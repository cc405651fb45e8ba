"""Eval harness + scorer tests: chunking, answer normalization, benchmark metrics,
and an end-to-end generation driver run on the tiny model."""
import json

import numpy as np
import pytest

from slime_tpu.eval import harness, scorers


def test_split_and_chunk():
    lst = list(range(10))
    chunks = harness.split_list(lst, 3)
    assert sum(chunks, []) == lst
    assert harness.get_chunk(lst, 3, 1) == chunks[1]


def test_vqa_normalization():
    assert scorers.normalize_vqa_answer("The Cat.") == "cat"
    assert scorers.normalize_vqa_answer("two") == "2"
    assert scorers.normalize_vqa_answer("dont") == "don't"
    assert scorers.normalize_vqa_answer("a dog") == "dog"


def test_vqa_accuracy_soft():
    gts = ["cat"] * 10
    assert scorers.vqa_accuracy("cat", gts) == 1.0
    assert scorers.vqa_accuracy("dog", gts) == 0.0
    gts = ["cat"] * 3 + ["dog"] * 7
    acc = scorers.vqa_accuracy("cat", gts)
    assert 0.0 < acc < 1.0


def test_pope_scoring():
    answers = [{"question_id": i, "text": t} for i, t in
               enumerate(["Yes, it is", "No", "yes", "there is not"])]
    labels = [{"question_id": i, "label": l} for i, l in
              enumerate(["yes", "no", "no", "no"])]
    m = scorers.score_pope(answers, labels)
    assert m["accuracy"] == 75.0
    assert 0 < m["f1"] <= 100


def test_scienceqa_parsing():
    assert scorers.parse_multichoice("The answer is B") == "B"
    assert scorers.parse_multichoice("A") == "A"
    assert scorers.parse_multichoice("C. because") == "C"
    assert scorers.parse_multichoice("I think maybe") is None
    m = scorers.score_scienceqa(
        [{"question_id": "1", "text": "The answer is A"},
         {"question_id": "2", "text": "B"}],
        {"1": 0, "2": 0})
    assert m["accuracy"] == 50.0


def test_mme_scoring():
    rows = [
        {"category": "color", "question_id": "img1", "text": "yes", "label": "yes"},
        {"category": "color", "question_id": "img1", "text": "no", "label": "no"},
        {"category": "color", "question_id": "img2", "text": "yes", "label": "no"},
        {"category": "color", "question_id": "img2", "text": "no", "label": "yes"},
    ]
    out = scorers.score_mme(rows)
    # acc = 50%, acc+ = 50% (img1 fully right) -> 100
    assert out["color"] == 100.0


def test_anls():
    assert scorers.anls("hello", ["hello"]) == 1.0
    assert scorers.anls("xyz", ["hello"]) == 0.0
    assert 0 < scorers.anls("helo", ["hello"]) < 1.0


def test_textvqa_scorer_files(tmp_path):
    res = tmp_path / "res.jsonl"
    with open(res, "w") as f:
        f.write(json.dumps({"question_id": 1, "text": "blue"}) + "\n")
        f.write(json.dumps({"question_id": 2, "text": "cat"}) + "\n")
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({"data": [
        {"question_id": 1, "answers": ["blue"] * 10},
        {"question_id": 2, "answers": ["dog"] * 10},
    ]}))
    m = scorers.score_textvqa(str(res), str(ann))
    assert m["accuracy"] == 50.0 and m["n"] == 2


@pytest.mark.slow
def test_harness_end_to_end(tmp_path):
    import jax
    from PIL import Image

    from slime_tpu.config import SliMEConfig
    from slime_tpu.models import slime
    from .toy_tokenizer import ToyTokenizer

    cfg = SliMEConfig.tiny()
    params = slime.init(jax.random.PRNGKey(0), cfg)
    tok = ToyTokenizer()

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (500, 400), (200, 10, 10)).save(img_dir / "x.jpg")
    questions = [{"question_id": i, "image": "x.jpg", "text": f"what color {i} ?"}
                 for i in range(3)]

    out = harness.run_eval(params, cfg, tok, questions,
                           image_folder=str(img_dir),
                           answers_file=str(tmp_path / "ans.jsonl"),
                           conv_mode="v1", batch_size=2, max_new_tokens=3,
                           seq_len=64, compute_dtype=np.float32, progress=False)
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == 3
    assert all("text" in r and "question_id" in r for r in rows)


@pytest.mark.slow
def test_harness_batched_matches_bs1(tmp_path):
    """Fidelity pin: batched greedy output must be token-identical to bs=1.

    The reference's scores are produced by bs=1 greedy decoding
    (llava/eval/model_vqa_loader.py:75-79, docs/Evaluation.md:3); our harness
    pads questions into fixed-shape batches and rounds sequence length to
    64-multiples (harness.py:124-135). This test crosses a 64-token bucket
    boundary (short + long prompts in one batch) AND exercises padded rows
    (5 questions, batch_size=4 -> final batch 1 real + 3 pad), asserting the
    decoded text per question is identical between batch_size=4 and
    batch_size=1. If a model/backend combination ever flips a greedy near-tie
    across tilings, score-reporting runs should pass --batch-size 1
    (docs/Evaluation.md, 'Protocol fidelity')."""
    import jax
    from PIL import Image

    from slime_tpu.config import SliMEConfig
    from slime_tpu.models import slime
    from .toy_tokenizer import ToyTokenizer

    cfg = SliMEConfig.tiny()
    params = slime.init(jax.random.PRNGKey(0), cfg)
    tok = ToyTokenizer()

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(5):
        Image.new("RGB", (300 + 60 * i, 240), (40 * i, 10, 200)).save(
            img_dir / f"im{i}.jpg")
    long_q = " ".join(f"word{j}" for j in range(70))  # crosses the 64 bucket
    questions = [
        {"question_id": 0, "image": "im0.jpg", "text": "what color ?"},
        {"question_id": 1, "image": "im1.jpg", "text": long_q},
        {"question_id": 2, "image": "im2.jpg", "text": "short ?"},
        {"question_id": 3, "image": "im3.jpg", "text": long_q + " extra"},
        {"question_id": 4, "image": "im4.jpg", "text": "is it red ?"},
    ]

    outs = {}
    for bs in (4, 1):
        f = harness.run_eval(params, cfg, tok, questions,
                             image_folder=str(img_dir),
                             answers_file=str(tmp_path / f"ans_bs{bs}.jsonl"),
                             conv_mode="v1", batch_size=bs, max_new_tokens=6,
                             seq_len=256, compute_dtype=np.float32,
                             progress=False)
        outs[bs] = {r["question_id"]: r["text"]
                    for r in map(json.loads, open(f))}
    assert outs[4] == outs[1], (
        f"batched eval diverged from bs=1 protocol: {outs[4]} vs {outs[1]}")


def test_merge_chunks(tmp_path):
    files = []
    for i in range(3):
        f = tmp_path / f"c{i}.jsonl"
        f.write_text(json.dumps({"question_id": i, "text": f"a{i}"}) + "\n")
        files.append(str(f))
    merged = harness.merge_chunks(files, str(tmp_path / "m.jsonl"))
    rows = [json.loads(l) for l in open(merged)]
    assert [r["question_id"] for r in rows] == [0, 1, 2]


def test_video_mme_scoring(tmp_path):
    from slime_tpu.eval.video import score_video_mme
    f = tmp_path / "v.jsonl"
    recs = [
        {"video_id": "v1", "duration": "short", "questions": [
            {"response": "The answer is A", "answer": "A"},
            {"response": "B", "answer": "C"},
        ]},
        {"video_id": "v2", "duration": "long", "questions": [
            {"response": "D", "answer": "D"},
        ]},
    ]
    with open(f, "w") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")
    s = score_video_mme(str(f))
    assert s["short"] == 50.0 and s["long"] == 100.0
    assert abs(s["overall"] - 200 / 3) < 1e-6


def test_video_frame_budget():
    from PIL import Image
    from slime_tpu.eval.video import process_video_frames
    frames = [Image.new("RGB", (640, 360), (i * 10, 0, 0)) for i in range(20)]
    pix, mask = process_video_frames(frames, tile=56, max_crops=8)
    assert pix.shape == (8, 3, 56, 56)
    assert mask.all()
    pix2, mask2 = process_video_frames(frames[:3], tile=56, max_crops=8)
    assert mask2.sum() == 3


def test_video_mme_frames_dir_resolution(tmp_path, monkeypatch):
    """Regression: each video must load ITS OWN frames dir (a leaked loop
    variable once routed every video to the last question's directory)."""
    import numpy as np
    from PIL import Image

    import slime_tpu.generate as gen_mod
    from slime_tpu.config import SliMEConfig
    from slime_tpu.eval import video as video_mod
    from .toy_tokenizer import ToyTokenizer

    frames_root = tmp_path / "frames"
    colors = {"vidA": (255, 0, 0), "vidB": (0, 200, 0)}
    for name, color in colors.items():
        d = frames_root / name
        d.mkdir(parents=True)
        for i in range(2):
            Image.new("RGB", (64, 64), color).save(d / f"{i:02d}.jpg")

    questions = [
        {"video_id": "A", "videoID": "vidA", "question_id": "q1",
         "question": "what?", "options": ["A. x", "B. y"], "answer": "A"},
        {"video_id": "B", "videoID": "vidB", "question_id": "q2",
         "question": "what?", "options": ["A. x", "B. y"], "answer": "B"},
    ]

    seen_pix = []

    def fake_generate(params, cfg, ids, attn, pix=None, mask=None, **kw):
        seen_pix.append(np.asarray(pix))
        return np.full((1, 1), cfg.eos_token_id, np.int32)

    monkeypatch.setattr(gen_mod, "generate", fake_generate)
    cfg = SliMEConfig.tiny()
    out = video_mod.run_video_mme(
        {}, cfg, ToyTokenizer(), questions,
        frames_root=str(frames_root), answers_file=str(tmp_path / "ans.jsonl"))

    assert len(seen_pix) == 2
    expected = []
    for name in ("vidA", "vidB"):
        frames = video_mod.load_frames(str(frames_root / name))
        pix, _ = video_mod.process_video_frames(
            frames, tile=cfg.vision.image_size,
            max_crops=1 + cfg.max_local_crops)
        expected.append(pix[None])
    # videos must not see each other's frames
    assert not np.allclose(expected[0], expected[1])
    np.testing.assert_allclose(seen_pix[0], expected[0])
    np.testing.assert_allclose(seen_pix[1], expected[1])


def test_relaxed_correctness():
    # numeric: 5% relative tolerance
    assert scorers.relaxed_correctness("100", "103")
    assert not scorers.relaxed_correctness("100", "106")
    # percentages normalize to fractions
    assert scorers.relaxed_correctness("50%", "0.51")
    # non-numeric: case-insensitive exact match
    assert scorers.relaxed_correctness("Blue", "blue")
    assert not scorers.relaxed_correctness("blue", "light blue")
    # zero target -> exact-match path (reference guards `target_float` truthy)
    assert scorers.relaxed_correctness("0", "0")
    assert not scorers.relaxed_correctness("0", "0.01")


def test_score_chartqa():
    entries = [
        {"answer": "42 ", "annotation": "43"},          # within 5%
        {"answer": "cat", "annotation": ["dog", "CAT"]},  # best-of list
        {"answer": "10", "annotation": "20"},            # wrong
    ]
    m = scorers.score_chartqa(entries)
    assert m["n"] == 3 and abs(m["relaxed_accuracy"] - 2 / 3) < 1e-9
    # an empty annotation list scores 0 instead of raising (ADVICE r2)
    m = scorers.score_chartqa(entries + [{"answer": "x", "annotation": []}])
    assert m["n"] == 4 and abs(m["relaxed_accuracy"] - 2 / 4) < 1e-9


def test_score_scienceqa_gpt4():
    problems = {
        "p1": {"choices": ["a", "b"], "answer": 1},
        "p2": {"choices": ["a", "b", "c"], "answer": 0},
    }
    ours = [{"question_id": "p1", "text": "The answer is B."},
            {"question_id": "p2", "text": "The answer is C."}]
    gpt4 = {"p1": "The answer is A.", "p2": "no parseable letter"}
    m = scorers.score_scienceqa_gpt4(ours, gpt4, problems, ["p1", "p2"])
    # p1: gpt4 says A (wrong); p2: gpt4 unparsable -> falls back to ours (C, wrong)
    assert m["total"] == 2 and m["correct"] == 0
    assert m["gpt4_failed"] == 1
    # upper bound counts p1 where OUR answer (B) was right
    assert m["accuracy_upperbound"] == 50.0


def test_score_scienceqa_gpt4_requery():
    problems = {
        "p1": {"choices": ["a", "b"], "answer": 1},
        "p2": {"choices": ["a", "b", "c"], "answer": 0},
        "p3": {"choices": ["a", "b"], "answer": 0},
    }
    ours = [{"question_id": "p1", "text": "The answer is A."},   # wrong
            {"question_id": "p2", "text": "The answer is A."},   # right
            {"question_id": "p3", "text": "The answer is B."}]   # wrong
    # requery fixes p1, is unparsable for p2 (falls back to ours), missing p3
    requery = [{"question_id": "p1", "text": "The answer is B."},
               {"question_id": "p2", "text": "hmm not sure"}]
    gpt4 = {"p1": "The answer is B.", "p2": "The answer is B.",
            "p3": "The answer is A."}
    m = scorers.score_scienceqa_gpt4_requery(ours, requery, gpt4, problems,
                                             ["p1", "p2", "p3"])
    # requery ensemble: p1 requery B (right), p2 falls back to ours A (right),
    # p3 missing requery -> ours B (wrong)
    assert m["count"] == 3 and m["correct"] == 2
    assert abs(m["acc"] - 200 / 3) < 1e-9
    assert m["missing_requery"] == 1
    assert m["results"] == {"p1": 1, "p2": 0, "p3": 1}
    assert abs(m["our_accuracy"] - 100 / 3) < 1e-9
    # gpt4: p1 B right, p2 B wrong, p3 A right -> 2/3
    assert abs(m["gpt4_accuracy"] - 200 / 3) < 1e-9
    # upper bound (gpt4 or ours right): p1 yes, p2 yes, p3 yes
    assert m["accuracy_upperbound"] == 100.0


def test_mmhal_parse_and_summarize():
    from slime_tpu.eval import mmhal
    assert mmhal.parse_rating("Good.\n- Rating: 5, very informative") == 5
    assert mmhal.parse_rating("rating: 6 or maybe Rating: 2") is None
    assert mmhal.parse_rating("no score here") is None
    # same rating repeated is still unique
    assert mmhal.parse_rating("Rating: 3 ... final Rating: 3") == 3

    reviews = [{"rating": r} for r in [6, 5, 1, None]]
    s = mmhal.summarize(reviews)
    assert s["n"] == 4
    assert s["average_score"] == (6 + 5 + 1 + 0) / 4
    assert s["hallucination_rate"] == 0.5  # ratings 1 and None(->0) are < 3
    assert s["score_per_type"][0] == 6 and s["score_per_type"][3] == 0


def test_mmhal_judge_prompt_and_fake_judge():
    from slime_tpu.eval import mmhal
    rec = {"question": "How many cats?", "image_content": ["Lynx", "Cat"],
           "gt_answer": "two", "model_answer": "one"}
    p = mmhal.build_judge_prompt(rec)
    assert "Lynx, Cat" in p and "### Question\nHow many cats?" in p
    reviews = mmhal.judge_responses(
        [rec], lambda sys, usr: "Wrong count.\n- Rating: 1")
    assert reviews[0]["rating"] == 1
    s = mmhal.summarize(reviews)
    assert s["hallucination_rate"] == 1.0


def test_run_text_qa_driver(tmp_path, monkeypatch):
    """model_qa.py-equivalent: text-only prompts through the default template,
    sampled decoding, reference answers-jsonl schema."""
    import numpy as np

    import slime_tpu.eval.harness as h
    from slime_tpu.config import SliMEConfig
    from .toy_tokenizer import ToyTokenizer

    import slime_tpu.generate as gen_mod

    seen = {}

    def fake_generate(params, cfg, ids, attn, *a, **kw):
        seen["temperature"] = kw.get("temperature")
        seen["rng"] = kw.get("rng")
        return np.full((ids.shape[0], 2), 9, np.int32)

    # run_text_qa imports generate inside the function from ..generate
    monkeypatch.setattr(gen_mod, "generate", fake_generate)
    cfg = SliMEConfig.tiny()
    out = h.run_text_qa({}, cfg, ToyTokenizer(),
                        [{"question_id": 3, "text": "why ?", "category": "c"}],
                        answers_file=str(tmp_path / "qa.jsonl"),
                        conv_mode="v1", batch_size=1, max_new_tokens=2)
    rows = [json.loads(l) for l in open(out)]
    assert rows[0]["question_id"] == 3 and "answer_id" in rows[0]
    assert seen["temperature"] == 0.7      # reference model_qa.py:37 sampling
    assert seen["rng"] is not None         # seeded, split per batch
