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
