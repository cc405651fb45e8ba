"""Benchmark drivers/converters + GPT-review plumbing tests (no model, no network)."""
import json

import pytest

from slime_tpu.eval import benchmarks as bm
from slime_tpu.eval import gpt_review as gr


def test_mmbench_prompt_and_rotation():
    p = bm.mmbench_prompt("What color?", ["red", "blue"], hint="A photo.",
                          conv_mode="v1")
    assert "A. red" in p and "B. blue" in p and "A photo." in p
    assert "option's letter" in p


def test_get_options():
    row = {"A": "x", "B": "y", "C": "", "D": ""}
    assert bm.get_options(row) == ["x", "y"]


def test_converters(tmp_path):
    ans = tmp_path / "a.jsonl"
    with open(ans, "w") as f:
        f.write(json.dumps({"question_id": 1, "text": "Blue "}) + "\n")
        f.write(json.dumps({"question_id": 2, "text": "cat"}) + "\n")

    gqa = bm.convert_gqa(str(ans), str(tmp_path / "gqa.json"))
    assert json.load(open(gqa))[0] == {"questionId": "1", "prediction": "blue"}

    v2 = bm.convert_vqav2(str(ans), str(tmp_path / "v2.json"))
    assert json.load(open(v2))[0] == {"question_id": 1, "answer": "Blue"}

    mv = bm.convert_mmvet(str(ans), str(tmp_path / "mv.json"))
    assert json.load(open(mv))["v1_1"] == "Blue"

    sd = bm.convert_seed(str(ans), str(tmp_path / "seed.json"))
    assert json.load(open(sd))[1]["prediction"] == "cat"


def test_scienceqa_prompt():
    p = bm.scienceqa_prompt({"question": "Which is heavier?",
                             "choices": ["rock", "feather"], "hint": "think",
                             "image": "x.png"}, conv_mode="v1")
    assert "(A) rock" in p and "(B) feather" in p and "<image>" in p


def test_gpt_review_parse_and_summary():
    assert gr.parse_score("7 9\nGood answers.") == [7.0, 9.0]
    assert gr.parse_score("garbled") == [-1.0, -1.0]

    reviews = [
        {"tuple": [8.0, 6.0], "category": "conv"},
        {"tuple": [5.0, 10.0], "category": "conv"},
        {"tuple": [-1.0, -1.0], "category": "conv"},
    ]
    s = gr.summarize_reviews(reviews)
    assert s["conv"]["n"] == 2
    assert s["conv"]["score1"] == 6.5 and s["conv"]["score2"] == 8.0


def test_gpt_review_with_fake_judge():
    qs = [{"question_id": 1, "text": "desc?"}]
    a1 = [{"text": "a cat"}]
    a2 = [{"text": "a detailed cat"}]
    reviews = gr.review_answers(qs, a1, a2,
                                judge_fn=lambda sys, usr: "6 8\nSecond better.",
                                rule_prompt="Rate both 1-10.")
    assert reviews[0]["tuple"] == [6.0, 8.0]


def test_webpage_renderer(tmp_path):
    from slime_tpu.eval import webpage
    qs = [{"question_id": 1, "text": "what <is> this?"}]
    a1 = [{"text": "a cat"}]
    a2 = [{"text": "a <b>dog</b>"}]
    reviews = [{"tuple": [7.0, 9.0]}]
    p = webpage.write_review_page(str(tmp_path / "r.html"), qs, a1, a2, reviews,
                                  title="t & t")
    s = open(p).read()
    assert "7 / 9" in s and "&lt;b&gt;dog&lt;/b&gt;" in s and "t &amp; t" in s
