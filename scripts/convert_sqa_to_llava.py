#!/usr/bin/env python
"""Convert ScienceQA releases into LLaVA/SliME training-format JSON
(reference scripts/convert_sqa_to_llava.py + convert_sqa_to_llava_base_prompt.py,
condensed QCM->A prompt formats).

Input: ScienceQA problems.json + pid_splits.json; output: conversations JSON whose
records plug straight into SupervisedDataset.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OPTIONS = ["A", "B", "C", "D", "E"]


def build_question(problem: dict) -> str:
    q = problem["question"]
    ctx = problem.get("hint") or ""
    parts = []
    if ctx:
        parts.append(f"Context: {ctx}")
    parts.append(f"Question: {q}")
    choices = problem.get("choices", [])
    opts = " ".join(f"({OPTIONS[i]}) {c}" for i, c in enumerate(choices))
    parts.append(f"Options: {opts}")
    return "\n".join(parts)


def build_answer(problem: dict, *, with_lecture: bool = False,
                 with_solution: bool = False) -> str:
    ans = f"The answer is {OPTIONS[problem['answer']]}."
    pieces = []
    if with_lecture and problem.get("lecture"):
        pieces.append(f"LECTURE: {problem['lecture']}")
    if with_solution and problem.get("solution"):
        pieces.append(f"SOLUTION: {problem['solution']}")
    pieces.append(ans)
    return "\n".join(pieces)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-dir", required=True,
                    help="dir containing problems.json and pid_splits.json")
    ap.add_argument("--split", default="train")
    ap.add_argument("--output", required=True)
    ap.add_argument("--prompt-format", default="QCM-A",
                    choices=["QCM-A", "QCM-LEA", "QCM-EA"])
    args = ap.parse_args()

    with open(os.path.join(args.base_dir, "problems.json")) as f:
        problems = json.load(f)
    with open(os.path.join(args.base_dir, "pid_splits.json")) as f:
        pids = json.load(f)[args.split]

    with_lecture = "L" in args.prompt_format.split("-")[1]
    with_solution = "E" in args.prompt_format.split("-")[1]

    out = []
    for pid in pids:
        p = problems[pid]
        q = build_question(p)
        if p.get("image"):
            q = "<image>\n" + q
        rec = {
            "id": pid,
            "conversations": [
                {"from": "human", "value": q},
                {"from": "gpt", "value": build_answer(
                    p, with_lecture=with_lecture, with_solution=with_solution)},
            ],
        }
        if p.get("image"):
            rec["image"] = os.path.join(args.split, pid, p["image"])
        out.append(rec)

    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(f"{len(out)} records -> {args.output}")


if __name__ == "__main__":
    main()
