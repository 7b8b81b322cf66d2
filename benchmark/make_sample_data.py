"""Generate synthetic JSONL datasets in the reference harness's schema.

The reference ships four datasets (HumanEval/CNNDM/AIME/GSM8K) as JSONL
rows of {"question_id", "category", "turns": [prompt]} (reference:
benchmark/data/, loaded by eval_benchmark.py). Those corpora aren't
redistributed here; this generates schema-compatible synthetic sets so
`eval_benchmark.py` runs out of the box — token-id prompts by default
(no tokenizer needed; pass them with --token-ids), or word-salad text
with --text for tokenizer-equipped checkpoints.

  python benchmark/make_sample_data.py --out benchmark/data
  python benchmark/eval_benchmark.py -d D -t T \
      --data-path benchmark/data/synthetic_short.jsonl --token-ids
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

WORDS = (
    "the a of to and in is for on with as by at from that this it be are "
    "was were has have had not no yes one two three time way day man world "
    "life hand part child eye place work week case point company number"
).split()


def rows(rng, n, lo, hi, category, vocab, text):
    out = []
    for i in range(n):
        ln = int(rng.integers(lo, hi + 1))
        if text:
            prompt = " ".join(rng.choice(WORDS) for _ in range(ln))
        else:
            prompt = [int(t) for t in rng.integers(2, vocab, size=ln)]
        out.append({"question_id": i, "category": category, "turns": [prompt]})
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="benchmark/data")
    p.add_argument("--num", type=int, default=100)
    p.add_argument("--vocab", type=int, default=32000,
                   help="token-id upper bound (keep <= the model's vocab)")
    p.add_argument("--text", action="store_true", help="word-salad text prompts")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    sets = {
        "synthetic_short.jsonl": (8, 48, "short"),      # chat-style
        "synthetic_medium.jsonl": (128, 512, "medium"),  # GSM8K-ish lengths
        "synthetic_long.jsonl": (1024, 2048, "long"),    # CNNDM-ish lengths
    }
    for name, (lo, hi, cat) in sets.items():
        path = os.path.join(args.out, name)
        with open(path, "w") as f:
            for row in rows(rng, args.num, lo, hi, cat, args.vocab, args.text):
                f.write(json.dumps(row) + "\n")
        print(f"wrote {path} ({args.num} rows, len {lo}-{hi})")


if __name__ == "__main__":
    main()
