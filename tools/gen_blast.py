#!/usr/bin/env python3
"""Adversarial parity-blast corpus generator.

Builds N fuzz turns (reusing gen_goldens.make_fuzz) plus their
reference-computed goldens, for graft.tools.ParityBlast:

    python3 tools/gen_blast.py 20000 90000 /tmp/blast
    sbt -batch "runMain graft.tools.ParityBlast \
        /tmp/blast_corpus.jsonl /tmp/blast_goldens.jsonl"

Unlike the committed corpus (tools/gen_goldens.py), these are throwaway
sweeps — vary the seed base per run to keep hunting parity bugs.
Round-1 blasts caught five real divergences; round-2 re-ran 20,000
turns at seed base 90000 after the structure-reuse optimization: 0
failures.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gen_goldens as gg  # noqa: E402

TOOLS = ["plain", "document", "receipt", "id_card", "form", "table",
         "signage", "scientific", "multi_column", "html", "pdf", "book_page"]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    seed_base = int(sys.argv[2]) if len(sys.argv) > 2 else 90000
    prefix = sys.argv[3] if len(sys.argv) > 3 else "/tmp/blast"

    turns = []
    for i in range(n):
        text = gg.make_fuzz(seed_base + i * 17)
        if i % 31 == 0:
            text = text[: (i % 53)]
        turns.append({
            "conv_id": f"blast-{i // 10:05d}", "turn_idx": i % 10,
            "role": ["user", "assistant", "tool"][i % 3], "text": text,
            "tool": TOOLS[i % len(TOOLS)], "ts": 1700000000000 + i * 1000,
        })
    with open(f"{prefix}_corpus.jsonl", "w", encoding="utf-8") as f:
        for t in turns:
            f.write(json.dumps(t, ensure_ascii=False) + "\n")
    with open(f"{prefix}_goldens.jsonl", "w", encoding="utf-8") as f:
        for t in turns:
            g = gg.run_live_path(t["text"], t["tool"])
            g["conv_id"] = t["conv_id"]
            g["turn_idx"] = t["turn_idx"]
            g["markdown"] = gg.render_markdown(t["ts"], t["tool"], g)
            for k in ("_summary_raw", "_insights_raw", "_structured_live"):
                del g[k]
            f.write(json.dumps(g, ensure_ascii=False) + "\n")
    print(f"wrote {n} turns to {prefix}_corpus.jsonl / {prefix}_goldens.jsonl")


if __name__ == "__main__":
    main()
