"""Offline BPE merge-table learner (one-time, deterministic).

Learns N character-level merges from the sf0.01 documents corpus with
the standard frequency-greedy procedure (Sennrich et al. 2016: repeat —
count adjacent symbol pairs over the word-frequency dict, merge the most
frequent pair everywhere; ties broken lexicographically so the table is
reproducible bit-for-bit). The output is a Python literal pasted into
crypto_market_tracker_etl_spark/functions/bpe.py — the engine ships the
TABLE, not the learner, exactly like a production tokenizer ships
merges.txt.
"""

from __future__ import annotations

import re
from collections import Counter

import duckdb

N_MERGES = 64
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    con = duckdb.connect()
    rows = con.execute(
        f"select text from read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    wordfreq: Counter[str] = Counter()
    for (text,) in rows:
        norm = re.sub(r"\s+", " ", text.lower().strip())
        for w in norm.split(" "):
            if w:
                wordfreq[w] += 1

    # symbol sequences per word
    seqs: dict[str, tuple[list[str], int]] = {
        w: (list(w), c) for w, c in wordfreq.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(N_MERGES):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, c in seqs.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        # NOTE: ties break to the lexicographically LARGEST pair (max on
        # (count, pair)) — one rule, applied identically on re-runs.
        merges.append(best)
        a, b = best
        ab = a + b
        for w, (syms, c) in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = (out, c)

    print("BPE_MERGES: list[tuple[str, str]] = [")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")


if __name__ == "__main__":
    main()
