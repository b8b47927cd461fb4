"""Offline BPE merge-table learner (one-time, deterministic).

Learns N character-level merges from the sf0.01 documents corpus with
the standard frequency-greedy procedure (Sennrich et al. 2016: repeat —
count adjacent symbol pairs over the word-frequency dict, merge the most
frequent pair everywhere; ties broken lexicographically so the table is
reproducible bit-for-bit). Default output (N=64, no args) is the Python
literal pasted into crypto_market_tracker_etl_spark/functions/bpe.py;
``python tools/learn_bpe.py N --txt`` emits merges.txt format (one
"a b" pair per line) for the larger shipped tables
(functions/bpe_merges_{N}.txt) — the engine ships the TABLE, not the
learner, exactly like a production tokenizer ships merges.txt. The
learner stops early if the corpus saturates (no adjacent pair left that
occurs more than once would still be merged — we stop only when NO pair
remains), so the emitted table can be shorter than N.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

import duckdb

N_MERGES = 64
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    counts = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_merges = int(counts[0]) if counts else N_MERGES
    txt = "--txt" in sys.argv
    rich = "--rich" in sys.argv
    as_bytes = "--bytes" in sys.argv
    # --dir=PATH: learn from a different scale factor. The sf0.01 corpus
    # SATURATES at 1826 byte-level merges (measured r10) — a 4k-8k
    # production-size table needs sf0.1's vocabulary (15k distinct
    # customer digit-runs alone). The TABLE is scale-independent: like
    # any shipped merges.txt it is learned once on whatever corpus is
    # available and applied everywhere.
    sf_dir = SF_DIR
    for a in sys.argv[1:]:
        if a.startswith("--dir="):
            sf_dir = a.split("=", 1)[1]
    con = duckdb.connect()
    sources = [f"select text from read_parquet('{sf_dir}/documents.parquet')"]
    if rich or as_bytes:
        # the documents corpus has only 31 distinct words — it saturates
        # at 89 merges. Production-size tables need a bigger vocabulary,
        # so --rich also learns from the corpus's other string columns
        # (~16k distinct words at sf0.1: part names/types, entity names).
        sources += [
            f"select p_name from read_parquet('{sf_dir}/part.parquet')",
            f"select p_type from read_parquet('{sf_dir}/part.parquet')",
            f"select c_name from read_parquet('{sf_dir}/customer.parquet')",
            f"select s_name from read_parquet('{sf_dir}/supplier.parquet')",
        ]
    wordfreq: Counter[str] = Counter()
    if as_bytes:
        # byte-level mode: GPT-2-class regex pretokens of the RAW text
        # (no lowercasing, no whitespace normalization — byte-level
        # tokenizers see the text as-is), rendered in the byte alphabet.
        # Merges learned here are over alphabet symbols, one per byte.
        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), os.pardir)
        )
        from crypto_market_tracker_etl_spark.functions.bpe import (
            byte_encode_py,
            pretokenize_py,
        )

        for src in sources:
            for (text,) in con.execute(src).fetchall():
                for w in pretokenize_py(text):
                    wordfreq[byte_encode_py(w)] += 1
    else:
        for src in sources:
            for (text,) in con.execute(src).fetchall():
                norm = re.sub(r"\s+", " ", text.lower().strip())
                for w in norm.split(" "):
                    if w:
                        wordfreq[w] += 1

    # symbol sequences per word
    seqs: dict[str, tuple[list[str], int]] = {
        w: (list(w), c) for w, c in wordfreq.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
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

    if txt:
        for a, b in merges:
            print(f"{a} {b}")
    else:
        print("BPE_MERGES: list[tuple[str, str]] = [")
        for a, b in merges:
            print(f"    ({a!r}, {b!r}),")
        print("]")


if __name__ == "__main__":
    main()
