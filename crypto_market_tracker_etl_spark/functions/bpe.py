"""Byte-pair-encoding tokenization as a pure JVM expression cascade.

A real (small) BPE tokenizer, not a vocabulary heuristic: a 64-entry
merge table learned offline from the corpus (tools/learn_bpe.py —
standard Sennrich frequency-greedy learning, lexicographic tie-break,
bit-reproducible) is shipped as a literal, exactly like a production
tokenizer ships merges.txt. Application semantics, documented and
implemented IDENTICALLY in Spark and the DuckDB oracle:

* a word is spaced into single-character symbols (" h e l l o ");
* merges apply in table (rank) order, each as a literal string replace
  of " a b " → " ab " run TWICE — left-to-right non-overlapping replace
  consumes the boundary space shared by back-to-back occurrences, so one
  pass merges the 1st/3rd/5th... occurrence of a chain and the second
  pass sweeps the stragglers (two passes always suffice: after pass one,
  surviving occurrences are separated by merged symbols);
* the token count is the number of space-separated symbols left.

This is the standard rank-order application: a VALID learned table lists
component merges before the compounds built from them, so single-pass-
per-rank coincides with the priority-queue tokenizer EXCEPT on
self-overlapping merge chains — a run of 5+ identical symbols under a
learned (g, g) merge segments here as gg|g|gg where priority-queue BPE
yields gg|gg|g (segmentation, and potentially counts, can differ on runs
of identical symbols). All three implementations (Spark cascade, DuckDB
CTE replay, the pure-Python model in tests) share these exact
boundary-space semantics, so the cross-engine attestation is
self-consistent.

Scale shape: the cascade is ~260 chained literal `replace` calls —
whole-stage-codegen JVM string ops, no UDF, no Python — and callers run
it on the DISTINCT-WORD grain (vocabulary ≪ corpus) before joining
counts back, so the cost is per vocabulary entry, not per token
instance.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Learned from /root/testdata/sf0.01/documents.parquet by
# tools/learn_bpe.py (64 merges, deterministic).
BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("p", "a"),
    ("pa", "r"),
    ("o", "in"),
    ("j", "oin"),
    ("s", "h"),
    ("h", "a"),
    ("ha", "sh"),
    ("r", "ow"),
    ("c", "h"),
    ("b", "at"),
    ("bat", "ch"),
    ("s", "c"),
    ("sc", "a"),
    ("sca", "n"),
    ("u", "st"),
    ("ust", "o"),
    ("usto", "mer"),
    ("o", "lu"),
    ("olu", "m"),
    ("olum", "n"),
    ("c", "ustomer"),
    ("c", "olumn"),
    ("t", "er"),
    ("l", "ter"),
    ("i", "lter"),
    ("f", "ilter"),
    ("s", "m"),
    ("sm", "a"),
    ("sma", "l"),
    ("smal", "l"),
    ("s", "l"),
    ("sl", "ow"),
    ("mer", "g"),
    ("merg", "e"),
    ("v", "e"),
    ("ve", "c"),
    ("vec", "t"),
    ("vect", "or"),
    ("or", "d"),
    ("ord", "er"),
    ("l", "in"),
    ("lin", "e"),
    ("t", "a"),
    ("ta", "b"),
    ("tab", "l"),
    ("tabl", "e"),
    ("d", "at"),
    ("dat", "a"),
    ("u", "p"),
    ("g", "g"),
    ("a", "gg"),
    ("v", "a"),
    ("va", "lu"),
    ("valu", "e"),
    ("k", "e"),
    ("ke", "y"),
]


def bpe_segment(word: Column) -> Column:
    """Space-separated BPE symbols of ``word`` (lowercase, no spaces in
    the input — callers tokenize on whitespace first), with sentinel
    spaces at both ends: ' cust omer ' style."""
    s = F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))
    for a, b in BPE_MERGES:
        pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
        s = F.replace(F.replace(s, pat, rep), pat, rep)
    return s


def bpe_tokens(word: Column) -> Column:
    """BPE token array for one word."""
    return F.split(F.trim(bpe_segment(word)), " ")


def bpe_token_count(word: Column) -> Column:
    """Number of BPE tokens ``word`` encodes to (≥1 for non-empty)."""
    return F.size(bpe_tokens(word))


def bpe_sql_ctes(source_sql: str, word_col: str = "w") -> str:
    """DuckDB CTE chain computing the IDENTICAL spaced segmentation (same
    table, same two-pass literal replaces) — the oracle replays the
    tokenizer rather than trusting it. One CTE per merge: DuckDB's binder
    caps expression recursion at 128, so a single nested-replace
    expression (depth ~260) cannot bind; the chain keeps each step's
    depth at 2. The final CTE ``bpe_vt`` yields (w, ntok)."""
    steps = [
        f"bpe0 AS (SELECT {word_col} AS w,"
        f" ' ' || regexp_replace({word_col}, '(.)', '\\1 ', 'g') AS s"
        f" FROM ({source_sql}))"
    ]
    for i, (a, b) in enumerate(BPE_MERGES, start=1):
        pat = f" {a} {b} ".replace("'", "''")
        rep = f" {a}{b} ".replace("'", "''")
        steps.append(
            f"bpe{i} AS (SELECT w,"
            f" replace(replace(s, '{pat}', '{rep}'), '{pat}', '{rep}') AS s"
            f" FROM bpe{i - 1})"
        )
    steps.append(
        "bpe_vt AS (SELECT w,"
        " len(regexp_split_to_array(trim(s), ' ')) AS ntok"
        f" FROM bpe{len(BPE_MERGES)})"
    )
    return ",\n".join(steps)


def bpe_encode_py(word: str) -> list[str]:
    """Pure-Python reference model of the SAME semantics (rank order,
    two-pass boundary-space replace) — the third independent check used
    by tests; deliberately string-based like the engines, not list-based
    like the learner."""
    s = " " + "".join(c + " " for c in word)
    for a, b in BPE_MERGES:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        s = s.replace(pat, rep).replace(pat, rep)
    return s.split()
