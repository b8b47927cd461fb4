"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring how ANN is actually deployed over huge corpora:

- ``brute_knn``: exact top-k cosine. The query set is broadcast (it is the
  bounded side); candidates stream through a single narrow stage — no
  shuffle of the corpus at all, then a window top-k on the (small) scored
  output keyed by query. Right up to ~10⁴ queries × any corpus size.
- ``rp_lsh_knn``: random-hyperplane LSH. Hyperplanes are deterministic
  (seeded, generated driver-side, embedded as literals so any oracle can
  reproduce them). Corpus is bucketed by sign-pattern; each query probes
  only its own bucket — the IVF-style scale path: bucket count ~2^H keeps
  per-bucket candidate lists ~n/2^H.

All math is Catalyst fold expressions (functions.vector) in double
precision — no UDFs, fully codegen'd, bit-reproducible.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import as_double, cosine
from .latest import top_k_per_key


def hyperplanes(dim: int, num_planes: int, seed: str = "rp") -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5(seed:plane:dim) parity.

    Generated driver-side with hashlib (not Spark) so the exact same
    constants can be embedded into oracle SQL text.
    """
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            digest = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            row.append(1.0 if int(digest[:2], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def _lit_vec(v: list[float]) -> Column:
    return F.array(*[F.lit(x) for x in v])


def bucket_key(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern string, one char per hyperplane ('1' if dot ≥ 0)."""
    bits = []
    for row in planes:
        dot = F.aggregate(
            F.zip_with(vec, _lit_vec(row), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def brute_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Output: query_id, neighbor_id, cosine, rank. Cosine is rounded before
    ranking so the (cosine, id) order is reproducible across engines.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.join(q, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), round_scale))
        .select("query_id", "neighbor_id", "cosine")
    )
    return top_k_per_key(scored, ["query_id"], [F.col("cosine"), F.col("neighbor_id")], k)


def rp_lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    num_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    At scale the corpus-side bucket key is precomputed/persisted (write
    once, probe many); the equi-join on bucket replaces the cross join, so
    work drops from |Q|·|C| to Σ per-bucket |Q_b|·|C_b|.
    """
    planes = hyperplanes(dim, num_planes)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bucket", bucket_key(F.col("cv"), planes))
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("qv"),
        ).withColumn("bucket", bucket_key(F.col("qv"), planes))
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), round_scale))
        .select("query_id", "neighbor_id", "cosine")
    )
    return top_k_per_key(scored, ["query_id"], [F.col("cosine"), F.col("neighbor_id")], k)
