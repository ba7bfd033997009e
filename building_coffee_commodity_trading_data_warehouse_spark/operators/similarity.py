"""Similarity search over embedding columns (north-star surface).

Plan shape: dot products run ARRAY-NATIVE — ``zip_with`` multiply +
``aggregate`` into a DECIMAL accumulator, entirely inside one JVM
projection. No explode, no per-component shuffle: a scan of N vectors
against Q broadcast queries is one broadcast-nested-loop join of N·Q
rows, each doing D fused multiply-accumulates. The decimal accumulator
keeps results order-independent and bit-identical to the DuckDB oracle
(which sums DECIMAL over an exploded view).

Baseline: brute-force cosine top-k (exact, O(Q·N·D)). Scale path:
random-hyperplane LSH — hyperplane signs are md5-derived (computed
once on the driver, shipped as literal arrays), bucketing is a pure
projection, and only co-bucketed pairs reach a dot product. Multiple
hash tables trade candidates for recall.

At 100 TB: the candidate scan stays partition-parallel with nothing
on the driver; queries/planes are broadcast literals; the only
shuffles are the final per-query top-k window and the LSH bucket
equi-join.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DOT_DEC = "decimal(38,12)"
# accumulator is deliberately NARROWER than the per-term cast: Spark
# widens decimal addition by one digit of precision, and (38,12)+(38,12)
# would overflow p=38, silently dropping to scale 11 and rounding every
# step. (26,12)+(26,12) -> (27,12) stays exact, and dot magnitudes here
# never need >14 integral digits.
_ACC_DEC = "decimal(26,12)"


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Exact (order-independent) dot product of two double arrays:
    per-element IEEE multiply, decimal-exact accumulation."""
    # per-term cast to scale 12 matches the oracle's DECIMAL(38,12)
    # rounding; accumulation stays in _ACC_DEC so each addition is exact
    # (see note above on why (38,12) accumulation would round per step)
    return (
        F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast(_ACC_DEC),
            lambda acc, x: (acc + x.cast(_ACC_DEC)).cast(_ACC_DEC),
        )
    ).cast("double")


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def with_norm(embeddings: DataFrame, id_alias: str, prefix: str) -> DataFrame:
    emb_d = as_double(F.col("embedding"))
    return embeddings.select(
        F.col("vec_id").alias(id_alias),
        emb_d.alias(f"{prefix}emb"),
        norm(emb_d).alias(f"{prefix}norm"),
    )


def cosine_pairs(embeddings: DataFrame, queries: DataFrame) -> DataFrame:
    """Exact cosine for every (query, candidate) pair: candidates scan
    once, queries broadcast."""
    q = with_norm(queries, "q_id", "q_")
    c = with_norm(embeddings, "c_id", "c_")
    return c.join(F.broadcast(q), F.lit(True)).select(
        "q_id",
        "c_id",
        (dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))).alias(
            "cosine"
        ),
    )


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors per query (self-match excluded),
    deterministic tiebreak on candidate id."""
    from pyspark.sql import Window

    pairs = cosine_pairs(embeddings, queries).filter(F.col("q_id") != F.col("c_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cosine", F.col("rk").cast("long").alias("rk"))
    )


def _plane_signs(plane: int, dim: int, table: int = 0) -> list[int]:
    """Deterministic ±1 hyperplane coefficients from md5 parity —
    identical to the SQL ``ascii(substr(md5(p || '_' || pos),1,1)) % 2``
    oracle (pos is 1-based). Computed once driver-side, shipped as a
    literal array."""
    prefix = f"{plane}_" if table == 0 else f"t{table}:{plane}_"
    out = []
    for pos in range(1, dim + 1):
        h = hashlib.md5(f"{prefix}{pos}".encode()).hexdigest()
        out.append(1 if ord(h[0]) % 2 == 1 else -1)
    return out


def _embedding_dim(embeddings: DataFrame) -> int:
    row = embeddings.select(F.size("embedding").alias("d")).first()
    if row is None:
        return 0
    return row["d"]


def lsh_buckets(
    embeddings: DataFrame, planes: int = 8, table: int = 0, dim: int | None = None
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: sign-bit pattern of
    ``planes`` projections. Pure projection — zero shuffles."""
    if dim is None:
        dim = _embedding_dim(embeddings)
    emb_d = as_double(F.col("embedding"))
    bucket = F.lit(0)
    for p in range(planes):
        signs = F.array(*[F.lit(float(s)) for s in _plane_signs(p, dim, table)])
        proj = dot(emb_d, signs)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return embeddings.select("vec_id", bucket.cast("long").alias("bucket"))


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 4,
    tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: a vector is a candidate iff it co-buckets
    with the query in ANY of ``tables`` independent hash tables; exact
    cosine + rank over candidates only. Tune planes (bucket size) and
    tables (recall) to corpus density."""
    from functools import reduce

    from pyspark.sql import Window

    if dim is None:
        dim = _embedding_dim(embeddings)

    c = with_norm(embeddings, "c_id", "c_")
    q = with_norm(queries, "q_id", "q_")

    def _cands(table: int) -> DataFrame:
        b = lsh_buckets(embeddings, planes, table, dim)
        qb = b.join(queries.select("vec_id"), "vec_id").select(
            F.col("vec_id").alias("q_id"), "bucket"
        )
        cb = b.select(F.col("vec_id").alias("c_id"), "bucket")
        return (
            F.broadcast(qb)
            .join(cb, "bucket")
            .filter(F.col("q_id") != F.col("c_id"))
            .select("q_id", "c_id")
        )

    cand = reduce(DataFrame.unionByName, [_cands(t) for t in range(tables)]).distinct()
    pairs = (
        cand.join(F.broadcast(q), "q_id")
        .join(c, "c_id")
        .select(
            "q_id",
            "c_id",
            (
                dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cosine", F.col("rk").cast("long").alias("rk"))
    )


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.99
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``.
    All-pairs here (the exact baseline); at corpus scale run
    ``lsh_buckets`` first and compare within buckets."""
    pairs = cosine_pairs(embeddings, embeddings).filter(
        F.col("q_id") < F.col("c_id")
    )
    return pairs.filter(F.col("cosine") >= threshold).select(
        F.col("q_id").alias("vec_a"), F.col("c_id").alias("vec_b"), "cosine"
    )
