"""Deduplication operators for large-scale text corpora (north-star
surface): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Portability: every hash is built from ``md5`` (identical on any
engine). MinHash uses the lexicographic minimum of ``md5(seed|shingle)``
per seed — a valid random-permutation min-hash with zero
engine-specific numerics.

Scale design:
  * exact dedup = one hash-shuffle on the content hash (not the text);
  * shingle→join pipelines shuffle on the shingle key; hot shingles
    (stopword bigrams) are the skew risk at 100 TB, so the candidate
    join supports a document-frequency cap that drops
    everywhere-shingles before the self-join (``max_df``) — standard
    practice and the difference between O(n²) and near-linear;
  * LSH banding turns all-pairs similarity into equality joins on
    band keys: only same-bucket pairs are verified with exact Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact dedup by content hash: keeper = min doc_id per text.
    Hashing first keeps the shuffle narrow (32-byte keys, not documents)."""
    return (
        documents.select("doc_id", F.md5(F.col("text").cast("binary")).alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingles(documents: DataFrame, n: int = 2) -> DataFrame:
    """Distinct word n-gram shingles per document, built array-side
    (one pass, no per-row Python): tokens[i..i+n-1] joined by space."""
    toks = F.split(F.col("text"), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return documents.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("shingle")
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 2,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity over the shingle join.

    ``max_df`` drops shingles present in more than that many documents
    before the self-join — the skew guard for web-scale corpora (a
    shingle in every document would otherwise produce |corpus|² pairs).
    """
    sh = shingles(documents, n)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(
            F.broadcast(df_counts.filter(F.col("df") <= max_df).select("shingle")),
            "shingle",
        )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            jac.cast("double").alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(documents: DataFrame, k: int = 8, n: int = 2) -> DataFrame:
    """MinHash signature rows (doc_id, seed, minhash): the minimum of
    md5(seed|shingle) per seed simulates k random permutations."""
    sh = shingles(documents, n)
    seeds = sh.sparkSession.range(k).select(F.col("id").cast("int").alias("seed"))
    return (
        sh.crossJoin(F.broadcast(seeds))
        .select(
            "doc_id",
            "seed",
            F.md5(
                F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle")).cast(
                    "binary"
                )
            ).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    k: int = 8,
    bands: int = 4,
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup: band the k-row signature into ``bands``
    buckets (r = k/bands rows each); docs sharing any band bucket are
    candidates; candidates are verified with exact Jaccard and filtered
    at ``threshold``. Each stage is an equi-join — no all-pairs scan.
    """
    r = k // bands
    sig = minhash_signatures(documents, k, n)
    band_key = (
        sig.withColumn("band", (F.col("seed") / r).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                        lambda s: s["minhash"],
                    ),
                ).cast("binary")
            ).alias("band_hash")
        )
    )
    a = band_key.select(F.col("doc_id").alias("doc_a"), "band", "band_hash")
    b = band_key.select(F.col("doc_id").alias("doc_b"), "band", "band_hash")
    candidates = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # verify ONLY candidates: intersect shingle sets along the candidate
    # pair list (candidates × shingles-of-a ⋈ shingles-of-b), never the
    # all-pairs join — this is the point of LSH.
    sh = shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb"))
    jac = F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.cast("double").alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(documents: DataFrame, bits: int = 16) -> DataFrame:
    """Per-document SimHash over distinct tokens: bit j of each token's
    md5 votes ±1 (parity of hex char j); the sign of the vote sum forms
    signature bit j. Portable: ascii/substr/md5 only.

    One explode + one grouped sum — the per-bit loop happens array-side
    in a single projection, not as ``bits`` passes over the data.
    """
    toks = documents.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), r"\s+"))).alias("tok"),
    ).withColumn("h", F.md5(F.col("tok").cast("binary")))
    votes = toks.select(
        "doc_id",
        *[
            (
                (F.ascii(F.substring("h", j + 1, 1)) % 2) * 2 - 1
            ).alias(f"v{j}")
            for j in range(bits)
        ],
    )
    summed = votes.groupBy("doc_id").agg(
        *[F.sum(f"v{j}").alias(f"s{j}") for j in range(bits)]
    )
    sig = summed.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
                for j in range(bits)
            ],
            F.lit(0),
        )
        .cast("long")
        .alias("simhash"),
    )
    return sig
