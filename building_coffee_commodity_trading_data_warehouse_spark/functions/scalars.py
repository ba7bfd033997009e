"""Scalar function surface (SURVEY.md §2.8, F1-F15).

Pure ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no
Python in the hot path. Engine-portability notes earned against the
DuckDB oracle are encoded here once:

  * a bare double→int cast TRUNCATES in Spark but ROUNDS in DuckDB —
    floor explicitly (F1/P12);
  * Spark ``dayofweek`` is Sunday=1, DuckDB Sunday=0 — normalize;
  * sentinel handling composes nullif+coalesce (F3/P13, the 'NaN'
    convention of reference ODS.py:62);
  * timezone shifts use ``from_utc_timestamp`` (F12 — the reference
    localizes to Asia/Ho_Chi_Minh, STG.py:138-141).

Header/table normalization (P2-P8) lives in ``operators/normalize.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sentinel(col: Column | str, missing: str = "NaN") -> Column:
    """F3/P13 — NULL → sentinel string (reference ODS.py:62)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("string"), F.lit(missing))


def floor_int(col: Column | str) -> Column:
    """F1/P12 — double → integral without the Spark/DuckDB cast-rounding
    divergence."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c).cast("long")


def dow_sunday0(col: Column | str) -> Column:
    """F11 — day-of-week with Sunday=0 (ANSI/DuckDB convention)."""
    return (F.dayofweek(col) - 1).cast("long")


def local_time(col: Column | str, tz: str = "Asia/Ho_Chi_Minh") -> Column:
    """F12 — UTC → local wall time (the reference stamps snapshots in
    Asia/Ho_Chi_Minh, STG.py:138-141,269-273)."""
    return F.from_utc_timestamp(col, tz)


def scalar_battery(orders: DataFrame) -> DataFrame:
    """F1-F8 in one projection over ``orders`` (round, sentinel, case,
    substring/instr, regex replace, split/tokens, floor-cast)."""
    return orders.select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("price_r1"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("NaN")).alias(
            "status_sentinel"
        ),
        F.lower("o_orderpriority").alias("prio_lower"),
        F.substring("o_orderpriority", 1, 3).alias("prio_pfx"),
        F.instr("o_orderpriority", "-").cast("long").alias("dash_pos"),
        F.regexp_replace("o_orderpriority", "[AEIOU]", "").alias("prio_novowel"),
        F.split("o_orderpriority", "-").getItem(0).alias("prio_token0"),
        F.size(F.split("o_orderpriority", "-")).cast("long").alias("prio_ntokens"),
        floor_int("o_totalprice").alias("price_int"),
    )


def date_battery(orders: DataFrame) -> DataFrame:
    """F9-F12 — formatting, int-encoded date keys, calendar parts,
    date arithmetic, timezone localization."""
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_ts"),
        F.date_format("o_orderdate", "yyyyMMdd").cast("long").alias("date_id"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        dow_sunday0("o_orderdate").alias("order_dow"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
        # Asia/Ho_Chi_Minh is UTC+7, no DST — the oracle can state the
        # shift as a constant interval
        F.date_format(local_time("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
            "local_ts"
        ),
    )


def string_battery2(part: DataFrame) -> DataFrame:
    """Second string battery: padding, reverse, translate, edit
    distance, trims — completing §2.8 beyond the F1-F8 set. All
    JVM-codegen'd built-ins; levenshtein is the only O(len²) one and
    runs on short brand/type strings."""
    return part.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_brand", 12, "*").alias("brand_rpad"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_upvowel"),
        F.levenshtein("p_brand", "p_type").cast("long").alias("brand_type_dist"),
        F.trim(F.lpad("p_brand", 12, " ")).alias("brand_retrim"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


def array_battery(documents: DataFrame) -> DataFrame:
    """Array-function battery over the token array: sort, slice,
    distinct, membership, extremum — §2.8's collection-type surface.
    Arrays leave the query as joined strings (engine-portable
    representation; array cells round-trip differently through pandas).
    """
    toks = F.split(F.col("text"), r"\s+")
    sorted_toks = F.array_sort(toks)
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.slice(sorted_toks, 1, 5)).alias("first5_sorted"),
        F.concat_ws(" ", F.array_sort(F.array_distinct(toks))).alias("vocab_sorted"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_max(toks).alias("max_token"),
        F.array_min(toks).alias("min_token"),
    )


def higher_order_battery(documents: DataFrame) -> DataFrame:
    """Lambda/higher-order function surface (F.transform / filter /
    aggregate / zip_with / exists / forall) over the token arrays —
    the codegen'd array programming layer UDF-free pipelines build on
    (every lambda runs JVM-side; no Python anywhere).

    zip_with pairs each token with its own length (token:len) — the
    oracle replays the same values through an indexed transform, since
    DuckDB spells pairwise zips differently; the VALUES, not the
    spelling, are the contract."""
    toks = F.split(F.col("text"), r"\s+")
    lens = F.transform(toks, lambda t: F.length(t))
    folded = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    zipped = F.slice(
        F.zip_with(
            toks, lens, lambda t, n: F.concat(t, F.lit(":"), n.cast("string"))
        ),
        1,
        3,
    )
    return documents.select(
        "doc_id",
        F.array_join(F.transform(toks, lambda t: F.upper(t)), " ").alias("upper_join"),
        F.size(F.filter(toks, lambda t: F.length(t) > 3)).alias("n_long_tokens"),
        folded.alias("total_chars"),
        F.array_join(zipped, " ").alias("first3_tok_len"),
        F.exists(toks, lambda t: t == F.lit("the")).alias("has_the"),
        F.forall(toks, lambda t: F.length(t) < F.lit(20)).alias("all_short"),
    )


def register_chunk_udtf(spark) -> None:
    """Register the ``token_chunks`` SQL table function — the Python
    UDTF surface (§2.10): ``SELECT d.doc_id, c.* FROM documents d,
    LATERAL token_chunks(d.text, 16) c`` explodes each document into
    fixed-size token windows with positions, straight from SQL.

    Arrow-optimized (``useArrow=True``): rows move in Arrow batches,
    keeping the repo's no-row-at-a-time-serde policy; the heavy
    chunking path for pipelines remains the array-native
    curate.chunk_documents — this TVF is the SQL-integration surface
    for ad-hoc lateral explodes, not a replacement."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, chunk_text string, n_tokens int", useArrow=True)
    class TokenChunks:
        def eval(self, text: str, chunk: int):
            toks = [t for t in (text or "").split() if t]
            for i in range(0, max(len(toks), 1), max(chunk, 1)):
                part = toks[i : i + chunk]
                yield i // max(chunk, 1), " ".join(part), len(part)

    spark.udtf.register("token_chunks", TokenChunks)
