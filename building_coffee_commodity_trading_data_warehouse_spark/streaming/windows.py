"""Watermarked window aggregations over event streams.

Tumbling / sliding / session windows with late-data bounds — the
streaming analytics surface (additive over the reference, which is
batch-only). All three run identically on a batch DataFrame (Spark's
unified semantics), which is how the oracle checks them: the driver
compares the streamed availableNow result against plain SQL.

State scale: watermark bounds the window state; keys are
(window, event_type) or (user) — low cardinality relative to events,
partial aggregation happens map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact import DEC


def _fmt(col: str):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Per event_type counts + exact value sums in tumbling windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            _fmt("w.start").alias("window_start"),
            _fmt("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding-window event counts: each event lands in width/slide
    overlapping windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            _fmt("w.start").alias("window_start"),
            _fmt("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows (gap-based): a session closes after
    ``gap`` of inactivity; window end = last event + gap. The batch
    twin of operators/windows.sessionize, expressed with the native
    session_window operator so the SAME code streams with state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            _fmt("w.start").alias("session_start"),
            _fmt("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def tumbling_ohlcv(
    events: DataFrame, width: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user OHLCV candles in tumbling event-time windows — the
    streaming twin of plans/bi.ohlcv_bars: a trading desk's live bar
    builder, late ticks bounded by the watermark. open/close are
    min_by/max_by on the same zero-padded epoch‖id key as the batch
    operator, so a tick arriving out of order still lands in the right
    position; all aggregates merge associatively, so state per
    (window, user) is one row regardless of tick volume."""
    tick_key = F.format_string(
        "%020d%012d",
        F.unix_micros(F.col("ts").cast("timestamp")),
        F.col("event_id"),
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "user_id")
        .agg(
            F.min_by("value", tick_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", tick_key).alias("close"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            _fmt("w.start").alias("window_start"),
            "user_id",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_ticks",
        )
    )


def tumbling_histogram(
    events: DataFrame,
    lo: float,
    hi: float,
    nbins: int,
    width: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-window value histograms over a live stream — the
    distribution-drift monitor (is this hour's traffic shaped like the
    last?) as a streaming operator. Bucketing is the same integer-cent
    floor division as the batch ``aggregates.histogram``: no float
    edge arithmetic, so streamed counts are bit-identical to a batch
    replay. State per (window, bucket) is one count — associative,
    watermark-bounded, independent of tick volume."""
    c = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    lo_c, hi_c = int(round(lo * 100)), int(round(hi * 100))
    if hi_c <= lo_c or nbins <= 0 or (hi_c - lo_c) % nbins:
        raise ValueError(
            f"histogram range [{lo}, {hi}] must split into {nbins} "
            "equal cent-lattice bins"
        )
    w_c = (hi_c - lo_c) // nbins
    raw = F.floor((c - F.lit(lo_c)) / F.lit(w_c)).cast("long")
    bucket = F.greatest(F.lit(0), F.least(F.lit(nbins - 1), raw))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            _fmt("w.start").alias("window_start"),
            "bucket",
            "n_rows",
        )
    )


def tumbling_user_totals(
    events: DataFrame, width: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Per-(window, user) event counts + exact value totals — the
    streamed state behind a live leaderboard. State is one associative
    (count, decimal-sum) pair per key, watermark-bounded; partial
    aggregation folds map-side before the shuffle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            _fmt("w.start").alias("window_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def leaderboard_topk(window_totals: DataFrame, k: int = 5) -> DataFrame:
    """Top-``k`` users per window over the MATERIALIZED output of
    ``tumbling_user_totals`` — rank functions are not supported inside
    a streaming aggregation, so the streaming engine maintains the
    per-(window, user) state and the leaderboard ranks the (tiny) sink
    table; this split is the standard streaming-top-k pattern and the
    rank input is #windows × #users rows, never event-sized. Ordering
    ties break on user_id, so the cut is deterministic."""
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(
            F.col("sum_value").desc(), F.col("user_id")
        )
    )
    return (
        window_totals.withColumn("rk", rk)
        .filter(F.col("rk") <= k)
        .select("window_start", "user_id", "n_events", "sum_value", "rk")
    )


def tumbling_variant_totals(
    events: DataFrame, width: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Open-schema streaming ingest: event payloads parse ONCE into
    the VARIANT encoding (Spark 4) and typed variant_get extraction
    feeds a watermarked tumbling aggregate — the shape a pipeline uses
    when producers evolve payload fields faster than schemas can be
    declared. The parse is a stateless projection (no per-field string
    re-parse downstream); state per (window, type) is one associative
    count + BIGINT sum."""
    # parse ONCE in a projection; inlining parse_json into each
    # aggregate re-parses the payload per expression copy.
    parsed = events.select(
        "ts", "event_type", F.parse_json("props").alias("__v")
    )
    k = F.expr("variant_get(__v, '$.k', 'int')")
    return (
        parsed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .select(
            _fmt("w.start").alias("window_start"),
            _fmt("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_k",
            "min_k",
            "max_k",
        )
    )
