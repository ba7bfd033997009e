"""Table maintenance: small-file compaction.

A 100 TB table ingested by streaming micro-batches or partitioned
merges (plans/ingest.py) accumulates small parquet files; every
downstream scan then pays per-file open/footer costs and the scheduler
drowns in splits. Compaction is the OPTIMIZE-style rewrite: bin-pack
row groups back to target-sized files, content unchanged.

The reference never needs this (its tables live in Postgres), but any
parquet-at-rest deployment of this engine does — it is the operational
twin of the ingestion path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def table_file_stats(df: DataFrame) -> tuple[int, int]:
    """(n_files, total_bytes) of the parquet files behind a scan.
    Driver-side listing of FILE METADATA only (paths + sizes — never
    data); at 100 TB this is the same listing the planner already does.

    Sizes come from the Hadoop FileSystem resolved per-scheme via the
    JVM gateway (r12 verdict item 7 — the old ``os.path.getsize``
    path raised on any non-``file:`` scheme, because silently summing
    0 bytes would make ``compact_table`` collapse a remote table into
    ONE file). Local paths, ``file:`` URIs, and any scheme with a
    configured Hadoop connector (s3a, hdfs, abfs, gs) all take the
    same code path, and the listing is ONE ``listStatus`` per parent
    DIRECTORY — never a per-file RPC, which at a 100 TB table's file
    count would turn the stat pass into the bottleneck.
    """
    files = df.inputFiles()
    if not files:
        return 0, 0
    spark = df.sparkSession
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    by_parent: dict[str, set[str]] = {}
    for f in files:
        p = HPath(f)
        by_parent.setdefault(str(p.getParent()), set()).add(p.getName())
    total = 0
    for parent, names in by_parent.items():
        pp = HPath(parent)
        fs = pp.getFileSystem(hconf)
        for st in fs.listStatus(pp):
            if st.getPath().getName() in names:
                total += st.getLen()
    return len(files), total


def compact_table(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: str | None = None,
) -> int:
    """Rewrite ``src_path`` into ``dest_path`` with files bin-packed to
    ``target_file_bytes``. Returns the output file count.

    File count = ceil(total_bytes / target). Unpartitioned: one
    round-robin ``repartition(n_out)`` equalizes output sizes regardless
    of input skew. Partitioned: hashing on the partition column ALONE
    would put each Hive partition's rows in one shuffle partition — an
    oversized partition would still write one oversized file. Instead the
    repartition keys on (partition column, salt) where salt =
    ``pmod(xxhash64(monotonically_increasing_id()), files_per_partition)``,
    so a partition holding K× the target bytes fans out across ~K packed
    files while small partitions stay at 1. Content is unchanged
    (tested): compaction is layout-only.
    """
    df = spark.read.parquet(src_path)
    _, total = table_file_stats(df)
    n_out = max(1, math.ceil(total / target_file_bytes))
    if partition_by:
        from pyspark.sql import functions as F

        n_parts = df.select(partition_by).distinct().count()
        files_per_partition = max(1, math.ceil(n_out / max(1, n_parts)))
        salt = F.pmod(
            F.xxhash64(F.monotonically_increasing_id()),
            F.lit(files_per_partition),
        )
        (
            df.withColumn("__salt", salt)
            .repartition(n_out, F.col(partition_by), F.col("__salt"))
            .drop("__salt")
            .write.mode("overwrite")
            .partitionBy(partition_by)
            .parquet(dest_path)
        )
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(dest_path)
    out = spark.read.parquet(dest_path)
    n_files, _ = table_file_stats(out)
    return n_files


def analyze_table(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
    approx: bool = False,
) -> DataFrame:
    """ANALYZE-style column profiling: one row per column with row,
    null, and distinct counts plus min/max — the statistics a catalog
    keeps so a cost-based optimizer (and a human) can judge selectivity
    and skew without scanning the table again.

    One pass over the data: every per-column aggregate folds into a
    single aggregation (Spark plans the multi-distinct via one EXPAND),
    then the 1-row result explodes into the per-column stats rows —
    nothing driver-side, output is #columns rows. ``approx=True`` swaps
    exact distinct counts for HLL sketches (approx_count_distinct):
    the 100 TB default, since exact multi-column distinct multiplies
    the expanded row volume; gates use exact so the values are
    engine-portable."""
    from pyspark.sql import functions as F

    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs, entries = [], []
    for c in numeric_cols + string_cols:
        is_num = c in numeric_cols
        aggs += [
            F.count(F.lit(1)).alias(f"__rows_{c}"),
            F.count(c).alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
            (F.min(c).cast("double") if is_num else F.lit(None).cast("double")).alias(
                f"__minn_{c}"
            ),
            (F.max(c).cast("double") if is_num else F.lit(None).cast("double")).alias(
                f"__maxn_{c}"
            ),
            (F.lit(None).cast("string") if is_num else F.min(c).cast("string")).alias(
                f"__mins_{c}"
            ),
            (F.lit(None).cast("string") if is_num else F.max(c).cast("string")).alias(
                f"__maxs_{c}"
            ),
        ]
        entries.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__rows_{c}").alias("n_rows"),
                (F.col(f"__rows_{c}") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__minn_{c}").alias("min_num"),
                F.col(f"__maxn_{c}").alias("max_num"),
                F.col(f"__mins_{c}").alias("min_str"),
                F.col(f"__maxs_{c}").alias("max_str"),
            )
        )
    return df.agg(*aggs).select(F.explode(F.array(*entries)).alias("s")).select("s.*")


def skew_report(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Join-key skew diagnosis: the numbers you read BEFORE choosing
    between a plain shuffle join, a salted join (joins.salted_join),
    and an AQE skew split — the hottest ``top_n`` keys with their row
    counts, alongside corpus-wide key statistics (distinct keys, max
    and mean per-key count, and the max/mean skew factor).

    One key-keyed aggregate (map-side combinable) is the only pass
    over the data — the per-key frame is scoped-persisted so the top-N
    branch and the stats branch read the cache, not the table, twice
    (same policy as analytics.pareto_customers); the global stats fold
    that tiny frame into one broadcast row, and the top-N terminates
    in a per-partition heap (TakeOrderedAndProject) — nothing
    key-cardinality-sized ever sorts globally or lands on the driver."""
    from pyspark.sql import functions as F

    from ..caching import scoped_persist

    counts = scoped_persist(
        df.groupBy(F.col(key_col).cast("string").alias("key_s")).agg(
            F.count(F.lit(1)).alias("n_rows")
        )
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("__n_keys"),
        F.sum("n_rows").alias("__total"),
        F.max("n_rows").alias("__max_n"),
    )
    top = counts.orderBy(F.col("n_rows").desc(), "key_s").limit(top_n)
    avg = F.col("__total") / F.col("__n_keys")
    return top.crossJoin(F.broadcast(stats)).select(
        "key_s",
        "n_rows",
        F.col("__n_keys").alias("n_keys"),
        F.col("__total").alias("total_rows"),
        F.col("__max_n").alias("max_per_key"),
        avg.alias("mean_per_key"),
        (F.col("__max_n") / avg).alias("skew_factor"),
    )


def check_constraints(df: DataFrame, rules: dict[str, "Column"]) -> DataFrame:
    """Deequ-style declarative data-quality checks, ONE scan: each rule
    is a boolean expression that must evaluate TRUE per row (NULL
    counts as a violation — a completeness rule that silently passes on
    NULL would be useless). All rules fold in a single partial→final
    aggregate — adding rules adds columns to the agg, never passes over
    the data — and the 1-row result unpivots to per-rule rows via
    stack(). No UDFs; at 100 TB this is one map-only scan plus a 1-row
    shuffle."""
    from pyspark.sql import functions as F

    if not rules:
        # stack(0, ...) would not parse; an empty suite passes trivially
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "rule string, n_rows bigint, n_violations bigint, passed boolean"
        )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (_, pred) in enumerate(rules.items()):
        viol = F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
        aggs.append(F.sum(viol).cast("long").alias(f"__v{i}"))
    row = df.agg(*aggs)
    # rule names are user text: escape quote characters rather than
    # splicing them raw into the stack() expression (a name with an
    # apostrophe would otherwise break — or rewrite — the query).
    def _q(name: str) -> str:
        return "'" + name.replace("\\", "\\\\").replace("'", "\\'") + "'"

    pairs = ", ".join(f"{_q(name)}, __v{i}" for i, name in enumerate(rules))
    return row.select(
        F.expr(f"stack({len(rules)}, {pairs}) AS (rule, n_violations)"),
        F.col("__n").alias("n_rows"),
    ).select(
        "rule", "n_rows", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )


def check_unique(df: DataFrame, cols: list[str], rule_name: str | None = None) -> DataFrame:
    """Uniqueness constraint: ``n_violations`` = surplus rows beyond
    one per key (0 ⇔ the column set is a key). One key-keyed count
    aggregate (map-side combinable) folded to a single row — the only
    shuffle carries (key, partial_count) pairs."""
    from pyspark.sql import functions as F

    name = rule_name or f"unique({','.join(cols)})"
    per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
    return per_key.agg(
        F.lit(name).alias("rule"),
        F.sum("__c").cast("long").alias("n_rows"),
        F.sum(F.col("__c") - 1).cast("long").alias("n_violations"),
    ).select("rule", "n_rows", "n_violations", (F.col("n_violations") == 0).alias("passed"))


def check_foreign_key(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    pk_col: str,
    rule_name: str | None = None,
) -> DataFrame:
    """Referential-integrity constraint: ``n_violations`` = child rows
    whose non-NULL ``fk_col`` has no match in ``parent.pk_col`` (NULL
    fk is the SQL convention: not a violation — add a completeness
    rule if it should be). Both sides project to their single key
    column before the left_anti join, so the shuffle moves keys, not
    rows; at 100 TB AQE picks broadcast when the parent key set fits."""
    from pyspark.sql import functions as F

    name = rule_name or f"fk({fk_col}->{pk_col})"
    keys = parent.select(F.col(pk_col).alias(fk_col)).distinct()
    orphan_n = (
        child.select(fk_col)
        .filter(F.col(fk_col).isNotNull())
        .join(keys, fk_col, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    )
    total = child.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    return (
        total.crossJoin(orphan_n)
        .select(
            F.lit(name).alias("rule"),
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )


def zorder_value(x: "Column", y: "Column", bits: int = 16) -> "Column":
    """Morton (Z-order) interleave of two non-negative integer codes,
    ``bits`` bits each: bit i of ``x`` lands at position 2i, bit i of
    ``y`` at 2i+1. Pure shift/and/or expression — whole-stage codegen,
    engine-portable (the same arithmetic replays in any SQL engine),
    no UDF. Inputs must already be quantized to [0, 2^bits); compose
    with :func:`quantize_code` for arbitrary ranges."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def quantize_code(
    col: "Column",
    lo: "int | Column",
    hi: "int | Column",
    bits: int = 16,
) -> "Column":
    """Map an integer column in [lo, hi] onto the [0, 2^bits) lattice:
    floor(((col−lo)·(2^bits−1)) / (hi−lo)). The division is ONE
    correctly-rounded IEEE double division (Spark divides longs as
    doubles), so it is engine-identical as long as the numerator stays
    inside double's exact-integer range — enforced below for literal
    bounds: (hi−lo)·(2^bits−1) must be < 2^53. Wider key ranges must
    pre-scale (shift the key right) before quantizing; silently losing
    low bits would make the "same arithmetic on any engine" contract
    false exactly when it matters. Bounds may also be Columns (e.g. a
    broadcast 1-row min/max aggregate, the ANALYZE-stats composition)
    — the overflow guard is then the caller's responsibility. Either
    way the quantizer stays a map-only projection."""
    from pyspark.sql import Column, functions as F

    if isinstance(lo, Column) or isinstance(hi, Column):
        lo_c = lo if isinstance(lo, Column) else F.lit(lo)
        hi_c = hi if isinstance(hi, Column) else F.lit(hi)
        span = F.greatest(hi_c - lo_c, F.lit(1))
        scaled = (col.cast("long") - lo_c) * F.lit((1 << bits) - 1)
        return F.floor(scaled / span).cast("long")
    if (hi - lo) * ((1 << bits) - 1) >= (1 << 53):
        raise ValueError(
            f"key range {hi - lo} x {bits}-bit lattice exceeds double's "
            "exact-integer range (2^53) — pre-scale the key (shift right) "
            "before quantizing"
        )
    span = max(hi - lo, 1)
    scaled = (col.cast("long") - F.lit(lo)) * F.lit((1 << bits) - 1)
    return F.floor(scaled / F.lit(span)).cast("long")


def zorder_table(
    df: DataFrame,
    out_path: str,
    x_col: str,
    y_col: str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """OPTIMIZE ZORDER-style rewrite: cluster a table's files along the
    Morton curve of two query columns so 2-D range predicates prune at
    the FILE level (parquet min/max footer stats). A single-column sort
    clusters one dimension and scatters the other; the Z-curve keeps
    both columns' per-file ranges narrow, which is what data skipping
    needs when dashboards filter on either or both.

    Plan shape: quantize (map-only) → one range-partitioning exchange
    on the z-value (repartitionByRange samples the z distribution, so
    files come out balanced even under skew) → in-partition sort →
    parquet write. One shuffle total, layout-only; content unchanged
    (verified by the m_zorder_layout gate's content aggregate)."""
    z = zorder_value(
        quantize_code(df[x_col], *x_range, bits=bits),
        quantize_code(df[y_col], *y_range, bits=bits),
        bits=bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
