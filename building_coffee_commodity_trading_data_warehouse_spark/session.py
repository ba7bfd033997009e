"""SparkSession factory.

Local testing runs one JVM with N threads; the configs below are chosen
so the same logical plans scale to a real cluster: AQE for runtime
re-planning (skew joins, partition coalescing), shuffle partitions sized
to cores locally (on a cluster this is overridden per-job), UTC session
timezone so results are comparable with the DuckDB oracle, and Arrow for
any pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "coffee_dw_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or min(os.cpu_count() or 4, 32)
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Keep the AQE coalesce floor at its 1 MB default. A session-
        # wide 64KB floor (tried in an earlier round for Python-bound
        # folds) converts every small shuffle into ~cores tiny tasks
        # whose scheduling overhead multiplies under co-tenant load
        # (paired A/B: 11x on exact-dedup). The two CPU-bound fold
        # paths that genuinely need more tasks than their byte size
        # suggests (windows.holt_smoothing / rolling_quartiles) pin
        # their own parallelism with an explicit repartition-by-key,
        # which AQE never coalesces and which self-documents at
        # cluster scale.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def tune(spark: SparkSession) -> SparkSession:
    """Apply engine session defaults to an externally supplied session
    (the driver hands us one) without rebuilding it."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # see get_spark: the AQE coalesce floor stays at the 1 MB default;
    # if a prior session (or an old checkpointed conf) lowered it,
    # restore it — the 64KB floor amplifies tiny-task scheduling
    # overhead under co-tenant load.
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1MB"
    )
    # events.parquet stores TIMESTAMP(NANOS) which the vectorized reader
    # rejects; read as long and convert in the catalog (catalog.table).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass
    return spark


def scan_partitions(df) -> int | None:
    """Partition count of a LEAF-backed frame (file scan, local
    relation, checkpointed/streamed RDD — optionally under
    Project/Filter), or ``None`` for a composed plan.

    The widen guards (multimodal._widen, dedup.repeated_spans /
    _hot_char_islands, similarity.ivf_index_search) need the scan's
    parallelism to decide whether a repartition before a CPU-bound
    stage pays. ``df.rdd.getNumPartitions()`` answers that, but with
    AQE enabled it finalizes the adaptive plan, which eagerly
    EXECUTES any upstream shuffle stages — a composed (joined /
    aggregated) input would run its upstream DAG once for the probe
    and again for the real action, and a lazy transformation-builder
    would launch Spark jobs at construction time (r14 ADVICE item 5).
    So the probe first walks the OPTIMIZED plan (driver-side only, no
    jobs): stageless shapes — a leaf under any chain of
    Project/Filter — get the exact ``getNumPartitions`` answer (no
    exchange exists, so finalizing runs nothing); anything else
    returns None and the caller skips the widen (the pre-r14
    behaviour for composed inputs, now guaranteed job-free)."""
    try:
        node = df._jdf.queryExecution().optimizedPlan()
        while node.children().size() == 1 and node.getClass().getSimpleName() in (
            "Project",
            "Filter",
        ):
            node = node.children().apply(0)
        if node.children().size() != 0:
            return None
        return df.rdd.getNumPartitions()
    except Exception:
        return None


_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers
    regardless of the driver's sys.path — the programmatic twin of
    ``spark-submit --py-files pkg.zip``, which is how the package
    deploys on a real cluster.

    Needed whenever an executor-side closure references module-level
    functions from this package (cloudpickle serializes those BY
    REFERENCE, so the worker re-imports the module): a driver that
    merely ``sys.path``-hacked the repo in does not propagate that
    path to forked workers. Zips the package once per (session,
    process) and registers it via ``addPyFile``."""
    import tempfile
    import zipfile

    key = f"{id(spark)}:{__package__}"
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_{pkg_name}_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, dirs, files in os.walk(pkg_dir):
                dirs[:] = [d for d in dirs if d != "__pycache__"]
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        arc = os.path.join(
                            pkg_name, os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, arc)
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED.add(key)
