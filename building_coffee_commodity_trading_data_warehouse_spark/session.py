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
        # AQE coalesces by BYTES, which serializes Python-CPU-bound
        # stages (applyInPandas folds) whose shuffle is only a few MB:
        # with the default 1 MB floor, a 3 MB / 100k-group stage
        # collapses to ~3 tasks (measured 3.6x wall on Holt smoothing
        # at sf0.1). Lowering the floor lets parallelismFirst's
        # totalSize/parallelism target win, spreading small-but-
        # expensive shuffles across cores; at cluster scale partitions
        # are far above either floor, so plans are unchanged.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
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
    # see get_spark: keep Python-bound small shuffles parallel
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB"
    )
    # events.parquet stores TIMESTAMP(NANOS) which the vectorized reader
    # rejects; read as long and convert in the catalog (catalog.table).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass
    return spark


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
