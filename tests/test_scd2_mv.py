"""SCD2 compaction, gaps-and-islands, and incremental-MV merge:
semantics on hand-built fixtures plus the plan/mergeability properties
the 100 TB posture depends on."""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark import catalog
from building_coffee_commodity_trading_data_warehouse_spark.operators import (
    aggregates,
    scd2,
    windows,
)
from building_coffee_commodity_trading_data_warehouse_spark.plans import explain


def _exchanges(df) -> int:
    return len(re.findall(r"Exchange hashpartitioning", explain.plan_string(df)))


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_scd2_collapses_noop_updates_and_versions(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 1, "bronze"),
        (1, _ts("2024-01-02T00:00:00"), 2, "bronze"),  # no-op update
        (1, _ts("2024-01-03T00:00:00"), 3, "silver"),
        (1, _ts("2024-01-04T00:00:00"), 4, "bronze"),  # back again → NEW version
        (2, _ts("2024-01-01T00:00:00"), 5, "gold"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = {(r["user_id"], r["version"]): r for r in scd2.scd2_compact(ev).collect()}
    assert len(out) == 4  # the no-op row collapsed
    v1, v2, v3 = out[(1, 1)], out[(1, 2)], out[(1, 3)]
    assert (v1["attr"], v2["attr"], v3["attr"]) == ("bronze", "silver", "bronze")
    # intervals chain: each valid_to equals the next valid_from
    assert v1["valid_to"] == v2["valid_from"]
    assert v2["valid_to"] == v3["valid_from"]
    assert v3["is_current"] and v3["valid_to"] == scd2.OPEN_END
    assert not v1["is_current"] and not v2["is_current"]
    assert out[(2, 1)]["is_current"]


def test_scd2_single_exchange(spark, sf_dir):
    """Change detection + interval close + versioning must share ONE
    key exchange — the property that keeps SCD2 cheap on a 100 TB log."""
    df = scd2.scd2_compact(catalog.table(spark, sf_dir, "events"))
    assert _exchanges(df) == 1


def test_scd2_current_is_one_row_per_key(spark, sf_dir):
    dim = scd2.scd2_compact(catalog.table(spark, sf_dir, "events"))
    cur = scd2.scd2_current(dim)
    per_key = cur.groupBy("user_id").count().filter(F.col("count") > 1).count()
    assert per_key == 0


def test_gap_islands_semantics(spark):
    days = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-05", "2024-02-01"]
    rows = [(1, _ts(d + "T12:00:00"), i) for i, d in enumerate(days)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = sorted(
        windows.gap_islands(ev).collect(), key=lambda r: r["streak_start"]
    )
    assert [(r["streak_start"], r["streak_end"], r["n_days"]) for r in out] == [
        ("2024-01-01", "2024-01-03", 3),
        ("2024-01-05", "2024-01-05", 1),
        ("2024-02-01", "2024-02-01", 1),
    ]


def test_merge_partials_invariant_to_split(spark, sf_dir):
    """The MV-refresh identity: merging per-key partials of ANY
    disjoint split equals the full aggregate, bit-for-bit (decimal
    accumulation is associative+commutative)."""
    ev = catalog.table(spark, sf_dir, "events")
    full = aggregates.merge_partials(aggregates.grouped_partials(ev))
    split3 = aggregates.merge_partials(
        aggregates.grouped_partials(ev.filter(F.col("event_id") % 3 == 0)),
        aggregates.grouped_partials(ev.filter(F.col("event_id") % 3 == 1)),
        aggregates.grouped_partials(ev.filter(F.col("event_id") % 3 == 2)),
    )
    a = {r["user_id"]: (r["n_events"], r["total_value"]) for r in full.collect()}
    b = {r["user_id"]: (r["n_events"], r["total_value"]) for r in split3.collect()}
    assert a == b


def test_approx_distinct_error_bound(spark, sf_dir):
    """HLL++ estimates within 3·rsd of exact for every group/column."""
    li = catalog.table(spark, sf_dir, "lineitem")
    exact = {r["l_returnflag"]: r for r in aggregates.distinct_counts(li).collect()}
    approx = {
        r["l_returnflag"]: r
        for r in aggregates.distinct_counts_approx(li, rsd=0.01).collect()
    }
    assert exact.keys() == approx.keys()
    for flag, e in exact.items():
        a = approx[flag]
        for ec, ac in (
            ("n_orders_exact", "n_orders_approx"),
            ("n_parts_exact", "n_parts_approx"),
        ):
            assert abs(a[ac] - e[ec]) <= max(3, 0.03 * e[ec]), (flag, ec)


def test_snapshot_diff_all_three_changes(spark, tmp_path):
    """CDF classification on a planted history: one insert, one
    delete, one update, and untouched keys absent from the feed."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import snapshots

    table = str(tmp_path / "t")
    v0 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, val double",
    )
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (4, "d", 40.0)],
        "id long, name string, val double",
    )
    snapshots.write_snapshot(v0, table)
    snapshots.write_snapshot(v1, table)
    got = {
        (r["change"], r["id"])
        for r in snapshots.snapshot_diff(spark, table, 0, 1, ["id"]).collect()
    }
    assert got == {("insert", 4), ("delete", 3), ("update", 2)}


def test_snapshot_diff_null_shift_is_an_update(spark, tmp_path):
    """Fingerprint must distinguish NULL-pattern shifts and
    delimiter-looking content — the collisions a concat_ws fold
    silently produces: (NULL,'x')→('x',NULL) and ('x|y','z')→('x','y|z')
    are both real updates."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import snapshots

    table = str(tmp_path / "t")
    v0 = spark.createDataFrame(
        [(1, None, "x"), (2, "x|y", "z")], "id long, a string, b string"
    )
    v1 = spark.createDataFrame(
        [(1, "x", None), (2, "x", "y|z")], "id long, a string, b string"
    )
    snapshots.write_snapshot(v0, table)
    snapshots.write_snapshot(v1, table)
    got = {
        (r["change"], r["id"])
        for r in snapshots.snapshot_diff(spark, table, 0, 1, ["id"]).collect()
    }
    assert got == {("update", 1), ("update", 2)}


def test_snapshot_diff_duplicate_keys_compare_multisets(spark, tmp_path):
    """key_cols need not be unique: a key whose row MULTISET is
    unchanged (even reordered) emits nothing; a changed multiset —
    including a pure cardinality change with identical values — emits
    exactly ONE update row, never the n*m cross-pairing a naive
    row-level inner join would produce."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import snapshots

    table = str(tmp_path / "t")
    v0 = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "x"), (2, "x"), (3, "q"), (3, "r")],
        "id long, v string",
    )
    v1 = spark.createDataFrame(
        # 1: same multiset reordered; 2: {x,x}→{x} cardinality change;
        # 3: one of two rows changed.
        [(1, "b"), (1, "a"), (2, "x"), (3, "q"), (3, "s")],
        "id long, v string",
    )
    snapshots.write_snapshot(v0, table)
    snapshots.write_snapshot(v1, table)
    got = sorted(
        (r["change"], r["id"])
        for r in snapshots.snapshot_diff(spark, table, 0, 1, ["id"]).collect()
    )
    assert got == [("update", 2), ("update", 3)]


def test_snapshot_diff_rejects_schema_drift(spark, tmp_path):
    import pytest

    from building_coffee_commodity_trading_data_warehouse_spark.plans import snapshots

    table = str(tmp_path / "t")
    snapshots.write_snapshot(
        spark.createDataFrame([(1, "a")], "id long, a string"), table
    )
    snapshots.write_snapshot(
        spark.createDataFrame([(1, "a", 2.0)], "id long, a string, b double"), table
    )
    with pytest.raises(ValueError, match="identical schemas"):
        snapshots.snapshot_diff(spark, table, 0, 1, ["id"])


def test_write_snapshot_skips_orphan_directory(spark, tmp_path):
    """A crashed write (data dir present, manifest unflipped) must not
    block future writes — the next version skips past the orphan."""
    import os

    from building_coffee_commodity_trading_data_warehouse_spark.plans import snapshots

    table = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    assert snapshots.write_snapshot(df, table) == 0
    # simulate a crash: v=1 directory lands but the manifest never flips
    df.write.parquet(os.path.join(table, "_versions", "v=1"))
    v = snapshots.write_snapshot(df, table)
    assert v == 2
    assert snapshots.read_version(spark, table, v).count() == 1
    # history only lists published versions; the orphan stays invisible
    assert [x[0] for x in snapshots.history(table)] == [0, 2]


def test_cdc_feed_reconstructs_target_multiset(spark, tmp_path):
    """apply_changes(v0, snapshot_changes(v0→v1)) == v1 as a row
    MULTISET, including duplicate keys, NULL payloads, reorderings,
    and cardinality-only changes."""
    from building_coffee_commodity_trading_data_warehouse_spark.plans import snapshots

    table = str(tmp_path / "t")
    v0 = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "x"), (2, "x"), (3, "q"), (5, "gone")],
        "id long, v string",
    )
    v1 = spark.createDataFrame(
        # 1 reordered (unchanged), 2 loses a dup, 3 changes, 4 inserted
        # (with a NULL), 5 deleted
        [(1, "b"), (1, "a"), (2, "x"), (3, "Q"), (4, None)],
        "id long, v string",
    )
    snapshots.write_snapshot(v0, table)
    snapshots.write_snapshot(v1, table)
    feed = snapshots.snapshot_changes(spark, table, 0, 1, ["id"])
    got = snapshots.apply_changes(
        snapshots.read_version(spark, table, 0), feed, ["id"]
    )
    assert sorted(
        ((r["id"], r["v"]) for r in got.collect()),
        key=lambda t: (t[0], t[1] or ""),
    ) == sorted(
        ((r["id"], r["v"]) for r in v1.collect()),
        key=lambda t: (t[0], t[1] or ""),
    )
    # the feed itself: delete rows carry NULL payload, key populated
    deletes = feed.filter(feed.change == "delete").collect()
    assert [(r["id"], r["v"]) for r in deletes] == [(5, None)]
