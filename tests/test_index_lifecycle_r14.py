"""Round-14 index-lifecycle hardening tests.

Covers the r13 VERDICT/ADVICE items landed this round:

* IVF lifecycle test parity with text (VERDICT item 5): the
  dynamic-partitionOverwriteMode compact test and the vacuum grace
  window exercised through the IVF entry points, matching what the
  text (test_dedup_skew.py) and phash (test_multimodal.py) twins
  already pin.
* compact ``exclude_tags`` + the streaming auto-compact cadence
  (VERDICT item 3): folding everything except the current
  micro-batch's own tag keeps the replay contract intact.
* torn-manifest loud failure on the local fast path (r13 ADVICE #1)
  and the centroid sidecar's part-file commit check (ADVICE #4).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark.operators import (
    dedup,
    similarity,
)


def _emb(spark, n=120, d=8, seed=7, start=0):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, d).astype("float64")
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(start, start + n, dtype="int64"),
            "embedding": [list(map(float, v)) for v in vecs],
        }
    )
    return spark.createDataFrame(pdf, "vec_id long, embedding array<double>")


def _key(df):
    return sorted((r["q_id"], r["c_id"]) for r in df.select("q_id", "c_id").collect())


def test_ivf_compact_under_dynamic_overwrite_mode(spark, tmp_path):
    """VERDICT r13 item 5: the IVF twin of
    test_manifest_swap_static_under_dynamic_overwrite_mode — under a
    session-level partitionOverwriteMode=dynamic the compact manifest
    swap must still retire superseded batches (the swap pins static
    per-write in the shared machinery; this pins that the IVF entry
    point actually rides it)."""
    emb = _emb(spark)
    qs = emb.filter(F.col("vec_id") % 10 == 0)
    p = str(tmp_path / "ivf")
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        similarity.ivf_index_build(emb.filter("vec_id < 60"), p, n_centroids=4)
        similarity.ivf_index_append(
            emb.filter("vec_id >= 60"), p, batch_tag="b2"
        )
        before = _key(
            similarity.ivf_index_search(spark, p, qs, 3, 4, bounded=True)
        )
        bid = similarity.ivf_index_compact(spark, p)
        manifest = [
            r["batch"]
            for r in spark.read.parquet(f"{p}/manifest")
            .select(F.col("batch").cast("string").alias("batch"))
            .distinct()
            .collect()
        ]
        assert manifest == [bid], (
            f"dynamic overwrite leaked superseded manifest rows: {manifest}"
        )
        after = _key(
            similarity.ivf_index_search(spark, p, qs, 3, 4, bounded=True)
        )
        assert after == before
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)


def test_ivf_vacuum_grace_spares_young_then_removes(spark, tmp_path):
    """VERDICT r13 item 5: the vacuum in-flight-append guard through
    the IVF entry point — a just-written unreferenced batch dir (an
    append racing the vacuum) survives under a grace window and is
    removed once the grace is lifted."""
    emb = _emb(spark, n=60)
    p = str(tmp_path / "ivf")
    similarity.ivf_index_build(emb, p, n_centroids=4)
    # torn/in-flight append: vectors land, manifest row never does
    _emb(spark, n=20, seed=9, start=100).withColumn(
        "cell", F.lit(0)
    ).write.partitionBy("cell").parquet(f"{p}/vectors/batch=inflight")
    assert similarity.ivf_index_vacuum(spark, p, grace_seconds=3600) == []
    assert os.path.isdir(f"{p}/vectors/batch=inflight")
    removed = similarity.ivf_index_vacuum(spark, p, grace_seconds=0)
    assert any("batch=inflight" in r for r in removed)
    assert not os.path.isdir(f"{p}/vectors/batch=inflight")


def test_compact_exclude_tags_preserves_excluded_batch(spark, tmp_path):
    """r14: compact(exclude_tags=[t]) folds every OTHER committed
    batch into one compact batch, keeps t's data dir untouched and
    its manifest row alive, and search results are identical before
    and after. compact(exclude_tags=<everything>) is a no-op that
    returns None."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma tok{i} delta eps") for i in range(4)],
        "doc_id long, text string",
    )
    extra = spark.createDataFrame(
        [(10, "zeta eta theta iota kappa lambda")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, "alpha beta gamma tok2 delta eps"),
            (101, "zeta eta theta iota kappa lambda"),
        ],
        "doc_id long, text string",
    )
    p = str(tmp_path / "idx")
    dedup.neardup_index_build(docs, p, k=8, bands=4, n=2)
    dedup.neardup_index_build(
        extra, p, k=8, bands=4, n=2, mode="append", batch_tag="keepme"
    )
    key = lambda df: sorted(
        (r["doc_id"], r["n_candidates"], r["best_jaccard"], r["is_neardup"])
        for r in df.collect()
    )
    before = key(dedup.neardup_index_search(spark, p, batch, threshold=0.4))

    # excluding every committed batch: nothing to fold, loud no-op
    tags = dedup._committed_view(spark, p)
    assert dedup.neardup_index_compact(spark, p, exclude_tags=tags) is None
    assert dedup._committed_view(spark, p) == sorted(tags)

    bid = dedup.neardup_index_compact(spark, p, exclude_tags=["keepme"])
    committed = dedup._committed_view(spark, p)
    assert sorted(committed) == sorted([bid, "keepme"])
    assert os.path.isdir(f"{p}/bands/batch=keepme")
    after = key(dedup.neardup_index_search(spark, p, batch, threshold=0.4))
    assert after == before
    # the excluded tag is still addressable by the replay contract
    excl = key(
        dedup.neardup_index_search(
            spark, p, batch, threshold=0.4, exclude_tags=["keepme"]
        )
    )
    assert excl != after  # doc 101's match lives only in 'keepme'


def test_streaming_auto_compact_cadence(spark, tmp_path):
    """r14 (VERDICT r13 item 3): neardup_stream(compact_every=2) keeps
    the committed batch count bounded while producing verdicts
    identical to the uncompacted stream, and a replayed micro-batch
    stays byte-identical because its own tag is excluded from the
    fold."""
    from building_coffee_commodity_trading_data_warehouse_spark.streaming import (
        pipeline,
    )

    hist = spark.createDataFrame(
        [(i, f"base doc {i} with alpha beta gamma delta") for i in range(4)],
        "doc_id long, text string",
    )
    deliveries = [
        [(10, "base doc 2 with alpha beta gamma delta"),
         (11, "novel text one omega psi chi phi upsilon")],
        [(20, "novel text one omega psi chi phi upsilon"),
         (21, "second novel rho sigma tau nu mu lambda kappa")],
        [(30, "second novel rho sigma tau nu mu lambda kappa"),
         (31, "third novel aleph beth gimel daleth he waw")],
    ]

    def run_stream(root, compact_every):
        ipath = f"{root}/idx"
        dedup.neardup_index_build(hist, ipath, k=8, bands=4, n=2)
        land = f"{root}/land"
        os.makedirs(land, exist_ok=True)
        for i, rows in enumerate(deliveries):
            df = spark.createDataFrame(rows, "doc_id long, text string")
            df.coalesce(1).write.parquet(f"{root}/s{i}")
            pipeline.stage_delivery(f"{root}/s{i}", land, f"delivery_{i}")
        stream = pipeline.stream_documents(spark, land, max_files_per_trigger=1)
        q = pipeline.neardup_stream(
            stream, ipath, f"{root}/out", f"{root}/ckpt",
            threshold=0.4, append_survivors=True,
            compact_every=compact_every,
        )
        q.awaitTermination()
        verdicts = sorted(
            (r["doc_id"], r["is_neardup"], r["match_doc_id"])
            for r in spark.read.parquet(f"{root}/out").collect()
        )
        return ipath, verdicts

    p_plain, v_plain = run_stream(str(tmp_path / "plain"), None)
    p_auto, v_auto = run_stream(str(tmp_path / "auto"), 2)
    assert v_auto == v_plain  # cadence is a pure physical rewrite
    n_plain = len(dedup._committed_view(spark, p_plain))
    n_auto = len(dedup._committed_view(spark, p_auto))
    assert n_plain == 4  # build + 3 survivor appends
    assert n_auto <= 2  # compact batch + at most the newest tag

    # replay the LAST micro-batch against the compacted index:
    # sink and index must stay byte-identical (its own tag was
    # excluded from the fold, so self-exclusion still works)
    run = pipeline._checkpoint_run_id(spark, str(tmp_path / "auto" / "ckpt"))
    before = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "auto" / "out")).collect())
    )
    last = spark.createDataFrame(deliveries[-1], "doc_id long, text string")
    pipeline._neardup_screen_batch(
        last, 2, p_auto, str(tmp_path / "auto" / "out"), 0.4, True,
        run=run, compact_every=2,
    )
    after = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "auto" / "out")).collect())
    )
    assert after == before


def test_committed_view_torn_empty_manifest_raises(spark, tmp_path):
    """r13 ADVICE #1: a manifest dir that exists but holds no
    committed batch dir (crash mid-swap) must surface as the loud
    torn-index ValueError on the local fast path — not as an empty
    committed list that silently filters out ALL history."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma tok{i} delta eps") for i in range(4)],
        "doc_id long, text string",
    )
    p = str(tmp_path / "idx")
    dedup.neardup_index_build(docs, p, k=8, bands=4, n=2)
    # simulate the crash: manifest dir exists, no batch dir inside
    import shutil

    for d in os.listdir(f"{p}/manifest"):
        full = os.path.join(f"{p}/manifest", d)
        shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)
    assert dedup._committed_view(spark, p) is None
    with pytest.raises(ValueError, match="torn"):
        dedup.neardup_index_search(
            spark,
            p,
            spark.createDataFrame(
                [(100, "alpha beta gamma tok2 delta eps")],
                "doc_id long, text string",
            ),
            threshold=0.4,
        )


def test_read_centroids_skips_uncommitted_manifest_dir(spark, tmp_path):
    """r13 ADVICE #4: a torn append (manifest batch dir created,
    commit row's part file never written) must not count as committed
    for the centroid sidecar — the pyarrow fast path now applies the
    same part-file check as dedup._committed_view, so centroids and
    vectors agree on the committed set within one search."""
    emb = _emb(spark, n=60)
    p = str(tmp_path / "ivf")
    similarity.ivf_index_build(emb, p, n_centroids=4)
    C0 = similarity._read_centroids(spark, p)
    # torn append: centroid rows + an EMPTY manifest batch dir (the
    # dir exists, its commit part file does not)
    tags = dedup._committed_view(spark, p)
    src = f"{p}/centroids/batch={tags[0]}"
    import shutil

    shutil.copytree(src, f"{p}/centroids/batch=torn")
    os.makedirs(f"{p}/manifest/batch=torn", exist_ok=True)
    C1 = similarity._read_centroids(spark, p)
    assert np.array_equal(C0, C1), (
        "torn manifest dir counted as committed for centroids"
    )
