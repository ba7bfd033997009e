"""ANN recall floors: approximate indexes (LSH, IVF) are judged by
recall@k against the exact brute force, not by value parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark import catalog
from building_coffee_commodity_trading_data_warehouse_spark.operators import similarity


def _pairs(df):
    return {(r["q_id"], r["c_id"]) for r in df.collect()}


def test_ivf_recall_floor(spark, sf_dir):
    emb = catalog.table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 25 == 0)
    exact = _pairs(similarity.brute_force_topk(emb, qs, k=5))
    approx = _pairs(similarity.ivf_topk(emb, qs, k=5, n_centroids=16, nprobe=4))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall  # nprobe/centroids = 1/4 of the corpus scanned


def test_ivf_probe_all_cells_is_exact(spark, sf_dir):
    emb = catalog.table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    exact = _pairs(similarity.brute_force_topk(emb, qs, k=5))
    full = _pairs(similarity.ivf_topk(emb, qs, k=5, n_centroids=8, nprobe=8))
    assert full == exact  # probing every cell degenerates to brute force


def test_lsh_recall_floor(spark, sf_dir):
    emb = catalog.table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 25 == 0)
    exact = _pairs(similarity.brute_force_topk(emb, qs, k=5))
    # recall knobs: fewer planes -> bigger buckets, more tables -> more
    # chances (measured here: 4/4 -> 0.49, 4/8 -> 0.77, 3/8 -> 0.93)
    approx = _pairs(similarity.lsh_topk(emb, qs, k=5, planes=3, tables=8))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


# ------------------------------------------------- embedding near-dup


def _neardup_set(df):
    return {(r["vec_a"], r["vec_b"]) for r in df.collect()}


def test_neardup_blocked_multiblock_is_exact(spark, sf_dir):
    """Tiny block_size forces many block-pair tiles (incl. off-diagonal
    tiles where hash order disagrees with id order); output must equal
    the single-block formulation exactly."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    one = similarity.embedding_neardup_pairs(
        emb, threshold=0.4, strategy="blocked", block_size=1 << 20
    )
    many = similarity.embedding_neardup_pairs(
        emb, threshold=0.4, strategy="blocked", block_size=37
    )
    assert _neardup_set(one) == _neardup_set(many) != set()


def test_neardup_lsh_recall_on_synthetic_neardups(spark):
    """The LSH strategy must find EVERY pair at realistic near-dup
    thresholds: 100 jittered copies at cosine ~0.97 against 300 base
    vectors; auto-sized tables put the miss probability per pair below
    1e-6, so recall is 1.0 (deterministic: md5 planes, fixed seed)."""
    import numpy as np

    rng = np.random.default_rng(42)
    base = rng.normal(size=(300, 64))
    jit = base[:100] + rng.normal(scale=0.08, size=(100, 64))
    allv = np.vstack([base, jit])
    sdf = spark.createDataFrame(
        [(int(i), [float(x) for x in allv[i]]) for i in range(len(allv))],
        "vec_id long, embedding array<double>",
    )
    exact = _neardup_set(
        similarity.embedding_neardup_pairs(sdf, threshold=0.95, strategy="blocked")
    )
    lsh = _neardup_set(
        similarity.embedding_neardup_pairs(sdf, threshold=0.95, strategy="lsh")
    )
    assert len(exact) == 100
    assert lsh == exact  # recall 1.0 AND exact-precision (decimal verify)


def test_neardup_auto_strategy_split():
    assert similarity._lsh_tables_for(0.95, 8) <= 32
    # permissive thresholds would need pathological table counts -> auto
    # must route them to the blocked exact path instead
    assert similarity._lsh_tables_for(0.4, 8) == 64  # capped: lsh futile here


def test_knn_join_tiny_corpus_never_self_pairs(spark):
    """Regression: when a block holds <= k+margin rows, argpartition
    keeps every column including the -inf-masked diagonal; the exact
    rerank would then re-score the self-pair to cosine 1.0 at rank 1.
    _local_topm must drop non-finite scores before they reach the
    candidate set."""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(6, 16))  # n=6 <= k+margin+1 with defaults
    sdf = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    )
    out = similarity.knn_join(sdf, k=3).collect()
    assert all(r["q_id"] != r["c_id"] for r in out)
    # every query still gets its full k (n-1 >= k candidates exist)
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], set()).add(r["rk"])
    assert by_q == {i: {1, 2, 3} for i in range(6)}


def test_knn_join_invariant_to_block_size(spark, sf_dir):
    """The blocked tiling is pure mechanics: k-NN self-join output must
    be IDENTICAL for any block size (1 block == brute force)."""
    from building_coffee_commodity_trading_data_warehouse_spark import catalog
    from building_coffee_commodity_trading_data_warehouse_spark.operators import similarity

    emb = catalog.table(spark, sf_dir, "embeddings")
    one = similarity.knn_join(emb, k=2, block_size=1 << 20)
    tiled = similarity.knn_join(emb, k=2, block_size=16)
    a = sorted(map(tuple, one.collect()))
    b = sorted(map(tuple, tiled.collect()))
    assert a == b


def test_pq_recall_tighter_aggregate_floor(spark, sf_dir):
    """PQ candidates=128 on the random-embedding corpus: mean
    recall@5 pinned ≥ 0.8 (measured 0.88 sf0.01 / 0.97 sf0.001), and
    the certified gate's booleans must all come back TRUE."""
    from pyspark.sql import functions as F

    from building_coffee_commodity_trading_data_warehouse_spark import catalog
    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        similarity,
    )

    emb = catalog.table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    exact = {
        (r["q_id"], r["c_id"])
        for r in similarity.brute_force_topk(emb, q, 5).collect()
    }
    got = {
        (r["q_id"], r["c_id"])
        for r in similarity.pq_topk(emb, q, 5, candidates=128).collect()
    }
    assert len(got & exact) / len(exact) >= 0.8
    cert = similarity.pq_topk_certified(emb, q, 5, candidates=128).collect()
    assert cert and all(r["recall_ok"] and r["mean_recall_ok"] for r in cert)
    assert all(r["k_exact"] == 5 for r in cert)


def test_mips_topk_prefers_magnitude(spark):
    from building_coffee_commodity_trading_data_warehouse_spark.operators import (
        similarity,
    )

    # same direction, different magnitudes: MIPS must rank the longer
    # vector first even though cosine would tie them
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [10.0, 0.0], 0),   # large parallel
        (2, [0.9, 0.1], 0),    # near-parallel small
        (3, [0.0, 1.0], 0),    # orthogonal
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = similarity.mips_topk(emb, emb.filter("vec_id = 0"), k=3).collect()
    order = [r["c_id"] for r in sorted(out, key=lambda r: r["rk"])]
    assert order == [1, 2, 3]
    assert sorted(out, key=lambda r: r["rk"])[0]["dot"] == 10.0


# ------------------------------------------------- persistent IVF index


def test_ivf_index_search_equals_ivf_topk(spark, sf_dir, tmp_path):
    """Build + search must be ROW-IDENTICAL to the in-session ivf_topk
    at the same parameters: the deterministic trainer yields the same
    quantizer, the index stores embedding bytes unchanged, and the
    decimal rerank is shared — so persisting the index cannot move a
    single neighbor."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 25 == 0)
    path = str(tmp_path / "ivf_index")
    similarity.ivf_index_build(emb, path, n_centroids=16)
    got = sorted(
        map(tuple, similarity.ivf_index_search(spark, path, qs, k=5, nprobe=8).collect())
    )
    ref = sorted(
        map(tuple, similarity.ivf_topk(emb, qs, k=5, n_centroids=16, nprobe=8).collect())
    )
    assert got == ref


def test_ivf_index_search_prunes_partitions(spark, sf_dir, tmp_path):
    """The scan must read ONLY the probed cell partitions: hive-style
    PartitionFilters (cell INSET ...) with a pruned ReadSchema — the
    I/O, not just the FLOPs, is the nprobe/n_centroids fraction."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 125 == 0)
    path = str(tmp_path / "ivf_index")
    similarity.ivf_index_build(emb, path, n_centroids=16)
    res = similarity.ivf_index_search(spark, path, qs, k=5, nprobe=4)
    plan = res._jdf.queryExecution().executedPlan().toString()
    pf = [
        line
        for line in plan.splitlines()
        if "PartitionFilters" in line and "INSET" in line and "cell" in line
    ]
    assert pf, plan


def test_ivf_index_search_distributed_row_identical(spark, sf_dir, tmp_path):
    """The two-sided search (queries stay a DataFrame end-to-end, for
    query batches the one-sided path's bounded toPandas cannot hold)
    must be ROW-IDENTICAL to ivf_index_search: same quantizer math ->
    same candidate sets -> same decimal rerank."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 25 == 0)
    path = str(tmp_path / "ivf_index")
    similarity.ivf_index_build(emb, path, n_centroids=16)
    one = sorted(
        map(
            tuple,
            similarity.ivf_index_search(spark, path, qs, k=5, nprobe=8).collect(),
        )
    )
    two = sorted(
        map(
            tuple,
            similarity.ivf_index_search_distributed(
                spark, path, qs, k=5, nprobe=8
            ).collect(),
        )
    )
    assert one == two
    # partition pruning survives the two-sided rewrite
    plan = (
        similarity.ivf_index_search_distributed(spark, path, qs, k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = [
        line
        for line in plan.splitlines()
        if "PartitionFilters" in line and "INSET" in line and "cell" in line
    ]
    assert pf, plan


def test_ivf_index_search_auto_routes_large_batches(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Routing contract (r8 verdict item 4): above max_driver_queries
    the one-sided path (driver toPandas of the batch) must hand off to
    the two-sided distributed search; at or under it, stay one-sided.
    bounded=True/False force each path. Results are row-identical
    either way, so routing can never change an answer."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 25 == 0)
    n_q = qs.count()
    path = str(tmp_path / "ivf_index")
    similarity.ivf_index_build(emb, path, n_centroids=16)

    calls = []
    real = similarity.ivf_index_search_distributed

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(similarity, "ivf_index_search_distributed", spy)

    # auto + small batch → one-sided (no distributed call)
    small = similarity.ivf_index_search(
        spark, path, qs, k=5, nprobe=8, max_driver_queries=n_q
    )
    assert not calls
    # auto + batch over threshold → distributed
    routed = similarity.ivf_index_search(
        spark, path, qs, k=5, nprobe=8, max_driver_queries=n_q - 1
    )
    assert len(calls) == 1
    # bounded=False forces distributed without the size probe
    forced = similarity.ivf_index_search(
        spark, path, qs, k=5, nprobe=8, bounded=False
    )
    assert len(calls) == 2
    # bounded=True skips the probe and stays one-sided
    similarity.ivf_index_search(
        spark, path, qs, k=5, nprobe=8, bounded=True, max_driver_queries=0
    )
    assert len(calls) == 2

    a = sorted(map(tuple, small.collect()))
    assert a == sorted(map(tuple, routed.collect()))
    assert a == sorted(map(tuple, forced.collect()))


def test_semantic_dedup_planted_clusters(spark):
    """SemDeDup semantics on planted clusters: identical vectors
    collapse to one keeper per cluster (tie on centroid_sim -> min
    vec_id) and singletons survive, at 1/2/auto cell counts. (With
    nc=2 on THIS data k-means converges to cells {e1,e2 blobs} and
    {e3 singleton} — the two-multi-member-blobs-in-two-cells case is
    exercised separately below.)"""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.similarity import (
        semantic_dedup,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.0, 1.0, 0.0, 0.0]),
        (20, [0.0, 0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # n_centroids=None self-scales to ~sqrt(N) (here isqrt(6)=2)
    for nc in (1, 2, None):
        out = {r["vec_id"]: r for r in semantic_dedup(emb, 0.95, nc).collect()}
        assert {v for v, r in out.items() if r["is_keeper"]} == {1, 10, 20}
        assert out[2]["cluster_id"] == out[3]["cluster_id"] == 1
        assert out[11]["cluster_id"] == 10
        assert out[20]["cluster_id"] == 20 and out[20]["is_keeper"]
    # keeper rule: the member LEAST similar to its cell centroid wins
    rows2 = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.02, 0.0, 0.0]),   # slightly atypical -> keeper
        (3, [1.0, 0.0, 0.0, 0.0]),
    ]
    emb2 = spark.createDataFrame(rows2, "vec_id long, embedding array<double>")
    out2 = {r["vec_id"]: r for r in semantic_dedup(emb2, 0.95, 1).collect()}
    assert {v for v, r in out2.items() if r["is_keeper"]} == {2}
    assert out2[2]["centroid_sim"] < out2[1]["centroid_sim"]
    # two multi-member blobs, two cells: deterministic linspace init
    # (sorted by vec_id) seeds one centroid in each blob, so each
    # cluster dedupes INSIDE its own cell
    rows3 = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
        (10, [0.0, 1.0, 0.0, 0.0]),
        (11, [0.0, 1.0, 0.0, 0.0]),
        (12, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb3 = spark.createDataFrame(rows3, "vec_id long, embedding array<double>")
    out3 = {r["vec_id"]: r for r in semantic_dedup(emb3, 0.95, 2).collect()}
    assert {v for v, r in out3.items() if r["is_keeper"]} == {1, 10}
    assert len({out3[v]["cell"] for v in (1, 2, 3)}) == 1
    assert len({out3[v]["cell"] for v in (10, 11, 12)}) == 1
    assert out3[1]["cell"] != out3[10]["cell"]


def test_semantic_dedup_empty_input(spark):
    """An empty corpus passes through as an empty result (auto cell
    count must not crash the quantizer)."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert semantic_dedup(emb).count() == 0


def test_semantic_dedup_partition_invariant_cells(spark, sf_dir):
    """Cell election must be invariant to input partitioning: the
    argmax now runs over 2^-20 lattice-quantized centroid sims (ties
    to the lower cell index), so BLAS batch-composition noise — which
    DOES vary with partitioning — cannot flip a near-equidistant
    vector between cells (r10 review; keeper election already ran on
    the lattice). Full (vec_id → cell, cluster, keeper) must match
    across a 1-partition and a 13-partition run."""
    from building_coffee_commodity_trading_data_warehouse_spark import catalog
    from building_coffee_commodity_trading_data_warehouse_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = catalog.table(spark, sf_dir, "embeddings")
    runs = []
    for nparts in (1, 13):
        out = semantic_dedup(emb.repartition(nparts), 0.9, n_centroids=6)
        runs.append(
            {
                r["vec_id"]: (r["cell"], r["cluster_id"], r["is_keeper"])
                for r in out.collect()
            }
        )
    assert runs[0] == runs[1]


def test_quantize_embeddings_roundtrip_bound(spark):
    """int8 quantization: q in [-127,127] always, reconstruction
    error within s/254 (plus one lattice tick), extremes map to
    exactly ±127, zero vectors stay zero with vacuous certs."""
    from building_coffee_commodity_trading_data_warehouse_spark.operators import similarity

    rows = [
        (1, [1.0, -1.0, 0.5, 0.0]),
        (2, [0.0, 0.0, 0.0]),
        (3, [3.5e-5, -7.0e-5]),   # tiny magnitudes, scale ~7e-5
        (4, [127.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in similarity.quantize_embeddings(df).collect()}
    import hashlib

    assert got[1]["max_abs_q"] == 127 and got[1]["cert_int8"]
    # q for [1,-1,.5,0] at s=1: [127,-127,64,0] (63.5+0.5 floors to 64)
    assert got[1]["q_md5"] == hashlib.md5(b"127,-127,64,0").hexdigest()
    assert got[1]["sum_q"] == 64
    assert got[2]["scale"] == 0.0 and got[2]["sum_q"] == 0
    assert got[2]["cert_err"] and got[2]["max_err_scaled_q20"] == 0
    assert got[3]["cert_err"] and got[3]["max_abs_q"] == 127
    assert got[4]["q_md5"] == hashlib.md5(b"127").hexdigest()
    for r in got.values():
        assert r["cert_int8"] and r["cert_err"]


def test_ivf_index_lifecycle_append_compact_vacuum(spark, tmp_path):
    """r13: the IVF index's manifest lifecycle — appends assign cells
    under the FROZEN quantizer and publish atomically; a torn append
    (vectors, no manifest row) is invisible at search; same-tag
    replays don't double vectors; compact+vacuum are pure physical
    rewrites (search results byte-identical); build refuses a
    different-n_centroids rebuild and append refuses a bad tag."""
    import numpy as np
    import pandas as pd
    import pytest as _pt
    from pyspark.sql import functions as F

    from building_coffee_commodity_trading_data_warehouse_spark.operators import similarity

    rng = np.random.RandomState(7)
    n, d = 120, 8
    vecs = rng.randn(n, d).astype("float64")
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": [list(map(float, v)) for v in vecs],
    })
    emb = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    qs = emb.filter(F.col("vec_id") % 10 == 0)
    p = str(tmp_path / "ivf")
    key = lambda df: sorted(
        (r["q_id"], r["c_id"]) for r in df.select("q_id", "c_id").collect()
    )

    similarity.ivf_index_build(emb.filter("vec_id < 60"), p, n_centroids=4)
    base = key(similarity.ivf_index_search(spark, p, qs, 3, 4, bounded=True))

    # torn append: vectors land, manifest row never does — invisible
    torn = emb.filter("vec_id >= 60")
    spark.read.parquet(f"{p}/vectors").limit(0)  # layout probe only
    torn.select("vec_id", "embedding").withColumn(
        "cell", F.lit(0)
    ).write.partitionBy("cell").parquet(f"{p}/vectors/batch=torn")
    assert key(similarity.ivf_index_search(
        spark, p, qs, 3, 4, bounded=True)) == base

    # committed append, replayed with the same tag: no doubling
    similarity.ivf_index_append(torn, p, batch_tag="b2")
    similarity.ivf_index_append(torn, p, batch_tag="b2")
    full = similarity.ivf_index_search(spark, p, qs, 3, 4, bounded=True)
    got = key(full)
    assert got != base  # the appended half is searchable
    n_vec = (
        similarity._ivf_vectors(spark, p)
        .groupBy("vec_id").count().filter("count > 1").count()
    )
    assert n_vec == 0, "replayed append doubled vectors"

    # compact + vacuum: byte-identical search, torn dir removed
    similarity.ivf_index_compact(spark, p)
    assert key(similarity.ivf_index_search(
        spark, p, qs, 3, 4, bounded=True)) == got
    removed = {x.rsplit("/", 1)[-1]
               for x in similarity.ivf_index_vacuum(spark, p)}
    assert "batch=torn" in removed
    assert key(similarity.ivf_index_search(
        spark, p, qs, 3, 4, bounded=True)) == got
    # distributed route reads the same committed view
    assert key(similarity.ivf_index_search_distributed(
        spark, p, qs, 3, 4)) == got

    # guards: banding mismatch, bad tag, append-to-nothing
    with _pt.raises(ValueError, match="was built with"):
        similarity.ivf_index_build(emb, p, n_centroids=8)
    with _pt.raises(ValueError, match="must be"):
        similarity.ivf_index_append(torn, p, batch_tag="20240101")
    with _pt.raises(Exception):
        similarity.ivf_index_append(torn, str(tmp_path / "nope"))
