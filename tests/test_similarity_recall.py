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
