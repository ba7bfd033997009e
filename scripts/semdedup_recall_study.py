"""SemDeDup cross-cell recall study (SCALE.md round-10).

SemDeDup's approximation is that pairs in DIFFERENT k-means cells are
never examined. The d_semdedup_certify gate pins recall >= 0.9 at the
production cell count on lightly-perturbed planted pairs; this script
maps the TRADEOFF — recall of true near-dup pairs vs cell count vs
how near the duplicates are — so the knob's cost is measured, not
guessed.

Planted construction (deterministic, same as the gate's): every fifth
vector gets a copy with its first k coordinates scaled by s. Smaller s
/ larger k => the copy sits farther from the original => lower cosine
=> more likely to straddle a centroid boundary. True pairs = exact
blocked all-pairs at the threshold; recall = fraction whose members
share a cell.

Usage: python scripts/semdedup_recall_study.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from building_coffee_commodity_trading_data_warehouse_spark import catalog
from building_coffee_commodity_trading_data_warehouse_spark.operators.similarity import (
    embedding_neardup_pairs,
    semantic_dedup,
)
from building_coffee_commodity_trading_data_warehouse_spark.session import (
    get_spark,
    ship_package,
)


def corpus_with_planted(emb, scale: float, k_coords: int):
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.select("vec_id", dbl.alias("embedding"))
    pert = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(
                i < k_coords, x.cast("double") * scale
            ).otherwise(x.cast("double")),
        ).alias("embedding"),
    )
    return base.unionByName(pert).localCheckpoint()


def recall_at(spark, corpus, threshold: float, n_centroids):
    true_pairs = embedding_neardup_pairs(
        corpus, threshold=threshold, strategy="blocked"
    ).localCheckpoint()
    n_true = true_pairs.count()
    if n_true == 0:
        return None, 0
    cells = semantic_dedup(
        corpus, threshold=threshold, n_centroids=n_centroids,
        cells_only=True,
    ).select("vec_id", "cell")
    j = true_pairs.join(
        cells.select(F.col("vec_id").alias("vec_a"), F.col("cell").alias("ca")),
        "vec_a",
    ).join(
        cells.select(F.col("vec_id").alias("vec_b"), F.col("cell").alias("cb")),
        "vec_b",
    )
    found = j.filter(F.col("ca") == F.col("cb")).count()
    return round(found / n_true, 4), n_true


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("semdedup_recall_study", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    emb = catalog.table(spark, sf_dir, "embeddings")
    rows = []
    for scale, k_coords, thr in (
        (0.875, 1, 0.95),   # the gate's construction: cosine ~0.999
        (0.0, 8, 0.95),     # heavier: zero 8 of 64 coords
        (0.0, 16, 0.90),    # heavier still, looser threshold
        (-1.0, 16, 0.80),   # sign-flip 16 coords, loose threshold
    ):
        corpus = corpus_with_planted(emb, scale, k_coords)
        # the self-scaling default sizes on the PLANTED corpus (base
        # + copies), not the base table — label with that count
        n_corpus = corpus.count()
        for nc in (8, None, 128, 256):
            rec, n_true = recall_at(spark, corpus, thr, nc)
            rows.append(
                {
                    "scale": scale,
                    "k_coords": k_coords,
                    "threshold": thr,
                    "n_centroids": nc if nc else f"sqrtN({int(n_corpus**0.5)})",
                    "n_true_pairs": n_true,
                    "recall": rec,
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    print("RESULT " + json.dumps(rows))
    spark.stop()


if __name__ == "__main__":
    main()
