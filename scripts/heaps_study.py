"""Heaps'-law validation on REAL text (r10 verdict item 6).

The x100 decade sweeps for the vocab-bound queries (t_pretoken_vocab,
t_lm_quality) replicate the sf corpus, and replicated data adds no new
tokens — so their flat curves prove the exchange is vocabulary-sized
but NOT that vocabulary stays small on real data. That rested on an
asserted Heaps'-law argument. This study measures it: prefix scales of
the harvested English prose corpus (scripts/make_english_corpus.py —
genuinely new text at each scale, not replicas), and at each scale

  * the corpus token count N;
  * the pretoken vocabulary V_pre (t_pretoken_vocab's groupBy key
    cardinality) and the word-bigram vocabulary V_bi (t_lm_quality's
    heaviest exchange key);
  * the EXACT post-map-side-combine shuffle row count for each: the
    number of distinct (shuffle-map partition, key) pairs — what the
    hash exchange actually puts on the wire (each map task emits one
    partial row per distinct key it saw).

Heaps' law V = K * N^beta predicts beta ~ 0.4-0.6 for English; the
log-log slope between successive scales is printed per transition.

Usage: python scripts/heaps_study.py   (prints one JSON line per scale
plus a fitted-slope summary line; ~1 min on local[32])
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/english_corpus.txt"
DOC_CHARS = 600          # chunking into documents, fixed
N_PARTITIONS = 32        # matches the bench session's shuffle width


def main() -> None:
    if not os.path.exists(CORPUS):
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_english_corpus.py"),
             CORPUS],
            check=True,
        )
    text = open(CORPUS).read()
    docs_all = [
        text[i: i + DOC_CHARS] for i in range(0, len(text), DOC_CHARS)
    ]

    from pyspark.sql import functions as F

    from building_coffee_commodity_trading_data_warehouse_spark.session import (
        get_spark,
    )
    from building_coffee_commodity_trading_data_warehouse_spark.operators.textstats import (
        _GPT2_PRETOKEN_RE,
    )

    spark = get_spark("heaps_study", cpus=min(os.cpu_count() or 8, 32))
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for frac in (0.1, 0.32, 1.0):
        docs = docs_all[: max(1, int(len(docs_all) * frac))]
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
        ).repartition(N_PARTITIONS)

        pre = df.select(
            F.spark_partition_id().alias("pid"),
            F.explode(
                F.regexp_extract_all(
                    F.col("text"), F.lit(_GPT2_PRETOKEN_RE), 0
                )
            ).alias("k"),
        )
        toks = df.select(
            "doc_id",
            F.filter(
                F.split(F.col("text"), r"[ \t\n\x0B\f\r]+"),
                lambda w: w != F.lit(""),
            ).alias("__tk"),
        )
        bi = toks.select(
            F.spark_partition_id().alias("pid"),
            F.explode(
                F.zip_with(
                    F.col("__tk"),
                    F.slice(
                        F.col("__tk"), 2,
                        F.greatest(F.size("__tk") - 1, F.lit(0)),
                    ),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("k"),
        ).filter(~F.col("k").rlike(r"\A[^ ]*\z"))  # drop the tail 1-gram

        row = {
            "frac": frac,
            "n_docs": len(docs),
            "n_tokens": toks.select(
                F.sum(F.size("__tk"))
            ).collect()[0][0],
            "vocab_pretoken": pre.select("k").distinct().count(),
            "shuffle_rows_pretoken": pre.distinct().count(),
            "vocab_bigram": bi.select("k").distinct().count(),
            "shuffle_rows_bigram": bi.distinct().count(),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    def slope(a, b, key):
        return round(
            math.log(b[key] / a[key]) / math.log(b["n_tokens"] / a["n_tokens"]),
            3,
        )

    summary = {
        "beta_vocab_pretoken": [
            slope(a, b, "vocab_pretoken")
            for a, b in zip(results, results[1:])
        ],
        "beta_vocab_bigram": [
            slope(a, b, "vocab_bigram") for a, b in zip(results, results[1:])
        ],
        "beta_shuffle_pretoken": [
            slope(a, b, "shuffle_rows_pretoken")
            for a, b in zip(results, results[1:])
        ],
        "beta_shuffle_bigram": [
            slope(a, b, "shuffle_rows_bigram")
            for a, b in zip(results, results[1:])
        ],
    }
    print("HEAPS_SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
