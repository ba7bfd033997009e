"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference coffee-commodity-trading data warehouse
(baovanle/Building-Coffee-Commodity-Trading-Data-Warehouse), rebuilt
Spark-first.

The reference is 487 LoC of pandas + psycopg2 ETL (see SURVEY.md). This
package re-expresses every operator it runs — scans, projections, star
joins, window analytics, merge-dedup loads, audit logging — as lazy
DataFrame plans that Catalyst optimizes, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal columns) a 100 TB pipeline needs.

Layout:
    session     SparkSession factory tuned for local[N] testing
    catalog     parquet table registry over the driver testdata
    operators/  windows, joins, aggregates, topk, dedup, similarity, textstats
    sources/    csv (sentinel nulls), json/rest, pdf (binaryFile+mapInPandas), multimodal
    functions/  scalar function surface (F1-F15) + header normalization (P2-P8)
    plans/      end-to-end pipelines: star-schema fact build, idempotent ingest
    streaming/  structured-streaming veneer: watermarked windows, foreachBatch merge
    testing/    DuckDB-oracle comparison harness used by tests
"""

__version__ = "0.1.0"
