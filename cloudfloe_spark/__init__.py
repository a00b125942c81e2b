"""cloudfloe_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference system (gordonmurray/cloudfloe: a read-only SQL service over
Iceberg data lakes), re-expressed Spark-first:

- Engine      = Spark SQL / DataFrame API (Catalyst + Tungsten + AQE).
- Policy      = sqlglot-based read-only SQL validation + LIMIT injection
                (reference: backend/main.py:65-111).
- Sources     = parquet star schema fixtures, Iceberg tables (catalog or
                path), text/JSON reads (reference: backend/main.py:452-526).
- Extensions  = dedup (exact/MinHash-LSH/SimHash/ngram-Jaccard/embedding),
                similarity search (brute-force + LSH-bucketed ANN), text
                analysis (lang-id, quality, tokens, fingerprints),
                multimodal column plumbing, structured streaming.

Everything here is built on public PySpark APIs only.
"""

__version__ = "0.1.0"

from cloudfloe_spark.session import get_spark, stop_spark  # noqa: F401
