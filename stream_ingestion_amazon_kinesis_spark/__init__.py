"""PySpark-native analytics & streaming-ingestion engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo paortizotalvaro/Stream_Ingestion_Amazon_Kinesis (an
educational Kinesis streaming-ETL lab), widened into a full query
engine surface:

- ``sources``   : batch/stream readers, schema-on-read JSON decode with
                  corrupt-record quarantine (reference consumer.py:118,
                  177-185 semantics, done declaratively).
- ``operators`` : the flagship session-enrichment ETL (consumer.py:124-175)
                  plus the relational operator inventory (joins, aggs,
                  windows, rollups, set-ops, as-of/range joins) and
                  LLM-data-pipeline ops (dedup, similarity search, text
                  analysis, multimodal plumbing).
- ``functions`` : reusable column expressions (exact decimal money math,
                  tokenization, hashing, vector math).
- ``streaming`` : Structured Streaming pipelines with watermarks,
                  event-time windows, stateful dedup and two-sink routing
                  (the reference's demux, consumer.py:160-171, with
                  exactly-once checkpointing instead of TRIM_HORIZON replay).
- ``plans``     : the query registry the driver harness consumes.

Everything is DataFrame/SQL-first: logical plans go through Catalyst,
shuffles are minimized (broadcast for dims, partial aggregation), and
Python only appears in Arrow-batched Pandas UDFs where built-ins cannot
express the semantics.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
