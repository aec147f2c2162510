"""crawl_streams_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ukwa/crawl-streams.

The reference (/root/reference, read-only) is a ~1.3k-LoC Kafka toolkit whose
hand-written consumer/producer loops perform a fixed set of relational and
streaming operations over JSON crawl events (see SURVEY.md). This package
re-expresses every one of those operations Spark-first:

- batch analytics: DataFrame / Spark SQL over Parquet & JSON (Catalyst plans,
  whole-stage codegen, AQE),
- streaming: Structured Streaming with watermarks + stateful aggregation,
- the single irreducible custom kernel (murmur3-seed-0 partition keys,
  reference enqueue.py:127) as an Arrow-batched pandas UDF,
- plus the large-scale training-data-pipeline extensions (dedup, similarity
  search, text analysis, multimodal plumbing) the reference lacks.

Layout:
    session.py      tuned SparkSession builder
    schemas.py      explicit StructType schemas (crawl log, tocrawl, feed)
    tables.py       loaders for the driver's TPC-H-ish test tables
    functions/      column-expression library (crawl, text, vectors, hashing)
    operators/      composed operators (host stats, report, launcher, dedup,
                    similarity, text analysis, multimodal)
    sources/        batch/streaming source builders (parquet, jsonl, kafka)
    streaming/      continuous jobs (analysis snapshot pipeline)
    plans/          the query registry consumed by __spark_entry__ / bench.py
"""

__version__ = "0.1.0"
