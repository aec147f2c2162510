"""Source builders (SURVEY §2.1).

Every reference scan maps to a declarative Spark source:
  SRC-1 bounded Kafka topic scan      → kafka.read_topic / stream_topic
  SRC-2 event-time range scan         → kafka.read_topic_time_range
  SRC-3 continuous subscribe+retry    → kafka.stream_topic (+ checkpoint)
  SRC-4 JSONL crawl-feed scan         → jsonl.read_crawl_feed
  SRC-5 text URI-list scan            → jsonl.read_uri_list
plus file-based streaming (fixture dirs as streams) so tests need no broker,
and the extension source:
  SRC-6 WARC archive scan (r8)        → warc.WarcDataSource — ISO 28500
        records (plain or per-record gzip) through Spark 4's Python
        DataSource API; spark.read.format("warc").load(path); streaming
        watch with bounded mtime-watermark offsets and mode=permissive
        corrupt-archive quarantine (r9)
"""

from . import jsonl, kafka, warc  # noqa: F401
