"""Source builders (SURVEY §2.1).

Every reference scan maps to a declarative Spark source:
  SRC-1 bounded Kafka topic scan      → kafka.read_topic / stream_topic
  SRC-2 event-time range scan         → kafka.read_topic_time_range
  SRC-3 continuous subscribe+retry    → kafka.stream_topic (+ checkpoint)
  SRC-4 JSONL crawl-feed scan         → jsonl.read_crawl_feed
  SRC-5 text URI-list scan            → jsonl.read_uri_list
plus file-based streaming (fixture dirs as streams) so tests need no broker.
"""

from . import jsonl, kafka  # noqa: F401
