"""SNK-2: Solr index sink (reference: report.py:169,224 pushes the crawl-db
ETL projection through SolrKevalsDB.import_items_from, a generator feeding
Solr's JSON update handler).

Spark-first shape: a ``foreachBatch``-compatible callable that POSTs each
partition's documents from the *executors* (``foreachPartition``) in bounded
JSON batches, with retry + exponential backoff, then issues one driver-side
commit barrier per micro-batch. Compared to the reference's single-threaded
generator this parallelizes the push across partitions — at 100 TB the HTTP
fan-out is the bottleneck, so documents never funnel through the driver.

Delivery is at-least-once (a partition retry may re-POST documents that
already landed). That is safe for this ETL because the document id is the
deterministic F-8 key ``crawl-log:<ts>/<url>`` (report.py:177): Solr
overwrites on id, so replays are idempotent upserts.

The partition closure deliberately captures only stdlib modules and scalar
config (no references to this package), so it pickles by value and runs on
executors that don't have the repo on sys.path.
"""

from __future__ import annotations

import urllib.request

from pyspark.sql import DataFrame

__all__ = ["solr_pusher", "push_to_solr"]


def solr_pusher(
    update_url: str,
    batch_size: int = 500,
    max_retries: int = 5,
    initial_backoff: float = 0.2,
    commit: bool = True,
    timeout: float = 30.0,
):
    """Build a ``foreachBatch`` sink callable ``(batch_df, batch_id) -> None``
    that POSTs JSON document arrays to ``update_url``.

    Works unchanged for batch ETL (call it directly with any DataFrame) and
    for Structured Streaming (pass to ``writeStream.foreachBatch``).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        url = update_url
        bs = int(batch_size)
        mr = int(max_retries)
        bo = float(initial_backoff)
        tmo = float(timeout)

        def push_partition(rows):
            # Executor-side: stdlib only, nothing from this package.
            import json
            import time
            import urllib.request as rq

            def post(docs):
                body = json.dumps(docs, default=str).encode("utf-8")
                last = None
                for attempt in range(mr):
                    try:
                        req = rq.Request(
                            url,
                            data=body,
                            headers={"Content-Type": "application/json"},
                        )
                        with rq.urlopen(req, timeout=tmo) as resp:
                            resp.read()
                        return
                    except Exception as e:  # noqa: BLE001 — retry any I/O error
                        last = e
                        if attempt < mr - 1:
                            time.sleep(bo * (2**attempt))
                raise last

            buf = []
            for row in rows:
                buf.append(row.asDict(recursive=True))
                if len(buf) >= bs:
                    post(buf)
                    buf = []
            if buf:
                post(buf)

        batch_df.foreachPartition(push_partition)

        if commit:
            # One commit barrier per micro-batch, after every partition has
            # pushed — mirrors the reference's end-of-stream flush semantics.
            sep = "&" if "?" in url else "?"
            req = urllib.request.Request(
                url + sep + "commit=true",
                data=b"[]",
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                resp.read()

    return sink


def push_to_solr(df: DataFrame, update_url: str, **kwargs) -> None:
    """Batch-mode convenience: push an entire DataFrame now."""
    solr_pusher(update_url, **kwargs)(df, 0)
