"""SNK-2 Solr sink against a fake in-process Solr update endpoint.

The reference pushes the crawl-db projection into Solr via a blocking
generator (report.py:169,224); here the push is partition-parallel HTTP from
executors. The fake collector records every update POST and the commit
barrier, and can fail the first N requests to exercise retry."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from crawl_streams_spark.operators import report as R
from crawl_streams_spark.sources.solr import push_to_solr, solr_pusher

from .fixtures import crawl_log_path


class _Collector:
    def __init__(self, fail_first: int = 0):
        self.lock = threading.Lock()
        self.docs: list[dict] = []
        self.posts = 0
        self.commits = 0
        self.fail_remaining = fail_first


def _make_server(collector: _Collector) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 — http.server API
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            with collector.lock:
                if collector.fail_remaining > 0:
                    collector.fail_remaining -= 1
                    self.send_response(503)
                    self.end_headers()
                    return
                if "commit=true" in self.path:
                    collector.commits += 1
                else:
                    collector.posts += 1
                    collector.docs.extend(json.loads(body))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"{}")

        def log_message(self, *a):  # silence
            pass

    return ThreadingHTTPServer(("127.0.0.1", 0), Handler)


@pytest.fixture()
def collector_server():
    col = _Collector()
    srv = _make_server(col)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield col, f"http://127.0.0.1:{srv.server_address[1]}/update/json/docs"
    srv.shutdown()


@pytest.mark.skipif(
    crawl_log_path() is None, reason="reference sample not available"
)
def test_solr_push_delivers_all_documents(spark, collector_server):
    col, url = collector_server
    from crawl_streams_spark.sources.jsonl import read_crawl_log

    docs = R.solr_documents(read_crawl_log(spark, crawl_log_path()))
    n = docs.count()
    push_to_solr(docs.repartition(4), url, batch_size=100)

    assert len(col.docs) == n
    assert col.commits == 1
    # batching honored: no single POST above batch_size
    assert col.posts >= (n + 99) // 100
    # idempotence key present and unique — replays would upsert, not dupe
    ids = [d["id"] for d in col.docs]
    assert len(set(ids)) == len(ids)
    assert all(i.startswith("crawl-log:") for i in ids)


def test_solr_push_retries_transient_failures(spark, collector_server):
    col, url = collector_server
    col.fail_remaining = 2  # first two requests 503 → retried with backoff
    df = spark.range(10).selectExpr("concat('doc-', id) AS id", "id AS n")
    push_to_solr(df.coalesce(1), url, batch_size=1000, initial_backoff=0.01)
    assert sorted(d["id"] for d in col.docs) == sorted(
        f"doc-{i}" for i in range(10)
    )
    assert col.commits == 1


def test_solr_pusher_as_foreach_batch_sink(spark, tmp_path, collector_server):
    col, url = collector_server
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(json.dumps({"id": f"s-{i}", "v": i}) for i in range(7))
    )
    stream = (
        spark.readStream.schema("id string, v long").json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(solr_pusher(url, batch_size=3))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    assert sorted(d["id"] for d in col.docs) == [f"s-{i}" for i in range(7)]
    assert col.commits == 1
