"""WARC (ISO 28500) reader as a Spark 4 Python DataSource.

The reference toolkit consumes crawl-log events ABOUT archived records
(crawlstreams' Kafka topics carry the log lines Heritrix emits as it
writes WARCs); reading the archives themselves is the natural source
extension for a crawl analytics engine — every downstream family here
(media decode, text curation, dedup) starts from WARC payloads in a
real deployment.

Format, honestly bounded: WARC/1.0 and WARC/1.1 records — a version
line, CRLF-terminated named headers, ``Content-Length`` octets of
payload, and a CRLF CRLF record separator — plain or gzip (including
the standard one-gzip-member-per-record layout: Python's streaming
GzipFile consumes concatenated members transparently). Anything
malformed raises ``WarcError`` with byte context; truncated payloads
are never silently clipped. HTTP response records additionally surface
the status code parsed from the enclosed HTTP status line.

Spark integration: ``register_warc_source(spark)`` registers the
``warc`` format; then

    spark.read.format("warc").load("/path/to/*.warc.gz")

Scale notes: one input partition per FILE — WARC convention caps files
at ~1 GB, so file-granularity is the natural parallelism at a
1000-executor crawl archive, and a gzip member stream cannot be split
finer without an external index anyway. ``max_payload_bytes`` (option,
default 1 MiB) bounds row width so a single oversized capture cannot
blow an executor's Arrow batch; the TRUNCATED payload is flagged in
``payload_truncated`` rather than silently cut. Header-only scans
(``payload excluded by column pruning``) still read the stream —
pushdown into gzip is impossible — but never materialize payloads into
rows.

Error envelope: ``mode`` option, ``failfast`` (default — a malformed
archive raises ``WarcError``, the right posture for a bounded batch
read) or ``permissive`` (records parsed before the corruption stand;
the corruption itself becomes ONE quarantine row with ``error`` set and
every other column NULL except ``source_file``, and the rest of that
file is skipped — same per-row quarantine discipline as the multimodal
decoders, and the posture a continuous directory watch needs so one
corrupt archive cannot poison-pill the stream; the reference's analysis
loop likewise skips bad records rather than failing the job,
crawl-streams analysis.py:140-141).

Streaming offsets are BOUNDED (the round-8 form — the sorted list of
every file name ever processed — wrote O(N) offset bytes per microbatch
over a long watch): the offset is a modification-time high-water mark
plus the listing within ``max_file_age_sec`` (default 7 days) of it,
mirroring Spark's native FileStreamSource ``maxFileAge`` semantics.
Files whose mtime has aged past the window purge from the offset;
a file that first APPEARS with an mtime older than the committed
watermark minus the window is ignored by design (exactly the native
source's documented contract — drop files with fresh mtimes, e.g.
write-elsewhere + rename preserves content but a copy refreshes mtime).
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os
import re

__all__ = [
    "WarcError",
    "WARC_SCHEMA",
    "warc_record_bytes",
    "iter_warc_records",
    "register_warc_source",
    "WarcDataSource",
]


class WarcError(ValueError):
    """Malformed or out-of-envelope WARC content."""


WARC_SCHEMA = (
    "warc_type string, record_id string, warc_date string, "
    "target_uri string, content_type string, content_length bigint, "
    "http_status int, payload binary, payload_truncated boolean, "
    "source_file string, error string"
)

_VERSION_RE = re.compile(rb"^WARC/(1\.[01])$")
_STATUS_RE = re.compile(rb"^HTTP/\d\.\d (\d{3})")


def warc_record_bytes(
    warc_type: str,
    payload: bytes,
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    warc_date: str = "2024-01-01T00:00:00Z",
    target_uri: str | None = None,
    content_type: str | None = None,
) -> bytes:
    """Fixture builder: one well-formed WARC/1.0 record."""
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"WARC-Date: " + warc_date.encode(),
    ]
    if target_uri is not None:
        lines.append(b"WARC-Target-URI: " + target_uri.encode())
    if content_type is not None:
        lines.append(b"Content-Type: " + content_type.encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _read_line(f) -> bytes:
    line = f.readline()
    if not line:
        raise WarcError("unexpected EOF inside a record header")
    if not line.endswith(b"\n"):
        raise WarcError("header line missing terminator (truncated file)")
    return line.rstrip(b"\r\n")


def iter_warc_records(f):
    """Yield (headers: dict[str, str], payload: bytes) from a binary
    stream of concatenated WARC records. Strict: bad version lines,
    missing Content-Length, short payloads, and broken separators all
    raise WarcError."""
    while True:
        # skip inter-record blank lines, detect EOF
        line = f.readline()
        if not line:
            return
        stripped = line.rstrip(b"\r\n")
        if stripped == b"":
            continue
        m = _VERSION_RE.match(stripped)
        if not m:
            raise WarcError(f"bad WARC version line {stripped[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            hline = _read_line(f)
            if hline == b"":
                break
            if b":" not in hline:
                raise WarcError(f"malformed header line {hline[:60]!r}")
            k, v = hline.split(b":", 1)
            try:
                key = k.strip().decode("ascii").lower()
            except UnicodeDecodeError as e:
                # header NAMES are ASCII by spec; a corrupt byte must be
                # a WarcError (the Spark stage catches exactly that), not
                # a UnicodeDecodeError that kills the task — found by
                # the totality fuzz
                raise WarcError(
                    f"non-ASCII header name {k[:40]!r}"
                ) from e
            headers[key] = v.strip().decode("utf-8", "replace")
        if "content-length" not in headers:
            raise WarcError("record missing Content-Length")
        try:
            n = int(headers["content-length"])
        except ValueError as e:
            raise WarcError(f"bad Content-Length: {e}") from None
        if n < 0:
            raise WarcError("negative Content-Length")
        payload = f.read(n)
        if len(payload) != n:
            raise WarcError(
                f"truncated payload: declared {n}, got {len(payload)}"
            )
        sep = f.read(4)
        if sep != b"\r\n\r\n":
            raise WarcError(f"bad record separator {sep!r}")
        yield headers, payload


def _open_maybe_gzip(path: str):
    raw = open(path, "rb")
    magic = raw.read(2)
    raw.seek(0)
    if magic == b"\x1f\x8b":
        # streaming GzipFile consumes concatenated members (the
        # record-per-member WARC convention) transparently
        return io.BufferedReader(gzip.GzipFile(fileobj=raw))
    return io.BufferedReader(raw)


def _http_status(headers: dict, payload: bytes) -> int | None:
    if headers.get("warc-type") != "response":
        return None
    m = _STATUS_RE.match(payload[:64])
    return int(m.group(1)) if m else None


def _rows_for_file(path: str, max_payload: int, permissive: bool = False):
    """Rows for one archive. ``permissive``: a mid-file ``WarcError``
    (or a bad gzip stream) yields ONE quarantine row — ``error`` set,
    ``source_file`` kept, everything else NULL — after the records that
    parsed cleanly; the remainder of the file is skipped (a corrupt
    framing byte makes every later record boundary untrustworthy)."""
    try:
        with _open_maybe_gzip(path) as f:
            for headers, payload in iter_warc_records(f):
                truncated = len(payload) > max_payload
                yield (
                    headers.get("warc-type"),
                    headers.get("warc-record-id"),
                    headers.get("warc-date"),
                    headers.get("warc-target-uri"),
                    headers.get("content-type"),
                    int(headers["content-length"]),
                    _http_status(headers, payload),
                    payload[:max_payload],
                    truncated,
                    path,
                    None,
                )
    except (WarcError, gzip.BadGzipFile, EOFError, OSError) as e:
        if not permissive:
            raise
        yield (None,) * 9 + (path, f"{type(e).__name__}: {e}")


def _expand_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        out = []
        for root, _dirs, files in os.walk(path):
            out.extend(
                os.path.join(root, x)
                for x in files
                if x.endswith((".warc", ".warc.gz"))
            )
        if not out:
            # same fail-fast contract as the glob form: a wrong (but
            # existing) directory must not read as an empty archive
            raise WarcError(f"no WARC files match {path!r}")
        return sorted(out)
    matches = sorted(_glob.glob(path))
    if not matches:
        raise WarcError(f"no WARC files match {path!r}")
    return matches


def register_warc_source(spark) -> None:
    """Register the ``warc`` format on this session (idempotent)."""
    spark.dataSource.register(WarcDataSource)


try:  # the DataSource API needs pyspark >= 4; the parser above does not
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    class _WarcFilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    def _parse_mode(options) -> bool:
        mode = options.get("mode", "failfast").lower()
        if mode not in ("failfast", "permissive"):
            raise WarcError(f"unknown mode {mode!r} (failfast|permissive)")
        return mode == "permissive"

    class _WarcReader(DataSourceReader):
        def __init__(self, options):
            self._path = options.get("path")
            if not self._path:
                raise WarcError("warc source requires a path")
            self._max_payload = int(
                options.get("max_payload_bytes", str(1 << 20))
            )
            self._permissive = _parse_mode(options)
            # resolved on the DRIVER so planning fails fast on bad globs
            self._files = _expand_paths(self._path)

        def partitions(self):
            return [_WarcFilePartition(p) for p in self._files]

        def read(self, partition):
            yield from _rows_for_file(
                partition.path, self._max_payload, self._permissive
            )

    _DEFAULT_MAX_FILE_AGE_SEC = 7 * 86400  # FileStreamSource's default

    class _WarcStreamReader(DataSourceStreamReader):
        """Continuous archive ingestion: watch the path for new WARC
        files; each micro-batch processes the files that appeared since
        the last committed offset.

        The offset is BOUNDED: ``{"wm": <max mtime ever seen>,
        "recent": {name: mtime for listed files within
        max_file_age_sec of wm}}``. Name-based membership means a late
        file that sorts before an already-consumed one can never remap
        history (files must be immutable once visible: write elsewhere,
        rename in — the standard archive-drop convention); the mtime
        watermark means names purge from the offset once they age past
        the window, so a long-running watch over a 100k-file archive
        writes O(files-per-window) offset bytes per microbatch, not
        O(all files ever) — the same compaction contract as Spark's
        native FileStreamSource ``maxFileAge``. The flip side is the
        native source's too: a file FIRST APPEARING with an mtime older
        than ``committed wm - max_file_age_sec`` is ignored (partitions
        filters on the START offset's horizon, so a watermark that
        regressed across a restart — newest files deleted — can never
        re-admit a purged, already-processed name)."""

        def __init__(self, options):
            self._path = options.get("path")
            if not self._path:
                raise WarcError("warc source requires a path")
            self._max_payload = int(
                options.get("max_payload_bytes", str(1 << 20))
            )
            self._permissive = _parse_mode(options)
            self._max_age = float(
                options.get(
                    "max_file_age_sec", str(_DEFAULT_MAX_FILE_AGE_SEC)
                )
            )
            if self._max_age <= 0:
                raise WarcError("max_file_age_sec must be positive")
            # fetch cap (the reference's W-8 discipline / Spark's
            # maxFilesPerTrigger): a long-running watch paces ingestion
            # at most this many NEW files per latestOffset call —
            # per microbatch under a processing-time trigger. The FIRST
            # snapshot of a fresh process is exempt: the reader cannot
            # yet distinguish backlog from already-committed history
            # (the committed name set only becomes visible in the first
            # partitions() call, which the engine orders AFTER
            # latestOffset), and capping it can permanently stall an
            # availableNow drain on names the checkpoint already holds.
            # 0 = unlimited.
            self._max_files = int(options.get("max_files_per_trigger", "0"))
            if self._max_files < 0:
                raise WarcError("max_files_per_trigger must be >= 0")
            self._wm = 0.0  # monotone high-water mark of seen mtimes
            # names already offered through a latestOffset this process;
            # only used to meter the cap — correctness (exactly-once)
            # derives from the committed offsets alone
            self._offered: set = set()

        def _listing(self) -> dict:
            """name -> mtime for every matching file present right now."""
            try:
                paths = _expand_paths(self._path)
            except WarcError:
                return {}  # an empty watch dir is a quiet stream, not an error
            out = {}
            for p in paths:
                try:
                    out[p] = os.stat(p).st_mtime
                except OSError:
                    pass  # raced deletion between glob and stat
            return out

        def initialOffset(self):
            return {"wm": 0.0, "recent": {}}

        def latestOffset(self):
            listing = self._listing()
            if not listing:
                return {"wm": self._wm, "recent": {}}
            horizon = max(self._wm, max(listing.values())) - self._max_age
            in_window = {
                p: mt for p, mt in listing.items() if mt >= horizon
            }
            if self._max_files and self._offered:
                # drain a backlog oldest-mtime-first, at most
                # max_files_per_trigger NEW names per latestOffset
                # (exempt while self._offered is empty — the fresh-
                # process first snapshot, see __init__). Exactly-once
                # membership never depends on this in-memory meter: a
                # restart just re-offers, and partitions() diffs
                # against the committed set.
                fresh = sorted(
                    (p for p in in_window if p not in self._offered),
                    key=lambda p: (in_window[p], p),
                )
                drop = set(fresh[self._max_files :])
                in_window = {
                    p: mt for p, mt in in_window.items() if p not in drop
                }
            self._offered = {p for p in self._offered if p in listing}
            self._offered.update(in_window)
            if in_window:
                # the watermark advances only to the newest INCLUDED
                # file, so deferring a backlog can never push the age
                # horizon past a file still waiting its turn
                self._wm = max(self._wm, max(in_window.values()))
            return {"wm": self._wm, "recent": in_window}

        @staticmethod
        def _offset_parts(off):
            if "files" in off:  # legacy round-8 checkpoint: full name list
                return None, {p: 0.0 for p in off["files"]}
            return float(off.get("wm", 0.0)), dict(off.get("recent", {}))

        def partitions(self, start, end):
            s_wm, s_recent = self._offset_parts(start)
            _e_wm, e_recent = self._offset_parts(end)
            # learn the committed membership for the fetch-cap meter
            # (a restarted process sees it here first)
            self._offered.update(s_recent)
            if s_wm is not None:
                # recover watermark monotonicity across a restart before
                # the next latestOffset builds on self._wm
                self._wm = max(self._wm, s_wm)
                horizon = s_wm - self._max_age if s_wm > 0.0 else None
            else:
                horizon = None  # legacy offset carries no watermark
            new = sorted(
                p
                for p, mt in e_recent.items()
                if p not in s_recent
                and (horizon is None or mt >= horizon)
            )
            # zero-partition batches are rejected by the engine; emit a
            # sentinel empty partition when nothing arrived
            return [
                _WarcFilePartition(p) for p in new
            ] or [_WarcFilePartition("")]

        def read(self, partition):
            if not partition.path:
                return
            yield from _rows_for_file(
                partition.path, self._max_payload, self._permissive
            )

        def commit(self, end):
            pass

    class WarcDataSource(DataSource):
        """``spark.read.format("warc").load(path)`` (batch) or
        ``spark.readStream.format("warc").load(path)`` (continuous
        directory watch) — path may be a file, a directory (recursive
        *.warc / *.warc.gz), or a glob."""

        @classmethod
        def name(cls) -> str:
            return "warc"

        def schema(self) -> str:
            return WARC_SCHEMA

        def reader(self, schema):
            opts = dict(self.options)
            opts.setdefault("path", opts.get("paths", ""))
            return _WarcReader(opts)

        def streamReader(self, schema):
            opts = dict(self.options)
            opts.setdefault("path", opts.get("paths", ""))
            return _WarcStreamReader(opts)

except ImportError:  # pragma: no cover — pyspark < 4
    WarcDataSource = None  # type: ignore[assignment]
