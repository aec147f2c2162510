"""Streaming metrics export — the working replacement for the reference's
dead Prometheus code (SNK-5: launcher.py:148-159 never imports Gauge and
never assigns self.frequency, so get_metrics cannot run; SURVEY §5.2).

Two pieces compose:

- ``df.observe(name, exprs...)`` attached to a query (e.g. the A-9 launch
  counters in operators/launcher.py) — metrics ride the micro-batch, cost
  nothing extra to compute, and are exact per batch;
- ``MetricsCollector``, a StreamingQueryListener that harvests every
  observation plus the engine's own progress counters (rows/s, batch
  duration, state size) into a bounded in-memory series a scraper can
  export.

At scale this is the right boundary: metrics aggregate on executors as
part of the batch plan; only the tiny observed row crosses to the driver.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["MetricsCollector", "BatchMetrics"]


@dataclass(frozen=True)
class BatchMetrics:
    query_name: str
    batch_id: int
    num_input_rows: int
    process_rate: float
    duration_ms: int
    observed: dict[str, dict[str, Any]] = field(default_factory=dict)


class MetricsCollector(StreamingQueryListener):
    """Harvests per-batch metrics from every streaming query on the
    session. Bounded history (ring buffer) — the snapshot is a gauge
    export, not an event log."""

    def __init__(self, max_batches: int = 1000):
        self._history: deque[BatchMetrics] = deque(maxlen=max_batches)

    # -- listener callbacks -------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self._history.append(
            BatchMetrics(
                query_name=p.name or p.id,
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                process_rate=p.processedRowsPerSecond,
                duration_ms=p.durationMs.get("triggerExecution", 0),
                observed={
                    k: v.asDict()  # Row, not a mapping
                    for k, v in (p.observedMetrics or {}).items()
                },
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- export surface ----------------------------------------------
    @property
    def history(self) -> list[BatchMetrics]:
        return list(self._history)

    def totals(self) -> dict[str, int]:
        """Summed input rows per query name — the gauge a scraper reads."""
        out: dict[str, int] = {}
        for m in self._history:
            out[m.query_name] = out.get(m.query_name, 0) + m.num_input_rows
        return out

    def observed_totals(self, metric_name: str, column: str) -> float:
        """Sum one observed column (e.g. launch_metrics 'n_launches')
        across all batches of all queries."""
        total = 0.0
        for m in self._history:
            if metric_name in m.observed:
                total += float(m.observed[metric_name].get(column) or 0)
        return total
