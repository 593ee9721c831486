"""A32 — in-process metrics registry (reference src/metrics.py:5-71).

Labeled counters + millisecond histograms exported Prometheus-style
with ``_sum`` / ``_count`` / ``_p95`` lines; p95 uses the reference's
index formula ``sorted[int(0.95*n) - 1]``. Driver-side state only —
not a Spark concern (SURVEY.md §1.1).
"""

from __future__ import annotations

import threading
from collections import defaultdict


# Per-histogram sample-window bound: _sum/_count stay exact running
# totals forever; the p95 is computed over the most recent WINDOW
# samples so a long-running server's memory and export cost stay
# O(series x WINDOW) instead of growing with total request count
# (the r9 middleware observes every HTTP request).
_HIST_WINDOW = 4096


class LocalRegistry:
    def __init__(self) -> None:
        from collections import deque

        self._lock = threading.Lock()
        self._counters: dict[str, float] = defaultdict(float)
        self._hist_sum: dict[str, float] = defaultdict(float)
        self._hist_n: dict[str, int] = defaultdict(int)
        self._hists: dict[str, object] = defaultdict(
            lambda: deque(maxlen=_HIST_WINDOW))
        self._external_exporter = None

    def set_external_exporter(self, fn) -> None:
        """Register a zero-arg callable returning a Prometheus text
        payload (e.g. ``generate_latest(...)`` from an ASGI
        instrumentator); ``export`` prepends it to the local series
        (reference src/metrics.py:54-68). A failing or empty exporter
        degrades to local-only output, never an export error."""
        self._external_exporter = fn

    @staticmethod
    def _key(name: str, labels: dict[str, str] | None) -> str:
        if not labels:
            return name
        inner = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
        return f"{name}{{{inner}}}"

    def inc(self, name: str, value: float = 1.0,
            labels: dict[str, str] | None = None) -> None:
        with self._lock:
            self._counters[self._key(name, labels)] += value

    def observe_ms(self, name: str, ms: float,
                   labels: dict[str, str] | None = None) -> None:
        with self._lock:
            k = self._key(name, labels)
            self._hist_sum[k] += ms
            self._hist_n[k] += 1
            self._hists[k].append(ms)

    def export(self) -> str:
        external = ""
        if self._external_exporter is not None:
            try:
                external = self._external_exporter() or ""
            except Exception:
                external = ""
        lines = []
        with self._lock:
            for k, v in sorted(self._counters.items()):
                lines.append(f"{k} {v}")
            for k, samples in sorted(self._hists.items()):
                n = self._hist_n[k]
                lines.append(f"{k}_sum {self._hist_sum[k]}")
                lines.append(f"{k}_count {n}")
                if samples:
                    window = sorted(samples)
                    p95 = window[max(int(0.95 * len(window)) - 1, 0)]
                    lines.append(f"{k}_p95 {p95}")
        local = "\n".join(lines) + "\n"
        if not external.strip():
            return local
        # Prometheus text format tolerates two families in one payload
        # as long as names don't collide; the external block leads, as
        # in the reference merge.
        return external.rstrip() + "\n" + local

    def reset(self) -> None:
        with self._lock:
            self._counters.clear()
            self._hist_sum.clear()
            self._hist_n.clear()
            self._hists.clear()


REGISTRY = LocalRegistry()
