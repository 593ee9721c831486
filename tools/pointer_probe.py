"""Poll-cost probe for O(1) latestOffset (r13 verdict #3).

Fabricates deep manifest logs (versions only — latest resolution
never opens data files) and times per-poll latest resolution via the
pointer fast path vs the O(versions) glob, at increasing table age.
Spark-free: the resolver is pure pathlib, identical to what every
micro-batch trigger runs driver-side.

Usage: python tools/pointer_probe.py [--polls 200]
Prints one JSON line per depth with per-poll microseconds.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_platform_copilot_spark.sources.versioned import (  # noqa: E402
    _latest_version_glob, latest_version)
from data_platform_copilot_spark.streaming.stream_source import (  # noqa: E402
    _latest_version as stream_latest)


def _fabricate(root: Path, n: int) -> None:
    root.mkdir(parents=True)
    for i in range(n):
        (root / f"manifest-{i}.json").write_text(
            json.dumps({"version": i, "mode": "append", "data_dirs": []}))
    (root / "_latest").write_text(str(n - 1))


def _per_poll_us(fn, arg, polls: int) -> float:
    t0 = time.perf_counter()
    for _ in range(polls):
        assert fn(arg) is not None
    return (time.perf_counter() - t0) / polls * 1e6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--polls", type=int, default=200)
    args = ap.parse_args()

    base = Path(tempfile.mkdtemp(prefix="pointer_probe_"))
    try:
        for depth in (10, 100, 1000, 10000):
            root = base / f"v{depth}"
            _fabricate(root, depth)
            print(json.dumps({
                "versions": depth,
                "pointer_us_per_poll": round(
                    _per_poll_us(latest_version, root, args.polls), 1),
                "stream_pointer_us_per_poll": round(
                    _per_poll_us(stream_latest, str(root), args.polls), 1),
                "glob_us_per_poll": round(
                    _per_poll_us(_latest_version_glob, root, args.polls),
                    1),
            }), flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
