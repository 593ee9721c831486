#!/usr/bin/env python3
"""Refresh the packaged Public Suffix List snapshot.

Downloads the official list (publicsuffix.org, MPL 2.0 — the list
itself is public data) and writes it over the packaged snapshot at
``data_platform_copilot_spark/functions/data/public_suffix_snapshot.dat``
(or a path you pass). The matcher (``functions/web.py:load_psl``)
reads the official format unchanged, so a full download simply widens
coverage from the curated snapshot subset to every registry.

Usage:
    python tools/fetch_psl.py [output_path]

Offline environments can instead point $SPARK_GRAFT_PSL_FILE at any
previously downloaded ``public_suffix_list.dat``.
"""

from __future__ import annotations

import sys
import urllib.request
from pathlib import Path

PSL_URL = "https://publicsuffix.org/list/public_suffix_list.dat"
DEFAULT_OUT = (Path(__file__).resolve().parent.parent
               / "data_platform_copilot_spark" / "functions" / "data"
               / "public_suffix_snapshot.dat")


def main() -> int:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_OUT
    print(f"fetching {PSL_URL} ...")
    with urllib.request.urlopen(PSL_URL, timeout=60) as resp:
        body = resp.read().decode("utf-8")
    if "===BEGIN ICANN DOMAINS===" not in body:
        print("unexpected payload (no ICANN section marker); not writing",
              file=sys.stderr)
        return 1
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(body, encoding="utf-8")
    rules = [ln for ln in body.splitlines()
             if ln.strip() and not ln.strip().startswith("//")]
    print(f"wrote {out} ({len(rules)} rules)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
