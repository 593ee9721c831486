"""Ship this package to Spark's Python workers.

The Python DataSources (``sources/batch_source.py``,
``streaming/stream_source.py``) are pickled BY REFERENCE: the
create-data-source / plan / streaming-runner workers unpickle the
class by importing ``data_platform_copilot_spark`` — which only works
when the package is on the WORKER's ``sys.path``. In local mode that
holds accidentally (the pyspark daemon starts as ``python -m`` with
the driver's cwd on ``sys.path``); run the driver from another
directory, or on a standalone cluster whose workers never saw the
repo, and every DataSource plan dies with ``ModuleNotFoundError``.

``ensure_package_shipped`` closes that hole the Spark way: zip the
package's ``*.py`` tree once per process and ``addPyFile`` it —
``worker_util.setup_spark_files`` puts SparkFiles-distributed
archives on every Python worker's path, local or cluster. Idempotent
per SparkContext (Spark ignores re-adds of the same path with a
warning, so even re-registration is harmless).

Relation to ``deploy/package_pyfiles.sh`` / ``SPARK_GRAFT_PYFILES``:
that is the OPERATOR-driven artifact for spark-submit deployments
(includes ``*.dat`` package data and ``__spark_entry__.py``); this
module is the AUTOMATIC just-in-time equivalent that DataSource
registration must not depend on an operator having run — both feed
the same addPyFile mechanism and coexist harmlessly.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile
from pathlib import Path

_SHIPPED: set[str] = set()


def ensure_package_shipped(spark) -> None:
    sc = spark.sparkContext
    pkg = Path(__file__).resolve().parent
    key = f"{id(sc)}:{pkg}"
    if key in _SHIPPED:
        return
    stamp = hashlib.sha1(str(pkg).encode()).hexdigest()[:8]
    z = (Path(tempfile.gettempdir())
         / f"dpcs_pkg_{stamp}_{os.getpid()}.zip")
    if not z.exists():
        tmp = z.with_name(z.name + ".tmp")
        with zipfile.ZipFile(tmp, "w") as zf:
            for p in sorted(pkg.rglob("*.py")):
                zf.write(p, f"{pkg.name}/{p.relative_to(pkg)}")
        os.replace(tmp, z)
    # task workers (plan_data_source_read, executors — local OR
    # cluster): SparkFiles includes, picked up by setup_spark_files
    sc.addPyFile(str(z))
    # driver-side PLANNER workers (create_data_source,
    # python_streaming_source_runner): launched with the registered
    # PythonFunction's env map, which is this live dict — they run on
    # the driver node, where the package path exists. Must happen
    # BEFORE spark.dataSource.register snapshots the function.
    parent = str(pkg.parent)
    existing = sc.environment.get("PYTHONPATH", "")
    if parent not in existing.split(os.pathsep):
        sc.environment["PYTHONPATH"] = (
            f"{parent}{os.pathsep}{existing}" if existing else parent)
    _SHIPPED.add(key)
