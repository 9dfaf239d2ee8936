"""Worker-side import bootstrap.

UDF closures defined in this package are pickled BY REFERENCE
(module.attr); Spark's Python workers then ``import
generative_ai_vector_db_spark`` — which fails when the driver process
was launched outside the repo (the repo dir is on the driver's
sys.path via __spark_entry__, but never on the workers').

``ensure_worker_imports(spark)`` zips the package once per process and
``addPyFile``s it, which puts it on every worker's sys.path — the same
mechanism used to ship job code to a real cluster, so this is also the
100 TB deployment story (one zip broadcast, no per-node installs).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SENTINEL = "_gavd_spark_pkg_shipped"


def ensure_worker_imports(spark) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SENTINEL, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.mkdtemp(prefix="gavd_pkg_"), f"{pkg_name}.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _SENTINEL, True)
