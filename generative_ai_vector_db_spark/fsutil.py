"""Filesystem helpers that go through the Hadoop FileSystem API, so
they work on any Spark-reachable scheme (file:/, hdfs:/, s3a:/ ...) —
not just the driver's local POSIX view. This matters on a real cluster:
``os.walk`` over an S3 bucket path simply throws.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _hadoop_path_and_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return hpath, fs


def path_exists(spark: SparkSession, path: str) -> bool:
    hpath, fs = _hadoop_path_and_fs(spark, path)
    return bool(fs.exists(hpath))


def dir_bytes(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Total bytes of files under ``path`` whose name ends with
    ``suffix`` (recursive)."""
    hpath, fs = _hadoop_path_and_fs(spark, path)
    it = fs.listFiles(hpath, True)
    total = 0
    while it.hasNext():
        status = it.next()
        if status.getPath().getName().endswith(suffix):
            total += status.getLen()
    return total


def count_files(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    hpath, fs = _hadoop_path_and_fs(spark, path)
    it = fs.listFiles(hpath, True)
    n = 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            n += 1
    return n


def rename_dir(spark: SparkSession, src: str, dst: str) -> None:
    """Atomic-as-the-FS-allows directory swap: drop ``dst`` and rename
    ``src`` onto it. HDFS rename is atomic; on object stores a table
    format (Delta/Iceberg commit) replaces this step."""
    spath, fs = _hadoop_path_and_fs(spark, src)
    dpath, _ = _hadoop_path_and_fs(spark, dst)
    if fs.exists(dpath):
        fs.delete(dpath, True)
    if not fs.rename(spath, dpath):
        raise IOError(f"rename {src} -> {dst} failed")
