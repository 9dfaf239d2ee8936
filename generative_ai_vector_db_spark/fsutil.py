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
    format (Delta/Iceberg commit) replaces this step.

    NOTE: a crash between the delete and the rename leaves NEITHER
    copy at ``dst``. Callers that must survive that window use
    ``swap_dir`` (two-rename discipline) instead."""
    spath, fs = _hadoop_path_and_fs(spark, src)
    dpath, _ = _hadoop_path_and_fs(spark, dst)
    if fs.exists(dpath):
        fs.delete(dpath, True)
    if not fs.rename(spath, dpath):
        raise IOError(f"rename {src} -> {dst} failed")


OLD_SUFFIX = "._old"


def swap_dir(spark: SparkSession, src: str, dst: str) -> None:
    """Crash-safe directory swap via TWO renames (r14 verdict item 3):
    ``dst`` -> ``dst._old``, then ``src`` -> ``dst``, then drop the
    ``._old`` copy. Unlike ``rename_dir`` (delete-then-rename), no
    instant in this sequence has BOTH copies gone: a crash between the
    renames leaves the prior copy at ``dst._old`` and the complete new
    copy at ``src``, so a read-side recovery pass can restore either
    (``operators.indexes._recover_components``). HDFS renames are
    atomic; on object stores a table-format commit replaces this."""
    spath, fs = _hadoop_path_and_fs(spark, src)
    dpath, _ = _hadoop_path_and_fs(spark, dst)
    opath, _ = _hadoop_path_and_fs(spark, dst + OLD_SUFFIX)
    if fs.exists(opath):
        fs.delete(opath, True)
    if fs.exists(dpath):
        if not fs.rename(dpath, opath):
            raise IOError(f"rename {dst} -> {dst + OLD_SUFFIX} failed")
    if not fs.rename(spath, dpath):
        raise IOError(
            f"rename {src} -> {dst} failed; prior copy preserved at"
            f" {dst + OLD_SUFFIX}"
        )
    if fs.exists(opath):
        fs.delete(opath, True)
