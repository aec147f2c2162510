"""Storage-agnostic filesystem helpers.

Operators that keep durable state next to the data (dedup indexes, rollup
tables, replay markers) must probe and touch that state through the SAME
filesystem abstraction the writes use. Driver-local ``os.path`` calls see
only the driver's disk: with an ``hdfs://`` or ``s3a://`` state path — the
stated 100 TB deployment posture — they return False every batch, silently
disabling cross-batch behavior (ADVICE r2, medium). Everything here goes
through Hadoop's FileSystem (resolved per-path from the active Hadoop
configuration), so any URI scheme the cluster can write it can also probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "hadoop_exists",
    "hadoop_touch",
    "hadoop_delete",
    "hadoop_list",
    "parquet_if_exists",
]


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def hadoop_exists(spark: SparkSession, path: str) -> bool:
    """True when ``path`` exists on ITS OWN filesystem (local, HDFS, S3,
    ... — resolved from the path's scheme), not merely the driver's."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def hadoop_touch(spark: SparkSession, path: str) -> bool:
    """Create an empty marker file (parents included) on the path's own
    filesystem. Returns False when the file already existed.

    ``createNewFile`` is atomic on HDFS and the local filesystem — two
    racing writers see exactly one True — which is what replay markers
    need; on S3 the create is last-writer-wins, the usual object-store
    caveat (markers stay correct there because replays write identical
    content)."""
    fs, hpath = _fs_and_path(spark, path)
    parent = hpath.getParent()
    if parent is not None:
        fs.mkdirs(parent)
    return bool(fs.createNewFile(hpath))


def hadoop_delete(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path`` on its own filesystem. Returns False
    when it didn't exist (idempotent cleanup — crash-recovery paths call
    this without probing first)."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.delete(hpath, True))


def hadoop_list(spark: SparkSession, path: str) -> list[str]:
    """Child names (not full paths) under a directory on its own
    filesystem; [] when the directory doesn't exist."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def parquet_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet dataset, or None when it doesn't exist yet.

    Probes by ATTEMPTING the read and treating Spark's path-not-found /
    unreadable-empty-path AnalysisException as "absent": one code path for
    every URI scheme, and no time-of-check/time-of-use gap against
    concurrent writers. Genuine I/O errors (permissions, corrupt footers)
    surface as their own exception types and still propagate."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None
