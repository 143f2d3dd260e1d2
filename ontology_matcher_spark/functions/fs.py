"""Hadoop-FileSystem-aware small-file IO for driver-side markers.

Artifact reuse checks (`_SUCCESS`, `_FINGERPRINT`) must work on the
storage the artifact actually lives on: `os.path.exists` only sees the
local filesystem, so on HDFS/S3 a purely-local check would either
never trigger reuse or, worse, silently rebuild shared artifacts.
These helpers go through the JVM Hadoop FileSystem resolved from the
path's scheme — identical semantics on file://, hdfs:// and s3a://.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jpath, jvm


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, jpath, _ = _fs_path(spark, path)
    return bool(fs.exists(jpath))


def fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Atomic-enough small-marker write (create-overwrite)."""
    fs, jpath, _ = _fs_path(spark, path)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def fs_read_text(spark: SparkSession, path: str) -> str | None:
    """Contents of a small text file, or None if absent/unreadable."""
    fs, jpath, jvm = _fs_path(spark, path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()
