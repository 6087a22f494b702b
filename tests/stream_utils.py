"""Shared harness for micro-batch replay tests of the stateful streaming
twins: one parquet file per micro-batch, mod-times forced increasing so a
maxFilesPerTrigger=1 file source replays them in order."""

from __future__ import annotations

import contextlib
import glob
import os
import shutil


@contextlib.contextmanager
def session_tz(spark, tz: str):
    """Temporarily run the session under another timezone (restores on
    exit). Both the stream twin AND its batch comparison must run inside
    the block — stream==batch only holds per session tz."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def write_batches(spark, tmp_path, batches, schema):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dest = os.path.join(src, f"batch{i:03d}.parquet")
        shutil.move(part, dest)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
    return src


def replayed_stream(spark, tmp_path, batches, schema):
    src = write_batches(spark, tmp_path, batches, schema)
    ddl = spark.createDataFrame([], schema).schema
    return spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(src)
