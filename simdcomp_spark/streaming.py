"""Structured Streaming encode: continuously compress appended token
sequences.

The reference is batch-only; this is the engine-level extension SURVEY.md
§1.4 scopes as "optional foreachBatch encode of appends".  The stream plan
is the SAME encode pipeline (split → encode UDF) applied per micro-batch via
``foreachBatch``, writing encoded parquet + manifest per batch — so the
batch and streaming paths cannot drift.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession

from . import engine
from .fixtures import TOKENS_SCHEMA


def start_encode_stream(spark: SparkSession, in_dir: str, out_dir: str,
                        codec: str = "auto",
                        checkpoint: str | None = None,
                        trigger_once: bool = True):
    """Watch ``in_dir`` for appended tokens parquet; encode each micro-batch
    into ``out_dir``.  Returns the StreamingQuery."""
    checkpoint = checkpoint or str(Path(out_dir) / "_checkpoint")
    stream = (spark.readStream.schema(TOKENS_SCHEMA)
              .parquet(in_dir))

    def process(batch_df, batch_id: int):
        enc = engine.encode(batch_df, codec=codec, salt=False)
        (enc.write.mode("append").parquet(str(Path(out_dir) / "data")))

    writer = (stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
