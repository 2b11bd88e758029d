"""Structured Streaming operators.

The reference is batch-only; SURVEY.md §1.4 scopes streaming as an
engine-level extension.  Three shapes:

* :func:`start_encode_stream` — continuously compress appended token
  sequences: the SAME encode pipeline (split → encode UDF) applied per
  micro-batch via ``foreachBatch``, so batch and streaming paths cannot
  drift;
* :func:`start_dedup_stream` — CUSTOM STATEFUL operator
  (``applyInPandasWithState``): streaming exact dedup that emits only the
  first occurrence of each distinct text across the whole stream; state is
  a per-bucket set of content hashes, keyed by ``xxhash64(text) % buckets``
  so state shards evenly across executors at 100 TB;
* :func:`windowed_token_rate` — watermarked event-time windowed
  aggregation (late data beyond the watermark is dropped, state is evicted
  — the standard unbounded-stream memory bound).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

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


def start_dedup_stream(spark: SparkSession, in_dir: str, out_dir: str,
                       checkpoint: str | None = None, buckets: int = 64,
                       max_files_per_trigger: int = 1,
                       schema: str = "doc_id string, text string"):
    """Streaming exact dedup: emit each distinct text's FIRST occurrence,
    across micro-batches, via ``applyInPandasWithState``.

    State = the set of seen content hashes per bucket; the grouping key is
    ``pmod(xxhash64(text), buckets)`` so state is sharded evenly across
    executors instead of keyed per-document (which would make every row its
    own state entry).  At 100 TB the state size is one 32-byte hash per
    DISTINCT document — the minimum any exact streaming dedup can hold."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    checkpoint = checkpoint or str(Path(out_dir) / "_checkpoint")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(in_dir))
    hashed = stream.select(
        "doc_id", "text",
        F.md5(F.col("text").cast("binary")).alias("h"),
        F.pmod(F.xxhash64("text"), F.lit(buckets)).alias("bucket"))

    def fn(key, pdfs, state):
        import pandas as pd
        seen = set(state.get[0]) if state.exists else set()
        keep_doc, keep_text = [], []
        for pdf in pdfs:
            for doc, text, h in zip(pdf["doc_id"], pdf["text"], pdf["h"]):
                if h not in seen:
                    seen.add(h)
                    keep_doc.append(doc)
                    keep_text.append(text)
        state.update((list(seen),))
        yield pd.DataFrame({"doc_id": keep_doc, "text": keep_text})

    out = (hashed.groupBy("bucket").applyInPandasWithState(
        fn, outputStructType="doc_id string, text string",
        stateStructType="seen array<string>", outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout))
    return (out.writeStream.format("parquet")
            .option("path", str(Path(out_dir) / "data"))
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


def windowed_token_rate(stream_df: DataFrame, ts_col: str = "ts",
                        window: str = "1 minute",
                        watermark: str = "2 minutes") -> DataFrame:
    """Watermarked event-time windowed aggregation over a token stream:
    tokens/docs per window per source.  The watermark bounds state (windows
    older than it are finalized and evicted) and drops later-than-watermark
    data — the standard correctness/memory trade for unbounded streams."""
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("win"), "source")
            .agg(F.sum("n_tok").alias("tokens"),
                 F.count("*").alias("docs"))
            .select(F.col("win.start").alias("win_start"), "source",
                    "tokens", "docs"))
