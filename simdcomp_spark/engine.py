"""Spark DataFrame encode/decode pipelines.

Spark-first design (SURVEY.md §1.4, §4):
* the ONLY Python in the hot path is Arrow-batched ``mapInPandas`` calling the
  vectorized numpy codec core — no per-row Python, no RDDs;
* salt-based repartitioning on ``pmod(xxhash64(doc_id, seg_id), shards)``
  spreads encode work evenly (north rule: explicit partitioning/skew
  handling);
* length-aware skew splitting: rows with huge ``n_tok`` are cut into
  independent segments with pure JVM expressions (``sequence``/``slice``)
  BEFORE the shuffle, so a single 10M-token document cannot straggle a task.
  Blocks are independent given per-block inits (SURVEY.md §3.2), so segment
  encodes are bit-compatible with whole-row encodes;
* decode reassembly is a declarative ``groupBy(doc_id) → array_sort →
  flatten`` that Catalyst plans as one shuffle; it is skipped when the
  caller knows no row exceeded the split threshold;
* metrics are plain DataFrame aggregations over the encoded output plus
  per-task encode timings carried as constant batch columns — queryable,
  not log-scraped.

Schema of the encoded table:
    doc_id, source, seg_id, n_tok, codec, widths, inits, payload, pid, enc_ns
"""

from __future__ import annotations

import os
import time

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import codecs
from .codecs.auto import choose_codec

ENCODED_SCHEMA = ("doc_id string, source string, seg_id int, n_tok int, "
                  "codec string, widths binary, inits binary, payload binary, "
                  "pid int, enc_ns long")
DECODED_SCHEMA = "doc_id string, source string, seg_id int, tokens array<int>"

DEFAULT_SPLIT_THRESHOLD = 1 << 16  # tokens per segment


def get_spark(app: str = "simdcomp_spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    return (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


# ---------------------------------------------------------------------------
# length-aware skew splitting (JVM-side, no Python)
# ---------------------------------------------------------------------------

def split_long_rows(df: DataFrame, threshold: int = DEFAULT_SPLIT_THRESHOLD
                    ) -> DataFrame:
    """Cut rows with n_tok > threshold into (doc_id, seg_id) segments of at
    most ``threshold`` tokens.  Pure Catalyst expressions — stays in
    whole-stage codegen, no UDF."""
    nseg = F.greatest(F.ceil(F.col("n_tok") / threshold).cast("int"), F.lit(1))
    return (
        df.withColumn("seg_id", F.explode(F.sequence(F.lit(0), nseg - 1)))
        .withColumn("tokens", F.slice("tokens",
                                      F.col("seg_id") * threshold + 1, threshold))
        .withColumn("n_tok", F.size("tokens"))
    )


def _as_u32_rows(series) -> list[np.ndarray]:
    out = []
    for v in series:
        a = np.asarray(v, dtype=np.int32)
        out.append(a.view(np.uint32))
    return out


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode(df: DataFrame, codec: str = "auto", shards: int | None = None,
           split_threshold: int | None = DEFAULT_SPLIT_THRESHOLD,
           salt: bool = True) -> DataFrame:
    """tokens table → encoded table.

    codec: a registry name, or 'auto' → per-partition cost-model selection
    (north rule).  shards: explicit salt-based repartition count (defaults to
    spark.sql.shuffle.partitions).  salt=False skips the shuffle entirely
    (narrow, scan-aligned encode — the fastest path when input partitioning
    is already fine-grained)."""
    spark = df.sparkSession
    if split_threshold is not None:
        df = split_long_rows(df, split_threshold)
    elif "seg_id" not in df.columns:
        df = df.withColumn("seg_id", F.lit(0))
    if salt:
        shards = shards or int(spark.conf.get("spark.sql.shuffle.partitions"))
        df = df.withColumn(
            "_shard", F.pmod(F.xxhash64("doc_id", "seg_id"), F.lit(shards)))
        df = df.repartition(shards, "_shard").drop("_shard")

    def encode_fn(it):
        import pandas as pd
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        chosen = None if codec == "auto" else codec
        total_ns = 0  # cumulative per task; metrics take max() per pid
        for pdf in it:
            t0 = time.perf_counter_ns()
            arrs = _as_u32_rows(pdf["tokens"])
            if chosen is None:
                chosen, _costs = choose_codec(arrs)
            c = codecs.get(chosen)
            widths, inits, payloads = c.encode_rows(arrs)
            total_ns += time.perf_counter_ns() - t0
            enc_ns = total_ns
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "seg_id": pdf["seg_id"].astype("int32"),
                "n_tok": pdf["n_tok"].astype("int32"),
                "codec": chosen,
                "widths": widths,
                "inits": inits,
                "payload": payloads,
                "pid": np.int32(pid),
                "enc_ns": np.int64(enc_ns),
            })

    return df.mapInPandas(encode_fn, schema=ENCODED_SCHEMA)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode(df_encoded: DataFrame, reassemble: bool = True) -> DataFrame:
    """encoded table → tokens table (doc_id, source, tokens, n_tok).

    reassemble=False keeps (doc_id, seg_id, tokens) segments and skips the
    groupBy shuffle — use when no row exceeded the split threshold."""

    def decode_fn(it):
        import pandas as pd
        for pdf in it:
            n_toks = pdf["n_tok"].to_numpy()
            out_tokens: list = [None] * len(pdf)
            for name in pdf["codec"].unique():
                sel = np.nonzero((pdf["codec"] == name).to_numpy())[0]
                c = codecs.get(name)
                arrs = c.decode_rows(
                    n_toks[sel],
                    [pdf["widths"].iat[i] for i in sel],
                    [pdf["inits"].iat[i] for i in sel],
                    [pdf["payload"].iat[i] for i in sel])
                for i, a in zip(sel, arrs):
                    out_tokens[i] = a.view(np.int32)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "seg_id": pdf["seg_id"],
                "tokens": out_tokens,
            })

    dec = df_encoded.mapInPandas(decode_fn, schema=DECODED_SCHEMA)
    if not reassemble:
        return dec.withColumn("n_tok", F.size("tokens"))
    return (
        dec.groupBy("doc_id")
        .agg(F.first("source").alias("source"),
             F.flatten(F.transform(
                 F.array_sort(F.collect_list(F.struct("seg_id", "tokens"))),
                 lambda s: s.tokens)).alias("tokens"))
        .withColumn("n_tok", F.size("tokens"))
    )


# ---------------------------------------------------------------------------
# verification + metrics (declarative)
# ---------------------------------------------------------------------------

def verify_roundtrip(original: DataFrame, decoded: DataFrame) -> int:
    """Number of rows whose decoded tokens differ (0 = bit-identical)."""
    o = original.select("doc_id", F.col("tokens").alias("t0"))
    d = decoded.select("doc_id", F.col("tokens").alias("t1"))
    return (o.join(d, "doc_id", "full_outer")
            .where(~F.coalesce(F.col("t0") == F.col("t1"), F.lit(False)))
            .count())


def partition_metrics(df_encoded: DataFrame) -> DataFrame:
    """Per-partition codec-choice / bits-per-token / throughput metrics
    (north rule) as a queryable DataFrame."""
    return (
        df_encoded.groupBy("pid", "codec")
        .agg(F.count("*").alias("rows"),
             F.sum("n_tok").alias("tokens"),
             F.sum(F.length("payload")).alias("payload_bytes"),
             (F.sum(F.length("widths")) + F.sum(F.length("inits"))
              ).alias("meta_bytes"),
             F.max("enc_ns").alias("enc_ns"))
        .withColumn("bits_per_token",
                    (F.col("payload_bytes") + F.col("meta_bytes")) * 8.0
                    / F.col("tokens"))
        .withColumn("tokens_per_sec",
                    F.col("tokens") / (F.col("enc_ns") / 1e9))
    )
