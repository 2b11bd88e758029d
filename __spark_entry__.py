"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: full encode→decode round-trip of token arrays
                 built from sf0.001 lineitem, returning per-codec metrics.
queries()      — one callable per implemented operator (SURVEY.md §2 +
                 north-rule codecs + training-pipeline ops).
oracle_sql()   — matching DuckDB SQL for every SQL-expressible query.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from simdcomp_spark import engine  # noqa: E402
from simdcomp_spark.queries import ORACLES, QUERIES, tokens_table  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: encode the lineitem token table with the
    auto-selected codec, decode, verify bit-identity inline, and return the
    per-partition codec/bits-per-token/throughput metrics DataFrame."""
    sf_dir = "/root/testdata/sf0.001"
    tok = tokens_table(spark, sf_dir, "lineitem", "l_orderkey",
                       "l_linenumber", "l_partkey", "lineitem").cache()
    enc = engine.encode(tok, codec="auto").cache()
    mismatches = engine.verify_roundtrip(tok, engine.decode(enc))
    metrics = engine.partition_metrics(enc)
    return metrics.withColumn("roundtrip_mismatches", F.lit(mismatches))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
