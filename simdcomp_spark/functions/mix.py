"""Training-mix construction: deterministic per-source rate sampling.

The mix-weighting stage of corpus building ("web at 35%, books at 80%,
code at 100%") needs a sampler that is (1) reproducible across runs,
engines, and partitionings — an RNG keyed by partition/seed is none of
those — and (2) shuffle-free.  The coin here is content-stable:
``pmod(xxhash64(id), 100) < rate[source]`` — a pure JVM rowwise
predicate (whole-stage codegen, no exchange), bit-reproducible in any
engine with an XXH64 (the DuckDB oracle replays it via generated SQL,
``oracles_xxh``).  Documents keep or drop identically however the data
is partitioned, so reruns and incremental extensions of the corpus
agree on every doc."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def training_mix(df: DataFrame, rates: dict[str, int],
                 id_col: str = "doc_id", source_col: str = "source"
                 ) -> DataFrame:
    """Keep each source at ``rates[source]`` percent using the
    content-stable coin; sources absent from ``rates`` are dropped
    entirely (explicit mixes only — a typo'd source name must not
    silently pass at 100%)."""
    coin = F.pmod(F.xxhash64(F.col(id_col)), F.lit(100))
    rate = reduce(
        lambda acc, kv: F.when(F.col(source_col) == kv[0],
                               F.lit(kv[1])).otherwise(acc),
        rates.items(), F.lit(-1))
    return df.where(coin < rate)
