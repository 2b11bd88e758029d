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

from pyspark.sql import DataFrame, Window, functions as F


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


def corpus_shuffle(df: DataFrame, seed: int, id_col: str = "doc_id"
                   ) -> DataFrame:
    """Deterministic seeded GLOBAL shuffle of the corpus: attach
    ``shuffle_key = xxhash64(seed, id)`` and return the frame globally
    ordered by it (ties broken by id).

    Training-data order must be (1) uniformly random-looking, (2) exactly
    reproducible across reruns/engines/partitionings, and (3) cheap to
    change per epoch — a different ``seed`` is a completely new order.
    ``orderBy`` here is Spark's distributed range sort (sampled range
    exchange + per-partition sort) — NOT a single-partition window; a
    writer downstream preserves the order file-by-file.  Consumers that
    need dense positions can zipWithIndex the written files; the key
    itself is the portable artifact (the DuckDB oracle replays it
    bit-exactly via generated XXH64 SQL)."""
    key = F.xxhash64(F.lit(int(seed)).cast("long"), F.col(id_col))
    # duplicate ids would leave the relative order of their rows
    # unpinned (identical sort keys) — breaking the reproducibility
    # contract silently; detect with one skinny map-side-combinable
    # count and a broadcast 1-row cross join, raising in-plan
    mx = df.groupBy(id_col).count().agg(F.max("count").alias("_mx"))
    guard = F.when(
        F.col("_mx") > 1,
        F.raise_error(F.lit(
            f"corpus_shuffle: duplicate {id_col} values — identical "
            "sort keys make the order nondeterministic"))
    ).otherwise(F.lit(0))
    return (df.crossJoin(F.broadcast(mx))
            .withColumn("shuffle_key", key + guard)
            .drop("_mx")
            .orderBy("shuffle_key", id_col))


def split_corpus(df: DataFrame, fractions: dict[str, float], seed: int,
                 id_col: str = "doc_id", resolution: int = 10000
                 ) -> DataFrame:
    """Assign every doc to a named split ("train"/"val"/"test"...) by a
    content-stable seeded coin: ``pmod(xxhash64(seed, id), resolution)``
    against cumulative integer thresholds (``round(frac*resolution)``).

    Same properties as :func:`training_mix`: shuffle-free rowwise JVM
    predicate, bit-reproducible anywhere with an XXH64, docs keep their
    split under any repartitioning or incremental corpus extension.
    ``fractions`` must sum to 1 (exactly, after integer rounding — a
    silent gap would leak docs into no split)."""
    if not fractions:
        raise ValueError("fractions must name at least one split")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1 (got {total})")
    # round the CUMULATIVE fraction so independently-rounded splits
    # (e.g. three 1/3s) can't miss the resolution by an off-by-one
    cum, thresholds = 0.0, []
    for name, frac in fractions.items():
        cum += frac
        thresholds.append((name, int(round(cum * resolution))))
    thresholds[-1] = (thresholds[-1][0], resolution)
    coin = F.pmod(F.xxhash64(F.lit(int(seed)).cast("long"),
                             F.col(id_col)), F.lit(int(resolution)))
    # ascending-threshold first-match when-chain
    expr = None
    for name, t in thresholds:
        cond = coin < F.lit(t)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def stratified_sample(df: DataFrame, k: int, seed: int,
                      id_col: str = "doc_id", source_col: str = "source",
                      oversample: int = 8) -> DataFrame:
    """EXACTLY ``min(k, |source|)`` docs per source — the seeded
    fixed-budget subset ("10k eval docs from every source"): per source,
    the ``k`` smallest by the content-stable key
    ``(xxhash64(seed, id), id)``.  Deterministic across reruns, engines
    and partitionings, and a different ``seed`` is a fresh draw.

    Scale shape: a plain per-source window would put EVERY doc of a
    source into one task (source cardinality is tiny at corpus scale —
    the definition of skew).  Instead a shuffle-free hash prefilter
    keeps ≈ ``oversample*k`` docs per source (coin on the same hash, so
    the true top-k always survive it *if* enough rows pass), and the
    window runs on that bounded remainder.  An in-plan guard compares
    each source's survivor count against ``min(k, n_source)`` and
    raises if the prefilter undershot (P(undershoot) ≈ Chernoff tail at
    ``oversample``× the mean — ~e^-3k at 8×; loud, never silently
    wrong; retry with a larger ``oversample``)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = F.xxhash64(F.lit(int(seed)).cast("long"), F.col(id_col))
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n_src"))
    # content-stable coin on the SAME ordering hash: survivors are
    # exactly the docs whose hash falls in the smallest p-fraction, so
    # the per-source top-k by hash survive whenever ≥ min(k, n) do.
    # p >= 1.0 keeps ALL rows explicitly: the double cast of an int64
    # hash can round u up to exactly 1.0, which would otherwise drop a
    # row even from a keep-everything source
    u = (h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)
    p = F.least(F.lit(1.0),
                F.lit(float(oversample * k)) / F.col("_n_src"))
    cand = (df.join(F.broadcast(counts), source_col)
            .where((u < p) | (p >= 1.0))
            # persisted: the guard and the window are two consumers of
            # this prefilter — without the cache each would re-scan the
            # corpus; the pinned data is only the survivors
            # (≈ oversample·k rows per source)
            .persist())
    # undershoot guard over EVERY source (a per-row guard can't fire
    # for a source whose prefilter kept zero rows): survivor counts
    # right-joined to the full source list, raise if any fall short —
    # tiny frames, and the broadcast keeps the window input unshuffled
    svc = cand.groupBy(source_col).agg(F.count("*").alias("_n_cand"))
    checked = (counts.join(svc, source_col, "left")
               .select(source_col, F.when(
                   F.coalesce(F.col("_n_cand"), F.lit(0))
                   < F.least(F.lit(k), F.col("_n_src")),
                   F.raise_error(F.lit(
                       "stratified_sample: hash prefilter undershot "
                       "min(k, n) for a source (astronomically "
                       "unlikely at the default oversample=8) — rerun "
                       "with a larger oversample"))
               ).otherwise(F.lit(0)).alias("_g")))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col))
    out = (cand.join(F.broadcast(checked), source_col)
           .withColumn("_rk", F.row_number().over(w) + F.col("_g"))
           .where(F.col("_rk") <= k)
           .drop("_rk", "_g", "_n_src"))
    # materialize the (bounded: ≤ k rows/source) result eagerly, then
    # release the prefilter cache — returning a lazy frame over `cand`
    # would leak one persisted DataFrame per call for the session
    # lifetime.  localCheckpoint also runs the in-plan undershoot guard
    # HERE, so a failed draw raises at the call site, not at first use.
    try:
        return out.localCheckpoint(eager=True)
    finally:
        cand.unpersist()
