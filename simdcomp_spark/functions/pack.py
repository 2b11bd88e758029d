"""Sequence packing: fold a token corpus into fixed-length training
examples.

The last stage of a pretraining-data pipeline concatenates documents in
a deterministic order and slices the stream into context-length chunks
("sequence packing").  Semantics here are the simple deterministic
variant every trainer can replay: documents concatenated in ``order_col``
order, stream cut every ``chunk_len`` tokens (chunks may span document
boundaries; the final chunk may be short).  Greedy bin-packing variants
trade determinism for fewer boundary crossings — this one is exactly
reproducible in ANY engine (the DuckDB oracle replays it in pure SQL),
which is what a 100 TB rerun needs.  ``partition_col`` packs each
domain/source as its OWN stream (chunks never mix domains — the usual
shape when domains are trained with different weights), adding
domain-parallelism on top of the shapes below.

Scale shape (up to three shuffles — one skinny range exchange plus at
most two array-moving exchanges — all keyed and skew-free):

1. **Skinny distributed cumsum** — the running token offset needs a
   total order, but only over ``(order, n_tok)`` (≈12 bytes/row): the
   offset stage never touches token arrays.  It is a TWO-LEVEL cumsum,
   fully distributed — ``repartitionByRange`` on the (group, order) key
   (range partitioner assigns ascending key ranges to ascending
   partition ids, so groups stay contiguous), a per-partition running
   sum (window PARTITIONed BY the range partition id + group — every
   frame is one partition's slice of one group, no global sort), and
   per-(partition, group) token totals (one tiny row each)
   prefix-summed into base offsets and broadcast back.  No
   single-partition stage over data anywhere.
2. **Array-moving shuffles, at most two** — each doc joins its start
   offset with a SHUFFLED HASH join building on the skinny side (the
   offsets can never be broadcast at corpus scale, and letting AQE
   guess invites it to broadcast the unestimatable array side — seen
   collecting the corpus to the driver on the 4B-token soak), is
   sliced IN PLACE into per-chunk pieces (``slice`` on the array
   column — no token explode), and then shuffles on the chunk key for
   reassembly.  A corpus already hash-partitioned by the order key
   skips the join-side array move, leaving the single chunk-keyed
   exchange.  Chunk keys are dense integers — uniform by construction,
   no salting needed.

Reference analog: the d1 block layout chops a sorted stream into
128-value blocks with per-block inits (reference/src/simdcomp.c,
simdpackd1 framing); pack_chunks is the same fixed-width reframing at
corpus scope, with documents instead of deltas as the unit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def pack_chunks(df_tokens: DataFrame, chunk_len: int,
                order_col: str | list[str] = "doc_id",
                with_boundaries: bool = False,
                partition_col: str | None = None) -> DataFrame:
    """Pack ``(doc_id, tokens)`` rows into fixed-``chunk_len`` examples.

    Returns ``(chunk_id long, tokens array<int>, n_tok int)`` where
    chunk ``c`` holds tokens ``[c*L, (c+1)*L)`` of the corpus stream in
    ``order_col`` order.  Every chunk except possibly the last has
    exactly ``chunk_len`` tokens; empty documents contribute nothing.
    ``with_boundaries=True`` adds ``doc_starts array<int>`` — the
    in-chunk positions where a DOCUMENT begins (sorted; empty when the
    whole chunk continues a document begun earlier) — what a trainer
    needs to build cross-document attention masks over packed examples.
    ``partition_col`` packs every value of that column as an
    independent stream: the output carries the column plus a per-group
    ``chunk_id`` (each group's final chunk may be short).
    ``order_col`` may be one column name or a list (composite keys —
    e.g. ``["doc_id", "seg_id"]`` for segment-split engine tables,
    ordered lexicographically as a struct) and must be duplicate-free
    (within a group when ``partition_col`` is set — it defines THE
    stream order); ties would make the packing nondeterministic, so a
    duplicated order key raises in-plan.  If the input carries an ``n_tok`` column it is trusted as
    ``size(tokens)`` (engine tables stamp it at encode) so the skinny
    pass never reads the arrays; pass a frame without it if yours is
    not authoritative.
    """
    if chunk_len <= 0:
        raise ValueError(f"chunk_len must be positive, got {chunk_len}")
    L = F.lit(int(chunk_len)).cast("long")
    # prefer a pre-stamped n_tok (engine decode/encode tables carry one):
    # the skinny stage-1 scan then prunes to (order, n_tok) ≈ 12 B/row
    # and never touches the array column at all on that pass
    n_tok = (F.coalesce(F.col("n_tok").cast("long"), F.lit(0))
             if "n_tok" in df_tokens.columns
             else F.coalesce(F.size("tokens").cast("long"), F.lit(0)))
    # NULL group values would vanish at the offs equi-join (null keys
    # never match) — refuse them loudly instead of silently dropping docs
    grp = (F.when(F.col(partition_col).isNull(),
                  F.raise_error(F.lit(
                      f"pack_chunks: {partition_col} contains NULL — "
                      "assign every doc a group before packing")))
           .otherwise(F.col(partition_col))
           if partition_col is not None else F.lit(0))

    # stage 1: skinny two-level cumsum — (group, order, n_tok) only,
    # arrays untouched, no single-partition stage over data (see module
    # docstring).  repartitionByRange keys equal (_grp, _ord) values
    # into one partition, so the lag-based duplicate guard cannot miss
    # a boundary-straddling pair.
    spark = df_tokens.sparkSession
    # explicit partition count so AQE never re-coalesces the range
    # exchange; both consumers below share the SAME exchange within one
    # query (canonical-plan stage reuse), so partition ids agree by
    # construction — a separate driver job over a re-executed exchange
    # would not be guaranteed the same range cuts
    if spark.conf.get("spark.sql.exchange.reuse",
                      "true").lower() != "true":
        raise ValueError(
            "pack_chunks requires spark.sql.exchange.reuse=true: the "
            "offset stage's two consumers must read ONE execution of "
            "the range exchange — re-executions may sample different "
            "range bounds and silently corrupt offsets")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ord_cols = ([order_col] if isinstance(order_col, str)
                else list(order_col))
    if not ord_cols:
        raise ValueError("order_col must name at least one column")
    ord_expr = (F.col(ord_cols[0]) if len(ord_cols) == 1
                else F.struct(*[F.col(c) for c in ord_cols]))
    # a NULL order key would inflate stage-1 offsets then vanish at the
    # stage-2 equi-join (and NULL==NULL defeats the lag guard): refuse.
    # For composite keys, any NULL member makes the struct equality
    # three-valued at the join — guard each member.
    null_any = None
    for c in ord_cols:
        cond = F.col(c).isNull()
        null_any = cond if null_any is None else (null_any | cond)
    ord_guard = F.when(
        null_any,
        F.raise_error(F.lit(
            f"pack_chunks: {ord_cols} contains NULL — every doc needs "
            "an order key"))).otherwise(ord_expr)
    skinny = (df_tokens
              .select(grp.alias("_grp"),
                      ord_guard.alias("_ord"), n_tok.alias("_n"))
              .where(F.col("_n") > 0)
              .repartitionByRange(n_parts, "_grp", "_ord")
              .withColumn("_pid", F.spark_partition_id()))
    w_local = Window.partitionBy("_pid", "_grp").orderBy("_ord")
    dup_guard = F.when(
        F.lag("_ord").over(w_local) == F.col("_ord"),
        F.raise_error(F.lit(
            "pack_chunks: duplicate order key — stream order would be "
            "nondeterministic"))).otherwise(F.lit(0))
    local = skinny.withColumn(
        "_local", F.sum("_n").over(w_local) - F.col("_n")
        + dup_guard)
    # per-(partition, group) totals prefix-summed into base offsets —
    # contiguous ranges mean ≤ n_parts + n_groups such rows; the only
    # single-partition work is the window over THOSE rows, never data
    pbase = (skinny.groupBy("_pid", "_grp").agg(F.sum("_n").alias("_t"))
             .withColumn("_base", F.sum("_t").over(
                 Window.partitionBy("_grp").orderBy("_pid")) - F.col("_t"))
             .select("_pid", "_grp", "_base"))
    offs = (local.join(F.broadcast(pbase), ["_pid", "_grp"])
            .select("_grp", "_ord", "_n",
                    (F.col("_base") + F.col("_local")).alias("_start")))

    # stage 2: join offsets back (skinny side carries 3 longs), slice
    # docs into per-chunk pieces in place, reassemble keyed by chunk.
    # shuffle_hash with the SKINNY side as build: AQE cannot size a
    # mapInArrow/decode input and has been observed electing to
    # broadcast the ARRAY side of this join (collecting the corpus to
    # the driver — maxResultSize abort on the 4B-token soak); a
    # shuffled hash join is the only shape that survives any input size
    docs = (df_tokens.select(grp.alias("_grp"),
                             ord_expr.alias("_ord"), "tokens")
            .join(offs.hint("shuffle_hash"), ["_grp", "_ord"]))
    # integer division, NOT `/` (double): past ~2^53 cumulative tokens a
    # double-rounded quotient silently shifts chunk ids by one — `div`
    # keeps chunk assignment exact at any stream offset
    first_c = F.expr(f"_start div {int(chunk_len)}")
    last_c = F.expr(f"(_start + _n - 1) div {int(chunk_len)}")
    pieces = (docs
              .select("_grp", "tokens", "_start", "_n",
                      F.explode(F.sequence(first_c, last_c))
                      .alias("chunk_id"))
              .select(
                  "_grp", "chunk_id",
                  F.col("_start").alias("_doc_start"),
                  F.slice(
                      "tokens",
                      # F.slice is 1-based; piece covers the overlap of
                      # [start, start+n) with [cL, (c+1)L)
                      (F.greatest(F.col("chunk_id") * L, F.col("_start"))
                       - F.col("_start") + 1).cast("int"),
                      (F.least((F.col("chunk_id") + 1) * L,
                               F.col("_start") + F.col("_n"))
                       - F.greatest(F.col("chunk_id") * L,
                                    F.col("_start"))).cast("int"))
                  .alias("piece")))
    aggs = [F.flatten(F.transform(
        F.array_sort(F.collect_list(
            F.struct(F.col("_doc_start").alias("s"),
                     F.col("piece").alias("p")))),
        lambda x: x.p)).alias("tokens")]
    out_key = ([F.col("_grp").alias(partition_col)]
               if partition_col is not None else [])
    cols = out_key + ["chunk_id", "tokens",
                      F.size("tokens").alias("n_tok")]
    if with_boundaries:
        # a piece that begins its document (doc start >= chunk start)
        # marks a boundary at the doc's in-chunk offset; collect_list
        # drops the NULLs of continuation pieces
        aggs.append(F.sort_array(F.collect_list(
            F.when(F.col("_doc_start") >= F.col("chunk_id") * L,
                   (F.col("_doc_start") - F.col("chunk_id") * L)
                   .cast("int")))).alias("doc_starts"))
        cols.append("doc_starts")
    return pieces.groupBy("_grp", "chunk_id").agg(*aggs).select(*cols)

def pack_greedy(df_tokens: DataFrame, chunk_len: int,
                id_col: str = "doc_id", buckets: int = 1024) -> DataFrame:
    """Boundary-respecting sequence packing: documents are NEVER cut
    mid-document — each chunk holds whole docs, so chunks carry
    ``n_tok ≤ chunk_len`` (padding fills the gap at train time) and no
    attention mask ever straddles a truncated document.  The price vs
    :func:`pack_chunks` is fill waste (reported in BENCH.md) instead of
    boundary cuts.

    Determinism without a global sequential pass: docs are assigned to
    ``buckets`` fixed hash buckets (``pmod(xxhash64(id), B)`` — content
    stable, engine-reproducible), and NEXT-FIT packing runs per bucket
    over docs in ``id_col`` order: keep appending docs to the open chunk
    while they fit, open a new chunk otherwise.  Output chunk identity is
    ``(bucket, chunk_id)`` — reruns, engines, and partitionings all
    produce identical chunks (the DuckDB oracle replays the whole thing:
    hash in generated SQL, next-fit as a recursive CTE).

    Scale shape: next-fit is inherently sequential, but only WITHIN a
    bucket, over a SKINNY (id, n_tok) frame — ~12 B/doc, never the
    arrays.  ``applyInPandas`` runs one python loop per bucket
    (~1M docs/s/core; size ``buckets`` so docs/bucket stays ~10^6), then
    the chunk assignment joins back to the arrays with the same
    shuffle_hash discipline as pack_chunks and ONE chunk-keyed exchange
    reassembles.  Docs longer than ``chunk_len`` cannot be packed uncut —
    they are refused loudly (split them upstream with pack_chunks or the
    engine's split_long_rows; silently truncating a document corrupts
    training data).
    """
    if chunk_len <= 0:
        raise ValueError(f"chunk_len must be positive, got {chunk_len}")
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    n_tok = (F.coalesce(F.col("n_tok").cast("long"), F.lit(0))
             if "n_tok" in df_tokens.columns
             else F.coalesce(F.size("tokens").cast("long"), F.lit(0)))
    oversize_guard = F.when(
        n_tok > chunk_len,
        F.raise_error(F.lit(
            f"pack_greedy: a document exceeds chunk_len={chunk_len} — "
            "boundary-respecting packing cannot cut it; split oversized "
            "docs upstream"))).otherwise(n_tok)
    null_guard = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(
            f"pack_greedy: {id_col} contains NULL — every doc needs an "
            "id"))).otherwise(F.col(id_col))
    skinny = (df_tokens
              .select(null_guard.alias("_id"), oversize_guard.alias("_n"))
              .where(F.col("_n") > 0)
              .withColumn("_bkt", F.pmod(F.xxhash64("_id"),
                                         F.lit(buckets)).cast("int")))

    L = int(chunk_len)

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        from .. import native
        pdf = pdf.sort_values("_id", kind="mergesort")
        ns = pdf["_n"].to_numpy(dtype="int64")
        chunk = native.next_fit(ns, L)   # C loop: ~100M docs/s/core
        if chunk is None:                # no toolchain: identical Python
            chunk = np.empty(ns.size, dtype=np.int64)
            cid, fill = 0, L   # fill=L forces first doc to open chunk 1
            for i, n in enumerate(ns):   # next-fit: sequential by design
                if fill + n <= L:
                    fill += n
                else:
                    cid += 1
                    fill = n
                chunk[i] = cid
        return pd.DataFrame({"_id": pdf["_id"], "_bkt": pdf["_bkt"],
                             "_chunk": chunk})

    id_type = df_tokens.schema[id_col].dataType.simpleString()
    asg = skinny.groupBy("_bkt").applyInPandas(
        assign, schema=f"_id {id_type}, _bkt int, _chunk long")

    # the NULL-id guard must also ride the ARRAY side: the equi-join's
    # inferred isnotnull(_id) can empty this side first, and AQE's
    # empty-relation propagation then skips the skinny branch (and its
    # guard) entirely — a NULL id would silently drop instead of raising
    docs = (df_tokens.select(null_guard.alias("_id"), "tokens")
            .join(asg.hint("shuffle_hash"), "_id"))
    return (docs.groupBy("_bkt", "_chunk")
            .agg(F.flatten(F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("_id").alias("i"),
                             F.col("tokens").alias("t")))),
                lambda x: x.t)).alias("tokens"),
                F.count("*").alias("n_docs"))
            .select(F.col("_bkt").alias("bucket"),
                    F.col("_chunk").alias("chunk_id"), "tokens",
                    F.size("tokens").alias("n_tok"),
                    F.col("n_docs").cast("int").alias("n_docs")))
