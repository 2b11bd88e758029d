"""Per-shard lineage manifests → checkpoint-resume of partially encoded
tables (north rule: "resumable from checkpoint with per-partition lineage +
metrics").

Layout of an encoded table directory:

    out_dir/
      data/shard=NNN/*.parquet     (one Spark write per shard batch, append)
      _manifest/shard=NNN.json     (atomic: tmp + rename)

A shard's manifest records the input fingerprint (row/token counts — cheap,
computed in the same job via the metrics aggregation) and its codec/metrics.
``encode_resumable`` anti-joins the shard universe against completed
manifests and encodes ONLY missing shards; re-running after a crash is
idempotent.  At 100 TB scale this is the difference between re-running a
12-hour job and re-running the 3 shards that failed.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import engine


def _manifest_dir(out_dir: str) -> Path:
    return Path(out_dir) / "_manifest"


def completed_shards(out_dir: str) -> dict[int, dict]:
    mdir = _manifest_dir(out_dir)
    done = {}
    if mdir.is_dir():
        for p in sorted(mdir.glob("shard=*.json")):
            try:
                rec = json.loads(p.read_text())
                if rec.get("status") == "done":
                    done[int(rec["shard"])] = rec
            except (ValueError, KeyError):
                continue  # torn write → treat as incomplete, re-encode
    return done


def _write_manifest_atomic(out_dir: str, rec: dict) -> None:
    mdir = _manifest_dir(out_dir)
    mdir.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=mdir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, mdir / f"shard={rec['shard']}.json")


def encode_resumable(df: DataFrame, out_dir: str, codec: str = "auto",
                     shards: int = 32,
                     split_threshold: int = engine.DEFAULT_SPLIT_THRESHOLD
                     ) -> dict:
    """Encode ``df`` into out_dir/data partitioned by shard, skipping shards
    whose manifest is already complete.  Returns a summary dict."""
    done = completed_shards(out_dir)
    todo = [s for s in range(shards) if s not in done]
    summary = {"shards": shards, "skipped": len(done), "encoded": 0,
               "rows": 0, "tokens": 0, "payload_bytes": 0}
    if not todo:
        return summary

    df = engine.split_long_rows(df, split_threshold)
    df = df.withColumn(
        "shard", F.pmod(F.xxhash64("doc_id", "seg_id"), F.lit(shards)))
    if len(todo) < shards:
        df = df.where(F.col("shard").isin(todo))
    df = df.repartition(len(todo), "shard")
    enc = engine.encode(df.drop("shard"), codec=codec,
                        split_threshold=None, salt=False)  # pre-split/sharded
    enc = enc.withColumn(
        "shard", F.pmod(F.xxhash64("doc_id", "seg_id"), F.lit(shards)))
    data_dir = Path(out_dir) / "data"
    staging_dir = Path(out_dir) / "_staging"

    # Crash-safe write protocol: stage the whole run's output, then promote
    # each shard with one atomic directory rename BEFORE its manifest is
    # committed.  A crash leaves either (a) garbage under _staging (removed
    # on the next run), or (b) a complete-but-unmanifested data/shard=K —
    # which the next run deletes and re-encodes.  The old mode("append")
    # write could leave PARTIAL shard files that a re-run appended to,
    # silently duplicating rows.
    if staging_dir.exists():
        shutil.rmtree(staging_dir)
    (enc.write.mode("overwrite").partitionBy("shard")
        .parquet(str(staging_dir)))
    data_dir.mkdir(parents=True, exist_ok=True)
    for s in todo:
        dst = data_dir / f"shard={s}"
        if dst.exists():  # unmanifested leftovers from a crashed run
            shutil.rmtree(dst)
        src = staging_dir / f"shard={s}"
        if src.exists():
            os.replace(src, dst)
    shutil.rmtree(staging_dir, ignore_errors=True)

    # fingerprint + metrics per shard from the written data (one scan)
    spark = df.sparkSession
    written = spark.read.parquet(str(data_dir))
    stats = (written.where(F.col("shard").isin(todo))
             .groupBy("shard", "codec")
             .agg(F.count("*").alias("rows"),
                  F.sum("n_tok").alias("tokens"),
                  F.sum(F.length("payload")).alias("payload_bytes"),
                  (F.sum(F.length("widths")) + F.sum(F.length("inits"))
                   ).alias("meta_bytes"))
             ).collect()
    by_shard: dict[int, dict] = {}
    for r in stats:
        rec = by_shard.setdefault(int(r["shard"]), {
            "shard": int(r["shard"]), "status": "done", "codecs": {},
            "rows": 0, "tokens": 0, "payload_bytes": 0, "meta_bytes": 0})
        rec["codecs"][r["codec"]] = int(r["rows"])
        rec["rows"] += int(r["rows"])
        rec["tokens"] += int(r["tokens"] or 0)
        rec["payload_bytes"] += int(r["payload_bytes"] or 0)
        rec["meta_bytes"] += int(r["meta_bytes"] or 0)
    for s in todo:
        rec = by_shard.get(s, {"shard": s, "status": "done", "codecs": {},
                               "rows": 0, "tokens": 0, "payload_bytes": 0,
                               "meta_bytes": 0})
        rec["fingerprint"] = f"{rec['rows']}:{rec['tokens']}"
        _write_manifest_atomic(out_dir, rec)
        summary["encoded"] += 1
        summary["rows"] += rec["rows"]
        summary["tokens"] += rec["tokens"]
        summary["payload_bytes"] += rec["payload_bytes"]
    return summary


def read_encoded(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(str(Path(out_dir) / "data"))


# ---------------------------------------------------------------------------
# Iceberg-native resumable encode: resume state and table state are ONE
# mechanism (the snapshot log), not two parallel metadata stacks
# ---------------------------------------------------------------------------

def completed_shards_iceberg(table_dir: str) -> set[int]:
    """Shards already committed to the Iceberg table, read from the
    snapshot summaries (``simdcomp-shards`` key).  A crashed run commits
    no snapshot, so its shards are absent here and its orphan data files
    are invisible to metadata-planned readers — exactly the resume
    contract the JSON manifests provided, with zero extra state."""
    from . import iceberg
    try:
        meta = iceberg._load_metadata(table_dir)
    except FileNotFoundError:
        return set()
    done: set[int] = set()
    for s in meta["snapshots"]:
        ids = s.get("summary", {}).get("simdcomp-shards", "")
        done |= {int(x) for x in ids.split(",") if x}
    # lineage of EXPIRED snapshots survives in table properties
    # (iceberg.expire_snapshots folds it there before dropping them)
    expired = meta.get("properties", {}).get("simdcomp-shards-expired")
    if expired:
        done |= {int(x) for x in json.loads(expired)}
    return done


def _recorded_total_shards(meta: dict) -> set[int]:
    """Every ``simdcomp-total-shards`` value recorded across snapshots
    (plus the table property expire_snapshots folds it into)."""
    out = {int(s["summary"]["simdcomp-total-shards"])
           for s in meta["snapshots"]
           if "simdcomp-total-shards" in s.get("summary", {})}
    prop = meta.get("properties", {}).get("simdcomp-total-shards")
    if prop:
        out.add(int(prop))
    return out


def _require_resumable_lineage(meta: dict | None, table_dir: str,
                               kind: str) -> None:
    """Refuse to resume into a NON-EMPTY table that carries no resumable
    lineage: with an empty done-set, every row would be re-encoded and
    APPENDED — a silent full duplication of a table that was published by
    a non-resumable path (export_encoded / overwrite)."""
    if meta is None or not meta["snapshots"]:
        return
    keys = ("simdcomp-shards", "simdcomp-input-files")
    in_summaries = any(k in s.get("summary", {})
                       for s in meta["snapshots"] for k in keys)
    in_props = any(f"{k}-expired" in meta.get("properties", {})
                   for k in keys)
    if not (in_summaries or in_props):
        raise ValueError(
            f"{table_dir} is a non-empty Iceberg table with no resumable "
            f"lineage in any snapshot summary — it was not written by "
            f"{kind}; appending would silently duplicate every row. "
            "Use iceberg.append/overwrite explicitly, or target a fresh "
            "table dir")


def encode_resumable_iceberg(df: DataFrame, table_dir: str,
                             codec: str = "auto", shards: int = 32,
                             split_threshold: int =
                             engine.DEFAULT_SPLIT_THRESHOLD,
                             batch_shards: int | None = None) -> dict:
    """Encode ``df`` DIRECTLY into an Iceberg v2 table, resumable.

    Each batch of ``batch_shards`` shards commits as ONE append snapshot
    whose summary records the shard ids; re-running after a crash encodes
    exactly the shards no committed snapshot claims.  Crash safety comes
    from the Iceberg commit protocol itself: a run that dies before its
    metadata publish leaves data files no manifest references (dead bytes,
    not duplicate rows), and `iceberg.read_table` never sees them.
    Returns the same summary shape as :func:`encode_resumable`."""
    from . import iceberg
    try:
        meta0 = iceberg._load_metadata(table_dir)
    except FileNotFoundError:
        meta0 = None
    _require_resumable_lineage(meta0, table_dir, "encode_resumable_iceberg")
    done = completed_shards_iceberg(table_dir)
    # the recorded total is authoritative: a LARGER new count would pass a
    # range check vacuously and re-append rows already committed under the
    # old modulus (hash%new and hash%old partition the rows differently)
    totals = _recorded_total_shards(meta0) if meta0 else set()
    if totals and totals != {shards}:
        raise ValueError(
            f"table {table_dir} was encoded with shards={sorted(totals)}, "
            f"got shards={shards} — resuming under a different modulus "
            "would silently duplicate committed rows; pass the original "
            "shard count")
    stale = done - set(range(shards))
    if stale:
        raise ValueError(
            f"table {table_dir} has committed shards {sorted(stale)} "
            f"outside range({shards}) — it was encoded with a different "
            "shard count; pass the original `shards`")
    todo = [s for s in range(shards) if s not in done]
    summary = {"shards": shards, "skipped": len(done), "encoded": 0,
               "rows": 0, "tokens": 0, "payload_bytes": 0,
               "snapshots": []}
    if not todo:
        return summary

    from pyspark.sql import Observation

    base = engine.split_long_rows(df, split_threshold)
    base = base.withColumn(
        "shard", F.pmod(F.xxhash64("doc_id", "seg_id"),
                        F.lit(shards)).cast("int"))
    step = batch_shards or len(todo)
    for i in range(0, len(todo), step):
        batch = todo[i:i + step]
        part = (base.where(F.col("shard").isin(batch))
                .repartition(len(batch), "shard"))
        enc = engine.encode(part.drop("shard"), codec=codec,
                            split_threshold=None, salt=False)
        enc = enc.withColumn(
            "shard", F.pmod(F.xxhash64("doc_id", "seg_id"),
                            F.lit(shards)).cast("int"))
        # token/byte totals ride on the write itself (Observation) —
        # no second pass over the just-written payload bytes
        obs = Observation(f"enc_batch_{i}")
        enc = enc.observe(obs, F.sum("n_tok").alias("t"),
                          F.sum(F.length("payload")).alias("p"))
        extra = {"simdcomp-shards": ",".join(str(s) for s in batch),
                 "simdcomp-total-shards": str(shards)}
        if iceberg.is_iceberg_table(table_dir):
            meta = iceberg.append(enc, table_dir, extra_summary=extra)
        else:
            meta = iceberg.export_encoded(enc, table_dir,
                                          extra_summary=extra)
        snap = meta["snapshots"][-1]
        summary["encoded"] += len(batch)
        summary["rows"] += int(snap["summary"]["added-records"])
        summary["tokens"] += int(obs.get["t"] or 0)
        summary["payload_bytes"] += int(obs.get["p"] or 0)
        summary["snapshots"].append(snap["snapshot-id"])
    return summary


def completed_input_files_iceberg(table_dir: str) -> set[str]:
    """Input files (relative paths) already ingested into the Iceberg
    table, read from the ``simdcomp-input-files`` snapshot-summary keys."""
    import json as _json

    from . import iceberg
    try:
        meta = iceberg._load_metadata(table_dir)
    except FileNotFoundError:
        return set()
    done: set[str] = set()
    for s in meta["snapshots"]:
        done |= set(_json.loads(
            s.get("summary", {}).get("simdcomp-input-files", "[]")))
    # lineage of EXPIRED snapshots survives in table properties
    done |= set(_json.loads(meta.get("properties", {}).get(
        "simdcomp-input-files-expired", "[]")))
    return done


def encode_files_resumable_iceberg(spark, input_path: str, table_dir: str,
                                   codec: str = "auto",
                                   split_threshold: int =
                                   engine.DEFAULT_SPLIT_THRESHOLD,
                                   batch_files: int | None = None,
                                   snapshot_id: int | None = None,
                                   verify: bool = False,
                                   rewrite_manifests: bool = False
                                   ) -> dict:
    """FUSED resumable ingest (the 100 TB path): INPUT FILES are the
    resume unit, and the Iceberg snapshot log is the resume state.

    Each batch of ``batch_files`` input parquet files is encoded via the
    fused :func:`engine.encode_files` (pyarrow in-worker, no JVM row
    format) and committed as ONE append snapshot whose summary records
    the batch's input files (paths relative to ``input_path``, so the
    summary stays bounded by the batch size — size the batch, not the
    table).  A crashed run commits nothing; the re-run ingests exactly
    the unrecorded input files.  This is the natural resume unit for
    ingest: the input's file listing is already the planning primitive,
    and no doc-hash shuffle is needed at all (the whole pipeline stays
    scan-aligned and narrow).  Compared with
    :func:`encode_resumable_iceberg` (doc-hash shards, scan-based
    encode), this path measured ~5-10x the throughput and is the one to
    use when the input is static files; use the shard variant when the
    input is a DataFrame with no stable file identity.

    ``verify=True`` round-trips EACH batch right after its commit
    (decode of the batch's data files vs the batch's input files) and on
    mismatch ROLLS BACK that snapshot (iceberg.rollback_last_snapshot)
    before raising — corrupt data never stays current, and the dropped
    snapshot's lineage vanishes with it, so the re-run (with the fixed
    encoder) re-encodes exactly the failed batch.

    ``rewrite_manifests=True`` consolidates the one-manifest-per-batch
    chain after the last batch lands (:func:`iceberg.rewrite_manifests`
    — metadata-only; resume lineage lives in the append snapshots'
    summaries, which a rewrite preserves in history, so a later resume
    is still a no-op)."""
    import json as _json

    from . import iceberg
    try:
        meta0 = iceberg._load_metadata(table_dir)
    except FileNotFoundError:
        meta0 = None
    _require_resumable_lineage(meta0, table_dir,
                               "encode_files_resumable_iceberg")
    all_files = engine._input_files(input_path, snapshot_id)
    rel = {f: os.path.relpath(f, input_path) for f in all_files}
    done = completed_input_files_iceberg(table_dir)
    stale = done - set(rel.values())
    if stale:
        raise ValueError(
            f"table {table_dir} records {len(stale)} ingested input "
            f"files absent from {input_path} (e.g. {sorted(stale)[:3]}) — "
            "wrong input path, or the input was rewritten under the "
            "table; refusing to mix lineages")
    todo = [f for f in all_files if rel[f] not in done]
    summary = {"input_files": len(all_files), "skipped": len(done),
               "encoded_files": 0, "rows": 0, "snapshots": []}
    if not todo:
        return summary

    step = batch_files or len(todo)
    for i in range(0, len(todo), step):
        batch = todo[i:i + step]
        enc = engine.encode_files(spark, input_path, codec=codec,
                                  split_threshold=split_threshold,
                                  files=batch)
        extra = {"simdcomp-input-files":
                 _json.dumps([rel[f] for f in batch]),
                 "simdcomp-input-path": str(input_path)}
        if iceberg.is_iceberg_table(table_dir):
            meta = iceberg.append(enc, table_dir, extra_summary=extra)
        else:
            meta = iceberg.export_encoded(enc, table_dir,
                                          extra_summary=extra)
        snap = meta["snapshots"][-1]
        if verify:
            # ignore_deletes: the ingest may target a table that already
            # carries row-level deletes (they cannot touch this batch's
            # just-appended files under the v2 sequence rule); the path
            # match needs the full /snap-<id>/ segment — snapshot ids
            # are variable-length, so a bare prefix can collide
            new_files = [d["file_path"] for d in iceberg.data_files(
                table_dir, ignore_deletes=True)
                if f"{os.sep}snap-{snap['snapshot-id']}{os.sep}"
                in d["file_path"]]
            dec = engine.decode(spark.read.parquet(*new_files),
                                reassemble=True)
            bad = engine.verify_roundtrip(
                spark.read.parquet(*batch), dec)
            if bad:
                # pin the snapshot being reverted: a concurrent append
                # landing between this batch's commit and the rollback
                # must fail the rollback, not be silently destroyed
                iceberg.rollback_last_snapshot(
                    table_dir, expected_id=snap["snapshot-id"])
                raise RuntimeError(
                    f"round-trip verification failed for {bad} rows in "
                    f"batch {i // step} — snapshot "
                    f"{snap['snapshot-id']} rolled back; the table's "
                    "current state excludes the corrupt batch")
        summary["encoded_files"] += len(batch)
        summary["rows"] += int(snap["summary"]["added-records"])
        summary["snapshots"].append(snap["snapshot-id"])
    if rewrite_manifests:
        res = iceberg.rewrite_manifests(table_dir)
        summary["manifests_after_rewrite"] = (
            res["manifests_after"])
    return summary
