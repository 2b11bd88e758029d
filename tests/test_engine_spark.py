"""Spark pipeline tests: round-trip identity through the full DataFrame
path (split → salt → encode UDF → parquet → decode UDF → reassembly),
resume-from-manifest, metrics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from simdcomp_spark import engine, fixtures, manifest
from simdcomp_spark import kernels as K


@pytest.fixture(scope="module")
def unit_df(spark):
    return fixtures.unit_table(spark).cache()


@pytest.mark.parametrize("codec", ["bitpack", "for", "d1", "rle", "dict", "auto"])
def test_spark_roundtrip_all_codecs(spark, unit_df, codec):
    enc = engine.encode(unit_df, codec=codec, split_threshold=1 << 14)
    dec = engine.decode(enc, reassemble=True)
    assert engine.verify_roundtrip(unit_df, dec) == 0


def test_skew_split_segments(spark, unit_df):
    split = engine.split_long_rows(unit_df, threshold=1 << 14)
    huge = split.where(F.col("doc_id") == "doc_tokenish_huge_00000000")
    segs = huge.select("seg_id", "n_tok").orderBy("seg_id").collect()
    assert len(segs) == (70000 + (1 << 14) - 1) // (1 << 14)
    assert sum(r["n_tok"] for r in segs) == 70000
    assert all(r["n_tok"] <= (1 << 14) for r in segs)


def test_compressed_size_bound_on_spark(spark, unit_df):
    """north rule: payload ≤ reference bits(max)-per-block packing, per row
    (equality for bitpack)."""
    enc = engine.encode(unit_df, codec="bitpack", split_threshold=None)
    rows = enc.select("doc_id", "n_tok", "widths", "payload").collect()
    assert rows
    for r in rows:
        wid = np.frombuffer(r["widths"], dtype=np.uint8)
        n = r["n_tok"]
        expect = sum(
            K.compressed_bytes(min(128, n - 128 * i), int(b))
            for i, b in enumerate(wid))
        assert len(r["payload"]) == expect


def test_parquet_write_read_roundtrip(spark, unit_df, tmp_path):
    out = str(tmp_path / "enc.parquet")
    engine.encode(unit_df, codec="auto").write.parquet(out)
    enc = spark.read.parquet(out)
    dec = engine.decode(enc, reassemble=True)
    assert engine.verify_roundtrip(unit_df, dec) == 0


def test_resume_from_manifest(spark, unit_df, tmp_path):
    out = str(tmp_path / "table")
    s1 = manifest.encode_resumable(unit_df, out, codec="bitpack", shards=8)
    assert s1["encoded"] == 8 and s1["skipped"] == 0
    # wipe two shards' manifests → only those re-encode
    import os
    for s in (2, 5):
        os.remove(f"{out}/_manifest/shard={s}.json")
    s2 = manifest.encode_resumable(unit_df, out, codec="bitpack", shards=8)
    assert s2["skipped"] == 6 and s2["encoded"] == 2
    s3 = manifest.encode_resumable(unit_df, out, codec="bitpack", shards=8)
    assert s3["encoded"] == 0 and s3["skipped"] == 8
    # staged-write protocol: re-encoded shards REPLACE their data dir, so a
    # resumed table has no duplicates even without reader-side dedup
    enc = manifest.read_encoded(spark, out)
    assert enc.groupBy("doc_id", "seg_id").count() \
        .where(F.col("count") > 1).count() == 0
    dec = engine.decode(enc, reassemble=True)
    assert engine.verify_roundtrip(unit_df, dec) == 0


def test_resume_after_midshard_crash_no_duplicates(spark, unit_df, tmp_path):
    """Crash simulation: a shard has SOME parquet files on disk but no
    manifest (the exact window where the old append-mode write duplicated
    rows).  Re-running must replace, not append."""
    import os
    from pathlib import Path
    out = str(tmp_path / "crashy")
    manifest.encode_resumable(unit_df, out, codec="bitpack", shards=8)
    os.remove(f"{out}/_manifest/shard=3.json")
    # make shard 3 truly partial: delete one of its data files if it has >1,
    # otherwise leave the complete-but-unmanifested dir (both must be safe)
    files = sorted(Path(f"{out}/data/shard=3").glob("*.parquet"))
    assert files
    if len(files) > 1:
        files[0].unlink()
    s2 = manifest.encode_resumable(unit_df, out, codec="bitpack", shards=8)
    assert s2["encoded"] == 1 and s2["skipped"] == 7
    enc = manifest.read_encoded(spark, out)
    assert enc.groupBy("doc_id", "seg_id").count() \
        .where(F.col("count") > 1).count() == 0
    dec = engine.decode(enc, reassemble=True)
    assert engine.verify_roundtrip(unit_df, dec) == 0


def test_partition_metrics_shape(spark, unit_df):
    m = engine.partition_metrics(engine.encode(unit_df, codec="auto"))
    rows = m.collect()
    assert rows
    total_tokens = sum(r["tokens"] for r in rows)
    assert total_tokens == unit_df.agg(F.sum("n_tok")).first()[0]
    for r in rows:
        assert r["bits_per_token"] > 0 and r["tokens_per_sec"] > 0


def test_distributed_fixture_deterministic(spark):
    a = fixtures.tokenish_table(spark, 200, parts=4)
    b = fixtures.tokenish_table(spark, 200, parts=4)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() == 200
    # skew row present
    assert a.where(F.col("n_tok") == 80000).count() == 1


def test_encode_files_fused_path(spark, unit_df, tmp_path):
    src = str(tmp_path / "toks")
    unit_df.write.parquet(src)
    enc = engine.encode_files(spark, src, codec="auto",
                              split_threshold=1 << 14)
    dec = engine.decode(enc, reassemble=True)
    assert engine.verify_roundtrip(unit_df, dec) == 0
    # fused path must also byte-match the mapInArrow-over-scan path
    enc2 = engine.encode(unit_df, codec="bitpack", split_threshold=1 << 14)
    enc1 = engine.encode_files(spark, src, codec="bitpack",
                               split_threshold=1 << 14)
    a = {(r["doc_id"], r["seg_id"]): (bytes(r["widths"]), bytes(r["payload"]))
         for r in enc1.collect()}
    b = {(r["doc_id"], r["seg_id"]): (bytes(r["widths"]), bytes(r["payload"]))
         for r in enc2.collect()}
    assert a == b


def test_decode_files_fused_path(spark, unit_df, tmp_path):
    """The fused pyarrow-in-worker decode must reproduce the scan-based
    decode exactly, including mixed-codec encoded tables and the
    shard-partitioned resumable layout."""
    enc_dir = str(tmp_path / "enc")
    enc = engine.encode(unit_df, codec="auto", split_threshold=1 << 14)
    enc.write.parquet(enc_dir)
    a = {(r["doc_id"], r["seg_id"]): r["tokens"]
         for r in engine.decode_files(spark, enc_dir).collect()}
    b = {(r["doc_id"], r["seg_id"]): r["tokens"]
         for r in engine.decode(spark.read.parquet(enc_dir),
                                reassemble=False).collect()}
    assert a == b
    # partitioned (resumable) layout
    out = str(tmp_path / "resumable")
    manifest.encode_resumable(unit_df, out, codec="d1", shards=4)
    dec = engine.decode_files(spark, f"{out}/data")
    got = {(r["doc_id"], r["seg_id"]): r["tokens"] for r in dec.collect()}
    want = {(r["doc_id"], r["seg_id"]): r["tokens"]
            for r in engine.decode(manifest.read_encoded(spark, out),
                                   reassemble=False).collect()}
    assert got == want


def test_encode_resumable_iceberg_crash_resume(spark, unit_df, tmp_path,
                                               monkeypatch):
    """Resume state and table state as ONE mechanism: each shard batch is
    an Iceberg append snapshot carrying its shard ids in the summary.  A
    run that crashes AFTER writing data files but BEFORE its metadata
    publish commits nothing — the re-run encodes exactly the missing
    shards and the final table round-trips with no duplicate rows (the
    crashed attempt's files are orphans no manifest references)."""
    from pathlib import Path

    from simdcomp_spark import iceberg
    table = str(tmp_path / "enc_iceberg")

    # first commit (shards 0,1) succeeds: 2 avro writes (manifest +
    # manifest list); the SECOND batch dies mid-publish on write 3
    orig = iceberg._avro_write
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] >= 3:
            raise RuntimeError("simulated crash before commit")
        return orig(*a, **k)

    monkeypatch.setattr(iceberg, "_avro_write", flaky)
    with pytest.raises(RuntimeError, match="simulated crash"):
        manifest.encode_resumable_iceberg(unit_df, table, codec="bitpack",
                                          shards=4, batch_shards=2)
    monkeypatch.setattr(iceberg, "_avro_write", orig)

    assert manifest.completed_shards_iceberg(table) == {0, 1}
    # orphan data of the crashed batch exists on disk but is invisible
    n_live = iceberg.read_table(spark, table).count()
    snap_dirs = list((Path(table) / "data").glob("snap-*"))
    assert len(snap_dirs) == 2           # one committed + one orphan

    s2 = manifest.encode_resumable_iceberg(unit_df, table, codec="bitpack",
                                           shards=4, batch_shards=2)
    assert s2["skipped"] == 2 and s2["encoded"] == 2
    assert len(s2["snapshots"]) == 1
    assert manifest.completed_shards_iceberg(table) == {0, 1, 2, 3}
    assert iceberg.read_table(spark, table).count() > n_live

    # idempotent: nothing left to do
    s3 = manifest.encode_resumable_iceberg(unit_df, table, codec="bitpack",
                                           shards=4)
    assert s3["encoded"] == 0 and s3["skipped"] == 4

    enc = iceberg.read_table(spark, table)
    assert enc.groupBy("doc_id", "seg_id").count() \
        .where(F.col("count") > 1).count() == 0
    dec = engine.decode(enc.drop("shard"), reassemble=True)
    assert engine.verify_roundtrip(unit_df, dec) == 0
    # a different shard count against the same table is a loud error
    with pytest.raises(ValueError, match="shard count"):
        manifest.encode_resumable_iceberg(unit_df, table, shards=2)


def test_encode_files_resumable_iceberg_crash_resume(spark, unit_df,
                                                     tmp_path, monkeypatch):
    """Fused resumable ingest: INPUT FILES are the resume unit.  First
    batch commits; the second dies mid-publish; the re-run ingests
    exactly the unrecorded files and the table round-trips clean."""
    from pathlib import Path

    from simdcomp_spark import iceberg
    src = str(tmp_path / "tok")
    unit_df.repartition(6).write.parquet(src)
    n_files = len(list(Path(src).glob("*.parquet")))
    assert n_files == 6
    table = str(tmp_path / "tbl")

    orig = iceberg._avro_write
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] >= 3:
            raise RuntimeError("simulated crash before commit")
        return orig(*a, **k)

    monkeypatch.setattr(iceberg, "_avro_write", flaky)
    with pytest.raises(RuntimeError, match="simulated crash"):
        manifest.encode_files_resumable_iceberg(
            spark, src, table, codec="bitpack", batch_files=3)
    monkeypatch.setattr(iceberg, "_avro_write", orig)

    assert len(manifest.completed_input_files_iceberg(table)) == 3
    s2 = manifest.encode_files_resumable_iceberg(
        spark, src, table, codec="bitpack", batch_files=3)
    assert s2["skipped"] == 3 and s2["encoded_files"] == 3
    s3 = manifest.encode_files_resumable_iceberg(
        spark, src, table, codec="bitpack")
    assert s3["encoded_files"] == 0 and s3["skipped"] == 6

    enc = iceberg.read_table(spark, table)
    assert enc.groupBy("doc_id", "seg_id").count() \
        .where(F.col("count") > 1).count() == 0
    dec = engine.decode(enc, reassemble=True)
    assert engine.verify_roundtrip(unit_df, dec) == 0

    # pointing the table at a different input is a loud lineage error
    other = str(tmp_path / "tok2")
    unit_df.limit(5).repartition(1).write.parquet(other)
    with pytest.raises(ValueError, match="refusing to mix"):
        manifest.encode_files_resumable_iceberg(spark, other, table)


def test_decode_files_pruned_subset(spark, unit_df, tmp_path):
    """prune_files → decode_files(files=...): a metadata-planned range
    decode touches ONLY the pruned files and round-trips their rows."""
    from simdcomp_spark import iceberg
    table = str(tmp_path / "tbl")
    enc = engine.encode(unit_df.orderBy("doc_id").repartitionByRange(
        4, "doc_id"), codec="bitpack", split_threshold=None)
    iceberg.export_encoded(enc, table)
    files = iceberg.data_files(table)
    subset = [d["file_path"] for d in files[:2]]
    dec = engine.decode_files(spark, table, files=subset)
    import pyarrow.parquet as pq
    want = sum(pq.ParquetFile(f).metadata.num_rows for f in subset)
    assert dec.count() == want
    got = {r["doc_id"]: r["tokens"] for r in dec.collect()}
    truth = {r["doc_id"]: r["tokens"] for r in unit_df.collect()}
    assert got and all(truth[k] == v for k, v in got.items())


def test_expire_snapshots_and_orphan_cleanup_preserve_resume(
        spark, unit_df, tmp_path):
    """Maintenance must not corrupt either the data or the resume state:
    expiring snapshots keeps the current table intact (append manifest
    lists carry prior manifests forward), folds the expired snapshots'
    ingest lineage into table properties so a resume is STILL a no-op,
    and remove_orphan_files sweeps only unreferenced bytes."""
    import shutil
    from pathlib import Path

    from simdcomp_spark import iceberg
    src = str(tmp_path / "tok")
    unit_df.repartition(6).write.parquet(src)
    table = str(tmp_path / "tbl")
    s = manifest.encode_files_resumable_iceberg(
        spark, src, table, codec="bitpack", batch_files=2)
    assert len(s["snapshots"]) == 3
    n = iceberg.read_table(spark, table).count()
    old_snap = s["snapshots"][0]

    r = iceberg.expire_snapshots(table, keep_last=1)
    assert r == {"expired": 2, "retained": 1}
    assert iceberg.read_table(spark, table).count() == n      # data intact
    with pytest.raises(ValueError, match="not found"):        # travel ends
        iceberg.read_table(spark, table, snapshot_id=old_snap)
    # resume after expiry is still a no-op (lineage moved to properties)
    s2 = manifest.encode_files_resumable_iceberg(
        spark, src, table, codec="bitpack")
    assert s2["encoded_files"] == 0 and s2["skipped"] == 6

    # orphan sweep: plant a crashed-run leftover, keep live files
    live = [d["file_path"] for d in iceberg.data_files(table)]
    orphan_dir = Path(table) / "data" / "snap-9999"
    orphan_dir.mkdir()
    orphan = str(orphan_dir / "leftover.parquet")
    shutil.copy(live[0], orphan)
    got = iceberg.remove_orphan_files(table, older_than_s=0,
                                      dry_run=True)
    assert orphan in got
    # the expired snapshots' manifest-list/manifest avros are orphans
    # too now; nothing else may be swept
    assert all(g == orphan or g.endswith(".avro") for g in got)
    assert Path(orphan).exists()                               # dry run
    # age guard: fresh files survive the default threshold
    assert iceberg.remove_orphan_files(table) == []
    got = iceberg.remove_orphan_files(table, older_than_s=0)
    assert orphan in got
    assert not orphan_dir.exists()
    assert iceberg.read_table(spark, table).count() == n
    assert all(Path(f).exists() for f in live)

    # the shard-variant lineage survives expiry the same way
    table2 = str(tmp_path / "tbl2")
    manifest.encode_resumable_iceberg(unit_df, table2, codec="bitpack",
                                      shards=4, batch_shards=2)
    iceberg.expire_snapshots(table2, keep_last=1)
    assert manifest.completed_shards_iceberg(table2) == {0, 1, 2, 3}
    with pytest.raises(ValueError, match="keep_last"):
        iceberg.expire_snapshots(table2, keep_last=0)


def test_rowgroup_units_many_small_files_no_driver_io(spark, unit_df,
                                                      tmp_path, monkeypatch):
    """At 100 TB the fused paths face 10^5-10^6 files; work-unit discovery
    must not open parquet footers on the driver (the old sequential loop
    serialized all of them before any task ran).  The driver may only LIST
    file names; footer reads fan out as a Spark job.  Proven by poisoning
    pq.ParquetFile in the driver process (executors are separate processes,
    so the job itself is unaffected) over a many-small-files layout."""
    import pyarrow.parquet as pq
    src = str(tmp_path / "many")
    # 40 single-row-group files
    unit_df.repartition(40).write.parquet(src)
    from pathlib import Path
    n_files = len(list(Path(src).glob("*.parquet")))
    assert n_files >= 30

    def _boom(*a, **k):
        raise AssertionError("driver-side parquet footer read in fused path")
    monkeypatch.setattr(pq, "ParquetFile", _boom)

    units = engine._rowgroup_units(spark, src)
    assert units.count() == n_files  # one row group per small file
    enc = engine.encode_files(spark, src, codec="bitpack",
                              split_threshold=1 << 14)
    dec = engine.decode(enc, reassemble=True)
    assert engine.verify_roundtrip(unit_df, dec) == 0


def test_rowgroup_units_exceed_partitions(spark, tmp_path):
    """The (path, rg) expansion happens IN THE PLAN with partitions capped
    at 4x default parallelism: with units >> partitions every row group is
    still covered exactly once (multiple units per task) and the driver
    never materializes an O(units) list or one-partition-per-unit plan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "manyrg"
    src.mkdir()
    n_rows, rg_rows = 8000, 50          # 160 row groups > 32*4 partitions
    tokens = [[(7 * i + j) % 1000 for j in range(8)] for i in range(n_rows)]
    tbl = pa.table({
        "doc_id": [f"d{i:05d}" for i in range(n_rows)],
        "source": ["t"] * n_rows,
        "n_tok": pa.array([8] * n_rows, pa.int32()),
        "tokens": pa.array(tokens, pa.list_(pa.int32()))})
    pq.write_table(tbl, src / "part-0.parquet", row_group_size=rg_rows)

    # r7 small-input fast path: one small file → ONE whole-file unit
    # (rg = -1, workers iterate row groups in file order from rg_off 0)
    fast = engine._rowgroup_units(spark, str(src)).collect()
    assert [(r["rg"], r["rg_off"]) for r in fast] == [(-1, 0)]

    # large files must take the distributed row-group planning path:
    # pretend the file stats big so the fast path declines
    import unittest.mock as mock
    with mock.patch.object(engine.os.path, "getsize",
                           return_value=1 << 30):
        units = engine._rowgroup_units(spark, str(src))
        cap = 4 * spark.sparkContext.defaultParallelism
        assert units.rdd.getNumPartitions() <= cap
        got = units.collect()
    assert len(got) == n_rows // rg_rows
    assert sorted(r["rg"] for r in got) == list(range(n_rows // rg_rows))

    enc = engine.encode_files(spark, str(src), codec="bitpack")
    assert enc.agg(F.sum("n_tok")).first()[0] == n_rows * 8
    dec = engine.decode(enc, reassemble=False)
    assert dec.where(F.col("doc_id") == "d00042").first()["tokens"] == \
        tokens[42]


def test_point_lookup_all_codecs(spark, unit_df):
    """Compressed-domain point lookup agrees with the raw arrays for every
    codec, including multi-block rows and the 70k-token skew row."""
    truth = {r["doc_id"]: r["tokens"] for r in unit_df.collect()}
    for codec in ("bitpack", "for", "d1", "rle", "dict"):
        enc = engine.encode(unit_df.where(F.col("n_tok") > 0),
                            codec=codec, split_threshold=None)
        enc = enc.withColumn(
            "lookup_idx",
            F.pmod(F.xxhash64("doc_id"), F.col("n_tok")).cast("int"))
        rows = engine.point_lookup(enc).collect()
        assert rows
        for r in rows:
            assert r["val"] == truth[r["doc_id"]][r["idx"]], (codec, r)


def test_minmax_sorted_compressed_domain(spark, unit_df):
    """Zone-map min/max without decode matches array_min/array_max on the
    raw data, for both sorted-row families, incl. multi-block rows."""
    sdf = unit_df.where(F.col("n_tok") > 0) \
        .withColumn("tokens", F.array_sort("tokens"))
    truth = {r["doc_id"]: (min(r["tokens"]), max(r["tokens"]))
             for r in sdf.collect()}
    for codec in ("d1", "for"):
        enc = engine.encode(sdf, codec=codec, split_threshold=None)
        rows = engine.minmax_sorted(enc).collect()
        assert len(rows) == len(truth)
        for r in rows:
            assert (r["min_tok"], r["max_tok"]) == truth[r["doc_id"]], \
                (codec, r["doc_id"])


def test_submit_job_script(spark, unit_df, tmp_path):
    """The spark-submit entry point end-to-end, incl. --verify."""
    import subprocess, sys, json as _json
    src, out = str(tmp_path / "in"), str(tmp_path / "out")
    unit_df.write.parquet(src)
    r = subprocess.run(
        [sys.executable, "scripts/submit_encode.py", "--input", src,
         "--output", out, "--codec", "bitpack", "--shards", "4",
         "--verify"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    assert _json.loads(lines[0])["encoded"] == 4
    assert _json.loads(lines[1])["roundtrip_mismatches"] == 0


def test_range_count_mixed_codec_batches(spark, unit_df):
    """range_count must route mixed d1/FOR batches per codec group (a
    post-shuffle encoded table can interleave both sorted-row families)."""
    sdf = unit_df.where(F.col("n_tok") > 0) \
        .withColumn("tokens", F.array_sort("tokens")) \
        .where(F.array_min("tokens") >= 0)  # signed sort == uint32 sort
    truth = {r["doc_id"]: sum(2000 <= t < 60000 for t in r["tokens"])
             for r in sdf.collect()}
    even = F.xxhash64("doc_id") % 2 == 0
    enc = (engine.encode(sdf.where(even), codec="d1", split_threshold=None)
           .unionByName(engine.encode(sdf.where(~even), codec="for",
                                      split_threshold=None))
           .repartition(2))
    rows = engine.range_count(enc, 2000, 60000).collect()
    assert len(rows) == len(truth)
    for r in rows:
        assert r["n_in_range"] == truth[r["doc_id"]], r["doc_id"]


def test_salt_encoded_mixed_codec_decode(spark, unit_df):
    """The bench/gate sentinel shape: salt the ENCODED table (compressed
    bytes shuffled, not raw tokens), then decode the shuffled, guaranteed
    mixed-codec batches.  Asserts both that >1 codec is present after the
    salt (so the per-codec sub-gather routing in _decode_batch_columns is
    genuinely exercised) and that the round-trip stays bit-identical."""
    even = F.xxhash64("doc_id") % 2 == 0
    enc = (engine.encode(unit_df.where(even), codec="bitpack",
                         split_threshold=1 << 14)
           .unionByName(engine.encode(unit_df.where(~even), codec="d1",
                                      split_threshold=1 << 14)))
    salted = engine.salt_encoded(enc, shards=4)
    assert salted.select("codec").distinct().count() == 2
    dec = engine.decode(salted, reassemble=True)
    assert engine.verify_roundtrip(unit_df, dec) == 0


def test_encoded_dedup_codec_invariant(spark):
    """Identical docs encoded by DIFFERENT codecs (auto picking per
    partition, or explicit per-half codecs) must still collapse: the
    content_hash stamped at encode time is computed from the raw token
    stream, not the compressed bytes."""
    rows = []
    for i in range(40):
        toks = [int(x) for x in np.arange(20) * 3 + (i % 10)]
        rows.append((f"doc_{i:03d}", "t", len(toks), toks))
    df = spark.createDataFrame(
        rows, "doc_id string, source string, n_tok int, tokens array<int>")
    # 10 distinct sequences, each duplicated 4x; halves get different codecs
    even = F.xxhash64("doc_id") % 2 == 0
    enc = (engine.encode(df.where(even), codec="d1", split_threshold=None)
           .unionByName(engine.encode(df.where(~even), codec="bitpack",
                                      split_threshold=None)))
    assert enc.select("codec").distinct().count() == 2
    groups = engine.encoded_dedup(enc).collect()
    assert len(groups) == 10
    assert all(g["n_docs"] == 4 for g in groups)
    # auto-encoded path end-to-end too (whatever codecs auto picks)
    enc_auto = engine.encode(df.repartition(8), codec="auto",
                             split_threshold=None)
    groups2 = engine.encoded_dedup(enc_auto).collect()
    assert len(groups2) == 10 and all(g["n_docs"] == 4 for g in groups2)


def test_encoded_dedup_legacy_table_requires_fixed_codec(spark, unit_df):
    """A pre-content_hash table (column dropped) with mixed codecs must be
    REJECTED — the compressed-representation fallback hash is only a
    bijection per fixed codec."""
    even = F.xxhash64("doc_id") % 2 == 0
    enc = (engine.encode(unit_df.where(even), codec="d1",
                         split_threshold=None)
           .unionByName(engine.encode(unit_df.where(~even), codec="bitpack",
                                      split_threshold=None)))
    legacy = enc.drop("content_hash")
    with pytest.raises(ValueError, match="single fixed codec"):
        engine.encoded_dedup(legacy)
    # single-codec legacy tables still work
    single = engine.encode(unit_df, codec="bitpack",
                           split_threshold=None).drop("content_hash")
    assert engine.encoded_dedup(single).count() > 0


def test_range_count_rejects_unsorted_family(spark, unit_df):
    from pyspark.errors.exceptions.captured import PythonException
    enc = engine.encode(unit_df.where(F.col("n_tok") > 0),
                        codec="bitpack", split_threshold=None)
    with pytest.raises(PythonException, match="sorted-row family"):
        engine.range_count(enc, 0, 10).collect()


def test_encoded_dedup_rejects_null_content_hash(spark, unit_df):
    """Legacy rows unioned into a hash-stamped table carry NULL
    content_hash; grouping them would collapse into one fake duplicate
    group — must raise.  The guard is folded into the single aggregation
    scan (raise_error in-plan, no separate probe job), so it surfaces at
    execution time as a Spark exception."""
    import pytest
    enc = engine.encode(unit_df.limit(20), codec="bitpack",
                        split_threshold=None)
    legacy = enc.drop("content_hash").limit(5)
    mixed = enc.unionByName(legacy, allowMissingColumns=True)
    with pytest.raises(Exception, match="content_hash contains NULL"):
        engine.encoded_dedup(mixed).collect()


def test_encoded_dedup_verify_splits_forged_collision(spark):
    """The stamped content_hash is a fast polynomial hash — adversarially
    malleable.  Simulate a forged collision by forcing DIFFERENT token
    rows to share a content_hash: verify=True (default) must split them
    via the sha256 confirm pass; verify=False shows the fast path alone
    would have silently merged them."""
    df = spark.createDataFrame(
        [("a", "t", 4, [1, 2, 3, 4]), ("b", "t", 4, [9, 9, 9, 9]),
         ("c", "t", 4, [1, 2, 3, 4])],
        "doc_id string, source string, n_tok int, tokens array<int>")
    enc = engine.encode(df, codec="bitpack", split_threshold=None)
    forged = enc.withColumn("content_hash", F.lit(b"\x00" * 16))
    groups = engine.encoded_dedup(forged).collect()
    assert sorted(g["n_docs"] for g in groups) == [1, 2]
    dup = next(g for g in groups if g["n_docs"] == 2)
    assert dup["first_doc"] == "a" and ":" in dup["seq_hash"]
    unverified = engine.encoded_dedup(forged, verify=False).collect()
    assert [g["n_docs"] for g in unverified] == [3]


def test_list_to_flat_handles_large_list(spark):
    """Fused scans read user parquet whose Arrow schema may restore
    large_list (int64 offsets); reading those as int32 corrupts every
    row length."""
    import numpy as np
    import pyarrow as pa
    arr = pa.array([[1, 2, 3], [], [4, 5]],
                   type=pa.large_list(pa.int32()))
    flat, lens = engine._list_to_flat(arr)
    assert lens.tolist() == [3, 0, 2]
    assert np.asarray(flat).tolist() == [1, 2, 3, 4, 5]
    # sliced large_list keeps correct offsets
    flat2, lens2 = engine._list_to_flat(arr.slice(1))
    assert lens2.tolist() == [0, 2] and np.asarray(flat2).tolist() == [4, 5]


def test_encode_files_large_list_parquet(spark, tmp_path):
    """End-to-end fused encode over a parquet file whose Arrow schema is
    large_list<int32> (int64 offsets) — the offset-width path of
    _list_to_flat driven through the real scan."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    rows = [[int(x) for x in np.arange(i, i + 40)] for i in range(50)]
    t = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(50)]),
        "tokens": pa.array(rows, type=pa.large_list(pa.int32())),
        "source": pa.array(["s"] * 50),
    })
    d = str(tmp_path / "ll")
    import os
    os.makedirs(d)
    pq.write_table(t, f"{d}/part-0.parquet")
    enc = engine.encode_files(spark, d, codec="bitpack")
    assert enc.agg(F.sum("n_tok")).first()[0] == 50 * 40
    dec = engine.decode(enc, reassemble=True)
    got = {r["doc_id"]: r["tokens"] for r in dec.collect()}
    assert got == {f"d{i}": rows[i] for i in range(50)}


def test_resumable_iceberg_duplication_guards(spark, unit_df, tmp_path):
    """The two silent-duplication paths are refused loudly: resuming a
    shard-encoded table under a DIFFERENT modulus (hash%new and hash%old
    partition rows differently), and resuming into a non-empty table that
    carries no resumable lineage at all (published by export_encoded —
    every row would be re-appended)."""
    from simdcomp_spark import iceberg
    t1 = str(tmp_path / "shards4")
    manifest.encode_resumable_iceberg(unit_df, t1, codec="bitpack",
                                      shards=4)
    with pytest.raises(ValueError, match="shard count"):
        manifest.encode_resumable_iceberg(unit_df, t1, codec="bitpack",
                                          shards=8)
    # lineage survives expiry, and so does the modulus guard
    iceberg.expire_snapshots(t1, keep_last=1)
    with pytest.raises(ValueError, match="shard count"):
        manifest.encode_resumable_iceberg(unit_df, t1, codec="bitpack",
                                          shards=8)

    t2 = str(tmp_path / "nolineage")
    iceberg.export_encoded(
        engine.encode(unit_df, codec="bitpack", split_threshold=None), t2)
    with pytest.raises(ValueError, match="no resumable lineage"):
        manifest.encode_resumable_iceberg(unit_df, t2, shards=4)
    src = str(tmp_path / "tok")
    unit_df.repartition(2).write.parquet(src)
    with pytest.raises(ValueError, match="no resumable lineage"):
        manifest.encode_files_resumable_iceberg(spark, src, t2)


def test_verify_rolls_back_corrupt_batch(spark, unit_df, tmp_path,
                                         monkeypatch):
    """verify=True gates each batch: a failing round-trip rolls back that
    snapshot (corrupt data never stays current), its lineage vanishes
    with it, and the fixed re-run re-encodes exactly the failed batch."""
    from simdcomp_spark import iceberg
    src = str(tmp_path / "tok")
    unit_df.repartition(4).write.parquet(src)
    table = str(tmp_path / "tbl")

    real = engine.verify_roundtrip
    calls = {"n": 0}

    def flaky(a, b):
        calls["n"] += 1
        return 7 if calls["n"] == 2 else real(a, b)

    monkeypatch.setattr(engine, "verify_roundtrip", flaky)
    with pytest.raises(RuntimeError, match="rolled back"):
        manifest.encode_files_resumable_iceberg(
            spark, src, table, codec="bitpack", batch_files=2, verify=True)
    monkeypatch.setattr(engine, "verify_roundtrip", real)

    # batch 1 committed and verified; batch 2 rolled back with its lineage
    assert len(manifest.completed_input_files_iceberg(table)) == 2
    n_after_rollback = iceberg.read_table(spark, table).count()
    s = manifest.encode_files_resumable_iceberg(
        spark, src, table, codec="bitpack", verify=True)
    assert s["skipped"] == 2 and s["encoded_files"] == 2
    enc = iceberg.read_table(spark, table)
    assert enc.count() > n_after_rollback
    assert engine.verify_roundtrip(
        unit_df, engine.decode(enc, reassemble=True)) == 0


def test_rollback_last_snapshot_to_empty(spark, unit_df, tmp_path):
    """Rolling back the only snapshot leaves a valid EMPTY table (spec:
    current-snapshot-id -1), not a broken one."""
    from simdcomp_spark import iceberg
    table = str(tmp_path / "tbl")
    cols = ["doc_id", "source", "n_tok", "tokens"]
    iceberg.export_encoded(unit_df.select(*cols), table)
    iceberg.rollback_last_snapshot(table)
    assert iceberg.data_files(table) == []
    assert iceberg.read_table(spark, table).count() == 0
    with pytest.raises(ValueError, match="no snapshot"):
        iceberg.rollback_last_snapshot(table)
    # the table is still appendable afterwards
    iceberg.append(unit_df.select(*cols).limit(5), table)
    assert iceberg.read_table(spark, table).count() == 5


def test_resumable_ingest_final_manifest_rewrite(spark, unit_df, tmp_path):
    """rewrite_manifests=True consolidates the one-manifest-per-batch
    chain after the last batch; resume lineage survives (a later run is
    still a no-op) and the table decodes identically."""
    from simdcomp_spark import iceberg
    src = str(tmp_path / "tok")
    unit_df.repartition(6).write.parquet(src)
    table = str(tmp_path / "tbl")
    s = manifest.encode_files_resumable_iceberg(
        spark, src, table, codec="bitpack", batch_files=2,
        rewrite_manifests=True)
    assert len(s["snapshots"]) == 3
    assert s["manifests_after_rewrite"] == 1
    data_manifests = [r for r in iceberg._prev_manifest_records(
        iceberg._load_metadata(table)) if r.get("content", 0) == 0]
    assert len(data_manifests) == 1
    # resume after the rewrite: lineage intact, no-op
    s2 = manifest.encode_files_resumable_iceberg(
        spark, src, table, codec="bitpack")
    assert s2["encoded_files"] == 0 and s2["skipped"] == 6
    dec = engine.decode(iceberg.read_table(spark, table), reassemble=True)
    assert engine.verify_roundtrip(unit_df, dec) == 0


def test_decode_single_segment_shortcut_r7(spark, tmp_path):
    """r7: decode(reassemble=True) over a bare scan of a provably
    single-segment table drops the reassembly exchange; split tables and
    duplicate-doc tables keep the exact groupBy path."""
    from pyspark.sql import functions as F

    rows = [(f"d{i}", "s", list(range(i % 9 + 1))) for i in range(300)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, tokens array<int>") \
        .withColumn("n_tok", F.size("tokens"))
    enc = engine.encode(df, codec="auto", split_threshold=None)
    p = str(tmp_path / "enc.parquet")
    enc.write.parquet(p)
    enc2 = spark.read.parquet(p)

    fast = engine.decode(enc2, reassemble=True)
    assert "Exchange" not in fast._jdf.queryExecution() \
        .executedPlan().toString()
    slow = engine.reassemble_segments(
        engine.decode(enc2, reassemble=False).drop("n_tok"))
    norm = lambda d: sorted((r["doc_id"], r["source"], tuple(r["tokens"]),
                             r["n_tok"]) for r in d.collect())
    assert norm(fast) == norm(slow)

    # split table: shortcut must NOT fire, rows reassemble exactly
    enc_s = engine.encode(df, codec="auto", split_threshold=4)
    ps = str(tmp_path / "enc_s.parquet")
    enc_s.write.parquet(ps)
    dec_s = engine.decode(spark.read.parquet(ps), reassemble=True)
    assert "Exchange" in dec_s._jdf.queryExecution() \
        .executedPlan().toString()
    assert norm(dec_s) == norm(df.select("doc_id", "source", "tokens",
                                         "n_tok"))
