"""Schema evolution on field-id-stamped Iceberg tables: rename / drop /
promote resolve physical columns by parquet field id (the only safe way
to execute them — reference analog: the reference has no tables at all,
reference/README.md:23-24; semantics follow the Iceberg v2 spec), legacy
name-based tables refuse, and the fused file-level paths refuse tables
whose live files carry stale physical names until a rewrite re-aligns
them."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from simdcomp_spark import engine, fixtures, iceberg


@pytest.fixture(scope="module")
def unit_df(spark):
    return fixtures.unit_table(spark).cache()


@pytest.fixture()
def table(spark, tmp_path):
    """A fresh 20-row tokens table (the BASELINE.json input shape)."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(str(i), "web" if i % 2 else "book", 3, [1, 2, i])
         for i in range(20)],
        "doc_id string, source string, n_tok int, tokens array<int>")
    iceberg.export_encoded(df, t)
    return t


def test_new_tables_stamp_field_ids(spark, table):
    """Every data file footer carries the Iceberg field id of each
    column (parquet's standard field_id slot), and the table records the
    capability as a property."""
    import pyarrow.parquet as pq
    meta = iceberg._load_metadata(table)
    assert iceberg._uses_field_ids(meta)
    want = {f["name"]: f["id"]
            for f in iceberg._current_schema(meta)["fields"]}
    for f in glob.glob(table + "/data/*/*.parquet"):
        got = {fl.name: int(fl.metadata[b"PARQUET:field_id"])
               for fl in pq.ParquetFile(f).schema_arrow}
        assert got == want


def test_rename_resolves_old_files_by_id(spark, table):
    """Rename is metadata-only: files written under the OLD name serve
    the renamed column's values; appends under the new name coexist."""
    before = iceberg.read_table(spark, table).agg(
        F.sum("n_tok")).collect()[0][0]
    iceberg.rename_column(table, "n_tok", "token_count")
    out = iceberg.read_table(spark, table)
    assert out.columns == ["doc_id", "source", "token_count", "tokens"]
    assert out.agg(F.sum("token_count")).collect()[0][0] == before
    extra = spark.createDataFrame(
        [("x", "web", 7, [9])],
        "doc_id string, source string, token_count int, "
        "tokens array<int>")
    iceberg.append(extra, table)
    assert iceberg.read_table(spark, table).agg(
        F.sum("token_count")).collect()[0][0] == before + 7
    # the old name is gone: appending under it refuses
    with pytest.raises(ValueError, match="schema mismatch"):
        iceberg.append(extra.withColumnRenamed("token_count", "n_tok"),
                       table)


def test_rename_checks(spark, tmp_path, table):
    with pytest.raises(ValueError, match="no column"):
        iceberg.rename_column(table, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        iceberg.rename_column(table, "n_tok", "source")
    # partition source columns refuse
    t2 = str(tmp_path / "part")
    df = spark.createDataFrame([("a", "web", [1])],
                               "doc_id string, source string, "
                               "tokens array<int>")
    iceberg.export_encoded(df, t2, partition_by="source")
    with pytest.raises(ValueError, match="partition source"):
        iceberg.rename_column(t2, "source", "origin")


def test_drop_then_readd_does_not_resurrect(spark, table):
    """Drop is metadata-only; re-adding the NAME allocates a fresh field
    id, so the old physical columns surface NULL — dead data cannot
    come back under a recycled name."""
    iceberg.drop_column(table, "source")
    assert iceberg.read_table(spark, table).columns == [
        "doc_id", "n_tok", "tokens"]
    iceberg.add_column(table, "source", "string")
    vals = (iceberg.read_table(spark, table)
            .select("source").distinct().collect())
    assert [v.source for v in vals] == [None]
    with pytest.raises(ValueError, match="last column"):
        for c in ("doc_id", "n_tok", "tokens", "source"):
            iceberg.drop_column(table, c)


def test_promote_int_to_long(spark, table):
    """int->long widening: old int32 files widen on read; appends write
    long; bounds written before the promotion (4 bytes) still prune."""
    before = iceberg.read_table(spark, table).agg(
        F.sum("n_tok")).collect()[0][0]
    with pytest.raises(ValueError, match="widening promotion"):
        iceberg.promote_column(table, "n_tok", "string")
    with pytest.raises(ValueError, match="widening promotion"):
        iceberg.promote_column(table, "doc_id", "long")
    iceberg.promote_column(table, "n_tok", "long")
    out = iceberg.read_table(spark, table)
    assert dict(out.dtypes)["n_tok"] == "bigint"
    assert out.agg(F.sum("n_tok")).collect()[0][0] == before
    big = spark.createDataFrame(
        [("y", "web", 2**40, [1])],
        "doc_id string, source string, n_tok bigint, tokens array<int>")
    iceberg.append(big, table)
    assert iceberg.read_table(spark, table).agg(
        F.sum("n_tok")).collect()[0][0] == before + 2**40
    # bounds pruning across mixed 4-byte (pre-promote) and 8-byte
    # (post-promote) manifest bounds
    hit = iceberg.prune_files(table, "n_tok", lo=2**39)
    assert len(hit) >= 1
    assert all(int(e["record_count"]) == 1 for e in hit)
    every = iceberg.prune_files(table, "n_tok", lo=0)
    assert len(every) > len(hit)


def test_legacy_tables_refuse_rename_drop_promote(spark, tmp_path):
    """Tables written without field ids (the pre-evolution layout) keep
    working for read/append/add_column but refuse the evolutions a
    name-based reader cannot execute safely."""
    t = str(tmp_path / "legacy")
    df = spark.createDataFrame([("a", 1, [1, 2])],
                               "doc_id string, n_tok int, "
                               "tokens array<int>")
    os.environ["SIMDCOMP_ICEBERG_FIELD_IDS"] = "0"
    try:
        iceberg.export_encoded(df, t)
    finally:
        del os.environ["SIMDCOMP_ICEBERG_FIELD_IDS"]
    assert not iceberg._uses_field_ids(iceberg._load_metadata(t))
    iceberg.append(df, t)                        # appends stay id-less
    import pyarrow.parquet as pq
    for f in glob.glob(t + "/data/*/*.parquet"):
        assert all(fl.metadata is None or
                   b"PARQUET:field_id" not in fl.metadata
                   for fl in pq.ParquetFile(f).schema_arrow)
    assert iceberg.read_table(spark, t).count() == 2
    for op in (lambda: iceberg.rename_column(t, "n_tok", "x"),
               lambda: iceberg.drop_column(t, "n_tok"),
               lambda: iceberg.promote_column(t, "n_tok", "long")):
        with pytest.raises(NotImplementedError, match="field-id"):
            op()
    iceberg.add_column(t, "lang", "string")      # ADD alone stays legal
    assert iceberg.read_table(spark, t).columns[-1] == "lang"


def test_equality_delete_applies_across_rename(spark, table):
    """An equality-delete file written BEFORE a rename still applies
    after it: its key columns are resolved by field id too."""
    iceberg.write_equality_deletes(
        spark, table,
        spark.createDataFrame([("3",), ("4",)], "doc_id string"))
    assert iceberg.read_table(spark, table).where(
        F.col("doc_id").isin("3", "4")).count() == 0
    iceberg.rename_column(table, "doc_id", "document_id")
    out = iceberg.read_table(spark, table)
    assert out.where(F.col("document_id").isin("3", "4")).count() == 0
    assert out.count() == 18
    # and compaction folds them away under the current schema
    iceberg.compact_files(spark, table)
    assert iceberg.read_table(spark, table).count() == 18
    assert not iceberg.delete_files(table)


def test_drop_refuses_live_equality_delete_key(spark, table):
    iceberg.write_equality_deletes(
        spark, table,
        spark.createDataFrame([("web",)], "source string"))
    with pytest.raises(ValueError, match="equality-delete key"):
        iceberg.drop_column(table, "source")
    iceberg.compact_files(spark, table)
    iceberg.drop_column(table, "source")         # folded away -> legal
    assert "source" not in iceberg.read_table(spark, table).columns


def test_fused_paths_refuse_stale_names_until_rewrite(spark, unit_df,
                                                      tmp_path):
    """The fused file-level decode addresses physical columns by NAME:
    it refuses a table whose live files predate a rename, and accepts
    again once an overwrite rewrites them under the current names.
    Pure add_column never trips the guard."""
    t = str(tmp_path / "enc")
    cols = ["doc_id", "source", "n_tok", "tokens"]
    enc = engine.encode(unit_df.select(*cols).limit(30),
                        codec="bitpack", split_threshold=None)
    iceberg.export_encoded(enc, t)
    n0 = engine.decode_files(spark, t).count()
    iceberg.add_column(t, "note", "string")
    assert engine.decode_files(spark, t).count() == n0   # adds are fine
    iceberg.rename_column(t, "note", "remark")
    # live files never carried 'note' -> still name-safe
    assert engine.decode_files(spark, t).count() == n0
    iceberg.rename_column(t, "doc_id", "document_id")
    with pytest.raises(ValueError, match="fused|by name"):
        engine.decode_files(spark, t).count()
    # overwrite rewrites every live file under the current schema
    iceberg.overwrite(iceberg.read_table(spark, t), t)
    df = engine.decode_files(spark, t)
    assert df.count() == n0
    # output is normalized to the CANONICAL role names (the physical
    # column read is 'document_id'; see
    # test_decode_files_canonical_names_after_rename)
    assert "doc_id" in df.columns


def test_fused_guard_conservative_on_expired_snapshots(spark, table):
    """A live file whose snapshot was EXPIRED on an evolved table cannot
    prove its write schema — the fused guard refuses conservatively
    (the file may predate the rename), and an overwrite (whose snapshot
    is live and current-schema) clears it."""
    iceberg.rename_column(table, "n_tok", "tc")
    extra = spark.createDataFrame(
        [("z", "web", 1, [5])],
        "doc_id string, source string, tc int, tokens array<int>")
    iceberg.append(extra, table)          # lives under schema 1
    iceberg.expire_snapshots(table, keep_last=1)
    # the ORIGINAL files' snapshot is gone; only the append's survives,
    # but the original files are still live (EXISTING entries)
    with pytest.raises(ValueError, match="fused|by name|expired|schema"):
        iceberg.assert_fused_name_safe(table)
    iceberg.overwrite(iceberg.read_table(spark, table), table)
    iceberg.assert_fused_name_safe(table)            # realigned


def test_fused_role_columns_resolution(spark, table):
    roles = ["doc_id", "source", "n_tok"]
    assert iceberg.fused_role_columns(table, roles) == {
        r: r for r in roles}
    iceberg.rename_column(table, "n_tok", "tc")
    assert iceberg.fused_role_columns(table, roles)["n_tok"] == "tc"
    iceberg.drop_column(table, "tc")
    with pytest.raises(ValueError, match="dropped"):
        iceberg.fused_role_columns(table, roles)
    # re-adding the original NAME resolves to the re-added column
    iceberg.add_column(table, "n_tok", "int")
    assert iceberg.fused_role_columns(table, roles)["n_tok"] == "n_tok"


def test_schema_id_recorded_on_snapshots(spark, table):
    """Snapshots record the schema they were written under — the basis
    of the fused guard's per-file write-schema resolution."""
    iceberg.rename_column(table, "n_tok", "tc")
    extra = spark.createDataFrame(
        [("z", "web", 1, [5])],
        "doc_id string, source string, tc int, tokens array<int>")
    iceberg.append(extra, table)
    meta = iceberg._load_metadata(table)
    sids = [s.get("schema-id", 0) for s in meta["snapshots"]]
    assert sids[0] == 0 and sids[-1] == max(
        s.get("schema-id", 0) for s in meta["schemas"])


def test_decode_files_canonical_names_after_rename(spark, tmp_path):
    """decode_files emits the engine's CANONICAL role names even when
    the stored columns were renamed, so the documented
    decode_files → reassemble_segments pipeline keeps working (it
    addresses doc_id/source/seg_id by name)."""
    t = str(tmp_path / "enc")
    tok = spark.createDataFrame(
        [(f"d{i}", "unit", 5, [i, i + 1, i + 2, i + 3, i + 4])
         for i in range(12)],
        "doc_id string, source string, n_tok int, tokens array<int>")
    enc = engine.encode(tok, codec="bitpack", split_threshold=None)
    iceberg.export_encoded(enc, t)
    iceberg.rename_column(t, "doc_id", "document_id")
    iceberg.overwrite(iceberg.read_table(spark, t), t)
    dec = engine.decode_files(spark, t)
    assert dec.columns == ["doc_id", "source", "seg_id", "tokens"]
    out = engine.reassemble_segments(dec)
    assert engine.verify_roundtrip(tok, out) == 0


def test_fused_roles_resist_name_reuse_chain(spark, tmp_path):
    """A rename chain that RE-USES a role name for a different field
    (doc_id→did, then source→doc_id) must resolve by FIELD-ID lineage:
    role doc_id → physical 'did', role source → physical 'doc_id'.
    Name-first resolution silently read source values as doc ids."""
    t = str(tmp_path / "enc")
    tok = spark.createDataFrame(
        [(f"d{i}", f"src{i % 3}", 4, [i, 2 * i, 3 * i, 4 * i])
         for i in range(10)],
        "doc_id string, source string, n_tok int, tokens array<int>")
    enc = engine.encode(tok, codec="bitpack", split_threshold=None)
    iceberg.export_encoded(enc, t)
    iceberg.rename_column(t, "doc_id", "did")
    iceberg.rename_column(t, "source", "doc_id")
    iceberg.overwrite(iceberg.read_table(spark, t), t)
    cm = iceberg.fused_role_columns(t, ["doc_id", "source"])
    assert cm == {"doc_id": "did", "source": "doc_id"}
    out = engine.reassemble_segments(engine.decode_files(spark, t))
    assert engine.verify_roundtrip(tok, out) == 0
