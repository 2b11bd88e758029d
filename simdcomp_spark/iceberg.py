"""Apache Iceberg (v2 spec) table layout: export, read, append, time travel.

The north rule targets "Iceberg tables of pre-tokenized training
sequences"; this module makes that concrete WITHOUT any Iceberg runtime
dependency (none exists in this environment): it writes and reads the
public Iceberg v2 table format directly —

    table_dir/
      data/*.parquet                          (Spark-written data files)
      metadata/
        version-hint.text                     ("N" → current metadata)
        vN.metadata.json                      (table metadata, v2 spec)
        snap-<id>.avro                        (manifest LIST, Avro)
        manifest-<id>.avro                    (manifest, Avro)

Two self-contained layers:

* a minimal generic **Avro 1.11 object-container codec** (``_avro_write`` /
  ``_avro_read``) driven by the writer's JSON schema — Iceberg manifests
  and manifest lists are Avro files per the spec, with field names and
  field-ids following the spec tables.  Interop evidence (no external
  Avro/Iceberg library exists in this environment to cross-check
  against): the wire format is asserted byte-for-byte against the worked
  examples PUBLISHED IN the Avro 1.11 specification itself — zigzag
  table, the spec's record example, and a golden container file fixture
  (tests/test_iceberg.py::test_avro_wire_format_matches_spec_examples,
  ::test_avro_golden_container_bytes) — deflate-codec files built to
  the spec's framing read back equal (::test_avro_deflate_codec_reads) —
  and a CLEAN-ROOM second reader implementation
  (tests/avro_independent.py: its own varint/zigzag/union/block code,
  strict sync-marker and block-consumption checks) cross-reads every
  manifest, manifest list, and delete manifest the writer emits and
  agrees record-for-record
  (::test_avro_independent_reader_cross_reads_all_manifests).  Codecs
  beyond null/deflate (snappy, zstd) are refused loudly; a golden
  fixture from a real Iceberg runtime remains the one check this
  environment cannot produce — validate against one before relying on
  cross-runtime reads;
* the **Iceberg table protocol**: ``export_encoded`` publishes an encoded
  DataFrame as a new Iceberg table, ``append`` commits another snapshot,
  ``read_table`` loads the current (or any historic) snapshot by walking
  version-hint → metadata → manifest list → manifests → data files —
  applying v2 POSITION DELETES (``delete_where`` /
  ``write_position_deletes`` commit them, ``compact_files`` folds them
  into the dirtied data files only) — and ``snapshots`` lists the log.  Commits follow Iceberg's
  HadoopTableOperations discipline: data + manifests are written first,
  then the COMMIT POINT is an atomic no-overwrite publish of the complete
  vN.metadata.json (os.link from a tmp file — exactly one concurrent
  writer wins, the loser gets a loud conflict); version-hint.text is an
  advisory fast-path updated after, and readers probe past a stale or
  regressed hint, so a crash anywhere leaves either the previous or the
  new version current — never a half-commit, never a wedged table.

File-level stats for manifests (record_count / file_size_in_bytes) are
gathered by a DISTRIBUTED Spark job, mirroring engine._rowgroup_units —
no per-file driver I/O at any scale.

The reference engine has no table notion at all (README.md:23-24 "does
not define a compressed format"); this is the storage layer the north
rule adds on top of it.
"""

from __future__ import annotations

import io
import json
import os
import re
import struct
import time
import uuid
import zlib
from pathlib import Path

import numpy as np

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F

# ---------------------------------------------------------------------------
# Minimal Avro 1.11 object-container codec (public spec, generic datum
# reader/writer driven by the JSON schema)
# ---------------------------------------------------------------------------

_MAGIC = b"Obj\x01"


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    def __init__(self, data: bytes):
        self.b = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.b[self.pos:self.pos + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return out

    def read_long(self) -> int:
        u, shift = 0, 0
        while True:
            byte = self.b[self.pos]
            self.pos += 1
            u |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)


def _write_datum(out: bytearray, schema, datum) -> None:
    if isinstance(schema, list):                       # union
        for i, branch in enumerate(schema):
            bname = branch if isinstance(branch, str) else branch.get("type")
            if datum is None and bname == "null":
                out += _zigzag_encode(i)
                return
            if datum is not None and bname != "null":
                out += _zigzag_encode(i)
                _write_datum(out, branch, datum)
                return
        raise ValueError(f"datum {datum!r} fits no union branch {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if datum else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(datum))
    elif t == "float":
        out += struct.pack("<f", float(datum))
    elif t == "double":
        out += struct.pack("<d", float(datum))
    elif t in ("bytes", "string"):
        raw = datum.encode("utf-8") if isinstance(datum, str) else bytes(datum)
        out += _zigzag_encode(len(raw))
        out += raw
    elif t == "fixed":
        out += bytes(datum)
    elif t == "record":
        for f in schema["fields"]:
            _write_datum(out, f["type"], datum.get(f["name"]))
    elif t == "array":
        if datum:
            out += _zigzag_encode(len(datum))
            for item in datum:
                _write_datum(out, schema["items"], item)
        out += _zigzag_encode(0)
    elif t == "map":
        if datum:
            out += _zigzag_encode(len(datum))
            for k, v in datum.items():
                _write_datum(out, "string", k)
                _write_datum(out, schema["values"], v)
        out += _zigzag_encode(0)
    else:
        raise NotImplementedError(f"avro type {t!r}")


def _read_datum(r: _Reader, schema):
    if isinstance(schema, list):                       # union
        return _read_datum(r, schema[r.read_long()])
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.read_long())
    if t == "string":
        return r.read(r.read_long()).decode("utf-8")
    if t == "fixed":
        return r.read(int(schema["size"]))
    if t == "record":
        return {f["name"]: _read_datum(r, f["type"])
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:                 # block with byte-size prefix
                r.read_long()
                n = -n
            for _ in range(n):
                out.append(_read_datum(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                r.read_long()
                n = -n
            for _ in range(n):
                k = _read_datum(r, "string")
                out[k] = _read_datum(r, schema["values"])
    raise NotImplementedError(f"avro type {t!r}")


def _avro_write(path: str, schema: dict, records: list[dict],
                metadata: dict[str, bytes] | None = None) -> None:
    """Write an Avro object-container file (null codec)."""
    schema_json = json.dumps(schema).encode()
    sync = bytes((hash((schema_json, len(records))) & ((1 << 128) - 1))
                 .to_bytes(16, "little"))
    body = bytearray()
    for rec in records:
        _write_datum(body, schema, rec)
    meta = {"avro.schema": schema_json, "avro.codec": b"null"}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    out = bytearray(_MAGIC)
    _write_datum(out, {"type": "map", "values": "bytes"}, meta)
    out += sync
    if records:
        out += _zigzag_encode(len(records))
        out += _zigzag_encode(len(body))
        out += body
        out += sync
    Path(path).write_bytes(bytes(out))


def _avro_read(path: str) -> tuple[dict, list[dict]]:
    """Read an Avro object-container file (null or deflate codec).
    Returns (writer schema, records)."""
    r = _Reader(Path(path).read_bytes())
    if r.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an avro object container file")
    meta = _read_datum(r, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        # a real Iceberg writer may declare snappy/zstd; feeding those
        # blocks to the datum reader would produce garbage records, not
        # an error — refuse up front
        raise ValueError(
            f"{path}: unsupported avro codec {codec!r} (this reader "
            "handles null and deflate)")
    sync = r.read(16)
    records: list[dict] = []
    while r.pos < len(r.b):
        n = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == b"deflate":
            block = zlib.decompress(block, -15)
        br = _Reader(block)
        for _ in range(n):
            records.append(_read_datum(br, schema))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records


# ---------------------------------------------------------------------------
# Iceberg v2 schemas (field names and field-ids per the public spec tables)
# ---------------------------------------------------------------------------

def _f(name, ftype, fid, required=True):
    t = ftype if required else ["null", ftype]
    return {"name": name, "type": t, "field-id": fid,
            **({} if required else {"default": None})}


# Iceberg models int-keyed maps (bounds are map<field-id, single-value
# binary>) as Avro arrays of key/value records (spec: "Avro type: array of
# key_value records")
def _kv_map(name):
    return {"type": "array", "items": {
        "type": "record", "name": name, "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "bytes"}]}}


_DATA_FILE_SCHEMA = {
    "type": "record", "name": "r2", "fields": [
        _f("content", "int", 134),
        _f("file_path", "string", 100),
        _f("file_format", "string", 101),
        {"name": "partition", "field-id": 102,
         "type": {"type": "record", "name": "partition_data",
                  "fields": []}},                      # unpartitioned spec
        _f("record_count", "long", 103),
        _f("file_size_in_bytes", "long", 104),
        _f("lower_bounds", _kv_map("k126_v127"), 125, required=False),
        _f("upper_bounds", _kv_map("k129_v130"), 128, required=False),
        # spec field 135 (element id 136): the schema field ids an
        # EQUALITY delete file (content=2) deletes on; null for data and
        # position-delete files
        _f("equality_ids",
           {"type": "array", "items": "int", "element-id": 136},
           135, required=False),
    ]}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        _f("status", "int", 0),
        _f("snapshot_id", "long", 1, required=False),
        _f("sequence_number", "long", 3, required=False),
        _f("file_sequence_number", "long", 4, required=False),
        {"name": "data_file", "type": _DATA_FILE_SCHEMA, "field-id": 2},
    ]}

_ICEBERG_TO_AVRO = {"string": "string", "int": "int", "long": "long"}


def _manifest_entry_schema(part_fields: list[tuple]) -> dict:
    """Manifest-entry schema whose ``partition`` record carries the
    current partition spec's fields (identity transforms), per the spec's
    'the partition struct's schema is derived from the partition spec'.
    ``part_fields`` is [(name, iceberg_type, partition_field_id)]."""
    schema = json.loads(json.dumps(_MANIFEST_ENTRY_SCHEMA))
    part = next(f for f in schema["fields"][-1]["type"]["fields"]
                if f["name"] == "partition")
    part["type"]["fields"] = [
        {"name": n, "type": ["null", _ICEBERG_TO_AVRO[t]],
         "field-id": fid, "default": None}
        for n, t, fid in part_fields]
    return schema

_MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        _f("manifest_path", "string", 500),
        _f("manifest_length", "long", 501),
        _f("partition_spec_id", "int", 502),
        _f("content", "int", 517),
        _f("sequence_number", "long", 515),
        _f("min_sequence_number", "long", 516),
        _f("added_snapshot_id", "long", 503),
        _f("added_data_files_count", "int", 504),
        _f("existing_data_files_count", "int", 505),
        _f("deleted_data_files_count", "int", 506),
        _f("added_rows_count", "long", 512),
        _f("existing_rows_count", "long", 513),
        _f("deleted_rows_count", "long", 514),
    ]}

_SPARK_TO_ICEBERG = {"string": "string", "int": "int", "integer": "int",
                     "bigint": "long", "long": "long", "binary": "binary",
                     "double": "double", "float": "float",
                     "boolean": "boolean", "timestamp": "timestamptz",
                     "timestamp_ntz": "timestamp", "date": "date"}


def _iceberg_schema_of(df: DataFrame) -> dict:
    fields = []
    next_id = len(df.schema.fields)  # element-ids allocated after columns
    for i, f in enumerate(df.schema.fields):
        s = f.dataType.simpleString()
        if s.startswith("array<") and s.endswith(">"):
            elem = _SPARK_TO_ICEBERG.get(s[6:-1])
            if elem is None:
                raise NotImplementedError(
                    f"no Iceberg mapping for array element "
                    f"{s[6:-1]!r} (column {f.name!r})")
            next_id += 1
            t = {"type": "list", "element-id": next_id, "element": elem,
                 "element-required": False}
        else:
            t = _SPARK_TO_ICEBERG.get(s)
            if t is None:
                raise NotImplementedError(
                    f"no Iceberg mapping for Spark type {s!r} "
                    f"(column {f.name!r})")
        fields.append({"id": i + 1, "name": f.name,
                       "required": False, "type": t})
    return {"type": "struct", "schema-id": 0, "fields": fields}


# ---------------------------------------------------------------------------
# table protocol
# ---------------------------------------------------------------------------

def _meta_dir(table_dir: str) -> Path:
    return Path(table_dir) / "metadata"


def _sv_encode(t, v) -> bytes:
    """Iceberg single-value binary serialization (spec Appendix D):
    int = 4-byte LE, long = 8-byte LE, string = UTF-8 bytes."""
    if t == "int":
        return struct.pack("<i", int(v))
    if t == "long":
        return struct.pack("<q", int(v))
    if t == "float":
        return struct.pack("<f", float(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "string":
        return str(v).encode("utf-8")
    raise NotImplementedError(f"single-value serialization for {t!r}")


def _sv_decode(t, b: bytes):
    if t == "int":
        return struct.unpack("<i", b)[0]
    if t == "long":
        # bounds written before an int->long promote_column stay 4 bytes
        # (the spec stores the value at its WRITE-time width); decode by
        # physical width so pruning keeps working across the promotion
        return struct.unpack("<i" if len(b) == 4 else "<q", b)[0]
    if t == "float":
        return struct.unpack("<f", b)[0]
    if t == "double":
        return struct.unpack("<f" if len(b) == 4 else "<d", b)[0]
    if t == "string":
        return b.decode("utf-8")
    raise NotImplementedError(f"single-value serialization for {t!r}")


def _file_stats(spark: SparkSession, files: list[str]) -> list[tuple]:
    """(path, num_rows, file_size, col_bounds) per parquet file — footer
    reads run as a distributed Spark job (engine._rowgroup_units
    discipline: the driver only lists names; it never opens a data file).
    col_bounds is {column: [min, max]} from the parquet footer statistics
    of top-level scalar columns (nested/list columns carry no usable
    per-file bound) — the source of the manifest's lower/upper_bounds.

    A column's bound is emitted ONLY when every row group of the file has
    usable statistics for it: a partial-coverage bound would describe a
    subset of the file and pruning on it could silently drop matching
    rows."""
    from . import engine

    def fn(it):
        import json as _json

        import pyarrow.parquet as pq
        for batch in it:
            paths = batch.column(0).to_pylist()
            rows, sizes, bounds = [], [], []
            for p in paths:
                md = pq.ParquetFile(p).metadata
                rows.append(md.num_rows)
                sizes.append(os.path.getsize(p))
                mins, maxs, covered = {}, {}, {}
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        if "." in c.path_in_schema:      # nested/list
                            continue
                        st = c.statistics
                        if st is None or not st.has_min_max:
                            continue
                        name = c.path_in_schema
                        mn, mx = st.min, st.max
                        if isinstance(mn, bytes):
                            try:
                                mn, mx = mn.decode(), mx.decode()
                            except UnicodeDecodeError:
                                continue
                        # only int/string bounds are single-value
                        # serializable here; skip dates/floats/etc.
                        if not isinstance(mn, (int, str)) or \
                                isinstance(mn, bool):
                            continue
                        covered[name] = covered.get(name, 0) + 1
                        if name not in mins or mn < mins[name]:
                            mins[name] = mn
                        if name not in maxs or mx > maxs[name]:
                            maxs[name] = mx
                bounds.append(_json.dumps(
                    {k: [mins[k], maxs[k]] for k in mins
                     if k in maxs and covered[k] == md.num_row_groups}))
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(rows, type=pa.int64()),
                 pa.array(sizes, type=pa.int64()),
                 pa.array(bounds, type=pa.string())],
                names=["path", "rows", "bytes", "bounds"])

    stats = [(r["path"], int(r["rows"]), int(r["bytes"]),
              json.loads(r["bounds"]))
             for r in engine.distributed_file_map(
                 spark, files, fn,
                 "path string, rows long, bytes long, bounds string")]
    # Zero-record part-files (Spark emits one per empty write partition)
    # never become table files: a boundless 0-row manifest entry defeats
    # pruning (conservatively kept by every range scan) and bloats the
    # manifest at 10^5-file scale.  Real Iceberg writers drop them too.
    for p, rows, _, _ in stats:
        if rows == 0:
            os.remove(p)
    return [s for s in stats if s[1] > 0]


def _current_version(table_dir: str) -> int:
    """Resolve the current metadata version.

    HadoopTableOperations semantics: the atomic no-overwrite publish of
    ``vN.metadata.json`` is the COMMIT POINT; ``version-hint.text`` is an
    advisory fast-path.  A writer that crashed after publishing vN but
    before updating the hint has still committed — so readers start at the
    hint and probe upward while a complete (JSON-parseable) next version
    exists.  This also heals a regressed hint (two writers finishing out
    of order) and restores commit liveness: a later writer always computes
    version N+1, never re-collides with an already-published vN."""
    mdir = _meta_dir(table_dir)
    hint = mdir / "version-hint.text"
    if hint.is_file():
        v = int(hint.read_text().strip())
    elif (mdir / "v1.metadata.json").is_file():
        # First-commit crash window: v1.metadata.json (the commit point)
        # was published but the writer died before writing the advisory
        # hint.  The table IS committed — start the upward probe at 1
        # instead of declaring it not-a-table.
        v = 1
    else:
        raise FileNotFoundError(f"{table_dir}: not an Iceberg table "
                                "(no metadata/version-hint.text)")
    while True:
        nxt = mdir / f"v{v + 1}.metadata.json"
        if not nxt.is_file():
            return v
        try:  # legacy pre-publish-protocol tables may hold a torn vN
            json.loads(nxt.read_text())
        except (OSError, ValueError):
            return v
        v += 1



def is_iceberg_table(table_dir: str) -> bool:
    """True when ``table_dir`` holds a committed table: the hint fast-path
    OR a published v1.metadata.json (hint-less first-commit crash window —
    the metadata publish is the commit point, the hint is advisory)."""
    mdir = _meta_dir(table_dir)
    return (mdir / "version-hint.text").is_file() or \
        (mdir / "v1.metadata.json").is_file()


def _current_schema(meta: dict) -> dict:
    """The table's CURRENT schema (schema evolution appends to `schemas`
    and moves `current-schema-id`; index 0 is only the original)."""
    sid = meta.get("current-schema-id", 0)
    return next(s for s in meta["schemas"] if s.get("schema-id", 0) == sid)


def _load_metadata(table_dir: str) -> dict:
    v = _current_version(table_dir)
    meta = json.loads(
        (_meta_dir(table_dir) / f"v{v}.metadata.json").read_text())
    # remember which version this metadata was loaded AS (in-memory only,
    # stripped before write): a committing writer must publish parent+1,
    # not current+1 — re-reading the directory at commit time would let a
    # STALE writer skip past a concurrent winner and silently drop its
    # snapshot instead of failing the optimistic-concurrency check
    meta["__loaded_version"] = v
    return meta


# ---------------------------------------------------------------------------
# Partition transforms (Iceberg spec "Partition Transforms" + Appendix B
# 32-bit hash requirements): identity, bucket[N], truncate[W]
# ---------------------------------------------------------------------------

def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Murmur3 x86 32-bit over ``data`` — the hash the Iceberg spec's
    bucket transform requires (Appendix B; test-pinned to the spec's own
    vectors: hash of long 34 = 2017239379, of "iceberg" = 1210000089)."""
    c1, c2, M = 0xCC9E2D51, 0x1B873593, 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    h = seed & M
    nblk = len(data) // 4
    for i in range(nblk):
        k = int.from_bytes(data[4 * i:4 * i + 4], "little")
        k = rotl((k * c1) & M, 15) * c2 & M
        h = (rotl(h ^ k, 13) * 5 + 0xE6546B64) & M
    tail = data[4 * nblk:]
    if tail:
        k = int.from_bytes(tail, "little")
        h ^= rotl((k * c1) & M, 15) * c2 & M
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M
    return h ^ (h >> 16)


def _murmur3_32_long_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_32 over int64 values hashed as the spec's
    8-byte little-endian longs (ints hash as longs so int/long agree)."""
    x = np.ascontiguousarray(v, dtype=np.int64).view(np.uint64)
    u32 = np.uint32

    def rotl(a, r):
        return (a << u32(r)) | (a >> u32(32 - r))

    h = np.zeros(x.size, np.uint32)                      # seed 0
    for blk in (x & np.uint64(0xFFFFFFFF), x >> np.uint64(32)):
        k = blk.astype(np.uint32)
        k = rotl(k * u32(0xCC9E2D51), 15) * u32(0x1B873593)
        h = rotl(h ^ k, 13) * u32(5) + u32(0xE6546B64)
    h ^= u32(8)
    h ^= h >> u32(16)
    h *= u32(0x85EBCA6B)
    h ^= h >> u32(13)
    h *= u32(0xC2B2AE35)
    return h ^ (h >> u32(16))


def bucket_value(value, src_type: str, n: int) -> int | None:
    """``bucket[n]`` of one value: (murmur3 & Int.MAX) % n, per spec."""
    if value is None:
        return None
    if src_type in ("int", "long"):
        h = murmur3_32(int(value).to_bytes(8, "little", signed=True))
    elif src_type == "string":
        h = murmur3_32(str(value).encode("utf-8"))
    else:
        raise NotImplementedError(f"bucket over {src_type!r}")
    return (h & 0x7FFFFFFF) % n


_PARTITION_BY_RE = re.compile(
    r"^\s*(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)\s*$")
_TRANSFORM_RE = re.compile(r"^(bucket|truncate)\[(\d+)\]$")


def _parse_partition_by(partition_by: str) -> tuple[str, str, int | None]:
    """'col' → (identity, col, None); 'bucket(16, col)' → (bucket, col,
    16); 'truncate(4, col)' → (truncate, col, 4)."""
    m = _PARTITION_BY_RE.match(partition_by)
    if m is None:
        return "identity", partition_by.strip(), None
    return m.group(1), m.group(3), int(m.group(2))


def _transform_of(pf: dict) -> tuple[str, int | None]:
    """(name, param) of a spec field's transform; refuses unknown ones
    loudly (year/month/day/hour/void are not implemented here)."""
    t = pf["transform"]
    if t == "identity":
        return "identity", None
    m = _TRANSFORM_RE.match(t)
    if m is None:
        raise NotImplementedError(
            f"partition transform {t!r} (identity, bucket[N], "
            "truncate[W] supported)")
    return m.group(1), int(m.group(2))


def _transform_result_type(tname: str, src_type: str) -> str:
    return "int" if tname == "bucket" else src_type


def _transform_column(tname: str, param: int | None, src_col: str,
                      src_type: str):
    """Spark Column computing a transform of ``src_col`` — identity and
    truncate are pure JVM expressions; bucket is a vectorized
    (Arrow-batched) pandas UDF over the numpy murmur3 kernel for
    int/long, per-value for string."""
    if tname == "identity":
        return F.col(src_col)
    if tname == "truncate":
        if src_type in ("int", "long"):
            # spec: v - floorMod(v, W) — exact on negatives via pmod
            return (F.col(src_col)
                    - F.pmod(F.col(src_col), F.lit(int(param)))
                    ).cast("int" if src_type == "int" else "long")
        if src_type == "string":
            return F.substring(F.col(src_col), 1, int(param))
        raise NotImplementedError(f"truncate over {src_type!r}")
    if tname == "bucket":
        import pandas as pd_

        if src_type in ("int", "long"):
            def _b(s):
                mask = s.isna()
                vals = s.fillna(0).to_numpy(dtype="int64")
                out = ((_murmur3_32_long_vec(vals)
                        & np.uint32(0x7FFFFFFF))
                       % np.uint32(int(param))).astype("int32")
                res = pd_.Series(out, index=s.index, dtype="Int32")
                res[mask] = None
                return res
        elif src_type == "string":
            def _b(s):
                return s.map(lambda v: None if v is None else
                             bucket_value(v, "string", int(param))
                             ).astype("Int32")
        else:
            raise NotImplementedError(f"bucket over {src_type!r}")
        # real class objects, not string annotations — `from __future__
        # import annotations` strings don't resolve inside pyspark's
        # type-hint inference when pandas is imported locally
        _b.__annotations__ = {"s": pd_.Series, "return": pd_.Series}
        return F.pandas_udf(_b, "int")(F.col(src_col))
    raise NotImplementedError(tname)


def _spec_partition_exprs(spec: dict, schema: dict) -> list[tuple[str, object]]:
    """[(partition field name, Spark Column)] computing every spec
    field's transform from the table schema — the single source for the
    physical ``partitionBy`` layout in append/export AND compaction."""
    by_id = {f["id"]: f for f in schema["fields"]}
    out = []
    for pf in spec["fields"]:
        tname, param = _transform_of(pf)
        src = by_id[pf["source-id"]]
        out.append((pf["name"],
                    _transform_column(tname, param, src["name"],
                                      src["type"])))
    return out


def _part_values_of(path: str, part_cols: list[str],
                    types: dict[str, str]) -> dict:
    """Identity-partition values of a data file, parsed from its Hive-style
    ``_p_<col>=<escaped value>`` path segments (Spark URL-escapes special
    characters; nulls become __HIVE_DEFAULT_PARTITION__)."""
    from urllib.parse import unquote
    raw = {}
    for seg in Path(path).parts:
        if seg.startswith("_p_") and "=" in seg:
            k, v = seg.split("=", 1)
            raw[k[3:]] = None if v == "__HIVE_DEFAULT_PARTITION__" \
                else unquote(v)
    out = {}
    for c in part_cols:
        v = raw[c]
        out[c] = None if v is None else (
            int(v) if types[c] in ("int", "long") else v)
    return out


def _write_snapshot(spark, table_dir: str, df: DataFrame,
                    prev_meta: dict | None,
                    operation: str = "append",
                    partition_by: str | None = None,
                    extra_summary: dict[str, str] | None = None,
                    branch: str = "main") -> dict:
    """Write data files + manifest + manifest list, then COMMIT by
    atomically publishing the new metadata json (see module docstring for
    the protocol).  ``operation`` is "append" (manifest list carries
    previous manifests forward) or "overwrite" (manifest list holds ONLY
    the new manifest — previous snapshots' files become dead in the new
    snapshot but remain readable by time travel).

    ``partition_by`` (new tables only) writes an identity partition spec
    on that column: data files are physically split per value (via a
    duplicated ``_p_<col>`` path column, so the column itself STAYS in the
    data files as Iceberg requires), each manifest entry carries the
    file's partition struct, and :func:`prune_files` prunes on it from
    the spec alone — no bounds read.  Appends to a partitioned table
    inherit the table's spec automatically."""
    table_dir = str(table_dir)
    mdir = _meta_dir(table_dir)
    mdir.mkdir(parents=True, exist_ok=True)
    data_dir = Path(table_dir) / "data"
    snap_id = int(uuid.uuid4().int % (1 << 62)) + 1
    seq = (prev_meta.get("last-sequence-number", 0) + 1) if prev_meta else 1
    now_ms = time.time_ns() // 1_000_000

    table_schema = (_current_schema(prev_meta) if prev_meta
                    else _iceberg_schema_of(df))
    by_name = {f["name"]: f for f in table_schema["fields"]}

    # partition spec: inherited from the table, or new from partition_by
    if prev_meta:
        spec = prev_meta["partition-specs"][prev_meta.get(
            "default-spec-id", 0)]
        if partition_by is not None:
            raise ValueError("partition_by is set at table creation; "
                             "appends inherit the table's spec")
    elif partition_by:
        tname, src_col, param = _parse_partition_by(partition_by)
        f = by_name.get(src_col)
        if f is None or f["type"] not in _ICEBERG_TO_AVRO:
            raise ValueError(
                f"partition_by={partition_by!r}: need an existing "
                f"string/int/long column, have "
                f"{ {k: v['type'] for k, v in by_name.items()} }")
        if tname == "bucket" and f["type"] not in ("int", "long",
                                                   "string"):
            raise NotImplementedError(
                f"bucket over {f['type']!r} (int/long/string)")
        if param is not None and param <= 0:
            raise ValueError(f"{tname} parameter must be positive")
        pname = (src_col if tname == "identity"
                 else f"{src_col}_{tname}")
        tstr = "identity" if tname == "identity" else f"{tname}[{param}]"
        spec = {"spec-id": 0, "fields": [
            {"name": pname, "transform": tstr,
             "source-id": f["id"], "field-id": 1000}]}
    else:
        spec = {"spec-id": 0, "fields": []}
    by_id = {f["id"]: f for f in table_schema["fields"]}
    part_cols, part_types, part_fields = [], {}, []
    for pf in spec["fields"]:
        tname, _param = _transform_of(pf)        # loud on unknown
        rt = _transform_result_type(tname, by_id[pf["source-id"]]["type"])
        part_cols.append(pf["name"])
        part_types[pf["name"]] = rt
        part_fields.append((pf["name"], rt, pf["field-id"]))

    # 1. data files (append into a per-snapshot subdir — no clobbering).
    # Field-id stamping: new tables always (rename/drop/promote safe),
    # appends follow the table's property so a table stays uniformly
    # id-stamped or uniformly not.
    use_ids = (_uses_field_ids(prev_meta) if prev_meta
               else os.environ.get("SIMDCOMP_ICEBERG_FIELD_IDS",
                                   "1") != "0")
    if use_ids:
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        df = _stamp_field_ids(df, table_schema)
    out = str(data_dir / f"snap-{snap_id}")
    if part_cols:
        dup = df
        for name, expr in _spec_partition_exprs(spec, table_schema):
            dup = dup.withColumn(f"_p_{name}", expr)
        dup.write.mode("error").partitionBy(
            *[f"_p_{c}" for c in part_cols]).parquet(out)
        files = sorted(str(p) for p in Path(out).rglob("*.parquet"))
    else:
        df.write.mode("error").parquet(out)
        files = sorted(str(p) for p in Path(out).glob("*.parquet"))
    stats = _file_stats(spark, files)

    # 2. manifest (avro), with per-file column bounds (spec fields
    # 125/128: map<field-id, single-value binary>) from the parquet
    # footer statistics — the basis of metadata-level file pruning.
    # Identity-partition columns are carried in the partition struct
    # instead (exact value, no bounds needed).
    def _bounds_maps(col_bounds):
        lbs, ubs = [], []
        for name, (mn, mx) in sorted(col_bounds.items()):
            f = by_name.get(name)
            if f is None or not isinstance(f["type"], str) \
                    or name in part_cols:
                continue
            try:
                lbs.append({"key": f["id"],
                            "value": _sv_encode(f["type"], mn)})
                ubs.append({"key": f["id"],
                            "value": _sv_encode(f["type"], mx)})
            except NotImplementedError:
                continue
        return lbs, ubs

    entries = []
    for p, rows, size, col_bounds in stats:
        lbs, ubs = _bounds_maps(col_bounds)
        entries.append(
            {"status": 1, "snapshot_id": snap_id,
             "sequence_number": None, "file_sequence_number": None,
             "data_file": {"content": 0, "file_path": p,
                           "file_format": "PARQUET",
                           "partition": _part_values_of(p, part_cols,
                                                        part_types),
                           "record_count": rows,
                           "file_size_in_bytes": size,
                           "lower_bounds": lbs, "upper_bounds": ubs}})
    manifest_path = str(mdir / f"manifest-{snap_id}.avro")
    _avro_write(manifest_path, _manifest_entry_schema(part_fields), entries,
                metadata={"schema": json.dumps(table_schema),
                          "partition-spec": json.dumps(spec["fields"]),
                          "content": "data",
                          "format-version": "2"})
    added_rows = sum(r for _, r, _, _ in stats)

    # 3. manifest list: append carries previous manifests forward;
    # overwrite replaces the live file set with this manifest only
    mlist_path = str(mdir / f"snap-{snap_id}.avro")

    def _mk_snapshot(base_meta, seq_):
        """Build + write the manifest list and snapshot record against
        ``base_meta`` — re-runnable on a rebase retry: the data files and
        our manifest avro never change, only the carried-forward previous
        manifests and the sequence number do (snap-{snap_id}.avro is ours
        alone, so rewriting it is safe)."""
        prev_manifests = []
        if base_meta and operation == "append":
            base_sid = None
            if branch != "main":
                ref = base_meta.get("refs", {}).get(branch)
                if ref is None or ref.get("type") != "branch":
                    raise ValueError(
                        f"{table_dir}: no branch ref {branch!r} "
                        "(create_branch first)")
                # carry forward the BRANCH head's manifests — main's
                # would silently drop every earlier staged batch
                base_sid = ref["snapshot-id"]
            prev_manifests = _prev_manifest_records(base_meta, base_sid)
        mlist = prev_manifests + [_mlist_record(
            manifest_path, 0, 0, seq_, seq_, snap_id,
            len(stats), added_rows)]
        _avro_write(mlist_path, _MANIFEST_FILE_SCHEMA, mlist,
                    metadata={"format-version": "2"})
        return {"snapshot-id": snap_id, "sequence-number": seq_,
                "timestamp-ms": now_ms, "manifest-list": mlist_path,
                "schema-id": table_schema.get("schema-id", 0),
                "summary": {"operation": operation,
                            "added-data-files": str(len(stats)),
                            "added-records": str(added_rows),
                            **(extra_summary or {})}}

    snapshot = _mk_snapshot(prev_meta, seq)
    if prev_meta and operation == "append":
        # optimistic-concurrency retry, appends only: an append commits
        # new files and invalidates nothing, so losing the CAS race just
        # means REBASING — reload the winner's metadata, rebuild the
        # manifest list + sequence number against it, and re-attach.
        # Overwrite/delete/replace keep fail-loudly semantics (what they
        # computed may be invalidated by the concurrent commit).
        retries = int(os.environ.get("SIMDCOMP_COMMIT_RETRIES", "5"))
        cur_meta = prev_meta
        for attempt in range(retries + 1):
            try:
                return _attach_snapshot(table_dir, cur_meta, snapshot,
                                        branch=branch)
            except RuntimeError as e:
                if "commit conflict" not in str(e) or attempt == retries:
                    raise
            time.sleep(0.02 * (attempt + 1)
                       * (1 + (uuid.uuid4().int & 0xFF) / 256))
            cur_meta = _load_metadata(table_dir)
            # the winner may have evolved the schema out from under us
            _check_same_schema(cur_meta, df, "append")
            snapshot = _mk_snapshot(
                cur_meta, cur_meta.get("last-sequence-number", 0) + 1)
    if prev_meta:
        return _attach_snapshot(table_dir, prev_meta, snapshot,
                                branch=branch)
    else:
        # last-column-id is the HIGHEST assigned field id including list
        # element-ids (v2 spec) — excluding them invites id collisions
        # when a real engine evolves the schema
        last_id = max(
            max(f["id"], f["type"].get("element-id", 0)
                if isinstance(f["type"], dict) else 0)
            for f in table_schema["fields"])
        meta = {"format-version": 2, "table-uuid": str(uuid.uuid4()),
                "location": table_dir,
                "last-column-id": last_id,
                "current-schema-id": 0,
                "schemas": [table_schema],
                "default-spec-id": 0,
                "partition-specs": [spec],
                "last-partition-id": max(
                    [999] + [pf["field-id"] for pf in spec["fields"]]),
                "default-sort-order-id": 0,
                "sort-orders": [{"order-id": 0, "fields": []}],
                "properties": {"write.format.default": "parquet",
                               **({_FIELD_IDS_PROP: "true"}
                                  if use_ids else {})},
                "snapshots": [snapshot],
                "snapshot-log": [{"snapshot-id": snap_id,
                                  "timestamp-ms": now_ms}],
                "metadata-log": []}
        version = 1
    meta["current-snapshot-id"] = snap_id
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = now_ms
    meta["refs"] = {"main": {"snapshot-id": snap_id, "type": "branch"}}
    # 5. the commit point (see _publish_metadata)
    _publish_metadata(mdir, meta, version, snap_id)
    return meta


def _attach_snapshot(table_dir: str, prev_meta: dict, snapshot: dict,
                     branch: str = "main") -> dict:
    """Shared commit tail for every snapshot-producing operation on an
    EXISTING table (append/overwrite/delete/replace): attach ``snapshot``
    (whose manifest-list avro is already on disk) to ``prev_meta``,
    advance the target ref / sequence counters, and publish the next
    metadata version atomically (:func:`_publish_metadata`).

    ``branch`` targets a staging ref (write-audit-publish): the
    snapshot joins the log and moves ONLY that ref — ``main`` and
    ``current-snapshot-id`` stay put, so readers are unaffected until
    :func:`fast_forward` publishes.  While a staging branch is ahead,
    main-targeted commits refuse (the linear log cannot represent a
    true divergence — publish or :func:`drop_branch` first)."""
    snap_id = snapshot["snapshot-id"]
    refs = dict(prev_meta.get("refs", {}))  # tags survive every commit
    staged = [n for n, r in refs.items()
              if r.get("type") == "branch" and n != "main"]
    meta = dict(prev_meta)
    meta.pop("__loaded_version", None)
    if branch == "main":
        if staged:
            raise ValueError(
                f"{table_dir}: staging branch(es) {staged} are ahead of "
                "main — fast_forward (publish) or drop_branch first; a "
                "linear snapshot log cannot hold a divergent main commit")
        parent = prev_meta.get("current-snapshot-id")
    else:
        ref = refs.get(branch)
        if ref is None or ref.get("type") != "branch":
            raise ValueError(
                f"{table_dir}: no branch ref {branch!r} (create_branch "
                "first)")
        parent = ref["snapshot-id"]
        if prev_meta["snapshots"] and \
                prev_meta["snapshots"][-1]["snapshot-id"] != parent:
            raise ValueError(
                f"{table_dir}: branch {branch!r} head is not the log "
                "tail — concurrent commit? reload and retry")
    if parent is not None and parent != -1:
        snapshot = {**snapshot, "parent-snapshot-id": parent}
    meta["snapshots"] = prev_meta["snapshots"] + [snapshot]
    if branch == "main":
        # spec: snapshot-log records changes to the CURRENT snapshot —
        # staged branch commits don't change it (fast_forward logs the
        # publish); a spec-conformant external reader doing
        # timestamp-based time travel must never resolve to unaudited
        # staged state
        meta["snapshot-log"] = prev_meta.get("snapshot-log", []) + [
            {"snapshot-id": snap_id,
             "timestamp-ms": snapshot["timestamp-ms"]}]
    version = prev_meta.get("__loaded_version",
                            _current_version(table_dir)) + 1
    meta["last-sequence-number"] = snapshot["sequence-number"]
    meta["last-updated-ms"] = snapshot["timestamp-ms"]
    if branch == "main":
        meta["current-snapshot-id"] = snap_id
        refs["main"] = {"snapshot-id": snap_id, "type": "branch"}
    else:
        refs[branch] = {"snapshot-id": snap_id, "type": "branch"}
    meta["refs"] = refs
    _publish_metadata(_meta_dir(table_dir), meta, version, snap_id)
    return meta


def _publish_metadata(mdir: Path, meta: dict, version: int,
                      uniquifier) -> None:
    """THE COMMIT POINT: publish vN.metadata.json atomically with
    NO-OVERWRITE semantics (write complete content to a tmp file, then
    os.link — link fails with EEXIST instead of clobbering).  Two
    writers based on the same parent compute the same N; exactly one
    link succeeds, the loser fails loudly and must re-read + retry —
    and the retry CAN succeed, because _current_version probes past the
    hint and sees the winner's vN (no permanent wedge if the winner
    crashes before updating the hint).  Readers never see a torn vN:
    the file appears only with complete content.  The hint update after
    is advisory only (a crash there, or an out-of-order update by a
    slower earlier writer, is healed by the reader-side upward probe)."""
    vpath = mdir / f"v{version}.metadata.json"
    # the tmp name carries a fresh random token: a caller-supplied
    # uniquifier can be deterministic (two concurrent add_column commits
    # compute the same schema-id), and a SHARED tmp inode would let one
    # writer publish the other's content as its own (lost commit)
    vtmp = mdir / f".v{version}.{uniquifier}.{uuid.uuid4().hex[:8]}.tmp"
    vtmp.write_text(json.dumps(meta))
    try:
        os.link(vtmp, vpath)
    except FileExistsError:
        raise RuntimeError(
            f"commit conflict: {vpath.name} already exists — another "
            "writer committed concurrently; re-read the table and retry"
        ) from None
    finally:
        vtmp.unlink(missing_ok=True)
    tmp = mdir / f".version-hint.{uniquifier}.tmp"
    tmp.write_text(str(version))
    os.replace(tmp, mdir / "version-hint.text")


def export_encoded(df: DataFrame, table_dir: str,
                   partition_by: str | None = None,
                   extra_summary: dict[str, str] | None = None) -> dict:
    """Publish a DataFrame (typically engine.encode output) as a NEW
    Iceberg v2 table at ``table_dir``.  ``partition_by`` writes an
    identity partition spec on that column (e.g. ``source`` for the
    north-rule table shape); appends inherit it.  Returns the table
    metadata."""
    if is_iceberg_table(table_dir):
        raise FileExistsError(
            f"{table_dir} is already an Iceberg table — use append()")
    return _write_snapshot(df.sparkSession, table_dir, df, None,
                           partition_by=partition_by,
                           extra_summary=extra_summary)


def append(df: DataFrame, table_dir: str,
           extra_summary: dict[str, str] | None = None,
           branch: str = "main") -> dict:
    """Commit an append snapshot to an existing table (schema must match).
    Readers of the previous snapshot are unaffected (snapshot isolation);
    ``read_table(snapshot_id=...)`` time-travels to any snapshot.
    ``extra_summary`` adds application keys to the snapshot summary (the
    spec's summary map is string->string; e.g. the resumable encoder's
    shard lineage).  ``branch`` stages the append on a write-audit-
    publish ref instead of main (see :func:`create_branch`)."""
    prev = _load_metadata(table_dir)
    _check_same_schema(prev, df, "append")
    return _write_snapshot(df.sparkSession, table_dir, df, prev,
                           extra_summary=extra_summary, branch=branch)


def add_column(table_dir: str, name: str, ftype: str) -> dict:
    """Schema evolution: ADD an optional column (metadata-only commit).

    Appends a new schema (schema-id = max+1) with the column assigned the
    next field id, moves current-schema-id, and publishes through the
    same atomic no-overwrite vN protocol as data commits — concurrent
    writers conflict loudly, readers see old-or-new.  Existing data files
    are untouched: read_table projects the CURRENT schema (by field id on
    id-stamped tables, by name on legacy ones), so old files surface the
    new column as NULL (Iceberg's add-column semantics).  Scalar types
    only.  Renaming / dropping / promoting live in
    :func:`rename_column` / :func:`drop_column` / :func:`promote_column`
    — those require field-id-stamped data files (every table created
    since field-id stamping landed) and refuse on legacy name-based
    tables rather than misread."""
    if ftype not in ("string", "int", "long", "double", "float",
                     "boolean", "binary"):
        raise NotImplementedError(
            f"add_column supports scalar types, not {ftype!r}")

    def mutate(meta, cur):
        if any(f["name"] == name for f in cur["fields"]):
            raise ValueError(f"column {name!r} already exists")
        new_id = meta["last-column-id"] + 1
        meta["last-column-id"] = new_id
        return cur["fields"] + [{"id": new_id, "name": name,
                                 "required": False, "type": ftype}]
    return _evolve_schema(table_dir, "addcol", mutate,
                          require_ids=False)


def _evolve_schema(table_dir: str, op: str, mutate,
                   require_ids: bool = True) -> dict:
    """Shared metadata-only schema commit: append a new schema
    (schema-id = max+1) built by ``mutate(meta, current_schema) ->
    new_fields``, move current-schema-id, publish atomically (same vN
    no-overwrite protocol as data commits).  ``require_ids`` refuses on
    tables whose data files lack parquet field ids — every evolution
    except ADD needs field-id projection to be executed safely."""
    meta = _load_metadata(table_dir)
    version = meta.pop("__loaded_version")
    if require_ids and not _uses_field_ids(meta):
        raise NotImplementedError(
            f"{op}: table {table_dir!r} predates field-id stamping (no "
            f"{_FIELD_IDS_PROP!r} property) — its files resolve columns "
            "by NAME, so this evolution cannot be executed safely; only "
            "add_column is supported on legacy tables")
    meta = dict(meta)
    cur = _current_schema(meta)
    new_fields = mutate(meta, cur)
    new_sid = max(s.get("schema-id", 0) for s in meta["schemas"]) + 1
    meta["schemas"] = meta["schemas"] + [
        {"type": "struct", "schema-id": new_sid, "fields": new_fields}]
    meta["current-schema-id"] = new_sid
    meta["last-updated-ms"] = time.time_ns() // 1_000_000
    _publish_metadata(_meta_dir(table_dir), meta, version + 1,
                      f"{op}-{new_sid}")
    return meta


def _refuse_partition_source(meta: dict, field: dict, op: str) -> None:
    spec = meta["partition-specs"][meta.get("default-spec-id", 0)]
    if any(pf["source-id"] == field["id"] for pf in spec["fields"]):
        raise ValueError(
            f"{op}: column {field['name']!r} (field id {field['id']}) "
            "is a partition source column — evolving it would desync "
            "the partition spec from the data layout")


def rename_column(table_dir: str, old: str, new: str) -> dict:
    """Schema evolution: RENAME a column (metadata-only commit).

    The field KEEPS its id; data files are untouched — readers resolve
    the column by its parquet field id, so every file written under the
    old name serves the renamed column's data (and an equality-delete
    file keyed on the old name still applies: its key columns are also
    id-resolved).  Partition source columns refuse (the spec names the
    partition path layout after them).  The file-level fused paths
    (engine.encode_files / decode_files) address physical columns by
    name and refuse a renamed table — read_table remains the full-
    fidelity reader (see assert_fused_name_safe)."""
    def mutate(meta, cur):
        by_name = {f["name"]: f for f in cur["fields"]}
        if old not in by_name:
            raise ValueError(f"rename_column: no column {old!r} "
                             f"(have {sorted(by_name)})")
        if new in by_name:
            raise ValueError(f"rename_column: {new!r} already exists")
        _refuse_partition_source(meta, by_name[old], "rename_column")
        return [dict(f, name=new) if f["name"] == old else f
                for f in cur["fields"]]
    return _evolve_schema(table_dir, "rename", mutate)


def drop_column(table_dir: str, name: str) -> dict:
    """Schema evolution: DROP a column (metadata-only commit).

    Data files are untouched — the field id simply stops being
    requested.  Re-adding the same NAME later allocates a NEW field id
    (last-column-id never decreases), so the old physical columns stay
    invisible: dead data cannot resurrect under a recycled name.
    Refuses partition source columns and columns referenced by live
    equality-delete files (their keys could no longer be evaluated;
    compact_files folds the deletes away first)."""
    def mutate(meta, cur):
        by_name = {f["name"]: f for f in cur["fields"]}
        if name not in by_name:
            raise ValueError(f"drop_column: no column {name!r} "
                             f"(have {sorted(by_name)})")
        if len(cur["fields"]) == 1:
            raise ValueError("drop_column: cannot drop the last column")
        f = by_name[name]
        _refuse_partition_source(meta, f, "drop_column")
        for d in delete_files(table_dir):
            if f["id"] in (d.get("equality_ids") or []):
                raise ValueError(
                    f"drop_column: {name!r} (field id {f['id']}) is an "
                    "equality-delete key of a live delete file "
                    f"({d['file_path']}) — run compact_files first")
        return [g for g in cur["fields"] if g["name"] != name]
    return _evolve_schema(table_dir, "dropcol", mutate)


_PROMOTIONS = {("int", "long"), ("float", "double")}


def promote_column(table_dir: str, name: str, new_type: str) -> dict:
    """Schema evolution: PROMOTE a column's type (metadata-only commit).

    The Iceberg-spec widening promotions only — int->long and
    float->double.  Data files are untouched: Spark's vectorized parquet
    reader widens the physical int32/float32 values on read (verified by
    test), and appends after the promotion write the wide type.  Old
    manifest bounds stay 4 bytes; :func:`_sv_decode` decodes bounds by
    their physical width, so metadata pruning keeps working across the
    promotion."""
    def mutate(meta, cur):
        by_name = {f["name"]: f for f in cur["fields"]}
        if name not in by_name:
            raise ValueError(f"promote_column: no column {name!r} "
                             f"(have {sorted(by_name)})")
        f = by_name[name]
        if not isinstance(f["type"], str) \
                or (f["type"], new_type) not in _PROMOTIONS:
            raise ValueError(
                f"promote_column: {f['type']!r} -> {new_type!r} is not "
                f"an Iceberg widening promotion {sorted(_PROMOTIONS)}")
        _refuse_partition_source(meta, f, "promote_column")
        return [dict(g, type=new_type) if g["name"] == name else g
                for g in cur["fields"]]
    return _evolve_schema(table_dir, "promote", mutate)


def assert_fused_name_safe(table_dir: str,
                           snapshot_id: int | None = None,
                           preloaded: tuple[dict, list[dict]] | None = None
                           ) -> None:
    """Refuse the file-level fused paths on tables whose LIVE data files
    may carry columns under names the CURRENT schema does not mean: the
    fused Arrow readers (engine.encode_files / decode_files) address
    physical parquet columns BY NAME.  Each live file's WRITE schema is
    resolved through its snapshot's recorded schema-id; a file whose
    write schema gave a shared field id a different name or type
    (rename / promote), or used a current name for a DIFFERENT field id
    (drop + re-add), makes name-addressing unsafe — read_table
    (field-id projection) remains correct, and rewriting the files
    (overwrite, or compact_files for delete-dirtied ones) re-aligns
    them, after which this check passes again.  Pure adds always pass:
    old files simply lack the new column.  A live file whose snapshot
    was expired on an evolved table cannot prove its write schema and
    refuses conservatively.

    ``preloaded=(meta, data_entries)`` skips the metadata-tree walk —
    callers that already hold a :func:`_snapshot_entries` result (the
    fused planners, via :func:`fused_plan`) must not pay a second full
    manifest read at 10^5-10^6 files just for the guard."""
    if preloaded is not None:
        meta, data = preloaded
        if len(meta["schemas"]) == 1:
            return                      # never evolved — trivially safe
    else:
        meta = _load_metadata(table_dir)
        if len(meta["schemas"]) == 1:
            return                      # never evolved — trivially safe
        meta, data, _ = _snapshot_entries(table_dir, snapshot_id)
    cur = _current_schema(meta)
    cur_sid = cur.get("schema-id", 0)
    snap_schema = {s["snapshot-id"]: s.get("schema-id", 0)
                   for s in meta["snapshots"]}
    schema_by_id = {s.get("schema-id", 0): s for s in meta["schemas"]}
    write_sids = set()
    for e in data:
        sid = snap_schema.get(e["_snapshot_id"])
        if sid is None:
            # expired snapshot on an evolved table: write schema
            # unprovable — check against the whole history
            write_sids = set(schema_by_id) - {cur_sid}
            break
        if sid != cur_sid:
            write_sids.add(sid)
    cur_by_id = {f["id"]: f for f in cur["fields"]}
    cur_by_name = {f["name"]: f for f in cur["fields"]}
    for sid in sorted(write_sids):
        for f in schema_by_id[sid]["fields"]:
            c = cur_by_id.get(f["id"])
            if c is not None and (c["name"] != f["name"]
                                  or c["type"] != f["type"]):
                raise ValueError(
                    f"{table_dir}: live files written under schema "
                    f"{sid} carry field id {f['id']} as "
                    f"{f['name']!r}:{f['type']}, now "
                    f"{c['name']!r}:{c['type']}; the fused file-level "
                    "paths address physical columns by name — use "
                    "read_table, or rewrite the files (overwrite) to "
                    "re-align them")
            n = cur_by_name.get(f["name"])
            if n is not None and n["id"] != f["id"]:
                raise ValueError(
                    f"{table_dir}: column name {f['name']!r} was "
                    f"re-used for a different field id ({f['id']} -> "
                    f"{n['id']}, drop + re-add); physical columns under "
                    "the stale name would resurrect dead data in a "
                    "name-addressed read — use read_table, or rewrite "
                    "the files (overwrite)")


def fused_plan(table_dir: str, snapshot_id: int | None = None
               ) -> tuple[dict, list[dict], list[dict]]:
    """ONE metadata-tree walk for the fused file-level paths: returns
    ``(meta, data_entries, delete_entries)`` from a single
    :func:`_snapshot_entries` read and runs :func:`assert_fused_name_safe`
    against that same result.  The fused planners (engine.encode_files /
    decode_files) previously stacked guard + delete_files + data_files —
    three independent full manifest reads per call; at the 10^5-10^6-file
    scale this module targets, planning I/O tripled for nothing."""
    meta, data, dels = _snapshot_entries(table_dir, snapshot_id)
    assert_fused_name_safe(table_dir, snapshot_id,
                           preloaded=(meta, data))
    return meta, data, dels


def refuse_raw_scan_on_deletes(table_dir: str, dels: list[dict]) -> None:
    """Raise when a snapshot carries delete files and the caller is a raw
    file-level scan that would resurrect deleted rows.  Shared by
    :func:`data_files` and the fused planners that handle deletes
    themselves only in some modes."""
    if dels:
        npos = sum(1 for d in dels if d.get("content", 0) == 1)
        raise NotImplementedError(
            f"{table_dir}: the snapshot carries {npos} position-delete "
            f"and {len(dels) - npos} equality-delete file(s); a raw "
            "file-level scan would resurrect deleted rows. Read via "
            "iceberg.read_table (applies the deletes), or run "
            "iceberg.compact_files first for file-level consumers "
            "(fused encode/decode).")


def fused_role_columns(table_dir: str, roles: list[str],
                       meta: dict | None = None) -> dict:
    """Map the engine's canonical role-column names (``doc_id``,
    ``payload``, …) to the table's CURRENT physical names, following
    renames through field ids.  Used by the fused file-level paths after
    :func:`assert_fused_name_safe` — once that guard passes, live files
    carry the current schema's names, so resolving roles against the
    current schema is exactly what reads the right physical columns.

    Resolution per role: FIELD-ID LINEAGE, walked oldest→newest through
    schema history — the role binds to the field id its name had at the
    name's first appearance, follows that id through renames (the id
    outliving its name is exactly a rename), and rebinds to a fresh
    field of the same name only after the bound id was DROPPED
    (drop + re-add: the re-added column IS the live one).  Name match
    against the current schema must NOT win on its own: a rename chain
    like ``doc_id→did`` then ``source→doc_id`` leaves the current name
    ``doc_id`` on the SOURCE field — resolving by name there would read
    source values as doc ids with no error.  A role whose field was
    dropped (and never re-added) raises."""
    if meta is None:
        meta = _load_metadata(table_dir)
    cur = _current_schema(meta)
    cur_by_id = {f["id"]: f["name"] for f in cur["fields"]}
    history = sorted(meta["schemas"], key=lambda s: s.get("schema-id", 0))
    out = {}
    for r in roles:
        fid = None
        for s in history:
            ids = {f["id"] for f in s["fields"]}
            if fid is not None and fid in ids:
                continue            # id lives on (possibly renamed)
            hit = next((f["id"] for f in s["fields"]
                        if f["name"] == r), None)
            if hit is not None:
                fid = hit           # first binding, or re-add after drop
        if fid is None or fid not in cur_by_id:
            raise ValueError(
                f"{table_dir}: required column {r!r} is not in the "
                "current schema and no rename of it survives — not a "
                "decodable encoded table" if fid is None else
                f"{table_dir}: required column {r!r} (field id {fid}) "
                "was dropped from the schema")
        out[r] = cur_by_id[fid]
    return out


def _check_same_schema(prev_meta: dict, df: DataFrame, op: str) -> None:
    """Column NAMES AND TYPES must match the table schema — a name-only
    check would let an append commit e.g. int64 files into an int32
    table, leaving the Iceberg schema no longer describing its data."""
    def norm(fields):
        out = []
        for f in fields:
            t = f["type"]
            if isinstance(t, dict):            # list type
                t = f"list<{t['element']}>"
            out.append((f["name"], t))
        return out
    want = norm(_current_schema(prev_meta)["fields"])
    got = norm(_iceberg_schema_of(df)["fields"])
    if want != got:
        raise ValueError(
            f"schema mismatch: table has {want}, {op} has {got}")


def overwrite(df: DataFrame, table_dir: str) -> dict:
    """Commit an overwrite snapshot: the new snapshot's live file set is
    exactly ``df``'s files (schema must match).  Previous snapshots stay
    readable via time travel; their files are dead in the current
    snapshot.  This is the natural sink for dedup/filter pipelines that
    REWRITE a table (e.g. ``encoded_dedup`` output) with snapshot
    isolation — readers of the old snapshot are never disturbed."""
    prev = _load_metadata(table_dir)
    _check_same_schema(prev, df, "overwrite")
    return _write_snapshot(df.sparkSession, table_dir, df, prev,
                           operation="overwrite")


def prune_files(table_dir: str, col: str, lo=None, hi=None,
                snapshot_id: int | None = None,
                ignore_deletes: bool = False,
                preloaded: tuple[dict, list[dict]] | None = None
                ) -> list[dict]:
    """Data files whose manifest [lower, upper] bounds for ``col`` may
    overlap [lo, hi] — metadata-level file pruning, no data I/O.  Files
    lacking bounds for the column are conservatively kept.  At 100 TB
    this is the difference between scanning the table and scanning the
    few files a range predicate touches.

    ``ignore_deletes`` has :func:`data_files` semantics: pruned paths
    handed to a raw scan must not come from a delete-bearing snapshot
    (read_table prunes AND applies the deletes; it passes True here).
    ``preloaded=(meta, data_entries)`` reuses a caller's existing
    metadata-tree walk instead of re-reading it."""
    if preloaded is not None:
        meta, entries = preloaded
    else:
        meta = _load_metadata(table_dir)
        entries = data_files(table_dir, snapshot_id, ignore_deletes)
    fields = {f["name"]: f for f in _current_schema(meta)["fields"]}
    if col not in fields:
        raise KeyError(f"column {col!r} not in table schema "
                       f"({sorted(fields)})")
    fid, ftype = fields[col]["id"], fields[col]["type"]
    spec = meta["partition-specs"][meta.get("default-spec-id", 0)]
    part_field = next((pf for pf in spec["fields"]
                       if pf["source-id"] == fid), None)
    tname = param = None
    if part_field is not None:
        tname, param = _transform_of(part_field)
        bucket_eq = (bucket_value(lo, ftype, param)
                     if tname == "bucket" and lo is not None
                     and lo == hi else None)
    out = []
    for d in entries:
        if part_field is not None:
            pv = (d.get("partition") or {}).get(part_field["name"])
            if pv is not None:
                if tname == "identity":
                    # the partition struct holds the file's exact value —
                    # prune from the SPEC, no bounds read
                    if (hi is not None and pv > hi) or \
                       (lo is not None and pv < lo):
                        continue
                    out.append(d)
                    continue
                if tname == "bucket":
                    # only an EQUALITY probe prunes a hash bucket; range
                    # predicates fall through to the column bounds below
                    if bucket_eq is not None and pv != bucket_eq:
                        continue
                elif tname == "truncate":
                    # file holds values v with truncate(v) == pv:
                    # ints cover [pv, pv+W); strings have prefix pv
                    # (so v >= pv) — prune on the SOUND directions only,
                    # bounds below refine the rest
                    if ftype in ("int", "long"):
                        if (hi is not None and pv > hi) or \
                           (lo is not None and pv + param - 1 < lo):
                            continue
                    else:
                        if (hi is not None and pv > hi) or \
                           (lo is not None and len(lo) >= param
                                and pv < lo[:param]):
                            continue
        lbs = {e["key"]: e["value"] for e in (d.get("lower_bounds") or [])}
        ubs = {e["key"]: e["value"] for e in (d.get("upper_bounds") or [])}
        if fid in lbs and fid in ubs:
            fmin = _sv_decode(ftype, lbs[fid])
            fmax = _sv_decode(ftype, ubs[fid])
            if (hi is not None and fmin > hi) or \
               (lo is not None and fmax < lo):
                continue
        out.append(d)
    return out


def _snapshot_entries(table_dir: str, snapshot_id: int | None = None
                      ) -> tuple[dict, list[dict], list[dict]]:
    """Walk metadata → manifest list → manifests for a snapshot (current
    by default) and return ``(meta, data_entries, delete_entries)``.

    Each entry is the spec's ``data_file`` struct augmented with
    ``_snapshot_id`` / ``_sequence_number`` resolved per the v2
    inheritance rule (an ADDED entry with null sequence number inherits
    the manifest-list entry's; EXISTING entries carry explicit values) —
    compaction needs them to carry untouched files forward as EXISTING
    entries without rewriting a byte.  ``delete_entries`` are POSITION
    delete files (content=1) and EQUALITY delete files (content=2);
    callers split on ``content``."""
    meta = _load_metadata(table_dir)
    sid = snapshot_id or meta["current-snapshot-id"]
    if snapshot_id is None and (sid == -1 or not meta["snapshots"]):
        return meta, [], []  # empty table (all snapshots rolled back)
    snaps = [s for s in meta["snapshots"] if s["snapshot-id"] == sid]
    if not snaps:
        raise ValueError(f"snapshot {sid} not found; have "
                         f"{[s['snapshot-id'] for s in meta['snapshots']]}")
    _, manifests = _avro_read(snaps[0]["manifest-list"])
    data, dels = [], []
    for m in manifests:
        m_content = m.get("content", 0)
        _, entries = _avro_read(m["manifest_path"])
        for e in entries:
            if e["status"] == 2:                     # 2 = DELETED entry
                continue
            d = dict(e["data_file"])
            d["_snapshot_id"] = (e.get("snapshot_id")
                                 if e.get("snapshot_id") is not None
                                 else m["added_snapshot_id"])
            d["_sequence_number"] = (
                e.get("sequence_number")
                if e.get("sequence_number") is not None
                else m["sequence_number"])
            content = d.get("content", 0)
            # spec: a manifest's content must agree with its entries (a
            # DELETE manifest holds position=1 OR equality=2 files); a
            # mismatch means a corrupt/hand-edited metadata tree, and
            # guessing either way silently loses or resurrects rows
            if (content == 0) != (m_content == 0):
                kind = ("data file entry in a DELETE manifest"
                        if m_content == 1 else
                        "delete file entry in a DATA manifest")
                raise ValueError(
                    f"{table_dir}: corrupt manifest "
                    f"{m['manifest_path']}: {kind} "
                    f"({d['file_path']}, content={content})")
            (data if content == 0 else dels).append(d)
    return meta, data, dels


def data_files(table_dir: str, snapshot_id: int | None = None,
               ignore_deletes: bool = False) -> list[dict]:
    """Live data files of a snapshot (current by default) by walking
    metadata → manifest list → manifests, per the spec.

    If the snapshot carries DELETE files (position or equality) this
    raises unless ``ignore_deletes=True``: callers that hand the returned
    paths straight to a parquet scan (the fused encode/decode paths)
    would silently resurrect deleted rows.  Row-aware readers go through
    :func:`read_table` (which applies the deletes) or
    :func:`compact_files` (which rewrites them away)."""
    _, data, dels = _snapshot_entries(table_dir, snapshot_id)
    if not ignore_deletes:
        refuse_raw_scan_on_deletes(table_dir, dels)
    return data


def delete_files(table_dir: str, snapshot_id: int | None = None
                 ) -> list[dict]:
    """Live DELETE files of a snapshot (empty when none): position
    deletes carry ``content=1``, equality deletes ``content=2`` plus
    ``equality_ids`` (the schema field ids they delete on) and
    ``_sequence_number`` (they apply only to data files with a STRICTLY
    SMALLER data sequence number, per the v2 spec)."""
    return _snapshot_entries(table_dir, snapshot_id)[2]


_BROADCAST_DELETE_BYTES = 64 << 20


def _apply_position_deletes(spark: SparkSession, df: DataFrame,
                            dels: list[dict]) -> DataFrame:
    """Anti-join ``df`` (must carry ``_file``/``_pos``) against the
    snapshot's position-delete files.  A delete set under 64 MB — the
    overwhelmingly common case; deletes are (path, pos) pairs, not rows —
    is broadcast, so the scan stays shuffle-free; larger sets fall back
    to a shuffled anti-join (AQE plans it)."""
    pos = spark.read.schema("file_path string, pos bigint").parquet(
        *[d["file_path"] for d in dels])
    if sum(int(d.get("file_size_in_bytes") or 0)
           for d in dels) < _BROADCAST_DELETE_BYTES:
        pos = F.broadcast(pos)
    cond = (df["_file"] == pos["file_path"]) & (df["_pos"] == pos["pos"])
    return df.join(pos, cond, "left_anti")


def _eq_delete_groups(meta: dict, eq_dels: list[dict]
                      ) -> dict[tuple, list[dict]]:
    """Group equality-delete files by their key-column NAME tuple
    (resolving ``equality_ids`` against the current schema); raises on
    ids the schema does not know (deleting on a since-dropped column
    cannot be evaluated)."""
    by_id = {f["id"]: f["name"] for f in _current_schema(meta)["fields"]}
    groups: dict[tuple, list[dict]] = {}
    for d in eq_dels:
        ids = list(d.get("equality_ids") or [])
        if not ids:
            raise ValueError(
                f"{d['file_path']}: equality delete file (content=2) "
                "without equality_ids")
        missing = [i for i in ids if i not in by_id]
        if missing:
            raise ValueError(
                f"{d['file_path']}: equality_ids {missing} not in the "
                "current schema")
        groups.setdefault(tuple(by_id[i] for i in ids), []).append(d)
    return groups


def _apply_equality_deletes(spark: SparkSession, df: DataFrame,
                            eq_dels: list[dict], meta: dict) -> DataFrame:
    """Anti-join ``df`` (must carry ``_seq``, its data file's sequence
    number) against the snapshot's equality-delete files.  Spec
    semantics: a delete row removes every data row whose key columns are
    null-safe-equal AND whose data sequence number is STRICTLY LESS than
    the delete file's — rows (re-)appended after the delete survive.
    Small delete sets broadcast; larger ones shuffle on the key."""
    fields = {f["name"]: f for f in _current_schema(meta)["fields"]}
    for cols, ds in _eq_delete_groups(meta, eq_dels).items():
        if _uses_field_ids(meta):
            # key columns resolve BY FIELD ID (current names requested):
            # a delete file written before a rename still applies
            spark.conf.set("spark.sql.parquet.fieldId.read.enabled",
                           "true")
            reader = spark.read.schema(_spark_struct_with_ids(
                {"fields": [fields[c] for c in cols]}))
        else:
            reader = spark.read
        keys = None
        for d in ds:
            k = (reader.parquet(d["file_path"]).select(*cols)
                 .withColumn("_del_seq",
                             F.lit(int(d["_sequence_number"]))))
            keys = k if keys is None else keys.unionByName(k)
        if sum(int(d.get("file_size_in_bytes") or 0)
               for d in ds) < _BROADCAST_DELETE_BYTES:
            keys = F.broadcast(keys)
        cond = keys["_del_seq"] > df["_seq"]
        for c in cols:
            cond = cond & df[c].eqNullSafe(keys[c])
        df = df.join(keys, cond, "left_anti")
    return df


def _eq_dirty_files(meta: dict, data: list[dict], eq_dels: list[dict]
                    ) -> set[str]:
    """Conservative dirty set for equality deletes (compaction planning):
    every data file with a STRICTLY smaller sequence number whose
    key-column bounds intersect the delete file's.  Missing bounds on
    either side → assumed dirty (a rewrite of a clean file is wasted
    work, a skipped dirty file resurrects rows)."""
    fields = {f["name"]: f for f in _current_schema(meta)["fields"]}
    dirty: set[str] = set()
    for cols, ds in _eq_delete_groups(meta, eq_dels).items():
        for d in ds:
            dseq = int(d["_sequence_number"])
            dlb = {e["key"]: e["value"]
                   for e in (d.get("lower_bounds") or [])}
            dub = {e["key"]: e["value"]
                   for e in (d.get("upper_bounds") or [])}
            for e in data:
                if e["file_path"] in dirty:
                    continue
                if int(e.get("_sequence_number") or 0) >= dseq:
                    continue
                elb = {b["key"]: b["value"]
                       for b in (e.get("lower_bounds") or [])}
                eub = {b["key"]: b["value"]
                       for b in (e.get("upper_bounds") or [])}
                hit = True
                for c in cols:
                    f = fields[c]
                    fid, t = f["id"], f["type"]
                    if not isinstance(t, str):
                        continue
                    if all(fid in m for m in (dlb, dub, elb, eub)):
                        if (_sv_decode(t, eub[fid])
                                < _sv_decode(t, dlb[fid])
                                or _sv_decode(t, elb[fid])
                                > _sv_decode(t, dub[fid])):
                            hit = False
                            break
                if hit:
                    dirty.add(e["file_path"])
    return dirty


def _read_with_pos(spark: SparkSession, table_dir: str,
                   entries: list[dict], dels: list[dict],
                   meta: dict | None = None) -> DataFrame:
    """Scan the data files in ``entries`` under the table's CURRENT
    schema with two extra columns — ``_file`` (normalized data-file
    path) and ``_pos`` (row ordinal within its file, Spark's
    ``_metadata.row_index``) — and the snapshot's position AND equality
    deletes applied.  (file, pos) is exactly the coordinate system v2
    position-delete files speak; equality deletes additionally need each
    row's data sequence number (``entries`` carry it), attached via a
    broadcast (file → seq) map so the scan stays shuffle-free."""
    paths = [e["file_path"] for e in entries]
    if meta is None:
        meta = _load_metadata(table_dir)
    df = (_schema_reader(spark, meta).parquet(*paths)
          .withColumn("_file", F.regexp_replace(
              F.col("_metadata.file_path"), "^file:/+", "/"))
          .withColumn("_pos", F.col("_metadata.row_index")))
    pos_dels = [d for d in dels if d.get("content", 0) == 1]
    eq_dels = [d for d in dels if d.get("content", 0) == 2]
    if pos_dels:
        df = _apply_position_deletes(spark, df, pos_dels)
    if eq_dels:
        seqs = spark.createDataFrame(
            [(e["file_path"], int(e.get("_sequence_number") or 0))
             for e in entries], "_file string, _seq bigint")
        df = (_apply_equality_deletes(
                  spark, df.join(F.broadcast(seqs), "_file", "left"),
                  eq_dels, meta)
              .drop("_seq"))
    return df


def read_table_with_pos(spark: SparkSession, table_dir: str,
                        snapshot_id: int | None = None) -> DataFrame:
    """:func:`read_table` plus the ``_file``/``_pos`` row coordinates —
    the input every position-delete WRITER needs (``delete_where``,
    ``engine.dedup_delete_iceberg``): select the rows to drop, emit
    their (_file, _pos) pairs, commit via
    :func:`write_position_deletes`.  Existing deletes are applied, so
    already-deleted rows can never be selected again."""
    meta, data, dels = _snapshot_entries(table_dir, snapshot_id)
    if not data:
        return spark.createDataFrame(
            [], _spark_ddl(table_dir) + ", _file string, _pos bigint")
    return _read_with_pos(spark, table_dir, data, dels, meta)


def read_table(spark: SparkSession, table_dir: str,
               snapshot_id: int | None = None,
               between: tuple | None = None,
               ref: str | None = None) -> DataFrame:
    """Load an Iceberg table's current (or a historic) snapshot as a
    DataFrame.  File pruning happens at the metadata layer — only the
    snapshot's live files are handed to the parquet scan.  ``between =
    (col, lo, hi)`` additionally prunes files via the manifest column
    bounds (:func:`prune_files`) and applies the exact row filter on
    top (the pruning is a superset guarantee, the filter the truth).
    DELETE files in the snapshot are applied — position deletes by
    anti-join on the (file, row-ordinal) coordinates, equality deletes
    by null-safe key anti-join under the sequence-number rule; both
    broadcast when small.  ``ref`` reads the snapshot a named tag (or
    ``"main"``) points at — mutually exclusive with ``snapshot_id``."""
    if ref is not None:
        if snapshot_id is not None:
            raise ValueError("pass ref OR snapshot_id, not both")
        snapshot_id = resolve_ref(table_dir, ref)
    meta, data, dels = _snapshot_entries(table_dir, snapshot_id)
    if between is not None:
        col, lo, hi = between
        # reuse THIS walk's entries — a second data_files walk would
        # re-open every manifest avro
        files = prune_files(table_dir, col, lo, hi, snapshot_id,
                            ignore_deletes=True,
                            preloaded=(meta, data))
    else:
        files = data
    paths = [d["file_path"] for d in files]
    if not paths:
        return spark.createDataFrame([], _spark_ddl(table_dir))
    if dels:
        df = _read_with_pos(spark, table_dir, files, dels, meta) \
            .drop("_file", "_pos")
    else:
        # explicit CURRENT schema: files written before an add_column
        # lack the new column and must surface it as NULL; id-stamped
        # tables additionally resolve renamed/promoted columns by
        # field id (see _schema_reader)
        df = _schema_reader(spark, meta).parquet(*paths)
    if between is not None:
        col, lo, hi = between
        if lo is not None:
            df = df.where(df[col] >= lo)
        if hi is not None:
            df = df.where(df[col] <= hi)
    return df


_ICEBERG_TO_SPARK_DDL = {
    "string": "string", "int": "int", "long": "bigint",
    "binary": "binary", "double": "double", "float": "float",
    "boolean": "boolean", "timestamptz": "timestamp",
    "timestamp": "timestamp_ntz", "date": "date"}


def _ddl_type(t) -> str:
    if isinstance(t, dict) and t.get("type") == "list":
        return (f"array<"
                f"{_ICEBERG_TO_SPARK_DDL.get(t['element'], t['element'])}>")
    return _ICEBERG_TO_SPARK_DDL.get(t, t)


def _ddl_of_schema(schema: dict) -> str:
    return ", ".join(f"{f['name']} {_ddl_type(f['type'])}"
                     for f in schema["fields"])


def _spark_ddl(table_dir: str) -> str:
    return _ddl_of_schema(_current_schema(_load_metadata(table_dir)))


# ---------------------------------------------------------------------------
# field-id projection (schema evolution support)
#
# New tables stamp the Iceberg field id of every column into the parquet
# footers (parquet's standard field_id slot, via Spark's
# ``parquet.field.id`` StructField metadata + the native
# ``spark.sql.parquet.fieldId.write.enabled`` writer path), and readers
# resolve columns BY ID instead of by name
# (``spark.sql.parquet.fieldId.read.enabled``).  That is what makes
# rename/drop/promote safe: a renamed column still resolves to the same
# physical data, a dropped-then-re-added name gets a NEW id so old
# physical columns with the stale name surface NULL instead of
# resurrecting dead data, and int->long promotion widens on read.
# Tables created before this capability (no ``schema.field-ids-in-files``
# property) keep the name-based read path and REFUSE rename/drop/promote
# — a name-based reader cannot execute them safely.
# ---------------------------------------------------------------------------

_FIELD_IDS_PROP = "schema.field-ids-in-files"


def _uses_field_ids(meta: dict) -> bool:
    return meta.get("properties", {}).get(_FIELD_IDS_PROP) == "true"


def _spark_struct_with_ids(schema: dict):
    """The current schema as a StructType whose every field carries
    ``parquet.field.id`` metadata — the request shape that flips Spark's
    parquet reader into field-id (not name) column resolution."""
    from pyspark.sql import types as T
    scalar = {"string": T.StringType(), "int": T.IntegerType(),
              "long": T.LongType(), "binary": T.BinaryType(),
              "double": T.DoubleType(), "float": T.FloatType(),
              "boolean": T.BooleanType(), "date": T.DateType(),
              "timestamptz": T.TimestampType(),
              "timestamp": T.TimestampNTZType()}

    def one(t):
        if isinstance(t, dict) and t.get("type") == "list":
            return T.ArrayType(scalar[t["element"]])
        return scalar[t]

    return T.StructType([
        T.StructField(f["name"], one(f["type"]), True,
                      {"parquet.field.id": f["id"]})
        for f in schema["fields"]])


def _stamp_field_ids(df: DataFrame, schema: dict) -> DataFrame:
    """Alias each column with its Iceberg field id so Spark's parquet
    writer stamps the id into the footer (write.enabled is on by
    default; we re-assert it at the write sites).  Columns not in the
    table schema (e.g. the duplicated ``_p_<col>`` partition-path
    columns) pass through untouched."""
    by_name = {f["name"]: f["id"] for f in schema["fields"]}
    return df.select(*[
        F.col(c).alias(c, metadata={"parquet.field.id": by_name[c]})
        if c in by_name else F.col(c)
        for c in df.columns])


def _schema_reader(spark: SparkSession, meta: dict):
    """A DataFrameReader projecting the table's CURRENT schema — by
    field id when the table stamps ids (rename/drop/promote safe), by
    name otherwise (legacy tables; evolution beyond add_column refuses
    there)."""
    if _uses_field_ids(meta):
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        return spark.read.schema(
            _spark_struct_with_ids(_current_schema(meta)))
    return spark.read.schema(_ddl_of_schema(_current_schema(meta)))


def snapshots(table_dir: str) -> list[dict]:
    """The snapshot log: (snapshot-id, sequence-number, timestamp-ms,
    operation, added rows) per commit."""
    meta = _load_metadata(table_dir)
    return [{"snapshot-id": s["snapshot-id"],
             "sequence-number": s.get("sequence-number"),
             "timestamp-ms": s["timestamp-ms"],
             "operation": s.get("summary", {}).get("operation"),
             "added-records": s.get("summary", {}).get("added-records"),
             "is-current": s["snapshot-id"] == meta["current-snapshot-id"]}
            for s in meta["snapshots"]]


def incremental_files(table_dir: str, from_snapshot_id: int,
                      to_snapshot_id: int | None = None,
                      preloaded: tuple[dict, list[dict]] | None = None
                      ) -> list[dict]:
    """Data files ADDED by the snapshots strictly after
    ``from_snapshot_id`` up to and including ``to_snapshot_id`` (default:
    current) — the incremental-consumption unit of a recurring pipeline:
    each run processes only what landed since its last run's snapshot
    cursor, a metadata-only plan at any table size.

    Safe only over APPEND history: if any snapshot in the range is an
    overwrite/delete/replace, "files added" is no longer the logical
    table diff (rows were removed or rewritten), so this raises and the
    caller must fall back to a full read (or re-seed its cursor).
    Deletes committed BEFORE the cursor never affect the result: the v2
    sequence rule means they only apply to data files with a smaller
    sequence number, and every in-range file's sequence is larger.  An
    expired or unknown ``from_snapshot_id`` raises (stale cursor —
    ``expire_snapshots`` outran the consumer).

    ``preloaded=(meta, data_entries)`` reuses a caller's existing
    :func:`_snapshot_entries` result resolved AT ``to_snapshot_id`` —
    no second manifest-tree walk (the tables this targets are exactly
    the long-manifest-chain ones where each walk is expensive)."""
    meta = preloaded[0] if preloaded is not None \
        else _load_metadata(table_dir)
    order = {s["snapshot-id"]: i for i, s in enumerate(meta["snapshots"])}
    if from_snapshot_id not in order:
        raise ValueError(
            f"{table_dir}: cursor snapshot {from_snapshot_id} is not in "
            "the table history (expired or never existed) — re-seed the "
            "incremental cursor from a full read")
    to_id = (to_snapshot_id if to_snapshot_id is not None
             else meta["current-snapshot-id"])
    if to_id not in order:
        raise ValueError(f"{table_dir}: snapshot {to_id} not found")
    i0, i1 = order[from_snapshot_id], order[to_id]
    if i1 < i0:
        raise ValueError(
            f"{table_dir}: to_snapshot {to_id} precedes from_snapshot "
            f"{from_snapshot_id}")
    # tag-pinned expiry can leave GAPS in the retained log (a pinned old
    # snapshot survives while untagged ones between it and the head are
    # expired); every adjacent pair in the range must be parent-linked
    # (spec parent-snapshot-id; consecutive-sequence fallback for
    # legacy snapshots), else this walk would silently skip the expired
    # snapshots' files — refuse like a stale cursor
    span = meta["snapshots"][i0:i1 + 1]
    for a, b in zip(span, span[1:]):
        if not _is_parent(a, b):
            raise ValueError(
                f"{table_dir}: snapshots between "
                f"{a['snapshot-id']} and {b['snapshot-id']} were "
                "expired (tag-gapped history) — the incremental range "
                "is incomplete; re-seed the cursor from a full read")
    rng = meta["snapshots"][i0 + 1:i1 + 1]
    # a manifest rewrite (operation=replace + rewrite-manifests marker)
    # adds no files and preserves every entry's original snapshot id —
    # benign inside an incremental range
    non_append = [(s["snapshot-id"],
                   s.get("summary", {}).get("operation"))
                  for s in rng
                  if s.get("summary", {}).get("operation") != "append"
                  and s.get("summary", {}).get("rewrite-manifests")
                  != "true"]
    if non_append:
        raise ValueError(
            f"{table_dir}: snapshot range contains non-append commits "
            f"{non_append}; added-files is not the logical diff across "
            "overwrite/delete/replace — full read required")
    if not rng:
        return []
    want = {s["snapshot-id"] for s in rng}
    if preloaded is not None:
        data = preloaded[1]
    else:
        _, data, _ = _snapshot_entries(table_dir, to_id)
    return [d for d in data if d["_snapshot_id"] in want]


# ---------------------------------------------------------------------------
# v2 row-level deletes: position-delete files (write + apply + compact)
# ---------------------------------------------------------------------------

# the spec's reserved field ids for position-delete file columns
_FP_FID, _POS_FID = 2147483546, 2147483545
_DELETE_ROWS_PER_FILE = 2_000_000


def _spec_part_fields(meta: dict) -> tuple[dict, list[tuple]]:
    """(partition spec, [(name, iceberg_type, partition_field_id)]) of the
    table's default spec — the manifest-entry partition-struct schema."""
    spec = meta["partition-specs"][meta.get("default-spec-id", 0)]
    by_id = {f["id"]: f for f in _current_schema(meta)["fields"]}
    return spec, [
        (pf["name"],
         _transform_result_type(_transform_of(pf)[0],
                                by_id[pf["source-id"]]["type"]),
         pf["field-id"]) for pf in spec["fields"]]


def _mlist_record(manifest_path: str, spec_id: int, content: int,
                  seq: int, min_seq: int, snap_id: int,
                  added_files: int, added_rows: int,
                  existing_files: int = 0, existing_rows: int = 0
                  ) -> dict:
    """One manifest-list entry (spec `manifest_file` struct) — the single
    source of its 14-field shape for every snapshot-producing writer
    (append/overwrite, both delete writers, compaction, manifest
    rewrite); a spec-field addition lands here once."""
    return {"manifest_path": manifest_path,
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": spec_id, "content": content,
            "sequence_number": seq, "min_sequence_number": min_seq,
            "added_snapshot_id": snap_id,
            "added_data_files_count": added_files,
            "existing_data_files_count": existing_files,
            "deleted_data_files_count": 0,
            "added_rows_count": added_rows,
            "existing_rows_count": existing_rows,
            "deleted_rows_count": 0}


def _prev_manifest_records(prev_meta: dict,
                           base_snapshot_id: int | None = None
                           ) -> list[dict]:
    """A snapshot's manifest-list records (data AND delete manifests),
    for carry-forward commits.  Default base = the current snapshot;
    branch-targeted appends pass the BRANCH head — carrying forward
    main's manifests instead would silently drop every earlier staged
    batch from the published table."""
    sid = (base_snapshot_id if base_snapshot_id is not None
           else prev_meta["current-snapshot-id"])
    cur = [s for s in prev_meta["snapshots"] if s["snapshot-id"] == sid]
    if not cur:
        return []
    _, records = _avro_read(cur[0]["manifest-list"])
    return records


def write_position_deletes(spark: SparkSession, table_dir: str,
                           pos_df: DataFrame,
                           extra_summary: dict[str, str] | None = None
                           ) -> dict | None:
    """Commit a DELETE snapshot from a DataFrame of row coordinates
    ``(file_path string, pos long)`` — the v2 position-delete format
    (spec: 'a position delete file identifies deleted rows by file path
    and row ordinal').  No data file is touched: the coordinates are
    written as parquet delete files (sorted by (file_path, pos) as the
    spec requires, ~2M coordinates per file), recorded in a delete
    manifest (content=1), and the manifest list carries every previous
    manifest forward.  At 100 TB this is the only sane shape for
    sub-percent row removal — dedup losers, takedowns, PII scrubs —
    because the alternative rewrites every dirtied data file for rows
    that are 16 bytes of coordinates each.

    Readers: :func:`read_table` applies the deletes; raw file-level
    consumers are refused by :func:`data_files` until
    :func:`compact_files` rewrites the dirtied files.  Returns the new
    table metadata, or None (no commit) when ``pos_df`` is empty."""
    prev_meta = _load_metadata(table_dir)
    spec, part_fields = _spec_part_fields(prev_meta)
    # the coordinate lineage is often the expensive part (delete_where /
    # dedup scan the whole table): persist so count + write run it once
    pos_df = pos_df.persist()
    n_pos = pos_df.count()
    if n_pos == 0:
        pos_df.unpersist()
        return None
    snap_id = int(uuid.uuid4().int % (1 << 62)) + 1
    seq = prev_meta.get("last-sequence-number", 0) + 1
    now_ms = time.time_ns() // 1_000_000
    out = str(Path(table_dir) / "data" / f"snap-{snap_id}")
    nfiles = (n_pos + _DELETE_ROWS_PER_FILE - 1) // _DELETE_ROWS_PER_FILE
    # the spec's RESERVED field ids for position-delete columns are
    # stamped into the footers on id-stamped tables (readers here match
    # these constant names either way)
    fp_meta = ({"parquet.field.id": _FP_FID}
               if _uses_field_ids(prev_meta) else None)
    pos_meta = ({"parquet.field.id": _POS_FID}
                if _uses_field_ids(prev_meta) else None)
    (pos_df.select(F.col("file_path").cast("string")
                   .alias("file_path", metadata=fp_meta),
                   F.col("pos").cast("long")
                   .alias("pos", metadata=pos_meta))
     .repartitionByRange(nfiles, "file_path", "pos")
     .sortWithinPartitions("file_path", "pos")
     .write.mode("error").parquet(out))
    pos_df.unpersist()
    files = sorted(str(p) for p in Path(out).glob("*.parquet"))
    stats = _file_stats(spark, files)

    entries = []
    for p, rows, size, col_bounds in stats:
        lbs, ubs = [], []
        # file_path/pos bounds under the spec's RESERVED field ids let a
        # reader skip delete files irrelevant to the data file it scans
        for name, fid, t in (("file_path", _FP_FID, "string"),
                             ("pos", _POS_FID, "long")):
            if name in col_bounds:
                mn, mx = col_bounds[name]
                lbs.append({"key": fid, "value": _sv_encode(t, mn)})
                ubs.append({"key": fid, "value": _sv_encode(t, mx)})
        entries.append(
            {"status": 1, "snapshot_id": snap_id,
             "sequence_number": None, "file_sequence_number": None,
             "data_file": {"content": 1, "file_path": p,
                           "file_format": "PARQUET",
                           "partition": {n: None for n, _, _ in
                                         part_fields},
                           "record_count": rows,
                           "file_size_in_bytes": size,
                           "lower_bounds": lbs, "upper_bounds": ubs}})
    mdir = _meta_dir(table_dir)
    manifest_path = str(mdir / f"manifest-del-{snap_id}.avro")
    _avro_write(manifest_path, _manifest_entry_schema(part_fields), entries,
                metadata={"schema": json.dumps(_current_schema(prev_meta)),
                          "partition-spec": json.dumps(spec["fields"]),
                          "content": "deletes",
                          "format-version": "2"})
    mlist = _prev_manifest_records(prev_meta) + [_mlist_record(
        manifest_path, spec["spec-id"], 1, seq, seq, snap_id,
        len(stats), n_pos)]
    mlist_path = str(mdir / f"snap-{snap_id}.avro")
    _avro_write(mlist_path, _MANIFEST_FILE_SCHEMA, mlist,
                metadata={"format-version": "2"})
    snapshot = {"snapshot-id": snap_id, "sequence-number": seq,
                "timestamp-ms": now_ms, "manifest-list": mlist_path,
                "schema-id": _current_schema(prev_meta).get("schema-id",
                                                            0),
                "summary": {"operation": "delete",
                            "added-position-delete-files": str(len(stats)),
                            "added-position-deletes": str(n_pos),
                            **(extra_summary or {})}}
    return _attach_snapshot(table_dir, prev_meta, snapshot)


def delete_where(spark: SparkSession, table_dir: str, predicate
                 ) -> dict | None:
    """Row-level DELETE by predicate (a SQL string or a Column) committed
    as position-delete files — no data-file rewrite.  Rows already
    deleted by earlier snapshots are never re-matched (the scan applies
    them).  Returns the new metadata, or None when nothing matched."""
    df = read_table_with_pos(spark, table_dir)
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    pos = df.where(cond).select(F.col("_file").alias("file_path"),
                                F.col("_pos").alias("pos"))
    return write_position_deletes(
        spark, table_dir, pos,
        extra_summary={"delete-predicate": str(predicate)})


def write_equality_deletes(spark: SparkSession, table_dir: str,
                           keys_df: DataFrame,
                           extra_summary: dict[str, str] | None = None
                           ) -> dict | None:
    """Commit a DELETE snapshot from a DataFrame of KEY VALUES — the v2
    equality-delete format (content=2): a delete row removes every data
    row whose values in the key columns are null-safe-equal, in data
    files with a STRICTLY smaller sequence number (spec: 'equality
    delete files are applied to data files from older sequence
    numbers'), so rows (re-)appended later survive.  The key columns are
    ``keys_df``'s columns, recorded as schema field ids in the manifest's
    ``equality_ids``; unlike position deletes no row coordinate is
    needed — the writer never has to read the table, which is what CDC /
    takedown-by-id pipelines want at 100 TB.  Key-column bounds are
    stamped on the delete file so compaction can skip data files whose
    bounds cannot intersect.  Returns the new table metadata, or None
    (no commit) when ``keys_df`` is empty."""
    prev_meta = _load_metadata(table_dir)
    spec, part_fields = _spec_part_fields(prev_meta)
    fields = {f["name"]: f for f in _current_schema(prev_meta)["fields"]}
    cols = list(keys_df.columns)
    unknown = [c for c in cols if c not in fields]
    if not cols or unknown:
        raise ValueError(
            f"equality-delete key columns {unknown or cols} not in the "
            f"table schema {sorted(fields)}")
    eq_ids = [fields[c]["id"] for c in cols]
    # persist the deduplicated keys: count + write otherwise run the
    # distinct (a shuffle over the caller's whole lineage) twice
    keys_df = keys_cached = keys_df.distinct().persist()
    n_keys = keys_df.count()
    if n_keys == 0:
        keys_cached.unpersist()
        return None
    snap_id = int(uuid.uuid4().int % (1 << 62)) + 1
    seq = prev_meta.get("last-sequence-number", 0) + 1
    now_ms = time.time_ns() // 1_000_000
    out = str(Path(table_dir) / "data" / f"snap-{snap_id}")
    nfiles = (n_keys + _DELETE_ROWS_PER_FILE - 1) // _DELETE_ROWS_PER_FILE
    if _uses_field_ids(prev_meta):
        # key columns carry their table field ids so the read side can
        # resolve them by id even after a later rename
        keys_df = _stamp_field_ids(
            keys_df, {"fields": [fields[c] for c in cols]})
    (keys_df.repartitionByRange(nfiles, *cols)
     .sortWithinPartitions(*cols)
     .write.mode("error").parquet(out))
    keys_cached.unpersist()
    files = sorted(str(p) for p in Path(out).glob("*.parquet"))
    stats = _file_stats(spark, files)

    entries = []
    for p, rows, size, col_bounds in stats:
        lbs, ubs = [], []
        for c in cols:
            if c not in col_bounds:
                continue
            f = fields[c]
            if not isinstance(f["type"], str):
                continue
            mn, mx = col_bounds[c]
            try:
                lbs.append({"key": f["id"],
                            "value": _sv_encode(f["type"], mn)})
                ubs.append({"key": f["id"],
                            "value": _sv_encode(f["type"], mx)})
            except NotImplementedError:
                continue
        entries.append(
            {"status": 1, "snapshot_id": snap_id,
             "sequence_number": None, "file_sequence_number": None,
             "data_file": {"content": 2, "file_path": p,
                           "file_format": "PARQUET",
                           "partition": {n: None for n, _, _ in
                                         part_fields},
                           "record_count": rows,
                           "file_size_in_bytes": size,
                           "lower_bounds": lbs, "upper_bounds": ubs,
                           "equality_ids": eq_ids}})
    mdir = _meta_dir(table_dir)
    manifest_path = str(mdir / f"manifest-eqdel-{snap_id}.avro")
    _avro_write(manifest_path, _manifest_entry_schema(part_fields), entries,
                metadata={"schema": json.dumps(_current_schema(prev_meta)),
                          "partition-spec": json.dumps(spec["fields"]),
                          "content": "deletes",
                          "format-version": "2"})
    mlist = _prev_manifest_records(prev_meta) + [_mlist_record(
        manifest_path, spec["spec-id"], 1, seq, seq, snap_id,
        len(stats), n_keys)]
    mlist_path = str(mdir / f"snap-{snap_id}.avro")
    _avro_write(mlist_path, _MANIFEST_FILE_SCHEMA, mlist,
                metadata={"format-version": "2"})
    snapshot = {"snapshot-id": snap_id, "sequence-number": seq,
                "timestamp-ms": now_ms, "manifest-list": mlist_path,
                "schema-id": _current_schema(prev_meta).get("schema-id",
                                                            0),
                "summary": {"operation": "delete",
                            "added-equality-delete-files": str(len(stats)),
                            "added-equality-deletes": str(n_keys),
                            "equality-field-ids":
                                ",".join(map(str, eq_ids)),
                            **(extra_summary or {})}}
    return _attach_snapshot(table_dir, prev_meta, snapshot)


def compact_files(spark: SparkSession, table_dir: str) -> dict:
    """REPLACE commit that folds the snapshot's position deletes into the
    data files they dirty — and ONLY those: untouched files are carried
    forward as EXISTING manifest entries (status=0, explicit snapshot /
    sequence numbers per the spec), so compaction cost scales with the
    dirtied fraction, not the table.  At 100 TB with 0.1% of rows
    deleted across 1% of files, 99% of the table is a metadata-only
    carry-forward.

    After compaction the current snapshot has no delete files, so the
    fused file-level paths (engine.encode_files / decode_files) accept
    the table again.  Earlier snapshots still time-travel (their delete
    files stay referenced until expire_snapshots + remove_orphan_files
    reclaim them).  Returns ``{"meta", "rewritten_files", "kept_files",
    "removed_delete_files"}``; no commit when the table has no
    deletes."""
    prev_meta, data, dels = _snapshot_entries(table_dir)
    if not dels:
        return {"meta": None, "rewritten_files": 0,
                "kept_files": len(data), "removed_delete_files": 0}
    pos_dels = [d for d in dels if d.get("content", 0) == 1]
    eq_dels = [d for d in dels if d.get("content", 0) == 2]
    dirty: set[str] = set()
    if pos_dels:
        # distinct dirtied paths: bounded by the data-file count, the
        # same order of driver memory as the manifest listing itself
        dirty |= {r["file_path"] for r in
                  spark.read.schema("file_path string, pos bigint")
                  .parquet(*[d["file_path"] for d in pos_dels])
                  .select("file_path").distinct().collect()}
    if eq_dels:
        dirty |= _eq_dirty_files(prev_meta, data, eq_dels)
    clean = [d for d in data if d["file_path"] not in dirty]
    dirty_entries = [d for d in data if d["file_path"] in dirty]

    spec, part_fields = _spec_part_fields(prev_meta)
    part_cols = [n for n, _, _ in part_fields]
    part_types = {n: t for n, t, _ in part_fields}
    schema = _current_schema(prev_meta)
    by_name = {f["name"]: f for f in schema["fields"]}

    snap_id = int(uuid.uuid4().int % (1 << 62)) + 1
    seq = prev_meta.get("last-sequence-number", 0) + 1
    now_ms = time.time_ns() // 1_000_000

    # rewrite ONLY the dirtied files, deletes applied; rewritten files
    # are stamped with CURRENT field ids and names, so compaction also
    # migrates files toward the current schema
    df = _read_with_pos(spark, table_dir, dirty_entries, dels,
                        prev_meta).drop("_file", "_pos")
    if _uses_field_ids(prev_meta):
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        df = _stamp_field_ids(df, schema)
    out = str(Path(table_dir) / "data" / f"snap-{snap_id}")
    if part_cols:
        dup = df
        for name, expr in _spec_partition_exprs(spec, schema):
            dup = dup.withColumn(f"_p_{name}", expr)
        dup.write.mode("error").partitionBy(
            *[f"_p_{c}" for c in part_cols]).parquet(out)
        files = sorted(str(p) for p in Path(out).rglob("*.parquet"))
    else:
        df.write.mode("error").parquet(out)
        files = sorted(str(p) for p in Path(out).glob("*.parquet"))
    stats = _file_stats(spark, files)

    def _bounds_maps(col_bounds):
        lbs, ubs = [], []
        for name, (mn, mx) in sorted(col_bounds.items()):
            f = by_name.get(name)
            if f is None or not isinstance(f["type"], str) \
                    or name in part_cols:
                continue
            try:
                lbs.append({"key": f["id"],
                            "value": _sv_encode(f["type"], mn)})
                ubs.append({"key": f["id"],
                            "value": _sv_encode(f["type"], mx)})
            except NotImplementedError:
                continue
        return lbs, ubs

    entries = []
    for p, rows, size, col_bounds in stats:
        lbs, ubs = _bounds_maps(col_bounds)
        entries.append(
            {"status": 1, "snapshot_id": snap_id,
             "sequence_number": None, "file_sequence_number": None,
             "data_file": {"content": 0, "file_path": p,
                           "file_format": "PARQUET",
                           "partition": _part_values_of(p, part_cols,
                                                        part_types),
                           "record_count": rows,
                           "file_size_in_bytes": size,
                           "lower_bounds": lbs, "upper_bounds": ubs}})
    added_rows = sum(r for _, r, _, _ in stats)
    kept_rows = 0
    for d in clean:  # carry untouched files forward: metadata only
        kept_rows += int(d.get("record_count") or 0)
        dd = {k: v for k, v in d.items() if not k.startswith("_")}
        entries.append(
            {"status": 0, "snapshot_id": d["_snapshot_id"],
             "sequence_number": d["_sequence_number"],
             "file_sequence_number": d["_sequence_number"],
             "data_file": dd})
    mdir = _meta_dir(table_dir)
    manifest_path = str(mdir / f"manifest-{snap_id}.avro")
    _avro_write(manifest_path, _manifest_entry_schema(part_fields), entries,
                metadata={"schema": json.dumps(schema),
                          "partition-spec": json.dumps(spec["fields"]),
                          "content": "data",
                          "format-version": "2"})
    min_seq = min([seq] + [d["_sequence_number"] for d in clean])
    mlist = [_mlist_record(
        manifest_path, spec["spec-id"], 0, seq, min_seq, snap_id,
        len(stats), added_rows,
        existing_files=len(clean), existing_rows=kept_rows)]
    mlist_path = str(mdir / f"snap-{snap_id}.avro")
    _avro_write(mlist_path, _MANIFEST_FILE_SCHEMA, mlist,
                metadata={"format-version": "2"})
    snapshot = {"snapshot-id": snap_id, "sequence-number": seq,
                "timestamp-ms": now_ms, "manifest-list": mlist_path,
                "schema-id": schema.get("schema-id", 0),
                "summary": {"operation": "replace",
                            "added-data-files": str(len(stats)),
                            "added-records": str(added_rows),
                            "rewritten-data-files": str(len(dirty_entries)),
                            "kept-data-files": str(len(clean)),
                            "removed-position-delete-files":
                                str(len(pos_dels)),
                            "removed-equality-delete-files":
                                str(len(eq_dels))}}
    meta = _attach_snapshot(table_dir, prev_meta, snapshot)
    return {"meta": meta, "rewritten_files": len(dirty_entries),
            "kept_files": len(clean), "removed_delete_files": len(dels)}


# ---------------------------------------------------------------------------
# table maintenance: snapshot expiry + orphan-file cleanup
# ---------------------------------------------------------------------------

_LINEAGE_KEYS = ("simdcomp-shards", "simdcomp-input-files",
                 "simdcomp-stream-batches")


def rewrite_manifests(table_dir: str,
                      target_entries: int = 100_000) -> dict:
    """Metadata-only REPLACE commit that consolidates the accumulated
    data manifests into ``ceil(live_files / target_entries)`` new ones.
    Every append carries the previous manifests forward, so a
    one-snapshot-per-micro-batch producer (the exactly-once streaming
    sink, the per-batch resumable ingest) leaves a manifest LIST of one
    small avro file per commit — after 10^4 micro-batches every planning
    walk (_snapshot_entries) opens 10^4 files.  This is the maintenance
    half Iceberg's own RewriteManifests action provides.

    No data file is touched and no entry changes identity: live data
    files are rewritten as EXISTING entries (status=0) with their
    ORIGINAL snapshot and sequence numbers, so time travel, the v2
    delete sequence rule, and :func:`incremental_files` cursors all
    survive a rewrite (the rewrite snapshot itself adds no files and is
    treated as benign by the incremental walk via its
    ``rewrite-manifests`` summary marker).  Delete manifests are carried
    forward unchanged.  Old manifest avros stay referenced by older
    snapshots until ``expire_snapshots`` + ``remove_orphan_files``
    reclaim them.  Returns ``{"meta", "manifests_before",
    "manifests_after"}``; no commit when there is nothing to merge."""
    if target_entries < 1:
        raise ValueError(
            f"rewrite_manifests: target_entries must be >= 1, got "
            f"{target_entries}")
    prev_meta = _load_metadata(table_dir)
    prev_records = _prev_manifest_records(prev_meta)
    data_records = [r for r in prev_records if r.get("content", 0) == 0]
    del_records = [r for r in prev_records if r.get("content", 0) == 1]
    _, data, _ = _snapshot_entries(table_dir)
    need = max(1, -(-len(data) // target_entries))
    if not data or len(data_records) <= need:
        return {"meta": None, "manifests_before": len(data_records),
                "manifests_after": len(data_records)}
    spec, part_fields = _spec_part_fields(prev_meta)
    schema = _current_schema(prev_meta)
    snap_id = int(uuid.uuid4().int % (1 << 62)) + 1
    seq = prev_meta.get("last-sequence-number", 0) + 1
    now_ms = time.time_ns() // 1_000_000
    entries = []
    for d in data:
        dd = {k: v for k, v in d.items() if not k.startswith("_")}
        entries.append({"status": 0, "snapshot_id": d["_snapshot_id"],
                        "sequence_number": d["_sequence_number"],
                        "file_sequence_number": d["_sequence_number"],
                        "data_file": dd})
    mdir = _meta_dir(table_dir)
    new_mlist = []
    for gi in range(0, len(entries), target_entries):
        chunk = entries[gi:gi + target_entries]
        mp = str(mdir / f"manifest-rw-{snap_id}-"
                        f"{gi // target_entries}.avro")
        _avro_write(mp, _manifest_entry_schema(part_fields), chunk,
                    metadata={"schema": json.dumps(schema),
                              "partition-spec":
                                  json.dumps(spec["fields"]),
                              "content": "data",
                              "format-version": "2"})
        rows = sum(int(e["data_file"].get("record_count") or 0)
                   for e in chunk)
        new_mlist.append(_mlist_record(
            mp, spec["spec-id"], 0, seq,
            min(e["sequence_number"] for e in chunk), snap_id,
            0, 0, existing_files=len(chunk), existing_rows=rows))
    mlist_path = str(mdir / f"snap-{snap_id}.avro")
    _avro_write(mlist_path, _MANIFEST_FILE_SCHEMA,
                new_mlist + del_records,
                metadata={"format-version": "2"})
    snapshot = {"snapshot-id": snap_id, "sequence-number": seq,
                "timestamp-ms": now_ms, "manifest-list": mlist_path,
                "schema-id": schema.get("schema-id", 0),
                "summary": {"operation": "replace",
                            "rewrite-manifests": "true",
                            "manifests-replaced":
                                str(len(data_records)),
                            "manifests-created": str(len(new_mlist))}}
    meta = _attach_snapshot(table_dir, prev_meta, snapshot)
    return {"meta": meta, "manifests_before": len(data_records),
            "manifests_after": len(new_mlist)}


def _is_parent(a: dict, b: dict) -> bool:
    """Is snapshot ``a`` the direct parent of ``b``?  By the spec's
    parent-snapshot-id when stamped; consecutive sequence numbers for
    legacy snapshots (correct pre-branch/rollback, when the log was
    always a contiguous chain)."""
    pid = b.get("parent-snapshot-id")
    if pid is not None:
        return pid == a["snapshot-id"]
    return b.get("sequence-number") == a.get("sequence-number", 0) + 1


def _check_ref_name(name: str) -> None:
    if name == "main":
        raise ValueError("'main' is the reserved branch ref")
    if not name or not all(c.isalnum() or c in "._-" for c in name):
        # the name lands in commit-artifact filenames; path separators
        # or emptiness would fail deep in _publish_metadata instead
        raise ValueError(
            f"invalid ref name {name!r}: need [A-Za-z0-9._-]+")


def resolve_ref(table_dir: str, name: str) -> int:
    """Snapshot id a named ref (tag or branch) points at."""
    meta = _load_metadata(table_dir)
    ref = meta.get("refs", {}).get(name)
    if ref is None:
        raise ValueError(
            f"{table_dir}: no ref {name!r} "
            f"(have {sorted(meta.get('refs', {}))})")
    return ref["snapshot-id"]


def create_tag(table_dir: str, name: str,
               snapshot_id: int | None = None) -> dict:
    """Metadata-only commit adding a named TAG ref (Iceberg v2 ``refs``
    map) pinning ``snapshot_id`` (default: current) — the reproducibility
    primitive: a training run tags the exact corpus snapshot it consumed
    ("run-2026-08-18"), later commits never move it,
    :func:`expire_snapshots` never expires it, and
    :func:`read_table`\\ ``(ref=...)`` reads exactly it forever (until
    :func:`remove_tag`)."""
    _check_ref_name(name)
    meta = _load_metadata(table_dir)
    version = meta.pop("__loaded_version")
    sid = snapshot_id if snapshot_id is not None \
        else meta["current-snapshot-id"]
    if sid not in {s["snapshot-id"] for s in meta["snapshots"]}:
        raise ValueError(f"{table_dir}: snapshot {sid} not in the log")
    refs = dict(meta.get("refs", {}))
    if name in refs:
        raise ValueError(
            f"{table_dir}: ref {name!r} already exists "
            f"(-> {refs[name]['snapshot-id']}); tags are immutable — "
            "remove_tag first to repoint")
    meta = dict(meta)
    refs[name] = {"snapshot-id": sid, "type": "tag"}
    meta["refs"] = refs
    meta["last-updated-ms"] = time.time_ns() // 1_000_000
    _publish_metadata(_meta_dir(table_dir), meta, version + 1,
                      f"tag-{name}")
    return meta


def remove_tag(table_dir: str, name: str) -> dict:
    """Metadata-only commit dropping a tag ref (the snapshot itself
    stays in the log until :func:`expire_snapshots` takes it)."""
    _check_ref_name(name)
    meta = _load_metadata(table_dir)
    version = meta.pop("__loaded_version")
    refs = dict(meta.get("refs", {}))
    if name not in refs:
        raise ValueError(f"{table_dir}: no ref {name!r}")
    if refs[name].get("type") == "branch":
        # deleting just the ref would orphan the staged snapshots IN the
        # log (time travel would expose unpublished data, and the
        # main-commit freeze would silently lift)
        raise ValueError(
            f"{table_dir}: {name!r} is a staging BRANCH — use "
            "drop_branch (removes its staged snapshots too) or "
            "fast_forward (publishes them)")
    del refs[name]
    meta = dict(meta)
    meta["refs"] = refs
    meta["last-updated-ms"] = time.time_ns() // 1_000_000
    _publish_metadata(_meta_dir(table_dir), meta, version + 1,
                      f"untag-{name}")
    return meta


def create_branch(table_dir: str, name: str) -> dict:
    """Metadata-only commit opening a write-audit-publish STAGING branch
    at the current snapshot: ``append(..., branch=name)`` then commits
    to the branch (readers of main unaffected), auditors read it with
    ``read_table(ref=name)``, and :func:`fast_forward` publishes it to
    main (or :func:`drop_branch` discards it).  One staging branch at a
    time — the linear snapshot log cannot represent true divergence, so
    main-targeted commits refuse while a branch exists."""
    _check_ref_name(name)
    meta = _load_metadata(table_dir)
    version = meta.pop("__loaded_version")
    refs = dict(meta.get("refs", {}))
    if name in refs:
        raise ValueError(f"{table_dir}: ref {name!r} already exists")
    existing = [n for n, r in refs.items()
                if r.get("type") == "branch" and n != "main"]
    if existing:
        raise ValueError(
            f"{table_dir}: staging branch {existing[0]!r} already open "
            "— one at a time (linear log)")
    if meta["current-snapshot-id"] in (None, -1):
        raise ValueError(f"{table_dir}: empty table has no snapshot "
                         "to branch from")
    meta = dict(meta)
    refs[name] = {"snapshot-id": meta["current-snapshot-id"],
                  "type": "branch"}
    meta["refs"] = refs
    meta["last-updated-ms"] = time.time_ns() // 1_000_000
    _publish_metadata(_meta_dir(table_dir), meta, version + 1,
                      f"branch-{name}")
    return meta


def fast_forward(table_dir: str, branch: str) -> dict:
    """PUBLISH a staging branch: metadata-only commit pointing main (and
    the current snapshot) at the branch head and dropping the branch
    ref — the audited snapshots become main history atomically; readers
    switch from pre-branch main to the full staged state in one
    metadata swap."""
    _check_ref_name(branch)
    meta = _load_metadata(table_dir)
    version = meta.pop("__loaded_version")
    refs = dict(meta.get("refs", {}))
    ref = refs.get(branch)
    if ref is None or ref.get("type") != "branch":
        raise ValueError(f"{table_dir}: no branch ref {branch!r}")
    head = ref["snapshot-id"]
    if not meta["snapshots"] or \
            meta["snapshots"][-1]["snapshot-id"] != head:
        raise ValueError(
            f"{table_dir}: branch {branch!r} head is not the log tail "
            "— cannot fast-forward")
    meta = dict(meta)
    del refs[branch]
    refs["main"] = {"snapshot-id": head, "type": "branch"}
    meta["refs"] = refs
    meta["current-snapshot-id"] = head
    now = time.time_ns() // 1_000_000
    # the publish is when CURRENT changes — log it now (staged commits
    # deliberately skipped snapshot-log; see _attach_snapshot)
    meta["snapshot-log"] = meta.get("snapshot-log", []) + [
        {"snapshot-id": head, "timestamp-ms": now}]
    meta["last-updated-ms"] = now
    _publish_metadata(_meta_dir(table_dir), meta, version + 1,
                      f"publish-{branch}")
    return meta


def drop_branch(table_dir: str, name: str) -> dict:
    """DISCARD a staging branch: metadata-only commit removing the
    branch ref AND its unpublished snapshots from the log (so the log
    stays exactly main's history — abandoned snapshots lingering after
    main would be silently swept into later incremental ranges).  The
    dropped snapshots' files become orphans (remove_orphan_files
    reclaims them); a tag pinning one of them blocks the drop."""
    _check_ref_name(name)
    meta = _load_metadata(table_dir)
    version = meta.pop("__loaded_version")
    refs = dict(meta.get("refs", {}))
    ref = refs.get(name)
    if ref is None or ref.get("type") != "branch":
        raise ValueError(f"{table_dir}: no branch ref {name!r}")
    cur = meta["current-snapshot-id"]
    keep, dropping = [], []
    past_main = False
    for s in meta["snapshots"]:
        (dropping if past_main else keep).append(s)
        if s["snapshot-id"] == cur:
            past_main = True
    for s in dropping:
        pins = [n for n, r in refs.items()
                if n != name and r["snapshot-id"] == s["snapshot-id"]]
        if pins:
            raise ValueError(
                f"{table_dir}: ref(s) {pins} pin staged snapshot "
                f"{s['snapshot-id']} — remove them before drop_branch")
    meta = dict(meta)
    del refs[name]
    meta["refs"] = refs
    meta["snapshots"] = keep
    keep_ids = {s["snapshot-id"] for s in keep}
    meta["snapshot-log"] = [e for e in meta.get("snapshot-log", [])
                            if e["snapshot-id"] in keep_ids]
    meta["last-updated-ms"] = time.time_ns() // 1_000_000
    _publish_metadata(_meta_dir(table_dir), meta, version + 1,
                      f"dropbranch-{name}")
    return meta


def expire_snapshots(table_dir: str, keep_last: int = 1) -> dict:
    """Metadata commit that drops all but the last ``keep_last`` snapshots
    from the log (standard Iceberg expire semantics: time travel to the
    expired snapshots ends; readers of the CURRENT snapshot are
    unaffected; physical bytes are reclaimed separately by
    :func:`remove_orphan_files`).

    The resumable encoders record their lineage (shard ids / input files)
    in snapshot summaries — expiring those snapshots must NOT forget the
    work: expired summaries' lineage keys are folded into the table
    ``properties`` first, and the completed_* readers in manifest.py union
    properties with the live summaries, so a resume after expiry is still
    a no-op."""
    import json as _json
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the current snapshot "
                         "can never be expired)")
    meta = _load_metadata(table_dir)
    version = meta.pop("__loaded_version")
    snaps = meta["snapshots"]
    if len(snaps) <= keep_last:
        return {"expired": 0, "retained": len(snaps)}
    # ref-protected snapshots (tags pin training-run inputs) never
    # expire, and neither does the STAGED region of an open branch (the
    # snapshots after current): expiring a staged intermediate would
    # both gap the chain fast_forward publishes and fold a
    # never-published batch's resume lineage into properties as done
    pinned = {r["snapshot-id"] for r in meta.get("refs", {}).values()}
    cur_idx = next((i for i, s in enumerate(snaps)
                    if s["snapshot-id"] == meta["current-snapshot-id"]),
                   len(snaps) - 1)
    main_hist = snaps[:cur_idx + 1]
    expired = [s for s in main_hist[:-keep_last]
               if s["snapshot-id"] not in pinned]
    if not expired:
        return {"expired": 0, "retained": len(snaps)}
    gone = {s["snapshot-id"] for s in expired}
    kept = [s for s in snaps if s["snapshot-id"] not in gone]
    if meta["current-snapshot-id"] not in {s["snapshot-id"] for s in kept}:
        raise ValueError("refusing to expire the current snapshot")
    meta = dict(meta)
    props = dict(meta.get("properties", {}))
    for key in _LINEAGE_KEYS:
        merged = set(_json.loads(props.get(f"{key}-expired", "[]")))
        for s in expired:
            v = s.get("summary", {}).get(key, "")
            if key == "simdcomp-shards":
                merged |= {x for x in v.split(",") if x}
            elif v:
                merged |= set(_json.loads(v))
        if merged:
            props[f"{key}-expired"] = _json.dumps(sorted(merged))
    for s in expired:  # scalar lineage must survive expiry too: the
        # shard modulus and the streaming sink's checkpoint query id
        for k in ("simdcomp-total-shards", "simdcomp-stream-query"):
            v = s.get("summary", {}).get(k)
            if v:
                props[k] = v
    meta["properties"] = props
    meta["snapshots"] = kept
    keep_ids = {s["snapshot-id"] for s in kept}
    meta["snapshot-log"] = [e for e in meta.get("snapshot-log", [])
                            if e["snapshot-id"] in keep_ids]
    meta["last-updated-ms"] = time.time_ns() // 1_000_000
    _publish_metadata(_meta_dir(table_dir), meta, version + 1,
                      f"expire-{len(expired)}")
    return {"expired": len(expired), "retained": len(kept)}


def remove_orphan_files(table_dir: str, older_than_s: float = 86400.0,
                        dry_run: bool = False) -> list[str]:
    """Delete data files no snapshot references (crashed-run leftovers,
    files of expired snapshots).  Walks every RETAINED snapshot's
    manifests directly — including DELETED-status entries, which still
    pin their files for time travel — and removes the complement.

    ``older_than_s`` guards the race with an in-flight writer: a
    concurrent commit's data files exist before its metadata does and
    must not be swept; the default only removes files older than a day
    (set 0 only when no writer can be active).  Unreferenced METADATA
    avros (manifest lists + manifests of expired snapshots, and the
    pre-rewrite manifests :func:`rewrite_manifests` replaced) are swept
    under the same age guard — without this, a
    one-snapshot-per-micro-batch producer leaks one avro per trigger
    forever.  Returns the removed (or, with dry_run, would-be-removed)
    paths."""
    meta = _load_metadata(table_dir)
    referenced: set[str] = set()
    ref_avros: set[str] = set()
    for s in meta["snapshots"]:
        ref_avros.add(s["manifest-list"])
        _, manifests = _avro_read(s["manifest-list"])
        for m in manifests:
            ref_avros.add(m["manifest_path"])
            _, entries = _avro_read(m["manifest_path"])
            referenced |= {e["data_file"]["file_path"] for e in entries}
    now = time.time()
    out = []
    for p in sorted((Path(table_dir) / "data").rglob("*.parquet")):
        sp = str(p)
        if sp in referenced:
            continue
        try:
            if now - p.stat().st_mtime < older_than_s:
                continue
            if not dry_run:
                p.unlink()
            out.append(sp)
        except OSError:
            continue
    # unreferenced avros, plus the .tmp files a publisher killed inside
    # _publish_metadata leaves behind (vtmp before its finally-unlink,
    # hint tmp before os.replace)
    mdir_ = Path(table_dir) / "metadata"
    stale_meta = sorted(mdir_.glob("*.avro")) + \
        sorted(p for p in mdir_.glob(".*.tmp"))
    for p in stale_meta:
        sp = str(p)
        if sp in ref_avros:
            continue
        try:
            if now - p.stat().st_mtime < older_than_s:
                continue
            if not dry_run:
                p.unlink()
            out.append(sp)
        except OSError:
            continue
    if not dry_run:  # drop now-empty per-snapshot dirs (+ _SUCCESS marks)
        for d in sorted((Path(table_dir) / "data").glob("snap-*"),
                        reverse=True):
            try:
                # the dir sweep needs the SAME age guard as the files: an
                # in-flight writer's freshly created snap dir has no
                # *.parquet yet and must not be rmtree'd from under it
                if now - d.stat().st_mtime < older_than_s:
                    continue
            except OSError:
                continue
            if not any(d.rglob("*.parquet")):
                import shutil
                shutil.rmtree(d, ignore_errors=True)
    return out


def rollback_last_snapshot(table_dir: str, expected_id: int | None = None
                           ) -> dict:
    """Metadata commit that DROPS the most recent snapshot, restoring the
    previous one as current (or an empty table if it was the first).

    The verification arm of the resumable ingest uses this: a batch whose
    round-trip check fails must not stay current, and dropping it from
    the log also un-records its resume lineage, so the re-run (with the
    fixed encoder) re-encodes exactly that batch.  The dropped snapshot's
    data files become orphans (remove_orphan_files reclaims them);
    sequence numbers stay monotonic (the dropped one is not reused).

    ``expected_id`` pins WHICH snapshot the caller intends to drop: if a
    concurrent append landed after it, the log tail is an innocent
    snapshot and blind rollback would destroy it while leaving the bad
    one current — the same optimistic-concurrency discipline the commit
    path enforces, applied to the undo path.  Callers reverting a
    specific commit must pass it."""
    meta = _load_metadata(table_dir)
    version = meta.pop("__loaded_version")
    if not meta["snapshots"]:
        raise ValueError(f"{table_dir}: no snapshot to roll back")
    dropped = meta["snapshots"][-1]
    if expected_id is not None and dropped["snapshot-id"] != expected_id:
        raise RuntimeError(
            f"{table_dir}: refusing rollback — expected snapshot "
            f"{expected_id} at the log tail but found "
            f"{dropped['snapshot-id']} (a concurrent commit landed after "
            "the snapshot being reverted; resolve it explicitly instead "
            "of dropping an innocent snapshot)")
    for name, r in meta.get("refs", {}).items():
        if name != "main" and r["snapshot-id"] == dropped["snapshot-id"]:
            raise ValueError(
                f"refusing to roll back snapshot "
                f"{dropped['snapshot-id']}: ref {name!r} pins it "
                "(remove_tag first if the pin is stale)")
    meta = dict(meta)
    meta["snapshots"] = meta["snapshots"][:-1]
    keep_ids = {s["snapshot-id"] for s in meta["snapshots"]}
    meta["snapshot-log"] = [e for e in meta.get("snapshot-log", [])
                            if e["snapshot-id"] in keep_ids]
    refs = {n: r for n, r in meta.get("refs", {}).items()
            if n != "main"}  # tags point at retained snapshots (guarded)
    if meta["snapshots"]:
        prev = meta["snapshots"][-1]
        if not _is_parent(prev, dropped):
            raise ValueError(
                f"refusing to roll back snapshot "
                f"{dropped['snapshot-id']}: its parent was expired "
                "(tag-gapped history) — restoring the older retained "
                f"snapshot {prev['snapshot-id']} would silently drop "
                "the expired commits' rows from the current view")
        cur = prev["snapshot-id"]
        meta["current-snapshot-id"] = cur
        refs["main"] = {"snapshot-id": cur, "type": "branch"}
    else:
        meta["current-snapshot-id"] = -1      # spec: no current snapshot
    meta["refs"] = refs
    meta["last-updated-ms"] = time.time_ns() // 1_000_000
    _publish_metadata(_meta_dir(table_dir), meta, version + 1,
                      f"rollback-{dropped['snapshot-id']}")
    return meta
