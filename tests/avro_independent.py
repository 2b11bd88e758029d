"""Clean-room Avro 1.11 object-container READER, written directly from the
Apache Avro specification (container file framing + binary encoding), with
NO code shared with simdcomp_spark.iceberg's codec — its own varint,
zigzag, block, and datum decoding.

Purpose: dual-implementation interop evidence for the Iceberg layer.  No
Avro/Iceberg library exists in this environment, so the strongest
available check on the manifests our writer emits is a SECOND,
independently written decoder agreeing byte-for-byte on every file.  A
shared misreading of the spec would survive this; a bug in either
implementation's varint/zigzag/union/block framing would not.

Strict by design: validates the magic, requires every block's sync marker
to match the header's, requires the declared block byte-length to be
consumed exactly, and rejects trailing garbage.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


class _Rd:
    def __init__(self, buf: bytes):
        self.b = buf
        self.i = 0

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.b):
            raise EOFError("truncated avro data")
        out = self.b[self.i:self.i + n]
        self.i += n
        return out

    def varint(self) -> int:
        """Unsigned LEB128 base-128 varint (spec: 'variable-length')."""
        shift, acc = 0, 0
        while True:
            byte = self.take(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                return acc
            shift += 7
            if shift > 70:
                raise ValueError("varint too long")

    def zlong(self) -> int:
        """Zigzag-decoded long (spec: int/long encoding)."""
        n = self.varint()
        return (n >> 1) ^ -(n & 1)

    def at_end(self) -> bool:
        return self.i == len(self.b)


def _read_datum(r: _Rd, schema):
    """Schema-driven binary decode of one datum (the types Iceberg
    manifests use: null/boolean/int/long/float/double/bytes/string/
    fixed/record/array/map/union)."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):                       # union
        idx = r.zlong()
        if not 0 <= idx < len(schema):
            raise ValueError(f"union index {idx} out of range")
        return _read_datum(r, schema[idx])
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return r.take(1) == b"\x01"
    if t in ("int", "long"):
        return r.zlong()
    if t == "float":
        return struct.unpack("<f", r.take(4))[0]
    if t == "double":
        return struct.unpack("<d", r.take(8))[0]
    if t == "bytes":
        return r.take(r.zlong())
    if t == "string":
        return r.take(r.zlong()).decode("utf-8")
    if t == "fixed":
        return r.take(schema["size"])
    if t == "record":
        return {f["name"]: _read_datum(r, f["type"])
                for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.zlong()
            if n == 0:
                return out
            if n < 0:               # block with byte-size prefix
                n = -n
                r.zlong()
            for _ in range(n):
                out.append(_read_datum(r, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = r.zlong()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.zlong()
            for _ in range(n):
                k = r.take(r.zlong()).decode("utf-8")
                out[k] = _read_datum(r, schema["values"])
    raise ValueError(f"unsupported avro type {t!r}")


def read_container(path: str) -> tuple[dict, dict, list]:
    """(schema, file metadata, records) of one Avro OCF, strictly."""
    with io.open(path, "rb") as f:
        r = _Rd(f.read())
    if r.take(4) != MAGIC:
        raise ValueError("bad avro magic")
    # header is itself a map<bytes>
    meta = {}
    while True:
        n = r.zlong()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.zlong()
        for _ in range(n):
            k = r.take(r.zlong()).decode("utf-8")
            meta[k] = r.take(r.zlong())
    sync = r.take(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"codec {codec!r} unsupported")
    records = []
    while not r.at_end():
        count = r.zlong()
        nbytes = r.zlong()
        block = r.take(nbytes)
        if r.take(16) != sync:
            raise ValueError("block sync marker mismatch")
        if codec == b"deflate":
            block = zlib.decompress(block, -15)   # raw deflate per spec
        br = _Rd(block)
        for _ in range(count):
            records.append(_read_datum(br, schema))
        if not br.at_end():
            raise ValueError("block not fully consumed")
    return schema, meta, records
