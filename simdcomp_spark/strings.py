"""FSST string-column compression as Spark DataFrame operators.

The symbol table is learned per Arrow batch (the FSST paper's per-block
table, at Arrow-batch granularity) from a STRIDE-SAMPLE of that batch's
rows, and carried on every row as a ``fsst_table`` binary column — Parquet
dictionary-encodes the repeated value down to a handful of copies per row
group, so the storage cost stays one table per file chunk, exactly like the
paper's per-block header.  Per-batch (re)training makes the compression
ratio drift-proof: a partition whose content shifts (e.g. rows ordered by
source) compresses each batch with a table trained on THAT batch, instead
of reusing a table learned from the head of the partition (the old
first-batch-only scheme lost ratio on drift-ordered corpora).  Decode
caches deserialized tables per distinct bytes within a partition.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from .codecs import fsst


def fsst_encode(df: DataFrame, col: str, out_col: str | None = None,
                sample_rows: int = 256,
                retrain_batches: int = 1) -> DataFrame:
    """Replace string column ``col`` with FSST-encoded binary + table.

    ``sample_rows`` rows are STRIDE-sampled across each training batch
    (not taken from its head), and the table is retrained every
    ``retrain_batches`` Arrow batches (default: every batch) so the ratio
    tracks content drift within a partition."""
    out_col = out_col or f"{col}_fsst"
    out_fields = [f"{f.name} {f.dataType.simpleString()}"
                  for f in df.schema.fields if f.name != col]
    schema = ", ".join(out_fields + [f"{out_col} binary", "fsst_table binary"])

    def enc(it):
        import pandas as pd
        table = None
        tbytes = None
        for bi, pdf in enumerate(it):
            raw = [s.encode("utf-8", "surrogatepass") if isinstance(s, str)
                   else (s or b"") for s in pdf[col]]
            if table is None or bi % retrain_batches == 0:
                step = max(1, len(raw) // max(sample_rows, 1))
                table = fsst.SymbolTable(
                    fsst.train(raw[::step][:sample_rows]))
                tbytes = table.serialize()
            # one flat batched tokenization for the whole Arrow batch
            lens = np.fromiter((len(s) for s in raw), dtype=np.int64,
                               count=len(raw))
            flat = np.frombuffer(b"".join(raw), dtype=np.uint8)
            out, out_lens = table.encode_flat(flat, lens)
            obuf = out.tobytes()
            offs = np.concatenate(([0], np.cumsum(out_lens)))
            encs = [obuf[offs[i]:offs[i + 1]] for i in range(lens.size)]
            out = pdf.drop(columns=[col]).copy()
            out[out_col] = encs
            out["fsst_table"] = [tbytes] * len(pdf)
            yield out

    return df.mapInPandas(enc, schema=schema)


def fsst_decode(df: DataFrame, enc_col: str, out_col: str) -> DataFrame:
    """Inverse of :func:`fsst_encode`; drops the table column."""
    out_fields = [f"{f.name} {f.dataType.simpleString()}"
                  for f in df.schema.fields
                  if f.name not in (enc_col, "fsst_table")]
    schema = ", ".join(out_fields + [f"{out_col} string"])

    def dec(it):
        cache: dict[bytes, fsst.SymbolTable] = {}
        for pdf in it:
            n = len(pdf)
            texts = [None] * n
            # group rows by symbol table (normally ONE per partition) and
            # decode each group with a single flat escape-scan + gather
            tables = [bytes(tb) for tb in pdf["fsst_table"]]
            encs = [bytes(e) for e in pdf[enc_col]]
            by_tb: dict[bytes, list[int]] = {}
            for i, tb in enumerate(tables):
                by_tb.setdefault(tb, []).append(i)
            for tb, rows in by_tb.items():
                t = cache.get(tb)
                if t is None:
                    t = cache[tb] = fsst.SymbolTable.deserialize(tb)
                row_lens = np.fromiter((len(encs[i]) for i in rows),
                                       dtype=np.int64, count=len(rows))
                codes = np.frombuffer(b"".join(encs[i] for i in rows),
                                      dtype=np.uint8)
                flat, out_lens = t.decode_flat(codes, row_lens)
                buf = flat.tobytes()
                offs = np.concatenate(([0], np.cumsum(out_lens)))
                for k, i in enumerate(rows):
                    texts[i] = buf[offs[k]:offs[k + 1]].decode(
                        "utf-8", "surrogatepass")
            out = pdf.drop(columns=[enc_col, "fsst_table"]).copy()
            out[out_col] = texts
            yield out

    return df.mapInPandas(dec, schema=schema)
