"""Pin the DuckDB-SQL XXH64 replication (oracles_xxh) bit-exact against
Spark's xxhash64 for all three primitives (string / int-chain / long-chain)
across every length class of the algorithm (empty, <4, <8, <32, stripes,
unicode).  The four oracle queries built on these primitives are covered by
the driver-gate sweep in test_entry.py."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from simdcomp_spark import oracles_xxh as OX  # noqa: E402

CASES = ["", "a", "ab", "abc", "abcd", "hello w", "12345678", "x" * 15,
         "y" * 16, "z" * 31, "w" * 32, "v" * 33, "u" * 64, "t" * 100,
         "日本語テスト", "héllo wörld", "the quick brown fox"]


def test_xxh64_sql_matches_spark(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"('{s}')" for s in CASES) + ") v(s)")
    layers = OX.hash_str_layers()
    for i in range(3):
        layers += OX.hash_int_layers(str(i), "h64", f"g{i}")
    layers += OX.hash_long_layers("h64", OX._u(42), "hl1")
    layers += OX.hash_long_layers("g0", "hl1", "hl2")
    sql = OX.layered_select(
        "SELECT s, hex(encode(s)) AS hx, octet_length(encode(s)) AS n "
        "FROM t", layers)
    sel = ", ".join(f"{OX.to_signed(c)} AS {c}_s"
                    for c in ["h64", "g0", "g1", "g2", "hl2"])
    got = {r[0]: r[1:] for r in
           con.execute(f"SELECT s, {sel} FROM ({sql})").fetchall()}

    df = spark.createDataFrame([(c,) for c in CASES], "s string")
    exp = df.select(
        "s", F.xxhash64("s").alias("h"),
        *[F.xxhash64("s", F.lit(i)).alias(f"g{i}") for i in range(3)],
        F.xxhash64(F.xxhash64("s"),
                   F.xxhash64("s", F.lit(0))).alias("hl2")).collect()
    for r in exp:
        assert got[r["s"]] == (r["h"], r["g0"], r["g1"], r["g2"],
                               r["hl2"]), r["s"]


def test_to_unsigned_roundtrip():
    con = duckdb.connect()
    vals = [0, 1, -1, 2**63 - 1, -(2**63), -42]
    q = ", ".join(
        f"{OX.to_signed(OX.to_unsigned(f'CAST({v} AS BIGINT)'))}"
        for v in vals)
    assert list(con.execute(f"SELECT {q}").fetchone()) == vals
