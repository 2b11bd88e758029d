#!/usr/bin/env python
"""Pre-materialize the multi-billion-token scaling input ONCE.

The N-vs-4N scaling evidence (BASELINE.json north rule) needs an input big
enough that per-JVM fixed costs are <5% of the 32-core wall; generating it
per-attempt blew the round-1 time budget, so this script writes it to a
persistent dir (default /root/repo/.benchdata/tokens4b.parquet) and every
scaling run reuses it.

Each Spark task writes one parquet file ≈ one row group, so
``engine.encode_files`` gets uniformly sized work units.

Usage: python scripts/gen_scaling_input.py [--docs N] [--parts P] [--out DIR]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4_670_000)  # ≈4B tokens
    ap.add_argument("--parts", type=int, default=256)
    ap.add_argument("--out", default="/root/repo/.benchdata/tokens4b.parquet")
    args = ap.parse_args()

    from simdcomp_spark import engine, fixtures

    spark = engine.get_spark(app="gen-scaling-input", cores=32,
                             shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    df = fixtures.zipfish_table(spark, args.docs, parts=args.parts)
    df.write.mode("overwrite").parquet(args.out)
    gen_s = time.perf_counter() - t0

    from pyspark.sql import functions as F
    agg = spark.read.parquet(args.out).agg(
        F.count("*"), F.sum("n_tok")).first()
    print({"out": args.out, "gen_seconds": round(gen_s, 1),
           "rows": int(agg[0]), "tokens": int(agg[1])})
    spark.stop()


if __name__ == "__main__":
    main()
