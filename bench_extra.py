#!/usr/bin/env python
"""Round-7 optimization measurement harness (guide §1).

NOT the driver bench (bench.py is frozen).  This one:
  * times each declared bench query in isolation through the noop sink
    (computation only, no sink cost — guide §1.4),
  * labels jobs (guide §1.5),
  * optionally dumps .explain("formatted") to plans/r07/<q>_<tag>.txt,
  * can time sub-stages of a query (e.g. tokens_table alone).

Usage:
  python bench_extra.py [--sf DIR] [--plans TAG] [--reps N] [q1 q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "bitpack_roundtrip", "for_roundtrip", "d1_roundtrip", "auto_roundtrip",
    "compressed_size", "exact_dedup", "token_count", "ann_topk",
    "fsst_roundtrip", "pack_chunks", "pack_greedy", "tokenize",
    "corpus_build", "intersect_postings",
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    args = sys.argv[1:]
    sf_dir = SF_DIR
    plans_tag = None
    reps = 1
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--plans":
            plans_tag = next(it)
        elif a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)
    names = names or BENCH_QUERIES

    from simdcomp_spark import engine
    import __spark_entry__ as em
    spark = engine.get_spark(app="bench_extra", cores=CPUS,
                             shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py: python workers + native lib + JVM scan JIT
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(4096) \
        .createOrReplaceTempView("_w")
    from simdcomp_spark.queries import tokens_table
    engine.encode(
        tokens_table(spark, sf_dir, "lineitem", "l_orderkey",
                     "l_linenumber", "l_partkey", "lineitem").limit(256),
        codec="auto").count()

    qdict = em.queries()
    out = {}
    plans_dir = Path(__file__).resolve().parent / "plans" / "r07"
    if plans_tag:
        plans_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        q = qdict[name]
        times = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            df = q(spark, sf_dir)
            noop(df)
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if plans_tag:
            df = q(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}_{plans_tag}.txt").write_text(plan)
        out[name] = times
        print(json.dumps({name: times}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
