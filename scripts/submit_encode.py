#!/usr/bin/env python
"""Cluster job entry point (north rule: "run via spark-submit --py-files").

Package and launch:

    cd /root/repo && zip -r /tmp/simdcomp_spark.zip simdcomp_spark
    spark-submit --py-files /tmp/simdcomp_spark.zip \
        scripts/submit_encode.py \
        --input  s3://bucket/tokens_table/ \
        --output s3://bucket/encoded_table/ \
        --codec auto --shards 4096 --split-threshold 65536

The job is resumable: re-submitting after a failure encodes only shards
whose manifest is missing (see simdcomp_spark/manifest.py).  On a cluster
the session comes from spark-submit's conf; local fallback uses
engine.get_spark().
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="tokens table (parquet dir or Iceberg table dir)")
    ap.add_argument("--output", required=True, help="encoded table root")
    ap.add_argument("--publish-iceberg", metavar="DIR",
                    help="additionally publish the encoded output as an "
                         "Iceberg v2 table at DIR (append snapshot if the "
                         "table exists)")
    ap.add_argument("--codec", default="auto")
    ap.add_argument("--shards", type=int, default=256)
    ap.add_argument("--split-threshold", type=int, default=1 << 16)
    ap.add_argument("--verify", action="store_true",
                    help="decode + compare against the input (extra pass)")
    args = ap.parse_args()

    from pathlib import Path as _P

    from pyspark.sql import SparkSession
    from simdcomp_spark import engine, manifest

    spark = SparkSession.getActiveSession() or engine.get_spark("encode-job")
    if (_P(args.input) / "metadata" / "version-hint.text").is_file():
        # Iceberg table input (the north rule's input shape): read the
        # current snapshot's live files via the metadata tree — a plain
        # parquet read over the dir would also pick up dead/orphan files
        from simdcomp_spark import iceberg
        df = iceberg.read_table(spark, args.input)
    else:
        df = spark.read.parquet(args.input)
    summary = manifest.encode_resumable(
        df, args.output, codec=args.codec, shards=args.shards,
        split_threshold=args.split_threshold)
    metrics = engine.partition_metrics(
        manifest.read_encoded(spark, args.output))
    metrics.write.mode("overwrite").parquet(f"{args.output}/_metrics")
    print(json.dumps(summary))

    if args.publish_iceberg:
        # Iceberg in -> Iceberg out: commit the encoded table as a
        # snapshot (new table or append) with manifest column bounds
        from simdcomp_spark import iceberg
        enc_out = manifest.read_encoded(spark, args.output)
        if (_P(args.publish_iceberg) / "metadata"
                / "version-hint.text").is_file():
            meta = iceberg.append(enc_out, args.publish_iceberg)
        else:
            meta = iceberg.export_encoded(enc_out, args.publish_iceberg)
        print(json.dumps({"iceberg_snapshot": meta["current-snapshot-id"],
                          "iceberg_table": args.publish_iceberg}))

    if args.verify:
        # no dropDuplicates: the staged-write resume protocol guarantees a
        # duplicate-free table, and verification must DETECT a violation of
        # that guarantee (decode reassembly would concatenate duplicated
        # segments and mismatch), not mask it
        enc = manifest.read_encoded(spark, args.output)
        bad = engine.verify_roundtrip(df, engine.decode(enc))
        print(json.dumps({"roundtrip_mismatches": bad}))
        return 1 if bad else 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
