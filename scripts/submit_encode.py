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


def _is_local(path: str) -> bool:
    """The self-contained Iceberg layer (simdcomp_spark/iceberg.py) does
    plain-file I/O for the metadata tree, so Iceberg detection/publish only
    applies to local paths; remote URIs stay on the plain-parquet paths."""
    return "://" not in path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="tokens table (parquet dir or local Iceberg "
                         "table dir)")
    ap.add_argument("--output", required=True, help="encoded table root")
    ap.add_argument("--publish-iceberg", metavar="DIR",
                    help="additionally publish the encoded output as an "
                         "Iceberg v2 table at DIR (overwrite snapshot if "
                         "the table exists — this job publishes the FULL "
                         "table, so re-runs replace rather than duplicate)")
    ap.add_argument("--codec", default="auto")
    ap.add_argument("--shards", type=int, default=256)
    ap.add_argument("--split-threshold", type=int, default=1 << 16)
    ap.add_argument("--verify", action="store_true",
                    help="decode + compare against the input (extra pass); "
                         "with --publish-iceberg, the publish happens only "
                         "after verification passes")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from simdcomp_spark import engine, iceberg, manifest

    if args.publish_iceberg and not _is_local(args.publish_iceberg):
        raise ValueError(
            "--publish-iceberg requires a local path: the self-contained "
            "Iceberg layer writes its metadata tree with plain file I/O")

    spark = SparkSession.getActiveSession() or engine.get_spark("encode-job")
    if _is_local(args.input) and \
            (Path(args.input) / "metadata" / "version-hint.text").is_file():
        # Iceberg table input (the north rule's input shape): read the
        # current snapshot's live files via the metadata tree — a plain
        # parquet read over the dir would also pick up dead/orphan files
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

    rc = 0
    if args.verify:
        # no dropDuplicates: the staged-write resume protocol guarantees a
        # duplicate-free table, and verification must DETECT a violation of
        # that guarantee (decode reassembly would concatenate duplicated
        # segments and mismatch), not mask it
        enc = manifest.read_encoded(spark, args.output)
        bad = engine.verify_roundtrip(df, engine.decode(enc))
        print(json.dumps({"roundtrip_mismatches": bad}))
        rc = 1 if bad else 0

    if args.publish_iceberg and rc == 0:
        # Iceberg in -> Iceberg out, gated on verification when requested:
        # a snapshot must never become current for data that just failed
        # its round-trip check.  This job publishes the FULL encoded
        # table, so an existing table gets an OVERWRITE snapshot (append
        # would duplicate every row on a re-run); previous snapshots stay
        # readable via time travel.
        enc_out = manifest.read_encoded(spark, args.output)
        if (Path(args.publish_iceberg) / "metadata"
                / "version-hint.text").is_file():
            meta = iceberg.overwrite(enc_out, args.publish_iceberg)
        else:
            meta = iceberg.export_encoded(enc_out, args.publish_iceberg)
        print(json.dumps({"iceberg_snapshot": meta["current-snapshot-id"],
                          "iceberg_table": args.publish_iceberg}))

    return rc


if __name__ == "__main__":
    raise SystemExit(main())
