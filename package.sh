#!/usr/bin/env bash
# Build the --py-files artifact and show the spark-submit invocation
# (north rule: "run via spark-submit --py-files at N and 4N executors").
set -euo pipefail
cd "$(dirname "$0")"
rm -f camden_spark.zip
zip -qr camden_spark.zip camden_spark -x '*__pycache__*'
echo "built camden_spark.zip"
cat <<'USAGE'
cluster usage:
  spark-submit \
    --master <cluster-master> \
    --num-executors "$N" --executor-cores 4 --executor-memory 8g \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.shuffle.partitions=$((N * 12)) \
    --py-files camden_spark.zip \
    main.py --input iceberg:warehouse.pages --output s3://bucket/dedup_out \
            --checkpoint-dir s3://bucket/dedup_ckpt

scaling evidence: run twice with N and 4N executors on the same input and
compare docs/sec from summary.json (sandbox stand-in: bench_scaling.py).
USAGE
