#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission (north rule:
# "runs via spark-submit --py-files on multi-executor clusters").
#
# Usage:
#   tools/package.sh                 # writes dist/amanogawa_spark.zip
#   spark-submit --py-files dist/amanogawa_spark.zip your_job.py
#
# Example job (PageRank superjob over an Iceberg/parquet pages table):
#   spark-submit \
#     --master yarn --deploy-mode cluster \
#     --num-executors 200 --executor-cores 5 --executor-memory 16g \
#     --conf spark.sql.adaptive.enabled=true \
#     --conf spark.sql.adaptive.skewJoin.enabled=true \
#     --conf spark.sql.shuffle.partitions=2000 \
#     --py-files dist/amanogawa_spark.zip \
#     tools/run_pagerank_job.py --pages s3://bucket/pages --out s3://bucket/ranks
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/amanogawa_spark.zip
python -c "
import zipfile, pathlib
zf = zipfile.ZipFile('dist/amanogawa_spark.zip', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('amanogawa_spark').rglob('*.py')):
    zf.write(p, p.as_posix())
zf.close()
print('wrote dist/amanogawa_spark.zip')
"
