#!/usr/bin/env bash
# Package the engine and run the replay job via spark-submit --py-files —
# the north rule's deployment shape. MASTER defaults to local[N] in the
# sandbox; on a cluster pass MASTER=yarn / spark://host:7077.
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
ZIP=/tmp/omicidx_etl_spark.zip

rm -f "$ZIP"
(cd . && python -c "
import zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('omicidx_etl_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
")

exec spark-submit --master "$MASTER" --py-files "$ZIP" \
    --conf spark.driver.memory="${SPARK_DRIVER_MEM:-48g}" \
    --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE_PARTITIONS:-32}" \
    jobs/replay_job.py "$@"
