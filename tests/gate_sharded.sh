#!/bin/bash
# Parallel query-gate runner: splits the 160+-query oracle gate into N
# shards (stable crc32 bucketing, see tests/test_queries.py::_shard), one
# pytest process per shard, each with its own local[8] Spark session.
# Same coverage as the single-process run in ~1/N the wall time.
#
#   SPARK_GRAFT_GATE_SF=/root/testdata/sf0.01 tests/gate_sharded.sh [N]
set -u
N="${1:-4}"
cd "$(dirname "$0")/.."
pids=()
rc=0
for i in $(seq 0 $((N - 1))); do
  SPARK_GRAFT_GATE_SHARD="$i/$N" SPARK_GRAFT_CPUS=8 \
    python -m pytest tests/test_queries.py::test_query_matches_oracle -q \
    --no-header -p no:cacheprovider >"/tmp/gate_shard_$i.log" 2>&1 &
  pids+=($!)
done
for i in $(seq 0 $((N - 1))); do
  if ! wait "${pids[$i]}"; then rc=1; fi
  tail -1 "/tmp/gate_shard_$i.log" | sed "s/^/shard $i: /"
done
exit $rc
