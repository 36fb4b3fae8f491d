#!/bin/bash
# Multi-process executor-scaling proxy (north rule: N vs 4N executors):
#   phase 1: one 8-thread executor JVM over D docs        -> T1 = D/t1
#   phase 2: four 8-thread executor JVMs over D docs each -> T4 = 4D/t4
#   efficiency = T4 / (4*T1)
# Executors are separate JVMs with separate heaps, as on a real cluster.
# Times are the workers' own measured extraction seconds (JVM startup and
# JIT warmup excluded, same as a long-running executor).
set -e
cd /root/repo
CPUS=${1:-8}
DOCS=${2:-6000}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-10g}
OUT=$(mktemp -d)

run_one() {
  tools/run_graft.sh graft.job.ExecutorWorker "$CPUS" "$DOCS" "$1" 2>/dev/null \
    | grep '"worker"' | tee "$OUT/$1.json"
}

echo "== phase 1: 1 executor x local[$CPUS] =="
run_one solo
echo "== phase 2: 4 executors x local[$CPUS] (concurrent) =="
for w in w1 w2 w3 w4; do run_one "$w" & done
wait

python3 - "$DOCS" "$OUT" "$CPUS" <<'EOF'
import sys, json, glob
docs, out, cpus = int(sys.argv[1]), sys.argv[2], sys.argv[3]
t1 = json.load(open(f"{out}/solo.json"))["sec"]
t4 = max(json.load(open(p))["sec"] for p in glob.glob(f"{out}/w*.json"))
T1 = docs / t1
T4 = 4 * docs / t4
print(f'{{"metric":"executor_scaling_efficiency","value":{T4/(4*T1):.3f},'
      f'"docs_per_sec_1x":{T1:.1f},"docs_per_sec_4x":{T4:.1f},'
      f'"sec_1x":{t1:.1f},"sec_4x_max":{t4:.1f},"docs_each":{docs},'
      f'"cpus_each":"local[{cpus}]"}}')
EOF
