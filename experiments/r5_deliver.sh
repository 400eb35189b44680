#!/bin/bash
# Round-5 deliverables queue: EVERY BASELINE workload at the shipped
# defaults, pass/fail, no blank cells (r4 verdict #3). Sequential —
# HOST MUST BE IDLE. Appends raw outputs to experiments/r5_deliver.log.
cd "$(dirname "$0")/.." || exit 1
LOG=experiments/r5_deliver.log
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/jaxcache}"

run() {
  local tag="$1" t="$2"; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$LOG" >&2
  timeout "$t" "$@" >> "$LOG" 2> >(tail -4 >&2)
  echo "--- $tag rc=$? ($(date +%H:%M:%S))" | tee -a "$LOG" >&2
}

run bench-1m 2400 python bench.py --json-only --steps 20
run bench-2m 3000 python bench.py --json-only --n 2000000 --steps 10
run bench-4m 3600 python bench.py --json-only --n 4000000 --steps 6
run e2e-64k 2400 python experiments/e2e_64k.py --frames 30
run fidelity-64k 1800 python experiments/fidelity_64k.py split3
run fidelity-collision 3000 python experiments/fidelity_collision.py
run river-1m 4200 python experiments/scene_run.py river --frames 4 --out /tmp/river_
run labyrinth-1m 4200 python experiments/scene_run.py labyrinth --frames 3 --out /tmp/lab_
run emitter-256k 3600 python experiments/emitter_run.py --n 262144 --frames 20
echo "deliverables done" >&2
