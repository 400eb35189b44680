#!/bin/bash
# Round-4 deliverables, reordered for a tight wall-clock budget:
# cheap scale rows first, host-CPU-heavy f64 fidelity oracles last.
# Sequential — HOST MUST BE IDLE. Appends to experiments/r4_deliver.log.
cd "$(dirname "$0")/.." || exit 1
LOG=experiments/r4_deliver.log
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/jaxcache}"

run() {
  local tag="$1" t="$2"; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" | tee -a "$LOG" >&2
  timeout "$t" "$@" >> "$LOG" 2> >(tail -4 >&2)
  echo "--- $tag rc=$? ($(date +%H:%M:%S))" | tee -a "$LOG" >&2
}

run bench-2m 420 python bench.py --json-only --n 2000000 --steps 10
run bench-4m 600 python bench.py --json-only --n 4000000 --steps 6
run river-1m 900 python experiments/scene_run.py river --frames 4 --out /tmp/river_
run emitter-256k 700 python experiments/emitter_run.py --n 262144 --frames 12
run fidelity-collision 900 python experiments/fidelity_collision.py
run fidelity-64k-split3 1200 python experiments/fidelity_64k.py split3
echo "deliverables done $(date +%H:%M:%S)" | tee -a "$LOG" >&2
