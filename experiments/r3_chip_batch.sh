#!/bin/bash
# Round-3 chip measurement matrix (run ON the TPU; no platform override).
# Each step is independent and appends to experiments/r3_results.jsonl —
# safe to re-run; comment out finished steps if the tunnel drops midway.
#
# Usage: bash experiments/r3_chip_batch.sh [results-file]
cd "$(dirname "$0")/.." || exit 1
OUT="${1:-experiments/r3_results.jsonl}"
run() { # run <tag> <timeout-s> <cmd...>
  local tag="$1" t="$2"; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
  local line
  line=$(timeout "$t" "$@" 2> >(tail -5 >&2))
  local rc=$?
  # validate + splice via json, not raw shell (a stray stdout line or
  # changed bench output must not corrupt the whole JSONL)
  RTAG="$tag" RRC="$rc" RTXT="$(echo "$line" | tail -1)" ROUT="$OUT" python -c '
import json, os
tag, rc, out = os.environ["RTAG"], int(os.environ["RRC"]), os.environ["ROUT"]
txt = os.environ["RTXT"]
rec = {"tag": tag}
try:
    rec["result"] = json.loads(txt)
except ValueError:
    rec["text"] = txt[-4096:]
if rc != 0:
    rec["error"] = rc
open(out, "a").write(json.dumps(rec) + "\n")
print(tag, "OK" if rc == 0 else "FAILED", json.dumps(rec.get("result", ""))[:200])
' >&2
}

B="python bench.py --json-only --steps 20"

# -- 1M cube headline candidates ------------------------------------
run 1m-control     1200 $B
run 1m-q32         1200 $B --force-query-rows 32
run 1m-q32-split3  1200 env LIBCLSPH_TPU_DOT_MODE=split3 $B --force-query-rows 32
run 1m-tier2       1200 $B --max-candidates-sub 96 --tier2-frac 8
run 1m-tier2-q32   1200 $B --max-candidates-sub 96 --tier2-frac 8 --force-query-rows 32
run 1m-split3      1200 env LIBCLSPH_TPU_DOT_MODE=split3 $B
run 1m-q32-c16     1200 $B --force-query-rows 32 --force-sub16
run 1m-q32-c16-split3 1200 env LIBCLSPH_TPU_DOT_MODE=split3 $B \
    --force-query-rows 32 --force-sub16
run 1m-c16-all     1200 $B --force-query-rows 32 --force-sub16 \
    --density-sub16 --max-candidates-sub 192
run 1m-c16-all-split3 1200 env LIBCLSPH_TPU_DOT_MODE=split3 $B \
    --force-query-rows 32 --force-sub16 --density-sub16 \
    --max-candidates-sub 192
run 1m-tier2-q32-split3 1200 env LIBCLSPH_TPU_DOT_MODE=split3 $B \
    --max-candidates-sub 96 --tier2-frac 8 --force-query-rows 32

# -- 64k rows (the ms/frame + real-time workload scale) ----------------
run 64k-control    900 $B --n 65536
run 64k-c16-all    900 $B --n 65536 --force-query-rows 32 --force-sub16 \
    --density-sub16 --max-candidates-sub 192

# -- scale rows (verdict #5: 4M >= 2.4M p-steps/s) -------------------
run 2m-tier2       1800 $B --n 2097152 --max-candidates-sub 96 --tier2-frac 8
run 4m-tier2       2400 $B --n 4194304 --max-candidates-sub 96 --tier2-frac 8
run 4m-control     2400 $B --n 4194304
run 2m-c16-all     1800 $B --n 2097152 --force-query-rows 32 --force-sub16 \
    --density-sub16 --max-candidates-sub 192
run 4m-c16-all     2400 $B --n 4194304 --force-query-rows 32 --force-sub16 \
    --density-sub16 --max-candidates-sub 288

runtxt() { # runtxt <tag> <timeout-s> <cmd...> — records stdout as a string
  local tag="$1" t="$2"; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
  local txt
  txt=$(timeout "$t" "$@" 2> >(tail -5 >&2))
  local rc=$?
  # keep the tail only: >~128KB in one env var would E2BIG the exec
  txt=$(echo "$txt" | tail -c 65536)
  RTAG="$tag" RRC="$rc" RTXT="$txt" ROUT="$OUT" python -c '
import json, os
rec = {"tag": os.environ["RTAG"], "text": os.environ["RTXT"]}
if os.environ["RRC"] != "0":
    rec["error"] = int(os.environ["RRC"])
open(os.environ["ROUT"], "a").write(json.dumps(rec) + "\n")
print(rec["tag"], "OK" if "error" not in rec else "FAILED")
' >&2
}

# -- sort backend in situ (only meaningful if radix_probe wins) ------
run 1m-sort-radix  1200 env LIBCLSPH_TPU_SORT=radix $B
run 1m-sort-fused  1200 env LIBCLSPH_TPU_SORT=radix-fused $B

# -- sort skipping at the c16 config (k=4: sort 1 in 4 substeps) -----
run 1m-c16-sortk4  1200 $B --force-query-rows 32 --force-sub16 \
    --density-sub16 --max-candidates-sub 192 --sort-interval 4

# -- collisions delta at the c16 config (control minus free-space) ---
run 1m-c16-freespace 1200 $B --scene none --force-query-rows 32 \
    --force-sub16 --density-sub16 --max-candidates-sub 192

# -- current stage breakdown at 1M (pick the next lever from data) ---
runtxt nl-profile-1m 2400 python experiments/nl_profile.py

# -- radix sort vs lax.sort (verdict #6) ------------------------------
runtxt radix-probe 2400 python experiments/radix_probe.py

# -- full Mosaic smoke suite on chip (incl. 1-device-mesh sharded) ----
runtxt tpu-smoke 5400 env LIBCLSPH_TPU_ALLOW_TPU=1 \
    python -m pytest tests/test_tpu_smoke.py -q --no-header -x

# -- fidelity at bench scale (verdict #9) ----------------------------
runtxt fidelity-highest 2400 python experiments/fidelity_64k.py highest
runtxt fidelity-split3  2400 python experiments/fidelity_64k.py split3

# -- 64k end-to-end ms/frame (verdict #10): full engine + async export
runtxt msframe-64k 3600 python - <<'EOF'
import sys, time, re
sys.path.insert(0, ".")
t_marks = []
import logging
class Tap(logging.Handler):
    def emit(self, rec):
        if "Simulating frame" in rec.getMessage():
            t_marks.append(time.perf_counter())
logging.getLogger("libclsph_tpu.engine.simulation").addHandler(Tap())
from libclsph_tpu import cli
t0 = time.perf_counter()
rc = cli.main(["water", "bench64k", "cube", "r3ms_"])
total = time.perf_counter() - t0
import numpy as np
d = np.diff(t_marks)
print(f"frames={len(t_marks)} total={total:.1f}s "
      f"first(incl compile)={d[0] if len(d) else 0:.1f}s "
      f"steady s/frame: median={np.median(d[1:]):.2f} "
      f"p90={np.percentile(d[1:], 90):.2f} mean={np.mean(d[1:]):.2f}")
sys.exit(rc)
EOF

# -- flow-through scenes (BASELINE matrix #5): bake fix + r3 kernels --
runtxt river-1m     3600 python experiments/scene_run.py river --frames 4 \
    --out /tmp/river_r3_
runtxt labyrinth-1m 3600 python experiments/scene_run.py labyrinth \
    --frames 4 --out /tmp/laby_r3_

echo "batch done -> $OUT" >&2
