#!/bin/bash
# Round-3 batch 6: end-to-end rows with candidate reuse wired through
# the engine (frame_jit lax.cond rebuild/reuse): 64k ms/frame via the
# CLI, river/labyrinth via scene_run. Requires the native geo writer
# (python native/setup.py build_ext --inplace) and an otherwise idle
# host (measurement traps, BASELINE.md r3 notes).
cd "$(dirname "$0")/.." || exit 1
OUT="${1:-experiments/r3_results.jsonl}"
runtxt() {
  local tag="$1" t="$2"; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
  local txt rc
  txt=$(timeout "$t" "$@" 2> >(tail -5 >&2))
  rc=$?
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

runtxt b6-msframe-reuse 2700 python - <<'EOF'
import sys, time
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
rc = cli.main(["water", "bench64k", "cube", "r3ms2_"])
total = time.perf_counter() - t0
import numpy as np
d = np.diff(t_marks)
print(f"frames={len(t_marks)} total={total:.1f}s "
      f"first(incl compile)={d[0] if len(d) else 0:.1f}s "
      f"steady s/frame: median={np.median(d[1:]):.2f} "
      f"p90={np.percentile(d[1:], 90):.2f} mean={np.mean(d[1:]):.2f}")
sys.exit(rc)
EOF

runtxt b6-river-reuse 2400 python experiments/scene_run.py river \
    --frames 4 --out /tmp/river_r3e_
runtxt b6-labyrinth-reuse 2400 python experiments/scene_run.py labyrinth \
    --frames 4 --out /tmp/laby_r3e_

echo "batch6 done -> $OUT" >&2
