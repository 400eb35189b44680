#!/bin/bash
# Round-3 batch 7: A/B the predictive-staleness candidate reuse and the
# gated singular branch. HOST MUST BE IDLE (BASELINE.md measurement
# traps). Appends to experiments/r3_results.jsonl.
cd "$(dirname "$0")/.." || exit 1
OUT="${1:-experiments/r3_results.jsonl}"
run() {
  local tag="$1" t="$2"; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
  local line rc
  line=$(timeout "$t" "$@" 2> >(tail -3 >&2))
  rc=$?
  RTAG="$tag" RRC="$rc" RTXT="$(echo "$line" | tail -1)" ROUT="$OUT" python -c '
import json, os
rec = {"tag": os.environ["RTAG"]}
try:
    rec["result"] = json.loads(os.environ["RTXT"])
except ValueError:
    rec["text"] = os.environ["RTXT"][-4096:]
if os.environ["RRC"] != "0":
    rec["error"] = int(os.environ["RRC"])
open(os.environ["ROUT"], "a").write(json.dumps(rec) + "\n")
print(rec["tag"], "OK" if "error" not in rec else "FAILED",
      json.dumps(rec.get("result", ""))[:160])
' >&2
}
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

B="python bench.py --json-only --steps 20"

# 1M headline at current code (near0 gating + reuse defaults)
run b7-1m 1200 $B

# river with PREDICTIVE reuse (scene_run cand_interval=2)
runtxt b7-river-predictive 2400 python experiments/scene_run.py river \
    --frames 4 --out /tmp/river_r3f_

# 64k ms/frame via the CLI (cand-interval default 2, predictive)
runtxt b7-msframe-predictive 2700 python - <<'EOF'
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
rc = cli.main(["water", "bench64k", "cube", "r3ms3_"])
total = time.perf_counter() - t0
import numpy as np
d = np.diff(t_marks)
print(f"frames={len(t_marks)} total={total:.1f}s "
      f"first(incl compile)={d[0] if len(d) else 0:.1f}s "
      f"steady s/frame: median={np.median(d[1:]):.2f} "
      f"p90={np.percentile(d[1:], 90):.2f} mean={np.mean(d[1:]):.2f}")
sys.exit(rc)
EOF

echo "batch7 done -> $OUT" >&2
