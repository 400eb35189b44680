#!/bin/bash
# Round-3 batch 5: smoke re-run (ST-threshold-aware comparisons +
# split3 default), river/labyrinth at the corrected q128+tier2 scene
# config, and the cand_interval (Verlet-list reuse) probe.
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

# -- Verlet-list candidate reuse probe (StepConfig.cand_interval) -----
run b5-1m-candk2 1500 $B --cand-interval 2 --cand-slack 0.25

# -- full Mosaic smoke suite (ST-margin-aware comparisons) ------------
runtxt b5-smoke 3600 env LIBCLSPH_TPU_ALLOW_TPU=1 \
    python -m pytest tests/test_tpu_smoke.py -q --no-header

# -- flow-through scenes at the corrected q128+tier2 config -----------
runtxt b5-river     2700 python experiments/scene_run.py river \
    --frames 4 --out /tmp/river_r3c_
runtxt b5-labyrinth 2700 python experiments/scene_run.py labyrinth \
    --frames 4 --out /tmp/laby_r3c_

echo "batch5 done -> $OUT" >&2
