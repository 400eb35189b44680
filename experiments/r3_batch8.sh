#!/bin/bash
# Round-3 batch 8: cadence A/B — candidate-rebuild / re-sort intervals
# and reuse slack around the r3 mid-round defaults (cand 2 / sort 2 /
# slack 0.25; the batch's outcome CHANGED the shipped defaults to
# cand 4 / sort 4, so every control below pins its flags explicitly).
# HOST MUST BE IDLE (BASELINE.md measurement traps).
# Appends to experiments/r3_results.jsonl.
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

B="python bench.py --json-only --steps 20"

# fresh control at the r3 mid-round defaults (cand 2 / sort 2 / slack .25)
run b8-1m-base 1200 $B --cand-interval 2 --sort-interval 2 --cand-slack 0.25

# longer reuse window, matched sort cadence
run b8-1m-c3s3 1200 $B --cand-interval 3 --sort-interval 3

# keep cand 2, stretch only the sort/permute cadence
run b8-1m-c2s4 1200 $B --cand-interval 2 --sort-interval 4

# longer reuse + slack sized for it (0.25 * 3/2)
run b8-1m-c3s3-slack375 1200 $B --cand-interval 3 --sort-interval 3 \
    --cand-slack 0.375

# the k=4 rung that became the shipped defaults, plus the defaults run
run b8-1m-c4s4 1200 $B --cand-interval 4 --sort-interval 4 --cand-slack 0.25
run b8-1m-new-defaults 1200 $B

echo "batch8 done -> $OUT" >&2
