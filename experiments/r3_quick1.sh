#!/bin/bash
# Quick decision rows after the xprof breakdown: single-dispatch refine
# (REFINE_CHUNK large enough that chunk == nb) and sort cadence on the
# c16-all + split3 winner. Appends to experiments/r3_results.jsonl.
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
C16="--force-query-rows 32 --force-sub16 --density-sub16 --max-candidates-sub 192"

run q1-control    1200 env LIBCLSPH_TPU_DOT_MODE=split3 $B $C16
run q1-refine1d   1200 env LIBCLSPH_TPU_DOT_MODE=split3 \
    LIBCLSPH_TPU_REFINE_CHUNK_MB=8192 $B $C16
run q1-sortk2     1200 env LIBCLSPH_TPU_DOT_MODE=split3 $B $C16 --sort-interval 2
run q1-all        1200 env LIBCLSPH_TPU_DOT_MODE=split3 \
    LIBCLSPH_TPU_REFINE_CHUNK_MB=8192 $B $C16 --sort-interval 2
echo "quick1 done" >&2
