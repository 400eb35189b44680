#!/bin/bash
# Quick-2: 8-field c16 force pack (self_from_ids, now default in code)
# and scatter compaction, on top of quick-1's winners (refine single
# dispatch + sort-interval 2 + split3 + c16-all).
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
ENV="LIBCLSPH_TPU_DOT_MODE=split3 LIBCLSPH_TPU_REFINE_CHUNK_MB=8192"

run q2-selfid  1200 env $ENV $B $C16 --sort-interval 2
run q2-scatter 1200 env $ENV LIBCLSPH_TPU_COMPACT=scatter $B $C16 --sort-interval 2
echo "quick2 done" >&2
