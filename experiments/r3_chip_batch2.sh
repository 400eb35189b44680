#!/bin/bash
# Round-3 follow-up chip rows: sort cadence + radix sort backends on
# the 1M headline config. Run AFTER r3_chip_batch.sh (appends to the
# same results file).
cd "$(dirname "$0")/.." || exit 1
OUT="${1:-experiments/r3_results.jsonl}"
run() {
  local tag="$1" t="$2"; shift 2
  echo "=== $tag ($(date +%H:%M:%S)) ===" >&2
  local line
  line=$(timeout "$t" "$@" 2> >(tail -5 >&2))
  local rc=$?
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
# batch-1 winner: c16-all + split3 (230.9 ms vs 245.7 control)
BEST="$B --force-query-rows 32 --force-sub16 --density-sub16 --max-candidates-sub 192"

# -- sort cadence on the winning config --------------------------------
run 1m-best-sort2  1200 env LIBCLSPH_TPU_DOT_MODE=split3 $BEST --sort-interval 2
run 1m-best-sort4  1200 env LIBCLSPH_TPU_DOT_MODE=split3 $BEST --sort-interval 4

# -- radix sort backends (verdict #6 bench delta) ----------------------
run 1m-best-radix-fused 1200 env LIBCLSPH_TPU_DOT_MODE=split3 \
    LIBCLSPH_TPU_SORT=radix-fused $BEST
run 1m-best-radix-fused-gather 1200 env LIBCLSPH_TPU_DOT_MODE=split3 \
    LIBCLSPH_TPU_SORT=radix-fused LIBCLSPH_TPU_SORT_APPLY=gather $BEST
run 1m-radix       1200 env LIBCLSPH_TPU_SORT=radix $B

# -- combined best ------------------------------------------------------
run 1m-best-all    1200 env LIBCLSPH_TPU_DOT_MODE=split3 \
    LIBCLSPH_TPU_SORT=radix-fused LIBCLSPH_TPU_SORT_APPLY=gather \
    $BEST --sort-interval 2

echo "batch2 done -> $OUT" >&2
