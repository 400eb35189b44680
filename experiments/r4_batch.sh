#!/bin/bash
# Round-4 measurement batches: each invocation runs the bench rows given
# as "tag[:env=VAL,env2=VAL2] -- flags..." lines on stdin, appending
# JSON records to experiments/r4_results.jsonl. HOST MUST BE IDLE
# (BASELINE.md measurement traps). The persistent JAX compilation cache
# makes REPEAT runs of an unchanged program skip the ~10 min 1M compile.
cd "$(dirname "$0")/.." || exit 1
OUT="${OUT:-experiments/r4_results.jsonl}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/jaxcache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

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
      json.dumps(rec.get("result", ""))[:200])
' >&2
}

B="python bench.py --json-only --steps 20"

while IFS= read -r spec; do
  [ -z "$spec" ] && continue
  case "$spec" in \#*) continue ;; esac
  tag="${spec%% *}"
  if [[ "$spec" == *" -- "* ]]; then rest="${spec#* -- }"; else rest=""; fi
  envs=""
  if [[ "$tag" == *:* ]]; then
    envs="${tag#*:}"; tag="${tag%%:*}"
  fi
  if [ -n "$envs" ]; then
    ( export $(echo "$envs" | tr ',' ' '); run "$tag" 1800 $B $rest )
  else
    run "$tag" 1800 $B $rest
  fi
done
echo "batch done -> $OUT" >&2
