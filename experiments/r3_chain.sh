#!/bin/bash
# Chain controller: batch-1 (r3_chip_batch.sh) stages after radix-probe
# (tpu-smoke, fidelity, msframe, river, labyrinth) depend on the FINAL
# production defaults, which in turn depend on batch-1's decision rows
# (scale, profile, radix). So: watch batch-1's results file; once the
# radix-probe record lands, kill batch-1 and run batch-2 (sort levers on
# the winning config). The deferred stages re-run later as batch-3 with
# the final defaults baked in.
cd "$(dirname "$0")/.." || exit 1
PIDFILE="${1:-/tmp/r3_batch.pid}"
OUT="${2:-experiments/r3_results.jsonl}"
while kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do
    if grep -q '"tag": "radix-probe"' "$OUT" 2>/dev/null; then
        echo "radix-probe landed; stopping batch-1 at $(date)" >&2
        kill "$(cat "$PIDFILE")" 2>/dev/null
        sleep 5
        # the in-flight timed child (bench/pytest) dies with the group;
        # give the tunnel a moment to settle
        sleep 25
        break
    fi
    sleep 60
done
bash experiments/r3_chip_batch2.sh "$OUT"
