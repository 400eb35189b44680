#!/bin/bash
# Probe the TPU tunnel until it answers, then run the round-3 chip
# batch. Tunnel probes hang indefinitely when it's down -> each probe
# is bounded by timeout; retry every 120 s. Progress to stderr.
cd "$(dirname "$0")/.." || exit 1
while true; do
    if timeout 300 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; print(jax.devices())" 2>/dev/null; then
        echo "tunnel up at $(date)" >&2
        break
    fi
    echo "tunnel down at $(date), retrying in 120s" >&2
    sleep 120
done
bash experiments/r3_chip_batch.sh
