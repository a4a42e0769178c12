#!/bin/bash
# One-shot TPU verification sweep for the round-2 kernel/wire work.
#
# Run when the device link is up:  bash scripts/tpu_sweep.sh [logfile]
#
# 1. probes the link;
# 2. sweeps the fused Pallas DP over read-block sizes x window-gather
#    variants (loop / take_along_axis gather / barrel shift) with a segs
#    cross-check, so the fastest Mosaic-accepted variant is measured,
#    not guessed;
# 3. runs the four bench lanes (default, --mixed, --rna, --stats).
#
# Outputs append to the logfile (default tpu_sweep.log, gitignored).
set -u -o pipefail
cd "$(dirname "$0")/.."
LOG=${1:-tpu_sweep.log}

echo "=== tpu_sweep $(date -u +%FT%TZ) ===" | tee -a "$LOG"
if ! timeout 120 python -c "import jax; d = jax.devices(); \
        assert d[0].platform != 'cpu', d; print('link OK:', d)" \
        2>&1 | tee -a "$LOG"; then
    echo "device link DOWN - aborting sweep" | tee -a "$LOG"
    exit 1
fi

echo "--- kernel layout sweep (R x variant) ---" | tee -a "$LOG"
timeout 3000 python scripts/kernel_layout_bench.py 8 16 32 2>&1 | tee -a "$LOG"

for MODE in "" "--mixed" "--rna" "--stats"; do
    echo "--- bench.py $MODE ---" | tee -a "$LOG"
    timeout 590 python bench.py $MODE 2>&1 | tail -3 | tee -a "$LOG"
done
echo "=== sweep done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
