#!/bin/bash
# Post-chain harvest (round 5): waits for the detached own3 chain to finish,
# then — ONLY if the chain script printed its DONE marker — owns the chip for
# the pending perf work: the 3-row raster-glue A/B ladder
# (scripts/perf_experiments.py glue: legacy / bary carry / shade carry) and
# the headline bench. If the chain died without the marker, writes
# exp/chain_needs_relaunch.flag and exits so a later session relaunches the
# chain first (it is resumable; see docs/ROUND5_STATE.md).
set -x
cd /root/repo
CHAIN_LOG=exp/chain_own3.log

while ps -eo cmd | grep run_reference_schedule | grep -qv grep; do
  sleep 60
done
# the chain process is gone; settle and decide
sleep 30
if ! grep -q "CHAIN_OWN2E DONE" "$CHAIN_LOG"; then
  touch exp/chain_needs_relaunch.flag
  echo "chain ended WITHOUT the DONE marker — not starting perf work"
  exit 1
fi

echo "chain done $(date); starting glue A/B ladder"
timeout 3000 python scripts/perf_experiments.py glue --iters 30 \
  > exp/glue_ab_r5.log 2>&1
echo "glue ladder done $(date); running bench"
timeout 1800 python bench.py > exp/bench_r5.json 2>&1
echo "AFTER_CHAIN DONE $(date)"
