#!/bin/bash
# Round-3 TPU measurement checklist — run when the axon tunnel is up.
# Each block prints its own header; pipe to a log and transcribe the
# numbers into BASELINE.md.
set -uo pipefail
cd "$(dirname "$0")/.."

run() { echo; echo "### $1"; shift; timeout 1800 "$@"; }

# 1. Headline (BENCH_r03 shape): mode-0 full chain, serving point
run "mode-0 chain (default knobs)" python bench.py

# 2. Per-mode chains — modes 2/3 now take the rational fused back end,
#    modes 0/2 the fused RDS back end (A/B via the env knobs below)
for m in 1 2 3; do
  run "mode-$m chain" env BENCH_RADIO_MODE=$m python bench.py
done

# 3. Fused-kernel A/Bs at the serving point
run "mode-0 RDS backend A/B: stock" env DY4TPU_RDS_BACKEND=stock python bench.py
run "mode-2 audio backend A/B: stock" env BENCH_RADIO_MODE=2 DY4TPU_BACKEND=stock python bench.py
run "mode-3 audio backend A/B: stock" env BENCH_RADIO_MODE=3 DY4TPU_BACKEND=stock python bench.py

# 4. Time-sharding tax, 1 chip (VERDICT r2 item 4 datapoint)
run "sharded efficiency 1-dev (chan-par)" env BENCH_MODE=sharded python bench.py
run "sharded efficiency 1-dev (replicated)" env BENCH_MODE=sharded BENCH_REPLAY=replicated python bench.py

# 5. C>512 channel scaling (VERDICT r2 item 5)
for c in 512 640 768 1024; do
  run "chain C=$c" env BENCH_CHANNELS=$c python bench.py
done
run "roofline C=768" env ROOF_CHANNELS=768 python -m benchmarks.roofline

# 6. FFT lowering decision (C12)
run "fft micro" python -m benchmarks.micro_fft

# 7. Wideband channelizer front door (one capture -> 512 stations)
run "wideband bench" env BENCH_MODE=wideband python bench.py
run "wideband breakdown" python -m benchmarks.micro_wideband

# 8. Roofline at the serving point (per-stage table in BASELINE.md)
run "roofline C=512 B=48" env ROOF_BLOCKS=48 python -m benchmarks.roofline
