#!/bin/bash
# Round-5 chip measurement sweep: run the moment the axon tunnel is
# back.  Produces devprof tables for both chain kernels at 2 kb and
# 16 kb, then the full bench.  ~30-50 min warm (compiles cached).
set -x
cd /root/repo
log=/tmp/chip_r5_$(date +%H%M).log
{
  echo "=== probe ==="
  timeout 300 python -c "import jax; print(jax.devices())" || exit 1
  echo "=== devprof 2kb full-window ==="
  timeout 1800 python -m minigraph_tpu.tools.devprof --bucket 2048x256 --n 256 --reps 3
  echo "=== devprof 2kb chunked ==="
  MGT_CHAIN_CHUNKED=1 timeout 1800 python -m minigraph_tpu.tools.devprof --bucket 2048x256 --n 256 --reps 3
  echo "=== devprof 16kb full-window B=128 ==="
  timeout 2400 python -m minigraph_tpu.tools.devprof --bucket 16384x128 --n 128 --reps 3
  echo "=== devprof 16kb chunked B=128 ==="
  MGT_CHAIN_CHUNKED=1 timeout 2400 python -m minigraph_tpu.tools.devprof --bucket 16384x128 --n 128 --reps 3
  echo "=== devprof 16kb chunked + narrow collect ==="
  MGT_CHAIN_CHUNKED=1 MGT_NARROW_QCOMPACT=1 timeout 2400 python -m minigraph_tpu.tools.devprof --bucket 16384x128 --n 128 --reps 3
  echo "=== devprof 2kb narrow collect ==="
  MGT_NARROW_QCOMPACT=1 timeout 1800 python -m minigraph_tpu.tools.devprof --bucket 2048x256 --n 256 --reps 3
  echo "=== bench (full) ==="
  timeout 3600 python bench.py
} > "$log" 2>&1
echo "done -> $log"
