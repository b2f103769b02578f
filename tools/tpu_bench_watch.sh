#!/bin/bash
# Poll the TPU tunnel; at each healthy window run the measurement pass
# in increasing cost order (so a window that closes mid-run still
# yields the cheap numbers):
#
#   1. tools/tpu_profile.py (v2: readback-synced timings)
#        -> /tmp/tpu_profile.jsonl + repo bench artifacts
#   2. bench ladder BENCH_N=64/128 -> /tmp/bench_results.jsonl
#   3. per-level timings at 192 -> bench_levels_results.jsonl
#
# The probe is a REAL round trip (compute + D2H readback assert):
# block_until_ready alone is NOT a completion barrier through the
# tunnel (backend.sync_readback) — a zombie channel ACKs dispatches
# while nothing executes, which is exactly the failure mode that
# poisoned the 2026-08-19/20 "tpu" rows.
#
# The poll interval is deliberately long: each probe is a fresh
# python+jax import (~20 s of CPU on this single-core host) and
# benchmarks run concurrently — a tight poll steals 10-20% CPU from
# every warm measurement.
#
# Usage: nohup setsid tools/tpu_bench_watch.sh >/tmp/watch.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/bench_results.jsonl
PASSES=0
PROBE='
import jax, jax.numpy as jnp, numpy as np
a = jnp.asarray(np.ones(4096, np.complex64))
assert abs(complex(jnp.sum(a*a)) - 4096) < 1e-3
'
for i in $(seq 1 200); do
    if timeout 120 python -c "$PROBE" > /dev/null 2>&1; then
        echo "$(date -Is) TPU healthy; starting measurement pass" >> "$OUT"
        # Cheap numbers first: profile writes one JSON line per
        # metric, so a window closing mid-run still leaves partial
        # data.  CYCLE_JIT pinned off for the kernel/solve sections
        # (its crossover is measured explicitly at the end of the
        # profile; auto-on would front-load minutes of fused-cycle
        # compiles into the window).  runpy from the repo root —
        # `python tools/x.py` would put tools/ (not the repo) on
        # sys.path and break the imports.
        EMG3D_TPU_CYCLE_JIT=0 TPU_PROFILE_SIZES=32,64,128 \
            timeout 7200 python -c \
            "import runpy; runpy.run_path('tools/tpu_profile.py', run_name='__main__')" \
            >> "$OUT" 2>/dev/null
        echo "$(date -Is) profile done; bench ladder" >> "$OUT"
        for n in 64 128; do
            BENCH_N=$n timeout 2400 python bench.py 2>/dev/null \
                | tail -1 >> "$OUT"
        done
        BENCH_N=192 timeout 2400 python - < tools/bench_levels.py \
            >> "$OUT" 2>/dev/null
        echo "$(date -Is) measurement pass complete" >> "$OUT"
        PASSES=$((PASSES + 1))
        [ "$PASSES" -ge 2 ] && exit 0
    fi
    sleep 280
done
echo "$(date -Is) TPU never became healthy" >> "$OUT"
exit 3
