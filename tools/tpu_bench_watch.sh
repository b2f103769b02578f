#!/bin/bash
# Poll the TPU tunnel; at the FIRST healthy window run the full
# measurement pass in increasing cost order (so a window that closes
# mid-run still yields the cheap numbers):
#
#   1. tools/tpu_profile.py  -> /tmp/tpu_profile.jsonl
#      (dispatch latency, per-kernel timings incl. Mosaic Pallas,
#       thomas-vs-pcr, blocked-vs-strided, production solves,
#       Krylov variants, cycle-jit crossover)
#   2. bench ladder BENCH_N=48/64/96/128 -> /tmp/bench_results.jsonl
#
# The poll interval is deliberately long: each probe is a fresh
# python+jax import (~20 s of CPU on this single-core host) and
# benchmarks run concurrently — a tight poll steals 10-20% CPU from
# every warm measurement.
#
# Usage: nohup tools/tpu_bench_watch.sh & (or a background Bash task).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/bench_results.jsonl
PROBE='
import jax, jax.numpy as jnp, numpy as np
a = jnp.asarray(np.ones(4096, np.complex64))
assert abs(complex(jnp.sum(a*a)) - 4096) < 1e-3
'
for i in $(seq 1 150); do
    if timeout 120 python -c "$PROBE" > /dev/null 2>&1; then
        echo "$(date -Is) TPU healthy; starting measurement pass" >> "$OUT"
        # Cheap numbers first: profile writes one JSON line per metric,
        # so a window closing mid-run still leaves partial data.
        # runpy from the repo root — `python tools/x.py` would put
        # tools/ (not the repo) on sys.path and break the imports.
        timeout 7200 python -c \
            "import runpy; runpy.run_path('tools/tpu_profile.py', run_name='__main__')" \
            >> "$OUT" 2>/dev/null
        echo "$(date -Is) profile done; bench ladder" >> "$OUT"
        for n in 48 64 96 128; do
            BENCH_N=$n timeout 1800 python bench.py 2>/dev/null \
                | tail -1 >> "$OUT"
        done
        echo "$(date -Is) measurement pass complete" >> "$OUT"
        exit 0
    fi
    sleep 280
done
echo "$(date -Is) TPU never became healthy" >> "$OUT"
exit 3
