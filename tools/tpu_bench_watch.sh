#!/bin/bash
# Poll the TPU tunnel; when healthy, run the benchmark ladder and record
# results to /tmp/bench_results.jsonl.  Usage: nohup tools/tpu_bench_watch.sh &
set -u
OUT=/tmp/bench_results.jsonl
for i in $(seq 1 200); do
    if timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
a = jnp.asarray(np.ones(4096, np.complex64))
assert abs(complex(jnp.sum(a*a)) - 4096) < 1e-3
" > /dev/null 2>&1; then
        echo "$(date -Is) TPU healthy; running bench ladder" >> "$OUT"
        for n in 48 64 96 128; do
            BENCH_N=$n timeout 900 python bench.py 2>/dev/null | tail -1 >> "$OUT"
        done
        exit 0
    fi
    sleep 120
done
echo "$(date -Is) TPU never became healthy" >> "$OUT"
