#!/bin/bash
# One-command on-chip validation + bench session (run when the axon
# tunnel is healthy; see TPU_TESTRUN.md for the record format).
# Usage: bash tpu_session.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_session_$(date +%H%M)}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/psa_tpu_jax_cache

echo "== health check =="
timeout 300 python -c "
import jax, jax.numpy as jnp, time; t0=time.time()
(jnp.ones((128,128),jnp.float32)@jnp.ones((128,128),jnp.float32)).block_until_ready()
print('tunnel OK', round(time.time()-t0,1), 's')" || { echo "TUNNEL DOWN -- abort"; exit 1; }

echo "== on-chip lanes =="
PSA_TEST_TPU=1 timeout 2400 python -m pytest tests/test_tpu_families.py -v 2>&1 | tail -20 | tee "$OUT/families.log"
PSA_TEST_TPU=1 timeout 2400 python -m pytest tests/test_df32.py tests/test_pallas.py -q 2>&1 | tail -5 | tee "$OUT/df32_pallas.log"
PSA_TEST_TPU=1 timeout 2400 python -m pytest tests/test_df32_gnlse.py tests/test_df32_vgnlse.py tests/test_df32_comb.py tests/test_df32_adaptive.py -q 2>&1 | tail -5 | tee "$OUT/df32_families.log"

echo "== benches (k=3 medians inside) =="
timeout 3600 python bench.py 2>"$OUT/bench_meta.log" | tee "$OUT/bench.json"
timeout 3600 python bench_comb.py 2>"$OUT/bench_comb_meta.log" | tee "$OUT/bench_comb.json"
timeout 3600 python bench_gnlse.py 2>"$OUT/bench_gnlse_meta.log" | tee "$OUT/bench_gnlse.json"
echo "== done; record results in TPU_TESTRUN.md / BENCH_*.md =="
ls -la "$OUT"
