#!/bin/bash
# One-shot on-chip measurement battery — run when the axon tunnel is up.
# Captures every bench the round added plus the canonical tables, into
# benchmarks/results/chipday_<ts>/.
set -u
cd "$(dirname "$0")/.."
# persistent compile cache: repeated battery runs (and reruns after a
# timeout) skip recompilation entirely — measured 0.88s -> 0.02s per
# program over the tunneled AOT compiler
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}
ts=$(date +%Y%m%d_%H%M%S)
out="benchmarks/results/chipday_${ts}"
mkdir -p "$out"
run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$out/log.txt"
  timeout "${RUN_TIMEOUT:-1800}" "$@" > "$out/${name}.json" \
    2> >(tail -40 >> "$out/log.txt")
  echo "--- exit $? ---" >> "$out/log.txt"
}

# TPU kernel test suite first: correctness before numbers
AO_TPU_TESTS=1 timeout 2400 python -m pytest tests/test_pallas_tpu.py -m tpu -q \
  2>&1 | tail -5 | tee "$out/tpu_tests.txt"

run gemm_sol      python benchmarks/gemm_sol.py 8        # %SoL incl nf4 row
run gemm_sol_m1   python benchmarks/gemm_sol.py 1
run gemm_sol_m2048 python benchmarks/gemm_sol.py 2048    # prefill regime
run bench         python bench.py                        # THE headline
# 10 full-model compiles: needs the long timeout on a cold compile cache
RUN_TIMEOUT=3600 run decode_suite  python benchmarks/decode_suite.py
run train_bench   python benchmarks/train_bench.py 4 4096
run sam_bench     python benchmarks/sam_bench.py 4
run diffusion     python benchmarks/diffusion_bench.py
run moe_grouped   python benchmarks/moe_grouped_bench.py 8
run moe_grouped64 python benchmarks/moe_grouped_bench.py 64
run spec_bench    python benchmarks/spec_bench.py
run attn_sol      python benchmarks/attn_sol.py
run serving       python benchmarks/serving_bench.py
run ppl_ladder    python benchmarks/ppl_delta.py       # incl kv-int8/int4 rows
# multi-chip scaling story: real-v5e-HLO wire anchor (topology AOT) then
# the projection that consumes it — the BASELINE >=85% @ 8 chips gate
run tp_wire_anchor python benchmarks/tp_wire_anchor.py
run scaling       python benchmarks/scaling_projection.py

# throughput-regression gate vs the last COMMITTED chipday dir: fails the
# battery if any tok/s (or kernel us) row regressed >15%
run regression    python benchmarks/regression_check.py "$out"

echo "done: $out"
