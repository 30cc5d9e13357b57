#!/bin/bash
# Round-5 priority battery — the subset of chipday.sh that validates this
# round's changes, ordered most-important-first so a partial run still
# commits the key evidence (use when chip time is short; full battery =
# chipday.sh).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}
ts=$(date +%Y%m%d_%H%M%S)
out="benchmarks/results/chipday_${ts}"
mkdir -p "$out"
run() {
  name=$1; shift
  echo "=== $name: $*" | tee -a "$out/log.txt"
  timeout "${RUN_TIMEOUT:-1800}" "$@" > "$out/${name}.json" \
    2> >(tail -40 >> "$out/log.txt")
  echo "--- $name exit $? ---" | tee -a "$out/log.txt"
}

run bench          python bench.py                           # headline
run attn_sol       python benchmarks/attn_sol.py             # new KV kernels + prefill rows
run tp_wire_anchor python benchmarks/tp_wire_anchor.py       # real-HLO anchor
run scaling        python benchmarks/scaling_projection.py   # >=85% gate
RUN_TIMEOUT=3600 run decode_suite python benchmarks/decode_suite.py  # KV e2e
run diffusion      python benchmarks/diffusion_bench.py      # producer-quant DiT
run sam_bench      python benchmarks/sam_bench.py 4          # producer-quant SAM
run serving        python benchmarks/serving_bench.py        # engine k=1 fix
RUN_TIMEOUT=2400 run spec_bench python benchmarks/spec_bench.py  # trained pair
RUN_TIMEOUT=2400 run ppl_ladder python benchmarks/ppl_delta.py   # stderr ladder
run gemm_sol       python benchmarks/gemm_sol.py 8
run regression     python benchmarks/regression_check.py "$out"
echo "done: $out"
