#!/bin/bash
# Round-5 measurement battery (VERDICT r4 next-steps #1,#2,#3,#5,#6).
# Runs every overdue measurement sequentially on the TPU chip, logging one
# file per point under tools/results_r5/. Designed to be resumable: each
# step skips itself if its result file already contains a JSON line.
cd "$(dirname "$0")/.." || exit 1
R=tools/results_r5
mkdir -p $R

have() { [ -f "$1" ] && grep -q '^{' "$1"; }

# The axon tunnel occasionally wedges for ~10-15 min after a client is
# killed mid-dispatch, and fresh processes can stall several minutes at
# their first compile. Gate each point on a compute health probe and give
# points a generous timeout so they are never killed mid-stall.
tpu_wait() {
  for _ in $(seq 1 30); do
    if timeout 120 python -c "import jax, jax.numpy as jnp; assert float(jnp.arange(4).sum())==6.0" >/dev/null 2>&1; then
      return 0
    fi
    echo "tpu busy/wedged, waiting... $(date)"
    sleep 60
  done
  echo "TPU never recovered"; return 1
}

run() { # run <outfile> <cmd...>
  local out=$1; shift
  if have "$out"; then echo "SKIP $out"; return; fi
  tpu_wait || return 1
  echo "RUN  $out: $*"
  timeout 3600 "$@" >"$out" 2>&1 || echo "FAIL $out (rc=$?)"
}

QI=3000   # quality iters
SZ=128    # probe image size

# --- 1. capacity-quality sweep, cell backend (VERDICT r4 #1, 3rd ask) ---
for K in 14 16 18 19; do
  run $R/quality_cell_k$K.json python bench.py --quality --scene textured \
      --iters $QI --image-size $SZ \
      --model LOG2_HASHMAP_SIZE=$K --model ENCODING_BACKEND=cell
done

# --- 2. cell-vs-window at equal settings (gen-4 discontinuity call) ---
for K in 14 19; do
  run $R/quality_window_k$K.json python bench.py --quality --scene textured \
      --iters $QI --image-size $SZ \
      --model LOG2_HASHMAP_SIZE=$K --model ENCODING_BACKEND=window
done

# --- 3. march-grid A/B: 64^3@32spr vs 128^3@24spr (VERDICT r4 #2) ---
run $R/quality_march64.json python bench.py --quality --scene textured \
    --iters $QI --image-size $SZ --model LOG2_HASHMAP_SIZE=19 \
    --renderer MARCH_RESOLUTION=64 --renderer AVG_SAMPLES_PER_RAY=32
run $R/quality_march128.json python bench.py --quality --scene textured \
    --iters $QI --image-size $SZ --model LOG2_HASHMAP_SIZE=19 \
    --renderer MARCH_RESOLUTION=128 --renderer AVG_SAMPLES_PER_RAY=24

# --- 4. capacity-throughput column (driver-side step ms at 262k samples) ---
run $R/throughput_capacity.json python tools/capacity_ab.py \
    --ks 14,16,18,19 --backend cell --skip-quality

# --- 5. GS count-scaling 100k..4M (VERDICT r4 #3) ---
run $R/gs_scale.json python tools/gs_scale.py \
    --counts 100000,500000,1000000,4000000

# --- 6. DNeRF probe (VERDICT r4 #5, 3rd ask) ---
run $R/quality_dnerf.json python bench.py --quality --dynamic \
    --iters $QI --image-size 64

echo "BATTERY DONE $(date)"
