#!/bin/bash
# Round-5 phase 2: TPU measurements that depend on the round-5 kernel work
# (GS tacc backward, FIR SSIM, channel-major stream) and on trained outputs.
# Resumable: each point skips itself if its result file already has output.
# Ordered by verdict value: the e2e inference run and the two default-
# deciding throughput points come before the optional profiles.
cd "$(dirname "$0")/.." || exit 1
R=tools/results_r5
mkdir -p $R
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

have() { [ -f "$1" ] && grep -q '^{' "$1"; }
havetxt() { [ -f "$1" ] && [ -s "$1" ]; }

run() { # run <outfile> <cmd...>  (JSON-line result files)
  local out=$1; shift
  if have "$out"; then echo "SKIP $out"; return; fi
  echo "RUN  $out: $* [$(date)]"
  timeout 3600 "$@" >"$out" 2>&1 || echo "FAIL $out (rc=$?)"
  sleep 120  # tunnel drain; see round5_battery.sh discipline note
}

runtxt() { # runtxt <outfile> <cmd...>  (plain-text result files)
  local out=$1; shift
  if havetxt "$out"; then echo "SKIP $out"; return; fi
  echo "RUN  $out: $* [$(date)]"
  timeout 3600 "$@" >"$out" 2>&1 || echo "FAIL $out (rc=$?)"
  sleep 120
}

# --- 1. march-default throughput check: 128^3@24spr step cost at the
# 8192-ray operating point (quality A/B: +0.92 dB; flips the default
# only if step cost is ~equal) ---
runtxt $R/ingp_march128_step.txt python tools/profile_ingp.py --which step \
    --set RENDERER.MARCH_RESOLUTION=128 --set RENDERER.AVG_SAMPLES_PER_RAY=24

# --- 2. window-backend step cost at 2^14/2^19 (the default-encode call:
# window k14 matches cell k19 quality on the probe — at what step price?) ---
run $R/throughput_window.json python tools/capacity_ab.py \
    --ks 14,19 --backend window --skip-quality

# --- 3. end-to-end inference.py -b (VERDICT r4 #6) ---
if ! havetxt $R/e2e_inference.txt; then
  python -c "from nerficg_tpu.data.synthetic import make_textured_scene; \
             make_textured_scene('.bench_scenes/textured', image_size=400)"
  timeout 3600 python scripts/train.py -c configs/ingp_e2e_bench.yaml \
      > $R/e2e_train.log 2>&1 || echo "FAIL e2e train"
  sleep 120
  RUN_DIR=$(ls -dt output/InstantNGPModel/e2e_bench_* 2>/dev/null | head -1)
  if [ -n "$RUN_DIR" ]; then
    timeout 3600 python scripts/inference.py -d "$RUN_DIR" -b --repeats 25 \
        > $R/e2e_inference.txt 2>&1 || echo "FAIL e2e inference"
    cp "$RUN_DIR"/performance_*.txt $R/ 2>/dev/null
    sleep 120
  fi
fi

# --- 4. headline bench with the round-5 kernels ---
run $R/bench_headline.json python bench.py

# --- 5. GS train profile (tacc bwd + FIR SSIM) — may already exist ---
runtxt $R/gs_train_profile.json python tools/profile_gs.py --which train

# --- 6. GS inference stage profiles (100k regression hunt; 1M budget) ---
runtxt $R/gs_infer_profile.json python tools/profile_gs.py --which infer
runtxt $R/gs_infer_profile_1m.json python tools/profile_gs.py --which infer \
    --num 1000000

# --- 7. INGP step stage profile (the non-encode 4.6 ms) ---
runtxt $R/ingp_profile.txt python tools/profile_ingp.py --which step

echo "PHASE2 DONE $(date)"
