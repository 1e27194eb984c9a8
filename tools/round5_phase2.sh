#!/bin/bash
# Round-5 phase 2: TPU measurements that depend on the round-5 kernel work
# (GS tacc backward, FIR SSIM) and on the battery's trained outputs.
# Same resumable pattern as round5_battery.sh. Run AFTER the battery exits.
cd "$(dirname "$0")/.." || exit 1
R=tools/results_r5
mkdir -p $R

have() { [ -f "$1" ] && grep -q '^{' "$1"; }
havetxt() { [ -f "$1" ] && [ -s "$1" ]; }

run() { # run <outfile> <cmd...>
  local out=$1; shift
  if have "$out"; then echo "SKIP $out"; return; fi
  echo "RUN  $out: $* [$(date)]"
  timeout 3600 "$@" >"$out" 2>&1 || echo "FAIL $out (rc=$?)"
  sleep 120  # drain pause; see round5_battery.sh tunnel discipline note
}

# --- 1. GS train step with the round-5 kernel work (tacc bwd + FIR SSIM) ---
run $R/gs_train_profile.json python tools/profile_gs.py --which train

# --- 1b. GS inference stage profile (the channel-major stream regressed
# 63.7 -> 56.5 FPS at 100k: find which stage absorbs the CH-aligned waste)
run $R/gs_infer_profile.json python tools/profile_gs.py --which infer

# --- 1c. GS inference stage profile at 1M (where does 112.8 ms go?) ---
run $R/gs_infer_profile_1m.json python tools/profile_gs.py --which infer \
    --num 1000000

# --- 2. GS chunk-size A/B (NERFICG_GS_CH; stream bwd needs k % CH == 0) ---
for C in 64 128 256; do
  if ! have $R/gs_train_ch$C.json; then
    echo "RUN  gs_train_ch$C [$(date)]"
    NERFICG_GS_CH=$C timeout 3600 python tools/profile_gs.py --which train \
        >$R/gs_train_ch$C.json 2>&1 || echo "FAIL ch$C"
    sleep 120
  fi
done

# --- 3. INGP step stage profile (attack plan for the non-encode 4.6 ms) ---
run $R/ingp_profile.json python tools/profile_ingp.py --which step

# --- 3b. march-default throughput check: 128^3@24spr step cost at the
# 8192-ray operating point (the quality A/B gave 128^3@24spr +0.92 dB;
# the default flips only if the step cost is ~equal) ---
run $R/ingp_march128_step.json python tools/profile_ingp.py --which step \
    --set RENDERER.MARCH_RESOLUTION=128 --set RENDERER.AVG_SAMPLES_PER_RAY=24

# --- 3c. window-backend step cost at 2^14/2^19 (the default-encode call:
# window k14 matches cell k19 quality on the probe — at what step price?) ---
run $R/throughput_window.json python tools/capacity_ab.py \
    --ks 14,19 --backend window --skip-quality

# --- 4. end-to-end inference.py -b (VERDICT r4 #6) ---
if ! havetxt $R/e2e_inference.txt; then
  python -c "from nerficg_tpu.data.synthetic import make_textured_scene; \
             make_textured_scene('.bench_scenes/textured', image_size=400)"
  timeout 2400 python scripts/train.py -c configs/ingp_e2e_bench.yaml \
      > $R/e2e_train.log 2>&1 || echo "FAIL e2e train"
  RUN_DIR=$(ls -dt output/InstantNGPModel/e2e_bench_* 2>/dev/null | head -1)
  if [ -n "$RUN_DIR" ]; then
    timeout 2400 python scripts/inference.py -d "$RUN_DIR" -b --repeats 25 \
        > $R/e2e_inference.txt 2>&1 || echo "FAIL e2e inference"
    cp "$RUN_DIR"/performance_*.txt $R/ 2>/dev/null
  fi
fi

# --- 5. headline bench with the round-5 kernels ---
run $R/bench_headline.json python bench.py

echo "PHASE2 DONE $(date)"
