#!/bin/bash
# Round-5 phase 3: the points the earlier phases could not finish.
#  - gs_scale's 4M count (its own client; frames/iters bounded so the
#    point fits its timeout even with cold compiles)
#  - the DNeRF probe on the opaque dynamic textured scene (the blob
#    dynamic probe saturates ~18 dB)
cd "$(dirname "$0")/.." || exit 1
R=tools/results_r5
mkdir -p $R
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

have() { [ -f "$1" ] && grep -q '^{' "$1"; }

run() { # run <outfile> <cmd...>
  local out=$1; shift
  if have "$out"; then echo "SKIP $out"; return; fi
  echo "RUN  $out: $* [$(date)]"
  timeout 3600 "$@" >"$out" 2>&1 || echo "FAIL $out (rc=$?)"
  sleep 120
}

run $R/gs_scale_4m.json python tools/gs_scale.py --counts 4000000 \
    --frames 8 --train-iters 5

if ! have $R/quality_dnerf_textured.json; then
  echo "RUN  dnerf_textured [$(date)]"
  timeout 3600 python tools/quality_sweep.py \
    '{"out": "tools/results_r5/quality_dnerf_textured.json", "iters": 3000, "image_size": 64, "dynamic": true, "scene": "textured"}' \
    > $R/dnerf_textured_sweep.log 2>&1 || echo "FAIL dnerf_textured (rc=$?)"
fi

echo "PHASE3 DONE $(date)"
