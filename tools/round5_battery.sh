#!/bin/bash
# Round-5 measurement battery (VERDICT r4 next-steps #1,#2,#3,#5,#6).
# Runs every overdue measurement sequentially on the TPU chip, logging one
# file per point under tools/results_r5/. Designed to be resumable: each
# step skips itself if its result file already contains a JSON line.
cd "$(dirname "$0")/.." || exit 1
R=tools/results_r5
mkdir -p $R

have() { [ -f "$1" ] && grep -q '^{' "$1"; }

# Tunnel discipline (measured the hard way): the remote terminal admits one
# client at a time, takes minutes to drain a finished client, and any client
# KILLED mid-dispatch wedges it for ~15 min — including health probes killed
# by their own timeout, which re-wedges in a self-perpetuating loop. So: NO
# probes. Pause between points to let the previous client drain, give each
# point a timeout generous enough to absorb an entry stall, and never run
# two points at once.
run() { # run <outfile> <cmd...>
  local out=$1; shift
  if have "$out"; then echo "SKIP $out"; return; fi
  echo "RUN  $out: $* [$(date)]"
  timeout 3600 "$@" >"$out" 2>&1 || echo "FAIL $out (rc=$?)"
  sleep 120
}

QI=3000   # quality iters
SZ=128    # probe image size

# Persistent compile cache: ramp recompiles repeat across points/clients.
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

pt() { # pt <outfile> <extra-json-fields...>
  local out=$1; shift
  printf '{"out": "%s", "iters": %d, "image_size": %d%s}' "$out" "$QI" "$SZ" "$*"
}

# --- 1-3 + 6: ALL quality points in ONE client (tools/quality_sweep.py):
# one entry stall, one drain, shared compile cache (VERDICT r4 #1,#2,#5).
run $R/sweep.log python tools/quality_sweep.py \
  "$(pt $R/quality_cell_k14.json   ', "model": {"LOG2_HASHMAP_SIZE": 14, "ENCODING_BACKEND": "cell"}, "scene": "textured"')" \
  "$(pt $R/quality_cell_k16.json   ', "model": {"LOG2_HASHMAP_SIZE": 16, "ENCODING_BACKEND": "cell"}, "scene": "textured"')" \
  "$(pt $R/quality_cell_k18.json   ', "model": {"LOG2_HASHMAP_SIZE": 18, "ENCODING_BACKEND": "cell"}, "scene": "textured"')" \
  "$(pt $R/quality_cell_k19.json   ', "model": {"LOG2_HASHMAP_SIZE": 19, "ENCODING_BACKEND": "cell"}, "scene": "textured"')" \
  "$(pt $R/quality_window_k14.json ', "model": {"LOG2_HASHMAP_SIZE": 14, "ENCODING_BACKEND": "window"}, "scene": "textured"')" \
  "$(pt $R/quality_window_k19.json ', "model": {"LOG2_HASHMAP_SIZE": 19, "ENCODING_BACKEND": "window"}, "scene": "textured"')" \
  "$(pt $R/quality_march64.json    ', "model": {"LOG2_HASHMAP_SIZE": 19, "ENCODING_BACKEND": "cell"}, "renderer": {"MARCH_RESOLUTION": 64, "AVG_SAMPLES_PER_RAY": 32}, "scene": "textured"')" \
  "$(pt $R/quality_march128.json   ', "model": {"LOG2_HASHMAP_SIZE": 19, "ENCODING_BACKEND": "cell"}, "renderer": {"MARCH_RESOLUTION": 128, "AVG_SAMPLES_PER_RAY": 24}, "scene": "textured"')" \
  '{"out": "tools/results_r5/quality_dnerf.json", "iters": 3000, "image_size": 64, "dynamic": true}'

# --- 4. capacity-throughput column (driver-side step ms at 262k samples) ---
run $R/throughput_capacity.json python tools/capacity_ab.py \
    --ks 14,16,18,19 --backend cell --skip-quality

# --- 5. GS count-scaling 100k..4M (VERDICT r4 #3) ---
run $R/gs_scale.json python tools/gs_scale.py \
    --counts 100000,500000,1000000,4000000

echo "BATTERY DONE $(date)"
