#!/bin/bash
# Round-5 phase 1.5: headroom probe — the 128px/3000-iter battery saturates
# near ~15 dB for every capacity (the probe ceiling, not the encode), so the
# capacity / cell-vs-window calls need a bigger instrument: 256px, 6000
# iters, window & cell at 2^14 vs 2^19. One client via quality_sweep.
cd "$(dirname "$0")/.." || exit 1
R=tools/results_r5
mkdir -p $R
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

pt() { local out=$1; shift; printf '{"out": "%s", "iters": 6000, "image_size": 256%s}' "$out" "$*"; }

# Three points decide everything: does capacity separate once the probe
# ceiling lifts (window 14 vs 19), and does cell hold window's quality at
# the operating point (cell 19 vs window 19). cell@14 already lost at 128px.
timeout 7200 python tools/quality_sweep.py \
  "$(pt $R/hr_window_k14.json ', "model": {"LOG2_HASHMAP_SIZE": 14, "ENCODING_BACKEND": "window"}, "scene": "textured"')" \
  "$(pt $R/hr_window_k19.json ', "model": {"LOG2_HASHMAP_SIZE": 19, "ENCODING_BACKEND": "window"}, "scene": "textured"')" \
  "$(pt $R/hr_cell_k19.json   ', "model": {"LOG2_HASHMAP_SIZE": 19, "ENCODING_BACKEND": "cell"}, "scene": "textured"')" \
  > $R/phase15.log 2>&1
echo "PHASE15 DONE $(date)"
