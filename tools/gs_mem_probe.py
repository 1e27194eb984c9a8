#!/usr/bin/env python3
"""Compile-only HBM probe for the GS inference render fn vs Gaussian count.

The 4M-point of tools/gs_scale.py died with a buffer-assignment OOM
(program 22.97G of 15.75G HBM). This lowers + compiles the exact
measure_gs_fps program at increasing counts (no on-chip execution) and
prints the per-count memory analysis, so the scaling culprit can be read
off instead of guessed.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--counts', default='500000,1000000,2000000')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    for n in (int(c) for c in args.counts.split(',')):
        cfg, model, renderer = bench._make_gs_model(n)
        h, w = 1080, 1920
        intrinsics = (0.8 * w, 0.8 * w, w / 2.0, h / 2.0, w, h)
        fn = renderer._get_render_fn(intrinsics, int(model.active_sh_degree))
        offset = jnp.zeros((model.params['positions'].shape[0], 2),
                           jnp.float32)
        w2c = jnp.asarray(np.eye(4, dtype=np.float32))
        eye = jnp.zeros(3, jnp.float32)
        bg = jnp.zeros(3)
        try:
            lowered = fn.lower(model.params, offset, w2c, eye, background=bg)
            compiled = lowered.compile()
            ma = compiled.memory_analysis()
            print(f'n={n}: '
                  f'args={ma.argument_size_in_bytes / 1e9:.2f}G '
                  f'out={ma.output_size_in_bytes / 1e9:.2f}G '
                  f'temp={ma.temp_size_in_bytes / 1e9:.2f}G '
                  f'gen={ma.generated_code_size_in_bytes / 1e6:.1f}M',
                  flush=True)
        except Exception as exc:
            print(f'n={n}: FAILED {type(exc).__name__}: '
                  f'{str(exc)[:300]}', flush=True)


if __name__ == '__main__':
    main()
