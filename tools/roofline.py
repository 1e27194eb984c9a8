#!/usr/bin/env python3
"""On-chip roofline microbenchmarks for the INGP throughput analysis
(PERF_NOTES.md "Roofline" section; VERDICT r3 next #1).

Measures, on the attached TPU, the four machine rates the hash-encode
design can be bounded by, plus the cost XLA actually pays for the
GPU-style random gather the reference's tcnn kernel is built on:

  1. HBM streaming bandwidth (saxpy over HBM-resident arrays);
  2. VPU f32 elementwise throughput (high-arithmetic-intensity
     polynomial, HBM traffic amortized);
  3. MXU bf16 matmul throughput;
  4. XLA random gather from a 2^19-row table at the encode's index
     pattern (262144 samples x 16 levels, cell-packed rows) — the
     operation a GPU does natively at HBM bandwidth and a TPU cannot;
  5. the shipped cell encode fwd / fwd+bwd at the same operating point,
     for direct comparison against (4) and the bounds.

Methodology: chained dispatches (tools/_common.timed) — see PERF_NOTES
"Benchmarking through the axon tunnel".
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update('jax_compilation_cache_dir', str(Path.home() / '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

import jax.numpy as jnp
import numpy as np

from _common import timed


def bw_saxpy():
    """HBM streaming rate via a CARRIED buffer: y <- y * c + 1, chained.

    The large array must be the loop-carried value, not a re-passed
    argument — through the axon tunnel, >~100 MB arguments are re-staged
    per dispatch (measured: the same saxpy with 256 MB *arguments* costs
    ~4.8 s/call; carried, it costs ~3 ms), which would measure the tunnel,
    not HBM."""
    m = 8192                                        # 64M f32 = 256 MB
    n = m * m

    @jax.jit
    def step(y):
        return y * 1.0000001 + 1e-9                 # read 256 MB, write 256 MB

    import time as _t
    y = step(jnp.ones((m, m), jnp.float32))
    jax.block_until_ready(y)
    iters = 50
    start = _t.perf_counter()
    for _ in range(iters):
        y = step(y)
    float(y[0, 0])
    ms = (_t.perf_counter() - start - 0.027) / iters * 1000.0
    gbps = 2 * n * 4 / (ms / 1000.0) / 1e9
    print(f'saxpy-carried 64M f32 (read 1, write 1)  {ms:10.3f} ms')
    print(f'  -> HBM streaming {gbps:.1f} GB/s')
    return gbps


def vpu_poly():
    n = 1 << 24                                     # 16M f32, 128 flops/elem
    a = jnp.ones((n,), jnp.float32) * 0.999

    def poly(x):
        y = x
        for _ in range(64):                         # 64 fma = 128 flops
            y = y * x + 0.5
        return y

    ms = timed(poly, (a,), iters=30, label='poly-64 16M f32 (VPU bound)')
    tflops = 128 * n / (ms / 1000.0) / 1e12
    print(f'  -> VPU f32 {tflops:.2f} TFLOP/s')
    return tflops


def mxu_matmul():
    m = 4096
    a = jnp.ones((m, m), jnp.bfloat16)
    b = jnp.ones((m, m), jnp.bfloat16)
    ms = timed(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32),
               (a, b), iters=30, label='matmul 4096^3 bf16')
    tflops = 2 * m ** 3 / (ms / 1000.0) / 1e12
    print(f'  -> MXU bf16 {tflops:.0f} TFLOP/s')
    return tflops


def xla_gather():
    """The tcnn access pattern: per (sample, level), fetch one packed cell
    row (8 corners x 2 feat) from a 2^19-row table. On a GPU this is a
    native 32-byte gather at L2/HBM speed; XLA:TPU lowers it to
    dynamic-slices / one-hot selects."""
    samples = 262144
    levels = 16
    table = jnp.ones((1 << 19, 16), jnp.bfloat16)   # packed cell rows
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 19, (samples, levels)),
        jnp.int32)

    ms = timed(lambda t, i: jnp.take(t, i, axis=0), (table, idx), iters=10,
               label='XLA gather 262k x 16 cell rows from 2^19')
    bytes_needed = samples * levels * 16 * 2
    print(f'  -> achieved {bytes_needed / (ms / 1000.0) / 1e9:.1f} GB/s '
          f'of useful table traffic (ideal-gather machine: HBM rate)')
    return ms


def encode_measured(log2_size=14):
    from nerficg_tpu.ops.hash_cell import hash_encode_cell
    from nerficg_tpu.ops.hashgrid import HashGridConfig, init_hash_grid_mxu
    samples = 262144
    config = HashGridConfig(num_levels=16, features_per_level=2,
                            log2_table_size=log2_size, base_resolution=16,
                            target_resolution=2048, anchor_stride=128)
    rng = np.random.default_rng(0)
    # Shell positions, morton-sorted (the marcher's output statistics).
    pos = rng.normal(size=(samples, 3))
    pos = 0.3 * pos / np.linalg.norm(pos, axis=-1, keepdims=True) + 0.5
    pos = np.clip(pos, 0.001, 0.999)
    q = np.floor(pos * 1024).astype(np.int64)
    key = np.zeros(samples, np.int64)
    for b in range(10):
        for d in range(3):
            key |= ((q[:, d] >> b) & 1) << (3 * b + d)
    pos = jnp.asarray(pos[np.argsort(key)], jnp.float32)
    table = init_hash_grid_mxu(jax.random.PRNGKey(0), config)

    ms_f = timed(lambda t, p: hash_encode_cell(t, p, config), (table, pos),
                 iters=20, label=f'cell encode fwd (262k, 2^{log2_size})')

    def fwdbwd(t, p):
        def f(tt):
            return jnp.sum(hash_encode_cell(tt, p, config) ** 2)
        return jax.grad(f)(t)

    ms_fb = timed(fwdbwd, (table, pos), iters=20,
                  label=f'cell encode fwd+bwd (262k, 2^{log2_size})')
    return ms_f, ms_fb


def main():
    print(f'devices: {jax.devices()}')
    bw = bw_saxpy()
    vpu = vpu_poly()
    mxu = mxu_matmul()
    xla_gather()
    for k in (14, 19):
        try:
            encode_measured(k)
        except Exception as exc:
            print(f'encode measurement (2^{k}) failed: {exc}')
    # The derived bound printed for convenience; full derivation in
    # PERF_NOTES.md "Roofline".
    per_ray = 32 * 16 * 8 * 2 * 2                   # fwd gather bytes/ray
    print(f'ideal-gather fwd-only bound at measured HBM rate: '
          f'{bw * 1e9 / per_ray / 1e6:.1f}M rays/s')
    print(f'(fwd+bwd with read+write scatter: '
          f'{bw * 1e9 / (3 * per_ray) / 1e6:.1f}M rays/s)')


if __name__ == '__main__':
    main()
