"""Input encodings: NeRF frequency encoding and real spherical harmonics.

Reference equivalents:
  * ``FrequencyEncoding`` (src/Methods/NeRF/utils.py:12-37).
  * tiny-cuda-nn's SphericalHarmonics encoding (degree 4) used by InstantNGP
    (src/Methods/InstantNGP/Model.py:90-115) and the SH->RGB evaluation of
    3DGS (src/Methods/GaussianSplatting/utils.py:21-59).

Pure jnp: these are elementwise/VPU ops that XLA fuses into the adjacent
matmuls; no kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ['frequency_encode', 'frequency_encoding_dim', 'sh_encode',
           'eval_sh', 'SH_C0']


def frequency_encode(x: jnp.ndarray, num_frequencies: int,
                     include_input: bool = True) -> jnp.ndarray:
    """NeRF positional encoding: [x, sin(2^k x), cos(2^k x)]
    (reference: NeRF/utils.py:12-37)."""
    if num_frequencies == 0:
        return x
    freqs = (2.0 ** jnp.arange(num_frequencies)) * jnp.pi
    scaled = x[..., None, :] * freqs[:, None]          # (..., F, D)
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    enc = jnp.concatenate([sin, cos], axis=-1).reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def frequency_encoding_dim(input_dim: int, num_frequencies: int,
                           include_input: bool = True) -> int:
    return input_dim * (2 * num_frequencies + (1 if include_input else 0))


# -- real spherical harmonics (hard-coded to degree 4, matching tcnn/3DGS) ----

SH_C0 = 0.28209479177387814
_SH_C1 = 0.4886025119029199
_SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396)
_SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435)


def sh_encode(directions: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Unit directions (..., 3) -> SH basis values (..., degree^2).

    Matches the real-SH convention of tcnn / 3DGS (reference:
    GaussianSplatting/utils.py:21-59). ``degree`` counts bands, so degree=4
    yields 16 coefficients.
    """
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    out = [jnp.full(x.shape, SH_C0, directions.dtype)]
    if degree > 1:
        out += [-_SH_C1 * y, _SH_C1 * z, -_SH_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [_SH_C2[0] * xy, _SH_C2[1] * yz,
                _SH_C2[2] * (2.0 * zz - xx - yy),
                _SH_C2[3] * xz, _SH_C2[4] * (xx - yy)]
    if degree > 3:
        out += [_SH_C3[0] * y * (3.0 * xx - yy),
                _SH_C3[1] * xy * z,
                _SH_C3[2] * y * (4.0 * zz - xx - yy),
                _SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                _SH_C3[4] * x * (4.0 * zz - xx - yy),
                _SH_C3[5] * z * (xx - yy),
                _SH_C3[6] * x * (xx - 3.0 * yy)]
    return jnp.stack(out, axis=-1)


def eval_sh(sh_coeffs: jnp.ndarray, directions: jnp.ndarray,
            degree: int) -> jnp.ndarray:
    """Evaluate SH color: coefficients (..., K, C) x basis (..., K) -> (..., C)
    with the 3DGS +0.5 offset applied by the caller."""
    basis = sh_encode(directions, degree)                       # (..., K)
    k = degree * degree
    return jnp.einsum('...kc,...k->...c', sh_coeffs[..., :k, :], basis[..., :k])
