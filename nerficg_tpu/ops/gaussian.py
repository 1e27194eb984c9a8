"""3D Gaussian math: covariance building, EWA projection, culling.

Reference equivalent: the projection/culling half of the external
diff-gaussian-rasterization CUDA package (SURVEY §2.12 N12) consumed via
src/Thirdparty/DiffGaussianRasterization.py and configured by
src/Methods/GaussianSplatting/Renderer.py:51-156.

All functions are batched jnp over the full Gaussian set — projection is
dense VPU/MXU work; only the tile rasterization needs special treatment
(ops/gs_rasterize.py).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ['quaternion_to_rotation', 'build_covariance_3d', 'project_gaussians']


def quaternion_to_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz (normalized by caller) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def build_covariance_3d(scales: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) scales + (N, 4) unit quaternions -> (N, 3, 3) covariances
    (Sigma = R S S^T R^T)."""
    rot = quaternion_to_rotation(rotations)
    m = rot * scales[:, None, :]
    return m @ jnp.swapaxes(m, -1, -2)


def project_gaussians(means3d: jnp.ndarray, cov3d: jnp.ndarray,
                      w2c: jnp.ndarray, focal_x: float, focal_y: float,
                      center_x: float, center_y: float,
                      width: int, height: int,
                      near: float = 0.01,
                      low_pass: float = 0.3) -> dict:
    """EWA splatting projection of all Gaussians to screen space.

    Returns dict with:
      means2d (N, 2) pixel centers, depths (N,), conics (N, 3) = inverse 2D
      covariance upper triangle (a, b, c), radii (N,) pixel radius,
      in_frustum (N,) bool.
    """
    # Camera-space means.
    cam = means3d @ w2c[:3, :3].T + w2c[:3, 3]
    x, y, z = cam[..., 0], cam[..., 1], cam[..., 2]
    in_front = z > near
    z_safe = jnp.maximum(z, near)

    # Pixel-space centers.
    px = x / z_safe * focal_x + center_x
    py = y / z_safe * focal_y + center_y

    # Jacobian of the projective transform (EWA approximation), with the
    # standard tan-fov clamp on x/z, y/z to bound the Jacobian at the frustum
    # edge (as in the reference CUDA kernel).
    lim_x = 1.3 * (0.5 * width / focal_x)
    lim_y = 1.3 * (0.5 * height / focal_y)
    tx = jnp.clip(x / z_safe, -lim_x, lim_x) * z_safe
    ty = jnp.clip(y / z_safe, -lim_y, lim_y) * z_safe
    zero = jnp.zeros_like(z_safe)
    j_row0 = jnp.stack([focal_x / z_safe, zero, -focal_x * tx / (z_safe ** 2)], -1)
    j_row1 = jnp.stack([zero, focal_y / z_safe, -focal_y * ty / (z_safe ** 2)], -1)
    jac = jnp.stack([j_row0, j_row1], axis=-2)                 # (N, 2, 3)

    rot_cw = w2c[:3, :3]
    t = jac @ rot_cw                                            # (N, 2, 3)
    cov2d = t @ cov3d @ jnp.swapaxes(t, -1, -2)                 # (N, 2, 2)
    # Low-pass filter: every splat is at least ~low_pass px wide (reference
    # kernel adds 0.3 to the diagonal).
    a = cov2d[..., 0, 0] + low_pass
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1] + low_pass

    det = a * c - b * b
    det_safe = jnp.maximum(det, 1e-12)
    inv_a = c / det_safe
    inv_b = -b / det_safe
    inv_c = a / det_safe
    conics = jnp.stack([inv_a, inv_b, inv_c], axis=-1)

    # 3-sigma pixel radius from the largest eigenvalue.
    mid = 0.5 * (a + c)
    eig1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radii = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(eig1, 0.0)))

    visible = in_front & (det > 0) & \
        (px + radii > 0) & (px - radii < width) & \
        (py + radii > 0) & (py - radii < height)
    return {
        'means2d': jnp.stack([px, py], axis=-1),
        'depths': z,
        'conics': conics,
        'radii': jnp.where(visible, radii, 0.0),
        'in_frustum': visible,
    }
