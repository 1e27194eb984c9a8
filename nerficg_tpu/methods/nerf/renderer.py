"""NeRF renderer: hierarchical coarse->fine ray rendering.

Reference equivalent: src/Methods/NeRF/Renderer.py (ray chunking by
RAY_BATCH_SIZE, coarse pass -> PDF resample -> merged sorted samples -> fine
pass, :21-95; config :98-102; render_image :132-140).

TPU-first: one jitted ``_render_chunk`` handles a static-shaped ray chunk;
full images are rendered by slicing the pixel grid into fixed chunks (padded
at the tail) so a single compiled executable serves every view. Batched
sample evaluation keeps the MLP matmuls at (chunk * samples, width) — large,
static, MXU-shaped.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from nerficg_tpu.cameras.base import generate_rays
from nerficg_tpu.core.config import Configurable
from nerficg_tpu.data.types import RayBatch, View
from nerficg_tpu.methods.base.renderer import BaseRenderer
from nerficg_tpu.methods.nerf.model import NeRFModel
from nerficg_tpu.ops.compositing import composite_rays
from nerficg_tpu.ops.sampling import (merge_sorted_samples, sample_pdf,
                                      stratified_samples)

__all__ = ['NeRFRenderer']


@Configurable.configure(
    RAY_BATCH_SIZE=8192,
    N_SAMPLES=256,
    COARSE_RATIO=0.25,
)
class NeRFRenderer(BaseRenderer):

    MODEL_CLASS = NeRFModel

    def __init__(self, config, model, mesh=None):
        super().__init__(config, model, mesh)
        self.num_coarse = max(int(self.N_SAMPLES * self.COARSE_RATIO), 1)
        self.num_fine = int(self.N_SAMPLES) - self.num_coarse
        self._render_jit = jax.jit(
            partial(self._render_rays_impl), static_argnames=('randomized',))

    # -- core ray rendering (pure, jitted) --------------------------------------
    def _render_rays_impl(self, params: dict, origins: jnp.ndarray,
                          directions: jnp.ndarray, rng: jax.Array,
                          near: jnp.ndarray, far: jnp.ndarray,
                          background: jnp.ndarray,
                          randomized: bool = True) -> dict:
        num_rays = origins.shape[0]
        rng_coarse, rng_pdf, rng_noise = jax.random.split(rng, 3)
        use_coarse = 'coarse' in params

        t_coarse = stratified_samples(rng_coarse, num_rays, self.num_coarse,
                                      near, far, randomized)
        dirs_n = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)

        def eval_block(block: str, t: jnp.ndarray) -> dict:
            positions = origins[:, None, :] + dirs_n[:, None, :] * t[..., None]
            s = t.shape[1]
            flat_pos = positions.reshape(num_rays * s, 3)
            flat_dir = jnp.broadcast_to(dirs_n[:, None, :],
                                        (num_rays, s, 3)).reshape(-1, 3)
            density, rgb = self.model.apply(
                params, block, flat_pos, flat_dir,
                density_noise_rng=rng_noise if randomized else None)
            deltas = jnp.diff(t, axis=-1, append=far * jnp.ones_like(t[:, :1]))
            return composite_rays(rgb.reshape(num_rays, s, 3),
                                  density.reshape(num_rays, s),
                                  t, deltas, background=background)

        outputs = {}
        if use_coarse:
            coarse = eval_block('coarse', t_coarse)
            # Hierarchical resampling from coarse weights
            # (reference: NeRF/Renderer.py:50-70).
            mids = 0.5 * (t_coarse[:, 1:] + t_coarse[:, :-1])
            bins = jnp.concatenate(
                [t_coarse[:, :1], mids, t_coarse[:, -1:]], axis=-1)
            t_fine = sample_pdf(rng_pdf, bins,
                                jax.lax.stop_gradient(coarse['weights']),
                                self.num_fine, randomized)
            t_all = merge_sorted_samples(t_coarse, t_fine)
            outputs['coarse_rgb'] = coarse['rgb']
        else:
            t_extra = stratified_samples(rng_pdf, num_rays, self.num_fine,
                                         near, far, randomized)
            t_all = merge_sorted_samples(t_coarse, t_extra)

        fine = eval_block('fine', t_all)
        outputs.update(rgb=fine['rgb'], depth=fine['depth'], alpha=fine['alpha'])
        return outputs

    # -- public API -----------------------------------------------------------------
    def render_rays(self, rays: RayBatch, rng: Optional[jax.Array] = None,
                    randomized: bool = False,
                    background: Optional[jnp.ndarray] = None) -> dict:
        """Render a RayBatch in RAY_BATCH_SIZE chunks (reference: Renderer.py:44-47)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        chunk_size = int(self.RAY_BATCH_SIZE)
        near, far, bg = self._ray_constants(background)
        outputs = []
        n = len(rays)
        padded = ((n + chunk_size - 1) // chunk_size) * chunk_size
        rays_p = rays.pad_to(padded)
        for i in range(0, padded, chunk_size):
            chunk_rng = jax.random.fold_in(rng, i)
            out = self._render_jit(self.model.params,
                                   rays_p.origins[i:i + chunk_size],
                                   rays_p.directions[i:i + chunk_size],
                                   chunk_rng, near, far, bg,
                                   randomized=randomized)
            outputs.append(out)
        merged = {k: jnp.concatenate([o[k] for o in outputs], axis=0)[:n]
                  for k in outputs[0]}
        return merged

    def _ray_constants(self, background=None):
        cs = getattr(self, '_camera_settings', None)
        near = jnp.asarray(cs.near if cs else 2.0, jnp.float32)
        far = jnp.asarray(cs.far if cs else 6.0, jnp.float32)
        bg = jnp.asarray(background if background is not None else
                         (cs.background_color if cs else jnp.zeros(3)),
                         jnp.float32)
        return near, far, bg

    def bind_camera_settings(self, settings) -> None:
        self._camera_settings = settings

    def render_image(self, view: View, rng: Optional[jax.Array] = None,
                     benchmark: bool = False) -> dict[str, jnp.ndarray]:
        """(reference: Renderer.py:132-140)"""
        self.bind_camera_settings(view.camera.settings)
        rays = view.get_rays(with_images=False)
        out = self.render_rays(rays, rng=rng, randomized=False)
        h, w = view.camera.height, view.camera.width
        result = {
            'rgb': out['rgb'].reshape(h, w, 3),
            'depth': out['depth'].reshape(h, w, 1),
            'alpha': out['alpha'].reshape(h, w, 1),
        }
        if benchmark:
            from nerficg_tpu.core.setup import device_sync
            device_sync(result['rgb'])
        return result
