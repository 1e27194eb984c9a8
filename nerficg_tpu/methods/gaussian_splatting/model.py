"""3D Gaussian Splatting model: parameters, activations, densification, export.

Reference equivalent: the ``Gaussians`` container
(src/Methods/GaussianSplatting/Model.py:18-317): raw parameters positions /
features_dc / features_rest / scales / rotations / opacities with
exp / sigmoid / normalize activations, SfM-point-cloud init with RMS-kNN
scale init and 0.1 opacity, clone/split/prune densification performed through
the optimizer (adam_utils), opacity reset, Morton-sorted activation baking,
and standard-3DGS PLY export.

TPU-first redesign: the Gaussian set lives in FIXED-CAPACITY arrays with a
host-side active count — densification edits host numpy copies and pushes
back, so compiled train steps only ever see a few capacity buckets instead
of recompiling at every count change (SURVEY §7 hard part 4). Dead slots
have sigmoid-opacity ~0 and are culled by the rasterizer's alpha threshold.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerficg_tpu.core.config import Configurable
from nerficg_tpu.core.logging import Logger
from nerficg_tpu.data.types import BasicPointCloud
from nerficg_tpu.methods.base.model import BaseModel
from nerficg_tpu.ops.encoding import SH_C0
from nerficg_tpu.ops.knn import knn_mean_sq_distance

__all__ = ['GaussianSplattingModel']

DEAD_OPACITY_RAW = -15.0    # sigmoid ~ 3e-7: culled by the alpha threshold


def _inverse_sigmoid(x):
    return np.log(x / (1.0 - x))


@Configurable.configure(
    SH_DEGREE=4,                 # bands; 16 coefficients
    INITIAL_OPACITY=0.1,
    CAPACITY_GRANULARITY=16384,  # arrays grow in these increments
    MAX_CAPACITY=4194304,
)
class GaussianSplattingModel(BaseModel):

    def build(self, rng: Optional[jax.Array] = None,
              point_cloud: Optional[BasicPointCloud] = None) -> 'GaussianSplattingModel':
        if point_cloud is None:
            # Placeholder cloud; trainers re-init from the dataset
            # (reference: Trainer.py:62-68 random fallback).
            rng_np = np.random.default_rng(0)
            point_cloud = BasicPointCloud(
                positions=rng_np.random((1024, 3)).astype(np.float32) * 2 - 1,
                colors=rng_np.random((1024, 3)).astype(np.float32))
        self.init_from_point_cloud(point_cloud)
        return self

    # -- initialization --------------------------------------------------------
    def init_from_point_cloud(self, pcd: BasicPointCloud) -> None:
        """(reference: Model.py:94-119)"""
        n = len(pcd)
        positions = np.asarray(pcd.positions, np.float32)
        colors = pcd.colors if pcd.colors is not None else np.full((n, 3), 0.5)
        # RMS-kNN(3) scale init.
        mean_sq = np.maximum(knn_mean_sq_distance(positions, 3), 1e-7)
        scales = np.log(np.sqrt(mean_sq))[:, None].repeat(3, axis=1)
        rotations = np.zeros((n, 4), np.float32)
        rotations[:, 0] = 1.0
        opacities = np.full((n, 1),
                            _inverse_sigmoid(float(self.INITIAL_OPACITY)),
                            np.float32)
        num_coeffs = int(self.SH_DEGREE) ** 2
        features_dc = ((colors - 0.5) / SH_C0).astype(np.float32)[:, None, :]
        features_rest = np.zeros((n, num_coeffs - 1, 3), np.float32)

        capacity = self._capacity_for(n)
        self.params = {
            'positions': self._padded(positions, capacity),
            'features_dc': self._padded(features_dc, capacity),
            'features_rest': self._padded(features_rest, capacity),
            'scales': self._padded(scales.astype(np.float32), capacity,
                                   fill=-10.0),
            'rotations': self._padded(rotations, capacity),
            'opacities': self._padded(opacities, capacity,
                                      fill=DEAD_OPACITY_RAW),
        }
        self.num_active = n
        self.buffers = {}
        self.active_sh_degree = 1

    def _capacity_for(self, n: int) -> int:
        gran = int(self.CAPACITY_GRANULARITY)
        return min(max(-(-n // gran), 1) * gran, int(self.MAX_CAPACITY))

    @staticmethod
    def _padded(arr: np.ndarray, capacity: int, fill: float = 0.0) -> jnp.ndarray:
        pad = capacity - arr.shape[0]
        if pad > 0:
            arr = np.concatenate(
                [arr, np.full((pad,) + arr.shape[1:], fill, arr.dtype)])
        return jnp.asarray(arr)

    # -- activations (pure) ------------------------------------------------------
    @staticmethod
    def get_scales(params) -> jnp.ndarray:
        # Clamp so a runaway raw scale cannot produce inf covariances.
        return jnp.exp(jnp.clip(params['scales'], -15.0, 10.0))

    @staticmethod
    def get_rotations(params) -> jnp.ndarray:
        q = params['rotations']
        # rsqrt(max(...)) has a finite derivative at q=0 — norm() would give
        # NaN gradients for zero-padded (dead) slots that poison Adam.
        inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True),
                                        1e-12))
        return q * inv

    @staticmethod
    def get_opacities(params) -> jnp.ndarray:
        return jax.nn.sigmoid(params['opacities'])[:, 0]

    @staticmethod
    def get_features(params) -> jnp.ndarray:
        return jnp.concatenate([params['features_dc'],
                                params['features_rest']], axis=1)  # (N, K, 3)

    # -- densification (host-side; reference: Model.py:202-259) -------------------
    def densify_and_prune(self, opt_state, grad_accum: np.ndarray,
                          grad_count: np.ndarray, grad_threshold: float,
                          scene_extent: float,
                          percent_dense: float = 0.01,
                          min_opacity: float = 0.005,
                          max_screen_size: Optional[float] = None,
                          max_radii: Optional[np.ndarray] = None):
        """Clone small / split large / prune — returns (params, opt_state).

        grad_accum/grad_count: per-slot accumulated viewspace grad norms and
        visibility counts (reference: Model.py:256-259).
        """
        from nerficg_tpu.optim.state_surgery import apply_row_surgery

        n_active = self.num_active
        capacity = self.params['positions'].shape[0]
        host = {k: np.asarray(v) for k, v in self.params.items()}
        avg_grad = grad_accum / np.maximum(grad_count, 1)
        scales = np.exp(host['scales'])
        max_scale = scales.max(-1)
        opacity = 1.0 / (1.0 + np.exp(-host['opacities'][:, 0]))

        active = np.zeros(capacity, bool)
        active[:n_active] = True
        needs_densify = active & (avg_grad >= grad_threshold)
        small = max_scale <= percent_dense * scene_extent
        to_clone = needs_densify & small
        to_split = needs_densify & ~small

        # Prune: low opacity or huge world/screen size (reference: :242-254).
        to_prune = active & (opacity < min_opacity)
        if max_screen_size is not None and max_radii is not None:
            to_prune |= active & (max_radii > max_screen_size)
            to_prune |= active & (max_scale > 0.1 * scene_extent)
        keep = active & ~to_prune

        keep_idx = np.nonzero(keep)[0]
        clone_idx = np.nonzero(to_clone & keep)[0]
        split_idx = np.nonzero(to_split & keep)[0]
        # split: parent becomes 2 children (parent row reused + 1 new row).
        new_total = len(keep_idx) + len(clone_idx) + len(split_idx)
        new_capacity = self._capacity_for(new_total)

        rng = np.random.default_rng(int(n_active))
        split_scales = scales[split_idx]
        # Sampled offsets in the parent's frame (reference: :220-236).
        from nerficg_tpu.cameras.pose import quaternion_to_rotation_matrix
        offsets = rng.normal(size=(len(split_idx), 3)).astype(np.float32) * \
            split_scales
        rots = quaternion_to_rotation_matrix(host['rotations'][split_idx])
        world_offsets = np.einsum('nij,nj->ni', rots, offsets).astype(np.float32)

        def surgery(arr: np.ndarray) -> np.ndarray:
            kept = arr[keep_idx]
            cloned = arr[clone_idx]
            split_parent = arr[split_idx]
            out = np.concatenate([kept, cloned, split_parent], axis=0)
            pad = new_capacity - out.shape[0]
            if pad > 0:
                out = np.concatenate(
                    [out, np.zeros((pad,) + out.shape[1:], arr.dtype)])
            return out

        new_params, new_opt_state = apply_row_surgery(
            self.params, opt_state, lambda a: surgery(np.asarray(a)))
        new_params = {k: np.array(v) for k, v in new_params.items()}
        # Dead padding slots must be invisible (zero-padded opacity would be
        # sigmoid(0) = 0.5: ghost splats at the origin).
        new_params['opacities'][new_total:] = DEAD_OPACITY_RAW

        # Post-surgery edits: move/shrink the split children.
        base = len(keep_idx) + len(clone_idx)
        sl = slice(base, base + len(split_idx))
        if len(split_idx):
            new_params['positions'][sl] = host['positions'][split_idx] + \
                world_offsets
            new_params['scales'][sl] = np.log(
                np.maximum(split_scales / 1.6, 1e-7))
            # Parent rows (kept in keep_idx region) also shrink+move: find
            # their positions within keep_idx.
            parent_pos = np.searchsorted(keep_idx, split_idx)
            offsets2 = rng.normal(size=(len(split_idx), 3)).astype(np.float32) * \
                split_scales
            world_offsets2 = np.einsum('nij,nj->ni', rots, offsets2)
            new_params['positions'][parent_pos] = host['positions'][split_idx] + \
                world_offsets2.astype(np.float32)
            new_params['scales'][parent_pos] = np.log(
                np.maximum(split_scales / 1.6, 1e-7))

        self.params = {k: jnp.asarray(v) for k, v in new_params.items()}
        self.num_active = new_total
        Logger.verbose(f'densify: {n_active} -> {new_total} gaussians '
                       f'(+{len(clone_idx)} clone, +{len(split_idx)} split, '
                       f'-{int(to_prune.sum())} pruned)')
        return self.params, new_opt_state

    def reset_opacity(self, max_opacity: float = 0.01) -> None:
        """Clamp all opacities to <= max (reference: Model.py:152-155)."""
        raw_cap = float(_inverse_sigmoid(max_opacity))
        raw = self.params['opacities']
        self.params['opacities'] = jnp.minimum(raw, raw_cap)

    # -- baking / export --------------------------------------------------------
    def bake(self, aabb_min=None, aabb_max=None) -> None:
        """Morton-sort active Gaussians for memory-coherent rendering and
        prune invisible ones (reference: Model.py:261-284). Keeps raw
        parameterization (activations are cheap on TPU)."""
        from nerficg_tpu.ops.morton import morton_encode_positions
        host = {k: np.asarray(v) for k, v in self.params.items()}
        n = self.num_active
        opacity = 1.0 / (1.0 + np.exp(-host['opacities'][:n, 0]))
        keep = np.nonzero(opacity >= 1.0 / 255.0)[0]
        if len(keep) == 0:
            Logger.warning('bake: no visible gaussians; keeping all')
            keep = np.arange(n)
        pos = host['positions'][keep]
        lo = pos.min(0) if aabb_min is None else np.asarray(aabb_min)
        hi = pos.max(0) if aabb_max is None else np.asarray(aabb_max)
        codes = np.asarray(morton_encode_positions(
            jnp.asarray(pos), jnp.asarray(lo), jnp.asarray(hi)))
        order = keep[np.argsort(codes)]
        capacity = self._capacity_for(len(order))
        for key, arr in host.items():
            fill = DEAD_OPACITY_RAW if key == 'opacities' else 0.0
            self.params[key] = self._padded(arr[order], capacity, fill)
        self.num_active = len(order)

    def get_ply_dict(self) -> dict:
        """Standard 3DGS PLY vertex layout (reference: Model.py:286-317)."""
        n = self.num_active
        host = {k: np.asarray(v)[:n] for k, v in self.params.items()}
        out = {
            'x': host['positions'][:, 0], 'y': host['positions'][:, 1],
            'z': host['positions'][:, 2],
            'nx': np.zeros(n, np.float32), 'ny': np.zeros(n, np.float32),
            'nz': np.zeros(n, np.float32),
        }
        for i in range(3):
            out[f'f_dc_{i}'] = host['features_dc'][:, 0, i]
        rest = host['features_rest'].transpose(0, 2, 1).reshape(n, -1)
        for i in range(rest.shape[1]):
            out[f'f_rest_{i}'] = rest[:, i]
        out['opacity'] = host['opacities'][:, 0]
        for i in range(3):
            out[f'scale_{i}'] = host['scales'][:, i]
        for i in range(4):
            out[f'rot_{i}'] = host['rotations'][:, i]
        return out

    def save(self, path) -> None:
        # Persist the active count alongside params.
        self.buffers = dict(self.buffers)
        self.buffers['num_active'] = jnp.asarray(self.num_active)
        self.buffers['active_sh_degree'] = jnp.asarray(self.active_sh_degree)
        super().save(path)

    @classmethod
    def load(cls, path, config=None):
        model = super().load(path, config)
        model.num_active = int(np.asarray(model.buffers.get(
            'num_active', model.params['positions'].shape[0])))
        model.active_sh_degree = int(np.asarray(model.buffers.get(
            'active_sh_degree', int(model.SH_DEGREE))))
        return model
