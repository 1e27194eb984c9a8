"""Per-frame / per-camera photometric ISP correction (PPISP).

Reference equivalent: src/Optim/ppisp.py:16-141 — a wrapper around the
external nv-tlabs/ppisp CUDA/torch package (src/Thirdparty/PPISP.py) that
maintains camera/frame index bookkeeping sorted by camera, an optimizer +
scheduler lifecycle, checkpoint extra-state, a per-parameter report export,
and a forward pass applying the ISP correction to rendered rgb by
camera/frame index.

TPU-native redesign: the correction itself is a tiny elementwise pipeline —
ideal VPU work that XLA fuses straight into the rendering graph — so the
model is a plain parameter pytree plus a pure ``apply_ppisp`` function
(vmappable over batches of frames), with optax providing the optimizer and
schedule. Correction stages, mirroring common ISP variation models:

  1. per-frame exposure (scalar gain, log-parameterized)
  2. per-frame white balance (r/b channel gains, g fixed)
  3. per-camera 3x3 color-correction matrix (identity-initialized)
  4. per-camera radial vignetting  1 + k1 r^2 + k2 r^4  (normalized radius)
  5. per-camera tone curve: gamma (log-parameterized) around linear

All stages are initialized to the identity so an untrained PPISP is a
no-op.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerficg_tpu.core.logging import Logger

__all__ = ['PPISPParams', 'PPISP', 'init_ppisp_params', 'apply_ppisp']


def init_ppisp_params(n_cameras: int, n_frames: int) -> dict:
    """Identity-initialized parameter pytree."""
    return {
        'log_exposure': jnp.zeros((n_frames,), jnp.float32),
        'wb_gains': jnp.zeros((n_frames, 2), jnp.float32),      # log r/b gains
        'ccm': jnp.tile(jnp.eye(3, dtype=jnp.float32)[None],
                        (n_cameras, 1, 1)),
        'vignette': jnp.zeros((n_cameras, 2), jnp.float32),     # k1, k2
        'log_gamma': jnp.zeros((n_cameras,), jnp.float32),
    }


def apply_ppisp(params: dict, rgb: jnp.ndarray, camera_idx,
                frame_idx) -> jnp.ndarray:
    """Apply the ISP correction to one (H, W, 3) image in [0, 1].

    camera_idx / frame_idx: ints or int32 scalars (traceable — the lookup
    is a dynamic index so one jitted function serves every view).
    """
    h, w = rgb.shape[0], rgb.shape[1]
    exposure = jnp.exp(params['log_exposure'][frame_idx])
    wb = jnp.exp(params['wb_gains'][frame_idx])                  # (2,)
    gains = jnp.stack([wb[0], jnp.ones(()), wb[1]])              # (3,)
    out = rgb * (exposure * gains)
    ccm = params['ccm'][camera_idx]                              # (3, 3)
    out = out @ ccm.T
    # Vignetting over the normalized image radius.
    ys = (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2) / max(h, w)
    xs = (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2) / max(h, w)
    r2 = (ys[:, None] ** 2 + xs[None, :] ** 2) * 4.0
    k1, k2 = params['vignette'][camera_idx]
    out = out * (1.0 + k1 * r2 + k2 * r2 * r2)[..., None]
    gamma = jnp.exp(params['log_gamma'][camera_idx])
    return jnp.clip(out, 1e-6, None) ** gamma


@dataclass
class PPISP:
    """Lifecycle wrapper: indexing, optimizer, checkpoint extra-state.

    Mirrors the reference wrapper's bookkeeping (src/Optim/ppisp.py:33-60):
    per-frame parameters are laid out sorted by camera so reports group
    frames of the same physical camera together.
    """

    params: dict | None = None
    opt_state: object = None
    known_camera_indices: dict = field(default_factory=dict)
    known_global_frame_indices: dict = field(default_factory=dict)
    frames_per_camera: list = field(default_factory=list)
    learning_rate: float = 1e-3
    total_training_steps: int = 0
    _optimizer: object = None

    def initialize(self, dataset, n_iterations: int) -> None:
        """Index bookkeeping + parameter/optimizer creation from a dataset."""
        for view in dataset:
            cam = self.known_camera_indices.setdefault(
                view.camera_index, len(self.known_camera_indices))
            if cam == len(self.frames_per_camera):
                self.frames_per_camera.append(0)
            self.frames_per_camera[cam] += 1
        offsets = [0]
        for count in self.frames_per_camera:
            offsets.append(offsets[-1] + count)
        cursor = list(offsets[:-1])
        for view in dataset:
            cam = self.known_camera_indices[view.camera_index]
            self.known_global_frame_indices[view.global_frame_idx] = cursor[cam]
            cursor[cam] += 1
        n_cameras = len(self.known_camera_indices)
        n_frames = len(self.known_global_frame_indices)
        Logger.info(f'initializing PPISP (cameras: {n_cameras}, '
                    f'total frames: {n_frames})')
        self.total_training_steps = n_iterations
        self.params = init_ppisp_params(n_cameras, n_frames)
        schedule = optax.cosine_decay_schedule(self.learning_rate,
                                               max(n_iterations, 1))
        self._optimizer = optax.adam(schedule)
        self.opt_state = self._optimizer.init(self.params)

    # -- training ----------------------------------------------------------------
    def step(self, grads: dict) -> None:
        """One optimizer step from external gradients (the ISP params are
        differentiated through the caller's loss)."""
        updates, self.opt_state = self._optimizer.update(grads, self.opt_state,
                                                         self.params)
        self.params = optax.apply_updates(self.params, updates)

    # -- inference ---------------------------------------------------------------
    def __call__(self, rgb: jnp.ndarray, view) -> jnp.ndarray:
        """Apply to a (H, W, 3) or (3, H, W) image for the given view."""
        to_chw = rgb.ndim == 3 and rgb.shape[0] == 3 and rgb.shape[-1] != 3
        if to_chw:
            rgb = jnp.transpose(rgb, (1, 2, 0))
        cam = self.known_camera_indices.get(view.camera_index)
        if cam is None:
            Logger.warning('ppisp: camera unseen during training, '
                           'defaulting to camera 0')
            cam = 0
        frame = self.known_global_frame_indices.get(view.global_frame_idx, 0)
        out = apply_ppisp(self.params, rgb, cam, frame)
        return jnp.transpose(out, (2, 0, 1)) if to_chw else out

    # -- checkpointing -----------------------------------------------------------
    def get_extra_state(self) -> dict:
        return {
            'total_training_steps': self.total_training_steps,
            'known_camera_indices': self.known_camera_indices,
            'known_global_frame_indices': self.known_global_frame_indices,
            'frames_per_camera': self.frames_per_camera,
        }

    def set_extra_state(self, state: dict) -> None:
        self.total_training_steps = state['total_training_steps']
        self.known_camera_indices = state['known_camera_indices']
        self.known_global_frame_indices = state['known_global_frame_indices']
        self.frames_per_camera = state['frames_per_camera']

    def create_report(self, output_directory: Path) -> None:
        """Plain-text parameter report (reference exports a PDF)."""
        out_dir = Path(output_directory) / 'ppisp_report'
        out_dir.mkdir(parents=True, exist_ok=True)
        p = jax.tree_util.tree_map(np.asarray, self.params)
        lines = ['PPISP parameter report', '=' * 40]
        frame = 0
        for cam_key, cam in sorted(self.known_camera_indices.items(),
                                   key=lambda kv: kv[1]):
            lines.append(f'camera {cam_key} (index {cam}):')
            lines.append(f'  ccm:\n{p["ccm"][cam]}')
            lines.append(f'  vignette k1={p["vignette"][cam][0]:+.4f} '
                         f'k2={p["vignette"][cam][1]:+.4f}')
            lines.append(f'  gamma={float(np.exp(p["log_gamma"][cam])):.4f}')
            for _ in range(self.frames_per_camera[cam]):
                lines.append(
                    f'    frame {frame}: exposure='
                    f'{float(np.exp(p["log_exposure"][frame])):.4f} '
                    f'wb_r={float(np.exp(p["wb_gains"][frame][0])):.4f} '
                    f'wb_b={float(np.exp(p["wb_gains"][frame][1])):.4f}')
                frame += 1
        (out_dir / 'report.txt').write_text('\n'.join(lines) + '\n')


# Alias matching the reference wrapper's class name (src/Optim/ppisp.py:15).
PPISPWrapper = PPISP
