"""Procedural synthetic scene generators (Blender / D-NeRF format).

Used by the test suite fixtures AND bench.py --quality: an analytically
composited gaussian-blob scene a radiance field can actually fit, written
in the reference's dataset formats (no real scene data ships in this
environment). Static variant: NeRF transforms; dynamic variant: D-NeRF
transforms with per-frame ``time``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ['make_synthetic_scene', 'make_dynamic_scene',
           'make_textured_scene', 'make_dynamic_textured_scene']


def make_synthetic_scene(root, image_size=24, n_train=8, n_test=2):
    root = Path(root)
    import json
    import math

    from PIL import Image

    def render_blob(c2w, size):
        """Analytic alpha-composited render of a gaussian density blob at the
        origin: serves as ground truth a NeRF can actually fit."""
        focal = 0.5 * size / math.tan(0.5 * math.radians(45.0))
        ys, xs = np.mgrid[0:size, 0:size].astype(np.float64) + 0.5
        dirs = np.stack([(xs - size / 2) / focal, (ys - size / 2) / focal,
                         np.ones_like(xs)], -1)
        dirs = dirs @ c2w[:3, :3].T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        origin = c2w[:3, 3]
        # March 64 steps from t=2 to t=6.
        ts = np.linspace(2.0, 6.0, 64)
        dt = ts[1] - ts[0]
        pts = origin[None, None, None, :] + dirs[:, :, None, :] * ts[None, None, :, None]
        r2 = np.sum(pts * pts, axis=-1)
        sigma = 8.0 * np.exp(-r2 / (2 * 0.4 ** 2))
        alpha = 1.0 - np.exp(-sigma * dt)
        trans = np.cumprod(1.0 - alpha + 1e-10, axis=-1)
        trans = np.concatenate([np.ones_like(trans[..., :1]), trans[..., :-1]], -1)
        w = trans * alpha
        # Color varies with position for a learnable signal.
        color = 0.5 + 0.5 * np.tanh(pts[..., :3])
        rgb = np.einsum('hws,hwsc->hwc', w, color)
        acc = w.sum(-1)
        return np.clip(rgb, 0, 1), np.clip(acc, 0, 1)

    def pose_on_circle(angle, radius=4.0):
        eye = np.array([radius * math.sin(angle), 0.0, radius * math.cos(angle)])
        forward = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, forward, eye
        return c2w

    for split, count in (('train', n_train), ('test', n_test)):
        frames = []
        (root / split).mkdir(parents=True, exist_ok=True)
        for i in range(count):
            angle = 2 * math.pi * (i + (0.5 if split == 'test' else 0)) / max(count, 1)
            c2w_colmap = pose_on_circle(angle)
            rgb, acc = render_blob(c2w_colmap, image_size)
            rgba = np.concatenate([rgb, acc[..., None]], -1)
            img = Image.fromarray((rgba * 255).astype(np.uint8))
            rel = f'{split}/r_{i}'
            img.save(root / f'{rel}.png')
            # Write OpenGL-convention matrix (the loader converts back).
            c2w_gl = c2w_colmap.copy()
            c2w_gl[:3, 1] *= -1
            c2w_gl[:3, 2] *= -1
            frames.append({'file_path': f'./{rel}',
                           'transform_matrix': c2w_gl.tolist()})
        meta = {'camera_angle_x': math.radians(45.0), 'frames': frames}
        with open(root / f'transforms_{split}.json', 'w') as f:
            json.dump(meta, f)
    return root




def make_textured_scene(root, image_size=128, n_train=30, n_test=4,
                        octaves=(3.0, 8.0, 14.0), seed=0):
    """Capacity-sensitive quality probe: an OPAQUE sphere with a
    multi-octave procedural 3D texture, rendered analytically (ray-sphere
    intersection + Lambertian shading), 2x supersampled.

    Unlike the translucent gaussian blob (`make_synthetic_scene`, whose
    probe PSNR tops out ~16 dB — it ranks encode variants but cannot see
    table capacity, VERDICT r3 weak #5), an opaque view-independent
    surface is well-posed from a ring of cameras, and the highest texture
    octave demands hashed hash-grid levels (14 cycles/unit = 1/28 of the
    [-1,1] box -> grid res >= 56, beyond the dense collision-free range), so probe PSNR responds to LOG2_HASHMAP_SIZE. Format matches
    the Blender loader (`data/loaders/nerf.py`; reference format
    /root/reference/src/Datasets/NeRF.py).

    GEOMETRY CONSTRAINT (cost one full debugging round): the Blender
    loader's near plane is 2.0 (`data/loaders/nerf.py NEAR_PLANE`, the
    reference's Blender convention) — every visible surface point must sit
    at ray depth > 2.0 from every camera, or the marcher can never sample
    it (the probe then trains to ~10 dB: geometry half-learned from
    grazing rays, colors washed out).  Cameras orbit at 4.0 like the real
    Blender-synthetic scenes; sphere radius 0.8 puts the surface at
    t in [3.2, 4.8]."""
    root = Path(root)
    import json
    import math

    from PIL import Image

    rng = np.random.default_rng(seed)
    # Random per-octave RGB phase/direction so channels decorrelate.
    dirs_oct = rng.normal(size=(len(octaves), 3, 3))
    dirs_oct /= np.linalg.norm(dirs_oct, axis=-1, keepdims=True)
    phases = rng.uniform(0, 2 * np.pi, size=(len(octaves), 3))
    light = np.array([0.5, 0.7, 0.5])
    light /= np.linalg.norm(light)
    radius = 0.8

    def texture(p):
        """Multi-octave sine texture in [0,1]^3 -> RGB, view-independent."""
        c = np.full(p.shape[:-1] + (3,), 0.5)
        amp = 0.5
        for o, f in enumerate(octaves):
            amp *= 0.55
            for ch in range(3):
                c[..., ch] += amp * np.sin(
                    2 * np.pi * f * (p @ dirs_oct[o, ch]) + phases[o, ch])
        return np.clip(c, 0.0, 1.0)

    def render(c2w, size, ss=2):
        hs = size * ss
        focal = 0.5 * hs / math.tan(0.5 * math.radians(45.0))
        ys, xs = np.mgrid[0:hs, 0:hs].astype(np.float64) + 0.5
        d = np.stack([(xs - hs / 2) / focal, (ys - hs / 2) / focal,
                      np.ones_like(xs)], -1)
        d = d @ c2w[:3, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = c2w[:3, 3]
        # ray-sphere: |o + t d|^2 = r^2
        b = d @ o
        disc = b * b - (o @ o - radius * radius)
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        p = o[None, None, :] + d * t[..., None]
        n = p / radius
        shade = 0.35 + 0.65 * np.maximum(n @ light, 0.0)
        rgb = texture(p) * shade[..., None]
        rgb = np.where(hit[..., None], rgb, 0.0)
        acc = hit.astype(np.float64)
        # box-downsample the supersampled buffers
        rgb = rgb.reshape(size, ss, size, ss, 3).mean(axis=(1, 3))
        acc = acc.reshape(size, ss, size, ss).mean(axis=(1, 3))
        return np.clip(rgb, 0, 1), acc

    def pose_on_ring(angle, elev, radius_cam=4.0):
        eye = radius_cam * np.array([
            math.cos(elev) * math.sin(angle), math.sin(elev),
            math.cos(elev) * math.cos(angle)])
        forward = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = \
            right, down, forward, eye
        return c2w

    for split, count in (('train', n_train), ('test', n_test)):
        frames = []
        (root / split).mkdir(parents=True, exist_ok=True)
        for i in range(count):
            angle = 2 * math.pi * (i + (0.5 if split == 'test' else 0)) \
                / max(count, 1)
            # two elevation bands so the poles are observed
            elev = math.radians(-25.0 if i % 2 else 20.0)
            c2w_colmap = pose_on_ring(angle, elev)
            rgb, acc = render(c2w_colmap, image_size)
            rgba = np.concatenate([rgb, acc[..., None]], -1)
            img = Image.fromarray((rgba * 255).astype(np.uint8))
            rel = f'{split}/r_{i}'
            img.save(root / f'{rel}.png')
            c2w_gl = c2w_colmap.copy()
            c2w_gl[:3, 1] *= -1
            c2w_gl[:3, 2] *= -1
            frames.append({'file_path': f'./{rel}',
                           'transform_matrix': c2w_gl.tolist()})
        meta = {'camera_angle_x': math.radians(45.0), 'frames': frames}
        with open(root / f'transforms_{split}.json', 'w') as f:
            json.dump(meta, f)
    return root


def make_dynamic_scene(root, image_size=24, n_train=10, n_test=3):
    root = Path(root)
    import json
    import math

    from PIL import Image

    def render_blob(c2w, size, t):
        focal = 0.5 * size / math.tan(0.5 * math.radians(45.0))
        ys, xs = np.mgrid[0:size, 0:size].astype(np.float64) + 0.5
        dirs = np.stack([(xs - size / 2) / focal, (ys - size / 2) / focal,
                         np.ones_like(xs)], -1)
        dirs = dirs @ c2w[:3, :3].T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        origin = c2w[:3, 3]
        ts = np.linspace(2.0, 6.0, 64)
        dt = ts[1] - ts[0]
        pts = origin[None, None, None, :] + dirs[:, :, None, :] * ts[None, None, :, None]
        center = np.array([0.6 * (t - 0.5), 0.0, 0.0])
        r2 = np.sum((pts - center) ** 2, axis=-1)
        sigma = 8.0 * np.exp(-r2 / (2 * 0.4 ** 2))
        alpha = 1.0 - np.exp(-sigma * dt)
        trans = np.cumprod(1.0 - alpha + 1e-10, axis=-1)
        trans = np.concatenate([np.ones_like(trans[..., :1]),
                                trans[..., :-1]], -1)
        w = trans * alpha
        color = 0.5 + 0.5 * np.tanh(pts[..., :3] - center)
        rgb = np.einsum('hws,hwsc->hwc', w, color)
        acc = w.sum(-1)
        return np.clip(rgb, 0, 1), np.clip(acc, 0, 1)

    def pose_on_circle(angle, radius=4.0):
        eye = np.array([radius * math.sin(angle), 0.0,
                        radius * math.cos(angle)])
        forward = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = \
            right, down, forward, eye
        return c2w

    for split, count in (('train', n_train), ('test', n_test)):
        frames = []
        (root / split).mkdir(parents=True, exist_ok=True)
        for i in range(count):
            t = i / max(count - 1, 1)
            angle = 2 * math.pi * (i + (0.5 if split == 'test' else 0)) / max(count, 1)
            c2w_colmap = pose_on_circle(angle)
            rgb, acc = render_blob(c2w_colmap, image_size, t)
            rgba = np.concatenate([rgb, acc[..., None]], -1)
            img = Image.fromarray((rgba * 255).astype(np.uint8))
            rel = f'{split}/r_{i}'
            img.save(root / f'{rel}.png')
            c2w_gl = c2w_colmap.copy()
            c2w_gl[:3, 1] *= -1
            c2w_gl[:3, 2] *= -1
            frames.append({'file_path': f'./{rel}', 'time': t,
                           'transform_matrix': c2w_gl.tolist()})
        meta = {'camera_angle_x': math.radians(45.0), 'frames': frames}
        with open(root / f'transforms_{split}.json', 'w') as f:
            json.dump(meta, f)
    return root


def make_dynamic_textured_scene(root, image_size=64, n_train=40, n_test=4,
                                octaves=(3.0, 8.0), amplitude=0.35, seed=0):
    """Opaque dynamic probe: the textured sphere of ``make_textured_scene``
    rigidly translating with time (center at ``[amplitude*sin(2 pi t), 0,
    0]``; texture/shading move WITH the sphere).

    Why: the translucent-blob dynamic probe saturates ~18 dB for the same
    reason the static blob does (semi-transparent volume, low-frequency
    colors: round-3 verdict weak #5) — it cannot measure dynamic-method
    quality improvements past that. A rigid translation of an opaque
    surface is exactly the canonical-space + deformation-offset
    decomposition D-NeRF assumes (reference: src/Methods/DNeRF/Model.py
    deformation MLP), so a correct method should reach the static textured
    probe's quality here. Same near-plane constraint as the static probe:
    surface stays at depth > 2 from every orbit camera
    (4.0 - 0.8 - |amplitude| >= 2.85).

    D-NeRF transforms format (``time`` per frame; loader:
    data/loaders/dnerf.py; reference format src/Datasets/DNeRF.py)."""
    root = Path(root)
    import json
    import math

    from PIL import Image

    rng = np.random.default_rng(seed)
    dirs_oct = rng.normal(size=(len(octaves), 3, 3))
    dirs_oct /= np.linalg.norm(dirs_oct, axis=-1, keepdims=True)
    phases = rng.uniform(0, 2 * np.pi, size=(len(octaves), 3))
    light = np.array([0.5, 0.7, 0.5])
    light /= np.linalg.norm(light)
    radius = 0.8

    def texture(p):
        c = np.full(p.shape[:-1] + (3,), 0.5)
        amp = 0.5
        for o, f in enumerate(octaves):
            amp *= 0.55
            for ch in range(3):
                c[..., ch] += amp * np.sin(
                    2 * np.pi * f * (p @ dirs_oct[o, ch]) + phases[o, ch])
        return np.clip(c, 0.0, 1.0)

    def render(c2w, size, t, ss=2):
        hs = size * ss
        focal = 0.5 * hs / math.tan(0.5 * math.radians(45.0))
        ys, xs = np.mgrid[0:hs, 0:hs].astype(np.float64) + 0.5
        d = np.stack([(xs - hs / 2) / focal, (ys - hs / 2) / focal,
                      np.ones_like(xs)], -1)
        d = d @ c2w[:3, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = c2w[:3, 3]
        center = np.array([amplitude * math.sin(2 * math.pi * t), 0.0, 0.0])
        oc = o - center
        b = d @ oc
        disc = b * b - (oc @ oc - radius * radius)
        hit = disc > 0
        tt = -b - np.sqrt(np.maximum(disc, 0.0))
        p = o[None, None, :] + d * tt[..., None] - center  # body frame
        n = p / radius
        shade = 0.35 + 0.65 * np.maximum(n @ light, 0.0)
        rgb = texture(p) * shade[..., None]
        rgb = np.where(hit[..., None], rgb, 0.0)
        acc = hit.astype(np.float64)
        rgb = rgb.reshape(size, ss, size, ss, 3).mean(axis=(1, 3))
        acc = acc.reshape(size, ss, size, ss).mean(axis=(1, 3))
        return np.clip(rgb, 0, 1), acc

    def pose_on_ring(angle, elev, radius_cam=4.0):
        eye = radius_cam * np.array([
            math.cos(elev) * math.sin(angle), math.sin(elev),
            math.cos(elev) * math.cos(angle)])
        forward = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, forward)
        right /= np.linalg.norm(right)
        down = np.cross(forward, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = \
            right, down, forward, eye
        return c2w

    for split, count in (('train', n_train), ('test', n_test)):
        frames = []
        (root / split).mkdir(parents=True, exist_ok=True)
        for i in range(count):
            t = i / max(count - 1, 1)
            angle = 2 * math.pi * (i + (0.5 if split == 'test' else 0)) \
                / max(count, 1)
            elev = math.radians(-25.0 if i % 2 else 20.0)
            c2w_colmap = pose_on_ring(angle, elev)
            rgb, acc = render(c2w_colmap, image_size, t)
            rgba = np.concatenate([rgb, acc[..., None]], -1)
            img = Image.fromarray((rgba * 255).astype(np.uint8))
            rel = f'{split}/r_{i}'
            img.save(root / f'{rel}.png')
            c2w_gl = c2w_colmap.copy()
            c2w_gl[:3, 1] *= -1
            c2w_gl[:3, 2] *= -1
            frames.append({'file_path': f'./{rel}', 'time': t,
                           'transform_matrix': c2w_gl.tolist()})
        meta = {'camera_angle_x': math.radians(45.0), 'frames': frames}
        with open(root / f'transforms_{split}.json', 'w') as f:
            json.dump(meta, f)
    return root
