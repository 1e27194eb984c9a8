"""Unit tests for ops: morton, packbits, sampling, compositing, aabb, encodings.

Everything is checked against tiny-numpy closed-form oracles (SURVEY.md §4's
test strategy for kernels N1-N10).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerficg_tpu.ops.compositing import (composite_rays, densities_to_weights,
                                         distortion_loss)
from nerficg_tpu.ops.encoding import (eval_sh, frequency_encode,
                                      frequency_encoding_dim, sh_encode)
from nerficg_tpu.ops.morton import (morton3d, morton3d_invert, packbits,
                                    unpackbits)
from nerficg_tpu.ops.ray_aabb import ray_aabb_intersect, ray_sphere_intersect
from nerficg_tpu.ops.sampling import sample_pdf, stratified_samples


class TestMorton:
    def test_roundtrip(self, np_rng):
        coords = np_rng.integers(0, 1024, size=(128, 3)).astype(np.int32)
        codes = morton3d(jnp.asarray(coords))
        back = morton3d_invert(codes)
        np.testing.assert_array_equal(np.asarray(back), coords)

    def test_known_values(self):
        # interleave of (1,0,0) -> 1; (0,1,0) -> 2; (0,0,1) -> 4; (1,1,1) -> 7
        codes = morton3d(jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]]))
        np.testing.assert_array_equal(np.asarray(codes), [1, 2, 4, 7])

    def test_locality(self):
        a = morton3d(jnp.array([[2, 3, 1]]))
        b = morton3d(jnp.array([[2, 3, 2]]))
        assert int(a[0]) != int(b[0])


class TestPackbits:
    def test_roundtrip(self, np_rng):
        grid = np_rng.random((4, 64)).astype(np.float32)
        bits = packbits(jnp.asarray(grid), 0.5)
        assert bits.shape == (4, 8)
        recovered = unpackbits(bits)
        np.testing.assert_array_equal(np.asarray(recovered), grid > 0.5)


class TestSampling:
    def test_stratified_bounds_sorted(self, rng):
        t = stratified_samples(rng, 16, 32, 2.0, 6.0)
        t = np.asarray(t)
        assert t.shape == (16, 32)
        assert (t >= 2.0).all() and (t <= 6.0).all()
        assert (np.diff(t, axis=-1) > 0).all()  # strata are ordered

    def test_deterministic_midpoints(self, rng):
        t = stratified_samples(rng, 2, 4, 0.0, 1.0, randomized=False)
        np.testing.assert_allclose(np.asarray(t[0]),
                                   [0.125, 0.375, 0.625, 0.875], atol=1e-6)

    def test_pdf_concentrates(self, rng):
        # Weights concentrated in one bin -> samples land in that bin.
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (4, 11))
        weights = jnp.zeros((4, 10)).at[:, 5].set(100.0)
        samples = sample_pdf(rng, bins, weights, 64)
        s = np.asarray(samples)
        frac_in_bin = ((s >= 0.5) & (s <= 0.6)).mean()
        assert frac_in_bin > 0.95

    def test_pdf_uniform(self, rng):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (1, 9))
        weights = jnp.ones((1, 8))
        samples = np.asarray(sample_pdf(rng, bins, weights, 4096))
        assert abs(samples.mean() - 0.5) < 0.02


class TestCompositing:
    def _oracle(self, rgb, sigma, t, deltas, bg=None):
        """Straightforward loop oracle for alpha compositing."""
        R, S = sigma.shape
        out_rgb = np.zeros((R, 3))
        out_depth = np.zeros(R)
        out_acc = np.zeros(R)
        for r in range(R):
            T = 1.0
            for s in range(S):
                a = 1 - np.exp(-sigma[r, s] * deltas[r, s])
                w = T * a
                out_rgb[r] += w * rgb[r, s]
                out_depth[r] += w * t[r, s]
                out_acc[r] += w
                T *= (1 - a + 1e-10)
            if out_acc[r] > 0:
                out_depth[r] /= max(out_acc[r], 1e-10)
            if bg is not None:
                out_rgb[r] += (1 - out_acc[r]) * bg
        return out_rgb, out_depth, out_acc

    def test_matches_oracle(self, np_rng):
        R, S = 8, 16
        rgb = np_rng.random((R, S, 3)).astype(np.float32)
        sigma = (np_rng.random((R, S)) * 3).astype(np.float32)
        t = np.sort(np_rng.random((R, S)) * 4 + 2, axis=-1).astype(np.float32)
        deltas = np.diff(t, axis=-1, append=6.0).astype(np.float32)
        bg = np.array([1.0, 1.0, 1.0], np.float32)
        out = composite_rays(jnp.asarray(rgb), jnp.asarray(sigma),
                             jnp.asarray(t), jnp.asarray(deltas),
                             background=jnp.asarray(bg))
        o_rgb, o_depth, o_acc = self._oracle(rgb, sigma, t, deltas, bg)
        np.testing.assert_allclose(np.asarray(out['rgb']), o_rgb, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out['depth'])[:, 0], o_depth,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out['alpha'])[:, 0], o_acc,
                                   atol=1e-4)

    def test_opaque_first_sample(self):
        # A fully opaque first sample should dominate the output.
        rgb = jnp.zeros((1, 4, 3)).at[0, 0].set(jnp.array([1.0, 0.0, 0.0]))
        sigma = jnp.zeros((1, 4)).at[0, 0].set(1e6)
        t = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        deltas = jnp.ones((1, 4))
        out = composite_rays(rgb, sigma, t, deltas)
        np.testing.assert_allclose(np.asarray(out['rgb'][0]), [1, 0, 0], atol=1e-5)
        np.testing.assert_allclose(float(out['depth'][0, 0]), 1.0, atol=1e-5)

    def test_mask_zeroes_contribution(self):
        rgb = jnp.ones((1, 4, 3))
        sigma = jnp.ones((1, 4)) * 10
        t = jnp.arange(4, dtype=jnp.float32)[None] + 1
        deltas = jnp.ones((1, 4))
        masked = composite_rays(rgb, sigma, t, deltas,
                                mask=jnp.zeros((1, 4)))
        assert float(masked['alpha'][0, 0]) == 0.0

    def test_grads_finite(self, np_rng):
        sigma = jnp.asarray(np_rng.random((4, 8)).astype(np.float32))
        deltas = jnp.ones((4, 8)) * 0.1

        def f(s):
            return jnp.sum(densities_to_weights(s, deltas))

        g = jax.grad(f)(sigma)
        assert np.isfinite(np.asarray(g)).all()

    def test_distortion_loss_oracle(self, np_rng):
        """Compare the prefix-sum form with the O(S^2) double sum."""
        R, S = 4, 16
        w = np_rng.random((R, S)).astype(np.float32) * 0.1
        mids = np.sort(np_rng.random((R, S)), axis=-1).astype(np.float32)
        deltas = np.full((R, S), 0.01, np.float32)
        loss = np.asarray(distortion_loss(jnp.asarray(w), jnp.asarray(mids),
                                          jnp.asarray(deltas)))
        oracle = np.zeros(R)
        for r in range(R):
            for i in range(S):
                for j in range(S):
                    oracle[r] += w[r, i] * w[r, j] * abs(mids[r, i] - mids[r, j])
                oracle[r] += w[r, i] ** 2 * deltas[r, i] / 3.0
        np.testing.assert_allclose(loss, oracle, rtol=1e-3, atol=1e-5)


class TestRayAABB:
    def test_hit_and_miss(self):
        origins = jnp.array([[0.0, 0.0, -5.0], [0.0, 5.0, -5.0]])
        dirs = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        t_near, t_far = ray_aabb_intersect(origins, dirs,
                                           jnp.array([-1.0, -1.0, -1.0]),
                                           jnp.array([1.0, 1.0, 1.0]))
        assert float(t_near[0]) == pytest.approx(4.0)
        assert float(t_far[0]) == pytest.approx(6.0)
        assert float(t_near[1]) > float(t_far[1])  # miss

    def test_sphere(self):
        origins = jnp.array([[0.0, 0.0, -5.0]])
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        t_near, t_far = ray_sphere_intersect(origins, dirs,
                                             jnp.zeros(3), 1.0)
        assert float(t_near[0]) == pytest.approx(4.0)
        assert float(t_far[0]) == pytest.approx(6.0)


class TestEncodings:
    def test_frequency_shape(self):
        x = jnp.ones((5, 3))
        enc = frequency_encode(x, 10)
        assert enc.shape == (5, frequency_encoding_dim(3, 10))
        assert enc.shape == (5, 63)

    def test_frequency_values(self):
        x = jnp.array([[0.5, 0.0, 0.0]])
        enc = np.asarray(frequency_encode(x, 1))
        # [x, sin(pi x), cos(pi x)] interleaved per dim
        assert enc[0, 0] == pytest.approx(0.5)
        assert enc[0, 3] == pytest.approx(np.sin(np.pi * 0.5), abs=1e-6)

    def test_sh_constant_band(self):
        dirs = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        basis = np.asarray(sh_encode(dirs, 1))
        np.testing.assert_allclose(basis[:, 0], 0.282095, atol=1e-5)

    def test_sh_orthonormality(self, np_rng):
        """Monte-carlo check: int Y_i Y_j dOmega ~ delta_ij."""
        v = np_rng.normal(size=(200000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        basis = np.asarray(sh_encode(jnp.asarray(v, jnp.float32), 3))
        gram = 4 * np.pi * (basis.T @ basis) / v.shape[0]
        np.testing.assert_allclose(gram, np.eye(9), atol=0.05)

    def test_eval_sh_degree1_constant(self):
        coeffs = jnp.zeros((4, 16, 3)).at[:, 0, :].set(1.0)
        dirs = jnp.array([[0, 0, 1.0]] * 4)
        out = np.asarray(eval_sh(coeffs, dirs, 1))
        np.testing.assert_allclose(out, 0.282095, atol=1e-5)


class TestMaskedMetrics:
    def test_masked_psnr_ignores_masked_pixels(self, np_rng):
        from nerficg_tpu.optim.masked_metrics import masked_psnr
        gt = np_rng.random((16, 16, 3)).astype(np.float32)
        pred = gt.copy()
        pred[:8] = 0.0  # corrupt the top half
        mask = np.zeros((16, 16), np.float32)
        mask[8:] = 1.0  # evaluate only the clean bottom half
        v = float(masked_psnr(jnp.asarray(pred), jnp.asarray(gt),
                              jnp.asarray(mask)))
        assert v > 60.0
        full = float(masked_psnr(jnp.asarray(pred), jnp.asarray(gt),
                                 jnp.ones((16, 16))))
        assert full < 20.0

    def test_masked_ssim_matches_plain_on_full_mask(self, np_rng):
        from nerficg_tpu.optim.masked_metrics import masked_ssim
        from nerficg_tpu.optim.metrics import ssim
        a = np_rng.random((24, 24, 3)).astype(np.float32)
        b = np.clip(a + np_rng.normal(size=a.shape).astype(np.float32) * 0.05,
                    0, 1)
        m = float(masked_ssim(jnp.asarray(a), jnp.asarray(b),
                              jnp.ones((24, 24))))
        p = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        assert abs(m - p) < 0.05

    def test_masked_ssim_matches_dycheck_formula(self, np_rng):
        """Independent scipy implementation of the dycheck partial-conv
        Gaussian-window SSIM (the reference protocol,
        /root/reference/src/Optim/MaskedMetrics.py compute_ssim)."""
        from scipy.signal import convolve2d

        from nerficg_tpu.optim.masked_metrics import masked_ssim
        a = np_rng.random((28, 28, 3)).astype(np.float64)
        b = np.clip(a + np_rng.normal(size=a.shape) * 0.1, 0, 1)
        mask = (np_rng.random((28, 28)) > 0.3).astype(np.float64)

        size, sigma = 11, 1.5
        hw = size // 2
        shift = (2 * hw - size + 1) / 2
        f = np.exp(-0.5 * (((np.arange(size) - hw + shift) / sigma) ** 2))
        f /= f.sum()

        def pconv(z, m, k2):
            z_ = convolve2d(z * m, k2, mode='valid')
            m_ = convolve2d(m, np.ones_like(k2), mode='valid')
            out = np.where(m_ != 0, z_ * np.ones_like(k2).sum() / 
                           np.where(m_ != 0, m_, 1.0), 0.0)
            return out, (m_ != 0).astype(np.float64)

        def filt(z, m):
            outs = []
            for c in range(3):
                z1, m1 = pconv(z[..., c], m, f[None, :])
                z2, _ = pconv(z1, m1, f[:, None])
                outs.append(z2)
            return np.stack(outs, -1)

        mu0, mu1 = filt(a, mask), filt(b, mask)
        s00 = np.maximum(filt(a * a, mask) - mu0 ** 2, 0)
        s11 = np.maximum(filt(b * b, mask) - mu1 ** 2, 0)
        s01 = filt(a * b, mask) - mu0 * mu1
        s01 = np.sign(s01) * np.minimum(np.sqrt(s00 * s11), np.abs(s01))
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        expected = np.mean(((2 * mu0 * mu1 + c1) * (2 * s01 + c2)) /
                           ((mu0 ** 2 + mu1 ** 2 + c1) * (s00 + s11 + c2)))

        got = float(masked_ssim(jnp.asarray(a, jnp.float32),
                                jnp.asarray(b, jnp.float32),
                                jnp.asarray(mask, jnp.float32)))
        assert abs(got - expected) < 2e-3, (got, expected)


class TestGradientScaling:
    def test_backward_scaled(self):
        from nerficg_tpu.optim.gradient_scaling import scale_gradients_by_distance
        values = jnp.ones((4, 3))
        distances = jnp.array([0.1, 0.5, 1.0, 2.0])

        def f(v):
            return jnp.sum(scale_gradients_by_distance(v, distances))

        g = np.asarray(jax.grad(f)(values))
        np.testing.assert_allclose(g[:, 0], [0.01, 0.25, 1.0, 1.0], atol=1e-6)


class TestLPIPSJax:
    def test_identity_is_zero_and_orders_similarity(self, rng, np_rng):
        from nerficg_tpu.optim.lpips_jax import (_lpips_impl,
                                                 init_random_weights)
        params = init_random_weights(rng)
        a = jnp.asarray(np_rng.random((32, 32, 3)), jnp.float32)
        noise = jnp.asarray(np_rng.normal(size=(32, 32, 3)), jnp.float32)
        d0 = float(_lpips_impl(params, a, a))
        d_small = float(_lpips_impl(params, a,
                                    jnp.clip(a + 0.02 * noise, 0, 1)))
        d_large = float(_lpips_impl(params, a,
                                    jnp.clip(a + 0.3 * noise, 0, 1)))
        assert d0 < 1e-6
        assert d0 < d_small < d_large
