"""PPISP photometric correction tests (nerficg_tpu/optim/ppisp.py).

Reference behavior: src/Optim/ppisp.py (index bookkeeping sorted by camera,
identity behavior when untrained, checkpoint extra-state round trip).
"""

import numpy as np
import pytest


class _FakeCam:
    width, height = 8, 6


class _FakeView:
    def __init__(self, camera_index, global_frame_idx):
        self.camera_index = camera_index
        self.global_frame_idx = global_frame_idx
        self.camera = _FakeCam()


def _dataset():
    # two cameras interleaved: frames must be re-indexed sorted by camera
    return [_FakeView(0, 0), _FakeView(1, 1), _FakeView(0, 2),
            _FakeView(1, 3), _FakeView(0, 4)]


class TestPPISP:

    def test_identity_at_init(self):
        import jax
        from nerficg_tpu.optim.ppisp import PPISP
        ppisp = PPISP()
        ppisp.initialize(_dataset(), n_iterations=100)
        rgb = jax.random.uniform(jax.random.PRNGKey(0), (6, 8, 3),
                                 minval=0.05, maxval=0.95)
        out = ppisp(rgb, _dataset()[0])
        np.testing.assert_allclose(np.asarray(out), np.asarray(rgb),
                                   rtol=1e-5, atol=1e-6)

    def test_frame_indexing_sorted_by_camera(self):
        from nerficg_tpu.optim.ppisp import PPISP
        ppisp = PPISP()
        ppisp.initialize(_dataset(), n_iterations=10)
        assert ppisp.frames_per_camera == [3, 2]
        # camera-0 frames occupy slots 0..2, camera-1 frames 3..4
        assert ppisp.known_global_frame_indices == {0: 0, 2: 1, 4: 2,
                                                    1: 3, 3: 4}

    def test_gradient_step_changes_output(self):
        import jax
        import jax.numpy as jnp
        from nerficg_tpu.optim.ppisp import PPISP, apply_ppisp
        ppisp = PPISP()
        ppisp.initialize(_dataset(), n_iterations=10)
        rgb = jnp.full((6, 8, 3), 0.25)
        target = jnp.full((6, 8, 3), 0.5)

        def loss(p):
            return jnp.mean((apply_ppisp(p, rgb, 0, 0) - target) ** 2)

        before = float(loss(ppisp.params))
        for _ in range(5):
            ppisp.step(jax.grad(loss)(ppisp.params))
        assert float(loss(ppisp.params)) < before

    def test_extra_state_roundtrip(self, tmp_path):
        from nerficg_tpu.optim.ppisp import PPISP
        ppisp = PPISP()
        ppisp.initialize(_dataset(), n_iterations=10)
        state = ppisp.get_extra_state()
        fresh = PPISP()
        fresh.set_extra_state(state)
        fresh.params = ppisp.params
        assert fresh.known_camera_indices == ppisp.known_camera_indices
        assert fresh.frames_per_camera == ppisp.frames_per_camera
        ppisp.create_report(tmp_path)
        assert (tmp_path / 'ppisp_report' / 'report.txt').exists()

    def test_chw_roundtrip(self):
        import jax
        import jax.numpy as jnp
        from nerficg_tpu.optim.ppisp import PPISP
        ppisp = PPISP()
        ppisp.initialize(_dataset(), n_iterations=10)
        rgb_chw = jax.random.uniform(jax.random.PRNGKey(1), (3, 6, 8),
                                     minval=0.1, maxval=0.9)
        out = ppisp(rgb_chw, _dataset()[1])
        assert out.shape == (3, 6, 8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(rgb_chw),
                                   rtol=1e-5, atol=1e-6)
