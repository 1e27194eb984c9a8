"""Native C++ image decoder vs the PIL reference."""

import numpy as np
import pytest
from PIL import Image

from nerficg_tpu.native import (decode_batch, decode_image,
                                native_io_available)

pytestmark = pytest.mark.skipif(
    not native_io_available(),
    reason='native toolchain unavailable (falls back to PIL)')


@pytest.fixture
def images(tmp_path, np_rng):
    specs = []
    a = (np_rng.random((37, 53, 3)) * 255).astype(np.uint8)
    Image.fromarray(a).save(tmp_path / 'rgb.png')
    specs.append((tmp_path / 'rgb.png', a.astype(np.float32) / 255, 1e-6))
    b = (np_rng.random((24, 31, 4)) * 255).astype(np.uint8)
    Image.fromarray(b).save(tmp_path / 'rgba.png')
    specs.append((tmp_path / 'rgba.png', b.astype(np.float32) / 255, 1e-6))
    c = (np_rng.random((16, 18)) * 65535).astype(np.uint16)
    Image.fromarray(c).save(tmp_path / 'g16.png')
    specs.append((tmp_path / 'g16.png',
                  (c.astype(np.float32) / 65535)[..., None], 1e-6))
    return specs


def test_decode_matches_reference(images):
    for path, ref, tol in images:
        out = decode_image(path)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=tol)


def test_jpeg_matches_pil(tmp_path, np_rng):
    a = (np_rng.random((40, 40, 3)) * 255).astype(np.uint8)
    p = tmp_path / 'x.jpg'
    Image.fromarray(a).save(p, quality=95)
    out = decode_image(p)
    ref = np.asarray(Image.open(p)).astype(np.float32) / 255
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_batch_threaded(images):
    paths = [p for p, _, _ in images] * 5
    outs = decode_batch(paths, n_threads=4)
    assert len(outs) == len(paths)
    for out, (_, ref, tol) in zip(outs, list(images) * 5):
        np.testing.assert_allclose(out, ref, atol=tol)


def test_load_image_uses_native(tmp_path, np_rng):
    from nerficg_tpu.data.io import load_image
    a = (np_rng.random((20, 20, 3)) * 255).astype(np.uint8)
    p = tmp_path / 'y.png'
    Image.fromarray(a).save(p)
    out = load_image(p)
    np.testing.assert_allclose(out, a.astype(np.float32) / 255, atol=1e-6)


def test_missing_file_falls_back_gracefully(tmp_path):
    assert decode_image(tmp_path / 'nope.png') is None
