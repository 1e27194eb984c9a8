"""End-to-end NeRF smoke test: tiny model must fit the synthetic blob scene.

SURVEY.md §4(d): tiny NeRF on a procedural 8-image scene must reach a PSNR
threshold in a few hundred steps on CPU.
"""

import numpy as np
import pytest

from nerficg_tpu.core.config import ConfigNode
from nerficg_tpu.core.registry import Datasets, Methods


@pytest.fixture(scope='module')
def tiny_config():
    return ConfigNode({
        'GLOBAL': {'METHOD_TYPE': 'NeRF', 'DATASET_TYPE': 'NeRF',
                   'RANDOM_SEED': 0, 'LOG_LEVEL': 'SILENT'},
        'MODEL': {'NUM_LAYERS': 3, 'WIDTH': 64, 'SKIP_LAYER': 2,
                  'POSITION_FREQUENCIES': 6, 'DIRECTION_FREQUENCIES': 2,
                  'USE_COARSE': False},
        'RENDERER': {'RAY_BATCH_SIZE': 1024, 'N_SAMPLES': 48,
                     'COARSE_RATIO': 0.5},
        'TRAINING': {'NUM_ITERATIONS': 300, 'RAYS_PER_BATCH': 512,
                     'LR_INIT': 5e-3, 'LR_FINAL': 5e-4,
                     'RENDER_TESTSET': False,
                     'CHECKPOINT': {'FINAL': False},
                     'PRELOAD_DATASET': False},
    })


def test_nerf_trains_on_synthetic_scene(tiny_config, synthetic_dataset, tmp_path):
    from nerficg_tpu.core.setup import Directories
    Directories.base = tmp_path / 'output'

    dataset = Datasets.get_dataset(tiny_config, path=str(synthetic_dataset))
    trainer = Methods.get_training_instance(tiny_config)
    trainer.run(dataset)

    # Render a test view and compare PSNR against ground truth.
    view = dataset.subsets['test'][0]
    out = trainer.renderer.render_image(view)
    pred = np.asarray(out['rgb'])
    gt_rgb = view.rgb
    gt_alpha = view.alpha
    bg = dataset.camera_settings.background_color
    gt = gt_rgb * gt_alpha + bg * (1 - gt_alpha)
    mse = float(np.mean((pred - gt) ** 2))
    psnr = -10 * np.log10(mse)
    assert psnr > 18.0, f'end-to-end NeRF PSNR too low: {psnr:.2f}'


def test_checkpoint_roundtrip_renders_identically(tiny_config, synthetic_dataset,
                                                  tmp_path):
    from nerficg_tpu.methods.nerf.model import NeRFModel
    import jax

    dataset = Datasets.get_dataset(tiny_config, path=str(synthetic_dataset))
    model = Methods.get_model(tiny_config)
    model.params = jax.tree_util.tree_map(lambda x: x, model.params)
    model.save(tmp_path / 'm.ckpt')
    loaded = NeRFModel.load(tmp_path / 'm.ckpt')
    assert loaded.WIDTH == 64  # config round-trips
    renderer_a = Methods.get_renderer(tiny_config, model)
    renderer_b = Methods.get_renderer(tiny_config, loaded)
    view = dataset.subsets['test'][0]
    img_a = np.asarray(renderer_a.render_image(view)['rgb'])
    img_b = np.asarray(renderer_b.render_image(view)['rgb'])
    np.testing.assert_allclose(img_a, img_b, atol=1e-6)
