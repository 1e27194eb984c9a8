"""Framework setup / teardown and output-directory layout.

Reference equivalent: ``Framework.setup`` (src/Framework.py:120-160) which
seeds RNGs, selects devices, and initializes logging — redesigned for JAX:
setup returns an explicit ``FrameworkContext`` (config + RNG key + device mesh)
instead of mutating process-global torch state.
"""

from __future__ import annotations

import argparse
import datetime
import random
import warnings
from dataclasses import dataclass, field
from pathlib import Path

import jax
import numpy as np

from nerficg_tpu.core.config import ConfigNode, load_config
from nerficg_tpu.core.logging import Logger

__all__ = ['FrameworkContext', 'setup', 'teardown', 'Directories',
           'default_argparser', 'device_sync']


class Directories:
    """Output directory layout (reference: Framework.py:111, Model.py:25)."""

    base: Path = Path('output')

    @classmethod
    def output_dir(cls, method: str, run_name: str, timestamp: bool = True) -> Path:
        if timestamp:
            stamp = datetime.datetime.now().strftime('%Y-%m-%d_%H-%M-%S')
            run_name = f'{run_name}_{stamp}'
        path = cls.base / method / run_name
        path.mkdir(parents=True, exist_ok=True)
        return path


@dataclass
class FrameworkContext:
    """Everything ``setup`` provides: explicit, no globals."""

    config: ConfigNode
    rng: jax.Array                      # jax PRNG key
    devices: list = field(default_factory=list)

    def next_rng(self) -> jax.Array:
        self.rng, sub = jax.random.split(self.rng)
        return sub


def setup(config_path: str | None = None, overrides=(), *,
          config: ConfigNode | None = None) -> FrameworkContext:
    """Initialize the framework (reference: Framework.setup, Framework.py:120-160).

    Seeds python/numpy RNG, creates the root JAX PRNG key, selects devices,
    configures logging and warning filters.
    """
    if config is None:
        config = load_config(config_path, overrides)
    g = config.GLOBAL
    Logger.set_level(g.get('LOG_LEVEL', 'NORMAL'))
    if g.get('FILTER_WARNINGS', True):
        warnings.filterwarnings('ignore', category=UserWarning)
    if g.get('ANOMALY_DETECTION', False):
        jax.config.update('jax_debug_nans', True)
    if g.get('DISTRIBUTED', False):
        # Multi-host: join the cluster before any device query (SURVEY §5.8;
        # the reference has no multi-host story — torch DataParallel only).
        from nerficg_tpu.parallel.mesh import initialize_distributed
        n_proc = initialize_distributed(
            coordinator_address=g.get('COORDINATOR_ADDRESS'),
            num_processes=g.get('NUM_PROCESSES'),
            process_id=g.get('PROCESS_ID'))
        Logger.info(f'distributed: process {jax.process_index()} '
                    f'of {n_proc}')

    seed = int(g.get('RANDOM_SEED', 42))
    random.seed(seed)
    np.random.seed(seed)
    rng = jax.random.PRNGKey(seed)

    devices = list(jax.devices())
    num = g.get('NUM_DEVICES')
    if num is not None:
        devices = devices[:int(num)]
    Logger.info(f'framework setup: {len(devices)} device(s) '
                f'[{devices[0].platform if devices else "none"}], seed={seed}')
    return FrameworkContext(config=config, rng=rng, devices=devices)


def teardown(ctx: FrameworkContext | None = None) -> None:
    """Flush any pending device work (reference: Framework.teardown, :311-320)."""
    try:
        jax.effects_barrier()
    except Exception:
        pass


def default_argparser(description: str) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument('-c', '--config', type=str, default=None,
                        help='path to YAML config file')
    parser.add_argument('overrides', nargs='*', default=[],
                        help='KEY.SUBKEY=value config overrides')
    return parser


def device_sync(tree) -> None:
    """Block until device work producing ``tree`` is complete.

    ``jax.block_until_ready`` has a pathological fixed cost (~1s) through some
    remote-device transports (axon); pulling one scalar forces completion via
    the data path instead.
    """
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        jnp.sum(leaves[0]).item()
