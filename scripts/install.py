#!/usr/bin/env python3
"""Environment / dependency doctor.

Reference equivalent: scripts/install.py:42-87 — the reference installs
each method's CUDA extensions by importing it, catching ExtensionError,
running the recorded pip command and retrying.  This framework has no
native extensions to build (the compute path is jax/Pallas, compiled at
runtime), so the equivalent surface is a doctor: it imports every
registered method and dataset, verifies the JAX backend and devices, and
reports any missing *optional* dependencies with their install commands.

Usage:
    python scripts/install.py            # check everything
    python scripts/install.py -m NeRF    # check one method
"""

import argparse
import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nerficg_tpu.core.logging import Logger

# Optional integrations: (module, why, install command).
OPTIONAL = [
    ('torch', 'LPIPS metric fallback (optim/metrics.py)',
     'pip install torch --index-url https://download.pytorch.org/whl/cpu'),
    ('wandb', 'experiment tracking (core/setup.py)', 'pip install wandb'),
    ('plyfile', 'PLY export fallback (scripts/convert_to_ply.py uses an '
     'internal writer; plyfile only for cross-checks)', 'pip install plyfile'),
]


def check_backend() -> bool:
    import jax
    devices = jax.devices()
    Logger.info(f'jax {jax.__version__}, backend={jax.default_backend()}, '
                f'{len(devices)} device(s): '
                f'{", ".join(str(d) for d in devices)}')
    try:
        import jax.numpy as jnp
        val = float(jnp.ones(8).sum())
        ok = val == 8.0
    except Exception as exc:  # pragma: no cover
        Logger.error(f'device smoke test failed: {exc}')
        return False
    if not ok:
        Logger.error('device smoke test produced a wrong result')
    return ok


def check_methods(only: str | None) -> bool:
    from nerficg_tpu.core.registry import Datasets, Methods
    ok = True
    methods = [only] if only else Methods.options()
    for name in methods:
        try:
            entry = Methods.get_entry(name)
            Logger.info(f'method {name}: model={entry.model_cls.__name__}, '
                        f'renderer={entry.renderer_cls.__name__}, '
                        f'trainer={entry.trainer_cls.__name__}')
        except Exception as exc:
            Logger.error(f'method {name} failed to import: {exc}')
            ok = False
    if only is None:
        for name in Datasets.options():
            try:
                Datasets.get_class(name)
            except Exception as exc:
                Logger.error(f'dataset {name} failed to import: {exc}')
                ok = False
        Logger.info(f'{len(Datasets.options())} dataset loaders importable')
    return ok


def check_optional() -> None:
    for module, why, cmd in OPTIONAL:
        try:
            importlib.import_module(module)
            Logger.info(f'optional {module}: available ({why})')
        except ImportError:
            Logger.warning(f'optional {module}: MISSING — {why}; '
                           f'install with: {cmd}')


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('-m', '--method', default=None,
                        help='check a single method only')
    args = parser.parse_args()
    ok = check_backend()
    ok = check_methods(args.method) and ok
    check_optional()
    if ok:
        Logger.info('environment OK')
    else:
        Logger.error('environment has problems (see above)')
        sys.exit(1)


if __name__ == '__main__':
    main()
