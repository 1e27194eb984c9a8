"""Method / dataset plugin registry.

Reference equivalent: src/Implementations.py (directory-scan discovery of
method packages exporting MODEL/RENDERER/TRAINING_INSTANCE and dataset modules
exporting CustomDataset). Redesigned as an explicit decorator registry: methods
and datasets register themselves at import time, and a lazy import table maps
names to modules so `get_*` works without importing every plugin up front.
External plugins call ``register_method`` / ``register_dataset`` directly.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass
from typing import Callable

from nerficg_tpu.core.errors import DatasetError, MethodError

__all__ = ['Methods', 'Datasets', 'register_method', 'register_dataset']


@dataclass
class MethodEntry:
    name: str
    model_cls: type
    renderer_cls: type
    trainer_cls: type


# Lazy import tables: name -> module path. Importing the module triggers the
# register_* decorator which fills _methods/_datasets.
_BUILTIN_METHOD_MODULES = {
    'NeRF': 'nerficg_tpu.methods.nerf',
    'InstantNGP': 'nerficg_tpu.methods.instant_ngp',
    'GaussianSplatting': 'nerficg_tpu.methods.gaussian_splatting',
    'DNeRF': 'nerficg_tpu.methods.dnerf',
}
_BUILTIN_DATASET_MODULES = {
    'NeRF': 'nerficg_tpu.data.loaders.nerf',
    'DNeRF': 'nerficg_tpu.data.loaders.dnerf',
    'Colmap': 'nerficg_tpu.data.loaders.colmap',
    'MipNeRF360': 'nerficg_tpu.data.loaders.mipnerf360',
    'TanksAndTemples': 'nerficg_tpu.data.loaders.tanks_and_temples',
    'TanksAndTemples_3DGS': 'nerficg_tpu.data.loaders.tanks_and_temples_3dgs',
    'NvidiaShort': 'nerficg_tpu.data.loaders.nvidia_short',
    'PlenopticVideoBlender': 'nerficg_tpu.data.loaders.plenoptic_video_blender',
    'OmniBlender': 'nerficg_tpu.data.loaders.omni_blender',
    'Ricoh360': 'nerficg_tpu.data.loaders.ricoh360',
    'RaRPano': 'nerficg_tpu.data.loaders.rar_pano',
    'RTMV': 'nerficg_tpu.data.loaders.rtmv',
    'Empty': 'nerficg_tpu.data.loaders.empty',
}

_methods: dict[str, MethodEntry] = {}
_datasets: dict[str, type] = {}


def register_method(name: str, model_cls: type, renderer_cls: type,
                    trainer_cls: type) -> None:
    _methods[name] = MethodEntry(name, model_cls, renderer_cls, trainer_cls)


def register_dataset(name: str) -> Callable[[type], type]:
    def decorator(cls: type) -> type:
        _datasets[name] = cls
        return cls
    return decorator


def _resolve_method(name: str) -> MethodEntry:
    if name not in _methods:
        module = _BUILTIN_METHOD_MODULES.get(name)
        if module is None:
            raise MethodError(
                f'unknown method {name!r} (available: '
                f'{sorted(set(_methods) | set(_BUILTIN_METHOD_MODULES))})')
        importlib.import_module(module)
    if name not in _methods:
        raise MethodError(f'method module for {name!r} did not register itself')
    return _methods[name]


def _resolve_dataset(name: str) -> type:
    if name not in _datasets:
        module = _BUILTIN_DATASET_MODULES.get(name)
        if module is None:
            raise DatasetError(
                f'unknown dataset {name!r} (available: '
                f'{sorted(set(_datasets) | set(_BUILTIN_DATASET_MODULES))})')
        importlib.import_module(module)
    if name not in _datasets:
        raise DatasetError(f'dataset module for {name!r} did not register itself')
    return _datasets[name]


class Methods:
    """Method lookup facade (reference: Implementations.Methods, :43-65)."""

    @staticmethod
    def options() -> list[str]:
        return sorted(set(_methods) | set(_BUILTIN_METHOD_MODULES))

    @staticmethod
    def get_entry(name: str) -> MethodEntry:
        return _resolve_method(name)

    @staticmethod
    def get_model(config, name: str | None = None, checkpoint: str | None = None):
        method = config.GLOBAL.METHOD_TYPE if name is None else name
        entry = _resolve_method(method)
        if checkpoint is not None:
            return entry.model_cls.load(checkpoint, config)
        model = entry.model_cls(config)
        model.build()
        return model

    @staticmethod
    def get_renderer(config, model, name: str | None = None):
        method = config.GLOBAL.METHOD_TYPE if name is None else name
        return _resolve_method(method).renderer_cls(config, model)

    @staticmethod
    def get_training_instance(config, name: str | None = None):
        method = config.GLOBAL.METHOD_TYPE if name is None else name
        entry = _resolve_method(method)
        model = Methods.get_model(config, method)
        renderer = entry.renderer_cls(config, model)
        return entry.trainer_cls(config, model, renderer)


class Datasets:
    """Dataset lookup facade (reference: Implementations.Datasets, :93)."""

    @staticmethod
    def options() -> list[str]:
        return sorted(set(_datasets) | set(_BUILTIN_DATASET_MODULES))

    @staticmethod
    def get_class(name: str) -> type:
        return _resolve_dataset(name)

    @staticmethod
    def get_dataset(config, name: str | None = None, path: str | None = None):
        dataset_type = config.GLOBAL.DATASET_TYPE if name is None else name
        cls = _resolve_dataset(dataset_type)
        return cls(config, path=path)
