"""Element / image / dataset samplers for training batches.

Reference equivalent: src/Optim/Samplers/ — element samplers (utils.py:8-57),
image samplers (ImageSamplers.py:11-61), dataset samplers
(DatasetSamplers.py:10-77). Host-side index logic (numpy RNG) that feeds
device steps; ray selection within a view happens on device from pixel ids.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from nerficg_tpu.core.errors import SamplerError
from nerficg_tpu.data.types import RayBatch

__all__ = ['SequentialSampler', 'RandomSequentialSampler',
           'IncrementalSequentialSampler', 'MultinomialImageSampler',
           'DatasetSampler', 'RayPoolSampler', 'IncrementalDatasetSampler']


# -- element samplers (reference: Optim/Samplers/utils.py:8-57) ------------------

class SequentialSampler:
    """Cycle 0..n-1 in order."""

    def __init__(self, num_elements: int, seed: int = 0):
        if num_elements <= 0:
            raise SamplerError('sampler needs at least one element')
        self.num_elements = num_elements
        self._pos = 0

    def get(self) -> int:
        idx = self._pos
        self._pos = (self._pos + 1) % self.num_elements
        return idx


class RandomSequentialSampler(SequentialSampler):
    """Shuffled epochs: every element once per epoch, random order."""

    def __init__(self, num_elements: int, seed: int = 0):
        super().__init__(num_elements)
        self._rng = np.random.default_rng(seed)
        self._order = self._rng.permutation(num_elements)

    def get(self) -> int:
        idx = int(self._order[self._pos])
        self._pos += 1
        if self._pos >= self.num_elements:
            self._pos = 0
            self._order = self._rng.permutation(self.num_elements)
        return idx


class IncrementalSequentialSampler(SequentialSampler):
    """Growing window: elements become available over time
    (reference: Samplers/utils.py:40-57)."""

    def __init__(self, num_elements: int, seed: int = 0, initial: int = 1):
        super().__init__(num_elements)
        self.available = min(initial, num_elements)
        self._rng = np.random.default_rng(seed)

    def grow(self, count: int = 1) -> None:
        self.available = min(self.available + count, self.num_elements)

    def get(self) -> int:
        return int(self._rng.integers(0, self.available))


class MultinomialImageSampler:
    """Importance sampling with an updatable pdf over images
    (reference: Samplers/ImageSamplers.py:42-61)."""

    def __init__(self, num_elements: int, seed: int = 0):
        self.num_elements = num_elements
        self.pdf = np.ones(num_elements) / num_elements
        self._rng = np.random.default_rng(seed)

    def update_pdf(self, weights: np.ndarray) -> None:
        weights = np.maximum(np.asarray(weights, np.float64), 1e-8)
        self.pdf = weights / weights.sum()

    def get(self) -> int:
        return int(self._rng.choice(self.num_elements, p=self.pdf))


# -- dataset samplers (reference: Optim/Samplers/DatasetSamplers.py:10-77) --------

class DatasetSampler:
    """Pick a view, then rays within it (reference: DatasetSamplers.py:10-40)."""

    def __init__(self, dataset, num_rays: int | None = 1024, seed: int = 0,
                 random_views: bool = True):
        self.dataset = dataset
        self.num_rays = num_rays
        n = len(dataset.subsets['train'])
        self.view_sampler = (RandomSequentialSampler(n, seed) if random_views
                             else SequentialSampler(n, seed))
        self._rng = np.random.default_rng(seed + 1)

    def get(self) -> tuple[int, Optional[np.ndarray]]:
        """Returns (view_index, pixel_ids or None for the full image)."""
        view_idx = self.view_sampler.get()
        if self.num_rays is None:
            return view_idx, None
        view = self.dataset.subsets['train'][view_idx]
        n_pixels = view.camera.num_pixels
        pixel_ids = self._rng.integers(0, n_pixels, size=self.num_rays,
                                       dtype=np.int64)
        return view_idx, pixel_ids

    def get_view(self):
        return self.dataset.subsets['train'][self.view_sampler.get()]


class RayPoolSampler:
    """Sample across all precomputed rays of the train split
    (reference: DatasetSamplers.py:42-62)."""

    def __init__(self, dataset, seed: int = 0):
        if dataset.ray_collection is None:
            dataset.precompute_rays('train')
        self.rays = dataset.ray_collection.rays
        self.num_rays_total = len(self.rays)
        self._rng = np.random.default_rng(seed)

    def get(self, num_rays: int) -> RayBatch:
        ids = self._rng.integers(0, self.num_rays_total, size=num_rays,
                                 dtype=np.int64)
        return self.rays[ids]

    def get_ids(self, num_rays: int) -> np.ndarray:
        return self._rng.integers(0, self.num_rays_total, size=num_rays,
                                  dtype=np.int64)


class IncrementalDatasetSampler(DatasetSampler):
    """Growing-window view selection for incremental/dynamic training
    (reference: DatasetSamplers.py:64-77)."""

    def __init__(self, dataset, num_rays: int | None = 1024, seed: int = 0):
        super().__init__(dataset, num_rays, seed)
        n = len(dataset.subsets['train'])
        self.view_sampler = IncrementalSequentialSampler(n, seed)

    def grow(self, count: int = 1) -> None:
        self.view_sampler.grow(count)
