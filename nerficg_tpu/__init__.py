"""nerficg_tpu: TPU-native radiance-field framework (JAX / XLA / Pallas).

A ground-up rebuild of the capabilities of nerficg-project/nerficg for TPU:
pluggable methods (NeRF, Instant-NGP, 3D Gaussian Splatting), a shared
camera/view/ray data model with many dataset loaders, a callback-driven
trainer with jit-compiled train steps, Pallas kernels for the hot paths, and
pjit/shard_map parallelism over device meshes.
"""

__version__ = '0.1.0'
