from nerficg_tpu.ops.compositing import (composite_rays, densities_to_weights,
                                         distortion_loss)
from nerficg_tpu.ops.encoding import eval_sh, frequency_encode, sh_encode
from nerficg_tpu.ops.morton import (morton3d, morton3d_invert,
                                    morton_encode_positions, packbits,
                                    unpackbits)
from nerficg_tpu.ops.ray_aabb import ray_aabb_intersect, ray_sphere_intersect
from nerficg_tpu.ops.sampling import (merge_sorted_samples, sample_pdf,
                                      stratified_samples)
