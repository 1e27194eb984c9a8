from nerficg_tpu.cameras.base import BaseCamera, SharedCameraSettings, generate_rays
from nerficg_tpu.cameras.distortion import RadialTangentialDistortion
from nerficg_tpu.cameras.equirectangular import EquirectangularCamera
from nerficg_tpu.cameras.perspective import PerspectiveCamera
from nerficg_tpu.cameras.pose import (average_pose, focal_to_fov, fov_to_focal,
                                      invert_3d_affine, look_at,
                                      quaternion_to_rotation_matrix,
                                      recenter_poses, rescale_poses_to_unit_cube,
                                      rotation_matrix_to_quaternion,
                                      transform_poses_pca)
