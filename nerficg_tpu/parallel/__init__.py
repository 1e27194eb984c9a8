from nerficg_tpu.parallel.mesh import (DATA_AXIS, RenderMesh, make_mesh,
                                       replicated_spec, shard_rays_spec)
