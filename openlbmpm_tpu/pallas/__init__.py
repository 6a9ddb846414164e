"""Pallas TPU kernels: fused collide-and-stream steps for the hot models.

These are the TPU-native equivalent of the reference's Numba-CUDA kernel
modules (its only compiled-kernel layer, SURVEY.md section 2.13): one
VMEM-resident pass per time step instead of the jnp multi-pass path.
Every family has one in 2D and 3D; the *_sharded_step variants wrap the
same kernels in shard_map with explicit ppermute halo exchange for
multi-chip meshes.
"""

from .cg3d import build_cg3d_fused_step, build_cg3d_sharded_step  # noqa: F401
from .csf import build_csf_fused_step, build_csf_sharded_step  # noqa: F401
from .sc3d import build_sc3d_fused_step, build_sc3d_sharded_step  # noqa: F401
from .shanchen import build_sc_fused_step, build_sc_sharded_step  # noqa: F401
from .single import build_single_phase_fused_step  # noqa: F401
from .single3d import build_single3d_fused_step  # noqa: F401
