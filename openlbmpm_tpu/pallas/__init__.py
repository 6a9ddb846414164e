"""Pallas TPU kernels: fused collide-and-stream steps for the hot models.

These are the TPU-native equivalent of the reference's Numba-CUDA kernel
modules (its only compiled-kernel layer, SURVEY.md section 2.13): one
VMEM-resident pass per time step instead of the jnp multi-pass path.
"""

from .csf import build_csf_fused_step  # noqa: F401
