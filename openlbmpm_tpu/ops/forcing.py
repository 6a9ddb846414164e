"""Forcing schemes: Guo source term and the EFS/EDM force distribution.

- Guo source S_i = w_i [3 (e - u) + 9 e (e.u)] . F (1 - 1/(2 tau)), as used by
  the CSF perturbation (``AcceleratedRKGPU2D.calPerturbationFromForce2D:1787-1795``).
- EFS force distribution f^F_i = (F . (e - u)) f^eq_i * 3 / rho — the Porter
  2012 explicit-forcing form (``ExplicitD2Q9GPU.calForceDistrGPU:255-272``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..lattice import Lattice
from .common import bcast_1d, e_dot_u, expand_q

__all__ = ["guo_source", "efs_force_pdf"]


def guo_source(lat: Lattice, u, force, prefactor=None) -> jnp.ndarray:
    """Guo et al. forcing source term (no relaxation prefactor applied unless
    given).

    Args:
      u: tuple of velocity components, each (*spatial,).
      force: tuple of force components.
      prefactor: optional scalar/field multiplied in (e.g. 1 - 1/(2 tau)).
    """
    dtype = u[0].dtype
    eu = e_dot_u(lat, u, dtype)
    w = bcast_1d(lat.w, lat.dim, dtype)
    acc = 0.0
    for d in range(lat.dim):
        ed = bcast_1d(lat.e[:, d], lat.dim, dtype)
        acc = acc + (3.0 * (ed - expand_q(u[d], lat)) + 9.0 * ed * eu) * \
            expand_q(force[d], lat)
    src = w * acc
    if prefactor is not None:
        pf = prefactor if jnp.ndim(prefactor) == 0 \
            else expand_q(prefactor, lat)
        src = src * pf
    return src


def efs_force_pdf(lat: Lattice, feq, rho, u, force) -> jnp.ndarray:
    """f^F_i = (F . (e_i - u)) f^eq_i / (rho c_s^2) with c_s^2 = 1/3."""
    dtype = feq.dtype
    acc = 0.0
    for d in range(lat.dim):
        ed = bcast_1d(lat.e[:, d], lat.dim, dtype)
        acc = acc + expand_q(force[d], lat) * (ed - expand_q(u[d], lat))
    rho_safe = jnp.where(rho > 0, rho, 1.0)
    return acc * feq * (3.0 / expand_q(rho_safe, lat))
