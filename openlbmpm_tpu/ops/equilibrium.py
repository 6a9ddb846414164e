"""Equilibrium distributions.

Forms mirror the reference kernels:
  - quadratic D2Q9/D3Q19 equilibrium
    (``OptimizedD2Q9GPU.calEquilibriumFuncGPU``, ``:377-429``);
  - RK "original" per-color equilibrium with density-ratio constants C_i
    (``AcceleratedRKGPU2D.calEquilibriumRK2DOriginal``, ``:181-186``);
  - transport J-scheme equilibrium C (J_i + e.u / 2)
    (``AccelerateTransport2DRK.calCollisionTransportGPU``, ``:128-130``);
  - transport linear equilibrium C w_i (1 + 3 e.u)
    (``AccelerateTransport2DRK.calCollisionTransportLinearEqlMRTGPU``, ``:565-567``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice
from .common import bcast_1d, e_dot_u, expand_q

__all__ = ["feq_quadratic", "feq_rk_original", "feq_transport_j",
           "feq_transport_linear", "feq_transport_quadratic",
           "rk_constants"]


def feq_quadratic(lat: Lattice, rho, u) -> jnp.ndarray:
    """w_i rho (1 + 3 e.u + 4.5 (e.u)^2 - 1.5 u.u).

    rho: (..., *spatial); u: tuple of same-shaped components.
    Returns (..., Q, *spatial) — the Q axis sits at -(dim + 1), matching the
    state layout f = (K, Q, ny, nx).
    """
    dtype = rho.dtype
    eu = e_dot_u(lat, u, dtype)
    uu = expand_q(sum(c * c for c in u), lat)
    w = bcast_1d(lat.w, lat.dim, dtype)
    return w * expand_q(rho, lat) * \
        (1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * uu)


def rk_constants(alpha: float) -> np.ndarray:
    """Density-ratio constants C_i of the RK equilibrium (D2Q9).

    C_0 = alpha, C_1..4 = (1 - alpha)/5, C_5..8 = (1 - alpha)/20
    (``RKD2Q9.py:146-151``).
    """
    c = np.zeros(9, dtype=np.float64)
    c[0] = alpha
    c[1:5] = (1.0 - alpha) / 5.0
    c[5:] = (1.0 - alpha) / 20.0
    return c


def feq_rk_original(lat: Lattice, rho, u, constants: np.ndarray) -> jnp.ndarray:
    """rho (C_i + w_i (3 e.u + 4.5 (e.u)^2 - 1.5 u.u))."""
    dtype = rho.dtype
    eu = e_dot_u(lat, u, dtype)
    uu = expand_q(sum(c * c for c in u), lat)
    w = bcast_1d(lat.w, lat.dim, dtype)
    cc = bcast_1d(constants, lat.dim, dtype)
    return expand_q(rho, lat) * \
        (cc + w * (3.0 * eu + 4.5 * eu * eu - 1.5 * uu))


def feq_transport_j(lat: Lattice, conc, u, j_coeffs: np.ndarray) -> jnp.ndarray:
    """C (J_i + (e.u) / 2) — the D2Q5 J-scheme equilibrium.

    j_coeffs: (Q,) with J_0 = J0 and J_i = (1 - J0)/4 for moving directions
    (``Transport2DRK.py:404-410``).
    """
    dtype = conc.dtype
    eu = e_dot_u(lat, u, dtype)
    j = bcast_1d(j_coeffs, lat.dim, dtype)
    return expand_q(conc, lat) * (j + 0.5 * eu)


def feq_transport_linear(lat: Lattice, conc, u) -> jnp.ndarray:
    """C w_i (1 + 3 e.u) — linear transport equilibrium."""
    dtype = conc.dtype
    eu = e_dot_u(lat, u, dtype)
    w = bcast_1d(lat.w, lat.dim, dtype)
    return expand_q(conc, lat) * w * (1.0 + 3.0 * eu)


def feq_transport_quadratic(lat: Lattice, conc, u) -> jnp.ndarray:
    """C w_i (1 + 3 e.u + 4.5 (e.u)^2 - 1.5 u.u) — quadratic transport
    equilibrium (``AccelerateTransport2DRK.py:596-659`` MRT variant)."""
    dtype = conc.dtype
    eu = e_dot_u(lat, u, dtype)
    uu = expand_q(sum(c * c for c in u), lat)
    w = bcast_1d(lat.w, lat.dim, dtype)
    return expand_q(conc, lat) * w * \
        (1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * uu)
