"""Macroscopic moments: density, momentum, velocities.

Mirrors ``OptimizedD2Q9GPU.calFluidRhoGPU:84-93`` (density),
``calPhysicalVelocity:156-175`` (u = (sum f e + F/2) / rho),
``calMacroWholeVelocity:336-353`` (Shan-Chen common velocity u'),
``AcceleratedRKGPU2D.calPhysicalVelocityRKGPU2DNew1:2634-2653`` (total-PDF
velocity with the half-force correction).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice
from .common import bcast_1d

__all__ = ["density", "momentum", "velocity", "sc_common_velocity",
           "pressure_sc", "pressure_sc_huang", "pressure_sc_shan",
           "pressure_sc_kang"]


def density(f: jnp.ndarray, spatial_dim: int = 2) -> jnp.ndarray:
    """rho = sum_i f_i; f has shape (..., Q, *spatial), reduces the Q axis."""
    return jnp.sum(f, axis=-1 - spatial_dim)


def momentum(lat: Lattice, f: jnp.ndarray):
    """(sum_i f_i e_i) per spatial component; returns tuple of arrays."""
    dtype = f.dtype
    qax = -1 - lat.dim
    comps = []
    for d in range(lat.dim):
        ed = bcast_1d(lat.e[:, d], lat.dim, dtype)
        comps.append(jnp.sum(ed * f, axis=qax))
    return tuple(comps)


def velocity(lat: Lattice, f: jnp.ndarray, rho: jnp.ndarray, force=None):
    """u = (sum f e + F/2) / rho.  `force` is an optional tuple per axis."""
    mom = momentum(lat, f)
    if force is not None:
        mom = tuple(m + 0.5 * g for m, g in zip(mom, force))
    rho_safe = jnp.where(rho > 0, rho, 1.0)
    return tuple(m / rho_safe for m in mom)


def sc_common_velocity(lat: Lattice, f_k: jnp.ndarray, rho_k: jnp.ndarray,
                       tau_k: np.ndarray):
    """Shan-Chen common velocity u' = sum_k(sum_i f_ki e_i / tau_k) / sum_k(rho_k / tau_k).

    f_k: (K, Q, *spatial); rho_k: (K, *spatial); tau_k: (K,).
    """
    dtype = f_k.dtype
    inv_tau = jnp.asarray(1.0 / np.asarray(tau_k, np.float64), dtype)
    itau = inv_tau.reshape((-1,) + (1,) * (rho_k.ndim - 1))
    denom = jnp.sum(rho_k * itau, axis=0)
    denom = jnp.where(denom != 0, denom, 1.0)
    comps = []
    for d in range(lat.dim):
        ed = bcast_1d(lat.e[:, d], rho_k.ndim - 1, dtype)
        num = jnp.sum(jnp.sum(ed * f_k, axis=1) * itau, axis=0)
        comps.append(num / denom)
    return tuple(comps)


def pressure_sc(rho_k: jnp.ndarray, g_matrix: np.ndarray) -> jnp.ndarray:
    """P = rho_tot/3 + (3/2) sum_{i<j} G_ij rho_i rho_j
    (``OptimizedD2Q9GPU.calMacroPressure:135-149``)."""
    k = rho_k.shape[0]
    p = jnp.sum(rho_k, axis=0) / 3.0
    for i in range(k - 1):
        for j in range(i + 1, k):
            p = p + 1.5 * float(g_matrix[i, j]) * rho_k[i] * rho_k[j]
    return p


def pressure_sc_huang(rho_0, rho_1, g: float) -> jnp.ndarray:
    """Huang & Sukop 2007 two-fluid pressure: P = rho/3 + G/3 rho_0 rho_1
    (``AccelerateGPU2D.calMacroPressureHuang1D:100-110``)."""
    return (rho_0 + rho_1) / 3.0 + (g / 3.0) * rho_0 * rho_1


def pressure_sc_shan(rho_0, rho_1, g: float) -> jnp.ndarray:
    """Shan & Doolen 1995 pressure: P = rho/3 + (3/2)(1/3) G rho_0 rho_1
    (``calMacroPressureShan1D:117-127``)."""
    return (rho_0 + rho_1) / 3.0 + 0.5 * g * rho_0 * rho_1


def pressure_sc_kang(rho_0, rho_1, g: float) -> jnp.ndarray:
    """Kang et al. 2002 pressure (G is 9x Shan's normalization;
    ``calMacroPressureKang1D:135-149``).  Same closed form as Shan's in the
    reference snapshot — kept as a distinct entry point for config parity."""
    return (rho_0 + rho_1) / 3.0 + 0.5 * g * rho_0 * rho_1
