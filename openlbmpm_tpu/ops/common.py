"""Shared helpers: periodic shifts and lattice-constant broadcasting."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice


def shift(a: jnp.ndarray, dx: int, dy: int, dz: int | None = None) -> jnp.ndarray:
    """Return array whose value at x is a(x + d), with periodic wrap.

    Works on the trailing spatial axes: (..., ny, nx) in 2D or
    (..., nz, ny, nx) in 3D.  A gather of the "upwind" neighbor value:
    ``shift(a, dx, dy)[..., y, x] == a[..., y + dy, x + dx]``.
    """
    if dz is None:
        return jnp.roll(a, shift=(-dy, -dx), axis=(-2, -1))
    return jnp.roll(a, shift=(-dz, -dy, -dx), axis=(-3, -2, -1))


def pull(a: jnp.ndarray, dx: int, dy: int, dz: int | None = None) -> jnp.ndarray:
    """Value at x of a(x - d): the pull-streaming gather for velocity d."""
    if dz is None:
        return jnp.roll(a, shift=(dy, dx), axis=(-2, -1))
    return jnp.roll(a, shift=(dz, dy, dx), axis=(-3, -2, -1))


def bcast_1d(v: np.ndarray, spatial_ndim: int, dtype) -> jnp.ndarray:
    """Broadcast a per-direction constant (Q,) against (Q, *spatial)."""
    return jnp.asarray(v, dtype=dtype).reshape((-1,) + (1,) * spatial_ndim)


def e_dot_u(lat: Lattice, u, dtype):
    """(Q, *spatial) array of e_i . u for u = (ux, uy[, uz])."""
    n = u[0].ndim
    acc = bcast_1d(lat.e[:, 0], n, dtype) * u[0][None]
    acc = acc + bcast_1d(lat.e[:, 1], n, dtype) * u[1][None]
    if lat.dim == 3:
        acc = acc + bcast_1d(lat.e[:, 2], n, dtype) * u[2][None]
    return acc
