"""Rothman-Keller color-gradient ops: phase field, wetting, CSF, recoloring.

Mask-based dense reformulations of the reference's sparse wetting machinery
(SURVEY.md section 7, "hard part 1"):

  - phase field phi                  (``AcceleratedRKGPU2D.calPhaseFieldPhi:1348-1356``)
  - solid-phi extrapolation          (``calColorValueOnSolid:1560-1580``)
  - isotropic gradient incl. solid   (``calRKInitialGradient:1584-1632``)
  - contact-angle enforcement, Xu 2017 variant
                                     (``updateColorGradientOnWetting:1639-1679``)
  - contact-angle enforcement, Akai 2018 variant
                                     (``updateColorGradientOnWettingNew:2430-2492``)
  - curvature + CSF force            (``calForceTermInColorGradient2D:1686-1735``
                                      and the "New" variant ``:2499-2552``)
  - tau(phi) interpolations          (``calRKCollision1TotalGPU2DSRTM:1818-1833``,
                                      Grunau quadratic ``calTau1/2AtLocation:150-164``)
  - perturbation operator            (``calRKCollision23GPU:286-306``,
                                      ``calRKCollision2TotalGPUNew:1485-1511``)
  - Latva-Kokko-Rothman recoloring   (``calRecoloringProcessM:1857-1900``,
                                      perturbation-variant ``calRKCollision23GPU:307-332``)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..lattice import D2Q9, Lattice
from .common import bcast_1d, shift

__all__ = [
    "phase_field", "solid_phi_extrapolate", "color_gradient",
    "rotate_gradient_on_wetting_xu", "rotate_gradient_on_wetting_akai",
    "rotate_gradient_on_wetting_akai_nd",
    "csf_force", "csf_force_nd", "tau_interp_csf", "tau_interp_grunau",
    "perturbation", "recolor_lkr", "recolor_lkr_nd", "recolor_rk_original",
    "B_CONSTANTS",
]

# Perturbation constants B_i (``RKD2Q9.py:127-129``).
B_CONSTANTS = np.array([-4 / 27] + [2 / 27] * 4 + [5 / 108] * 4, np.float64)
# Liu et al. 2014 alternative (``RKD2Q9.py:131-133``).
B_CONSTANTS_LIU = np.array([-2 / 9] + [1 / 9] * 4 + [1 / 36] * 4, np.float64)

_EPS = 1.0e-8


def phase_field(rho_r, rho_b):
    """phi = (rho_R - rho_B) / (rho_R + rho_B), 0 where both vanish."""
    s = rho_r + rho_b
    return jnp.where(s != 0, (rho_r - rho_b) / jnp.where(s != 0, s, 1.0), 0.0)


def _shift_e(a, e_i, dim: int):
    """Shift by one lattice velocity (2D or 3D)."""
    if dim == 3:
        return shift(a, int(e_i[0]), int(e_i[1]), int(e_i[2]))
    return shift(a, int(e_i[0]), int(e_i[1]))


def solid_phi_extrapolate(phi, is_fluid, lat: Lattice = D2Q9):
    """Extend phi onto solid voxels as the w-weighted average of fluid
    neighbors; returns the full field (phi on fluid, extrapolation on solid).
    """
    fl = is_fluid.astype(phi.dtype)
    num = jnp.zeros_like(phi)
    den = jnp.zeros_like(phi)
    for i in range(1, lat.q):
        w = float(lat.w[i])
        fl_n = _shift_e(fl, lat.e[i], lat.dim)
        num = num + w * fl_n * _shift_e(phi, lat.e[i], lat.dim)
        den = den + w * fl_n
    phi_solid = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
    return jnp.where(is_fluid, phi, phi_solid)


def color_gradient(phi_ext, lat: Lattice = D2Q9):
    """grad phi = 3 sum_i w_i phi(x + e_i) e_i (isotropic 2nd-order).

    Returns a tuple of lat.dim gradient components.
    """
    g = [jnp.zeros_like(phi_ext) for _ in range(lat.dim)]
    for i in range(1, lat.q):
        w = float(lat.w[i])
        s = _shift_e(phi_ext, lat.e[i], lat.dim)
        for d in range(lat.dim):
            ed = int(lat.e[i, d])
            if ed:
                g[d] = g[d] + (w * ed) * s
    return tuple(3.0 * c for c in g)


def rotate_gradient_on_wetting_xu(gx, gy, nsx, nsy, cos_t, sin_t, wet_mask):
    """Replace the gradient direction on wetting fluid nodes by n_s rotated
    by +/- theta, choosing the rotation closer to the current direction
    (Xu et al. 2017; ``updateColorGradientOnWetting``).
    """
    n1x = nsx * cos_t - nsy * sin_t
    n1y = nsy * cos_t + nsx * sin_t
    n2x = nsx * cos_t + nsy * sin_t
    n2y = nsy * cos_t - nsx * sin_t
    norm = jnp.sqrt(gx * gx + gy * gy)
    safe = norm > _EPS
    ux = jnp.where(safe, gx / jnp.where(safe, norm, 1.0), 0.0)
    uy = jnp.where(safe, gy / jnp.where(safe, norm, 1.0), 0.0)
    d1 = jnp.sqrt((ux - n1x) ** 2 + (uy - n1y) ** 2)
    d2 = jnp.sqrt((ux - n2x) ** 2 + (uy - n2y) ** 2)
    mx = jnp.where(d1 < d2, n1x, jnp.where(d1 > d2, n2x, nsx))
    my = jnp.where(d1 < d2, n1y, jnp.where(d1 > d2, n2y, nsy))
    gx_new = norm * mx
    gy_new = norm * my
    return (jnp.where(wet_mask, gx_new, gx), jnp.where(wet_mask, gy_new, gy))


def rotate_gradient_on_wetting_akai(gx, gy, nsx, nsy, cos_t, sin_t, wet_mask):
    """Akai et al. 2018 wetting-angle enforcement
    (``updateColorGradientOnWettingNew:2430-2492``).

    Works with the inward normal n-hat = -g/|g|; builds the two candidate
    directions in the plane spanned by (n_s, n-hat) at angle theta from n_s
    and keeps the nearer one.  Nodes where the two distances tie keep their
    gradient (reference leaves them unmodified).
    """
    norm = jnp.sqrt(gx * gx + gy * gy)
    safe = norm > _EPS
    ux = jnp.where(safe, -gx / jnp.where(safe, norm, 1.0), 0.0)
    uy = jnp.where(safe, -gy / jnp.where(safe, norm, 1.0), 0.0)
    dot = jnp.clip(ux * nsx + uy * nsy, -1.0, 1.0)
    theta_gs = jnp.arccos(dot)
    sin_gs = jnp.sin(theta_gs)
    ok = jnp.abs(sin_gs) > 1.0e-9
    sin_gs_safe = jnp.where(ok, sin_gs, 1.0)
    c1 = jnp.where(ok, sin_t * jnp.cos(theta_gs) / sin_gs_safe, 0.0)
    c2 = jnp.where(ok, sin_t / sin_gs_safe, 0.0)
    n1x = (cos_t - c1) * nsx + c2 * ux
    n1y = (cos_t - c1) * nsy + c2 * uy
    n2x = (cos_t + c1) * nsx - c2 * ux
    n2y = (cos_t + c1) * nsy - c2 * uy
    d1 = jnp.sqrt((n1x - ux) ** 2 + (n1y - uy) ** 2)
    d2 = jnp.sqrt((n2x - ux) ** 2 + (n2y - uy) ** 2)
    pick1 = d1 < d2
    tie = d1 == d2
    mx = jnp.where(pick1, n1x, n2x)
    my = jnp.where(pick1, n1y, n2y)
    gx_new = jnp.where(tie, gx, -norm * mx)
    gy_new = jnp.where(tie, gy, -norm * my)
    return (jnp.where(wet_mask, gx_new, gx), jnp.where(wet_mask, gy_new, gy))


def csf_force(gx, gy, sigma, is_fluid, inward_normal: bool = False,
              lat: Lattice = D2Q9):
    """Continuum-surface-force: F = +-(1/2) sigma kappa grad(phi).

    kappa = nx ny (dx ny + dy nx) - ny^2 dx nx - nx^2 dy ny with n-hat the
    unit gradient (outward for wetting type 1) or -g/|g| (inward, type 2);
    neighbor partials sum over fluid neighbors only.

    Returns (fx, fy, kappa).
    """
    sign = -1.0 if inward_normal else 1.0
    norm = jnp.sqrt(gx * gx + gy * gy)
    safe = norm > (_EPS if inward_normal else 0.0)
    nhx = jnp.where(safe, sign * gx / jnp.where(safe, norm, 1.0), 0.0)
    nhy = jnp.where(safe, sign * gy / jnp.where(safe, norm, 1.0), 0.0)
    fl = is_fluid.astype(gx.dtype)
    nhx = nhx * fl
    nhy = nhy * fl
    dx_ny = jnp.zeros_like(gx)
    dy_nx = jnp.zeros_like(gx)
    dx_nx = jnp.zeros_like(gx)
    dy_ny = jnp.zeros_like(gx)
    for i in range(1, lat.q):
        dx, dy = int(lat.e[i, 0]), int(lat.e[i, 1])
        w3 = 3.0 * float(lat.w[i])
        sx = shift(nhx, dx, dy)
        sy = shift(nhy, dx, dy)
        if dx:
            dx_ny = dx_ny + (w3 * dx) * sy
            dx_nx = dx_nx + (w3 * dx) * sx
        if dy:
            dy_nx = dy_nx + (w3 * dy) * sx
            dy_ny = dy_ny + (w3 * dy) * sy
    kappa = nhx * nhy * (dx_ny + dy_nx) - nhy * nhy * dx_nx - nhx * nhx * dy_ny
    fx = sign * 0.5 * sigma * kappa * gx
    fy = sign * 0.5 * sigma * kappa * gy
    return fx, fy, kappa


def tau_interp_csf(phi, rho_r, rho_b, tau_r, tau_b, delta, option: int = 1):
    """tau(phi) for the CSF total-PDF collision.

    option 1: harmonic interpolation in (tau - 1/2);
    option 2: harmonic viscosity mixing by density fraction.
    Outside |phi| <= delta the pure-fluid tau applies.
    """
    if option == 1:
        tau_mid = 0.5 + 1.0 / ((1.0 + phi) / (2.0 * (tau_r - 0.5)) +
                               (1.0 - phi) / (2.0 * (tau_b - 0.5)))
    elif option == 2:
        s = rho_r + rho_b
        s = jnp.where(s != 0, s, 1.0)
        ratio_r = rho_r / s
        ratio_b = rho_b / s
        mu_r = 3.0 / (tau_r - 0.5)
        mu_b = 3.0 / (tau_b - 0.5)
        mu = 1.0 / (ratio_r * mu_r + ratio_b * mu_b)
        tau_mid = 3.0 * mu + 0.5
    else:
        raise ValueError(f"unknown tau option {option}")
    tau = jnp.where(phi > delta, tau_r,
                    jnp.where(phi < -delta, tau_b, tau_mid))
    return tau


def tau_interp_grunau(phi, tau_r, tau_b, delta):
    """Grunau et al. quadratic tau interpolation (Perturbation variant,
    ``calTau1AtLocation``/``calTau2AtLocation:150-164``)."""
    s1 = 2.0 * tau_r * tau_b / (tau_r + tau_b)
    s2 = 2.0 * (tau_r - s1) / delta
    s3 = -s2 / (2.0 * delta)
    tau1 = s1 + s2 * phi + s3 * phi * phi
    t2 = 2.0 * (s1 - tau_b) / delta
    t3 = t2 / (2.0 * delta)
    tau2 = s1 + t2 * phi + t3 * phi * phi
    tau = jnp.where(phi > delta, tau_r,
           jnp.where(phi > 0.0, tau1,
            jnp.where(phi >= -delta, tau2, tau_b)))
    return tau


def perturbation(gx, gy, a_coeff, b_constants: np.ndarray,
                 lat: Lattice = D2Q9):
    """(A/2) |g| (w_i (e_i . g)^2 / |g|^2 - B_i); zero where |g| = 0."""
    dtype = gx.dtype
    g2 = gx * gx + gy * gy
    norm = jnp.sqrt(g2)
    safe = g2 > 0
    g2_safe = jnp.where(safe, g2, 1.0)
    w = bcast_1d(lat.w, gx.ndim, dtype)
    bc = bcast_1d(b_constants, gx.ndim, dtype)
    eg = (bcast_1d(lat.e[:, 0], gx.ndim, dtype) * gx[None] +
          bcast_1d(lat.e[:, 1], gx.ndim, dtype) * gy[None])
    pert = 0.5 * a_coeff * norm[None] * (w * eg * eg / g2_safe[None] - bc)
    return jnp.where(safe[None], pert, 0.0)


def _cos_theta_times_enorm(gx, gy, lat: Lattice, dtype):
    """w_i-free recoloring direction factor: (e_i . g)/|g| per direction
    (equals cos(theta_i) * |e_i|), zero where |g| ~ 0 or e_i = 0."""
    norm = jnp.sqrt(gx * gx + gy * gy)
    safe = norm > _EPS
    norm_safe = jnp.where(safe, norm, 1.0)
    eg = (bcast_1d(lat.e[:, 0], gx.ndim, dtype) * gx[None] +
          bcast_1d(lat.e[:, 1], gx.ndim, dtype) * gy[None])
    return jnp.where(safe[None], eg / norm_safe[None], 0.0)


def recolor_lkr(f_total, rho_r, rho_b, gx, gy, beta, lat: Lattice = D2Q9):
    """Latva-Kokko-Rothman segregation on the total PDF (CSF variant).

    f_R = rho_R/rho f_tot + beta rho_R rho_B / rho * w_i cos(theta_i) |e_i|
    (``calRecoloringProcessM:1894-1899``).
    """
    dtype = f_total.dtype
    rho = rho_r + rho_b
    rho_safe = jnp.where(rho != 0, rho, 1.0)
    frac_r = rho_r / rho_safe
    seg = (beta * rho_r * rho_b / rho_safe)[None] * \
        bcast_1d(lat.w, gx.ndim, dtype) * \
        _cos_theta_times_enorm(gx, gy, lat, dtype)
    f_r = frac_r[None] * f_total + seg
    f_b = (1.0 - frac_r)[None] * f_total - seg
    return f_r, f_b


def csf_force_nd(g, sigma, is_fluid, inward_normal: bool = False,
                 lat: Lattice = D2Q9):
    """Dimension-generic CSF force F = +-(1/2) sigma kappa grad(phi).

    kappa = sum_ab (n_a n_b - delta_ab) d_a n_b — the tangential-projected
    divergence of the unit normal; reduces exactly to the reference's 2D
    expansion (``calForceTermInColorGradient2D:1686-1735``) via
    1 - n_a^2 = sum_{b != a} n_b^2.

    Args:
      g: tuple of lat.dim gradient components.
    Returns (force components tuple, kappa).
    """
    dim = lat.dim
    sign = -1.0 if inward_normal else 1.0
    norm = jnp.sqrt(sum(c * c for c in g))
    safe = norm > (_EPS if inward_normal else 0.0)
    norm_s = jnp.where(safe, norm, 1.0)
    fl = is_fluid.astype(g[0].dtype)
    nh = [jnp.where(safe, sign * c / norm_s, 0.0) * fl for c in g]
    # partials d_a n_b via the same isotropic stencil
    dn = [[jnp.zeros_like(g[0]) for _ in range(dim)] for _ in range(dim)]
    for i in range(1, lat.q):
        w3 = 3.0 * float(lat.w[i])
        shifted = [_shift_e(nh[b], lat.e[i], dim) for b in range(dim)]
        for a in range(dim):
            ea = int(lat.e[i, a])
            if not ea:
                continue
            for b in range(dim):
                dn[a][b] = dn[a][b] + (w3 * ea) * shifted[b]
    kappa = jnp.zeros_like(g[0])
    for a in range(dim):
        for b in range(dim):
            coef = nh[a] * nh[b] - (1.0 if a == b else 0.0)
            kappa = kappa + coef * dn[a][b]
    force = tuple(sign * 0.5 * sigma * kappa * c for c in g)
    return force, kappa


def rotate_gradient_on_wetting_akai_nd(g, ns, cos_t, sin_t, wet_mask):
    """Dimension-generic Akai 2018 contact-angle enforcement.

    Works in the plane spanned by (n_s, n-hat = -g/|g|) in any dimension:
    the two candidate directions at angle theta from n_s are
    (cos_t -+ c1) n_s +- c2 n-hat with c1 = sin_t cos(theta_gs)/sin(theta_gs)
    and c2 = sin_t/sin(theta_gs); the nearer candidate wins.

    Args:
      g: tuple of gradient components; ns: tuple of solid-normal components.
    Returns the rotated gradient tuple.
    """
    dim = len(g)
    norm = jnp.sqrt(sum(c * c for c in g))
    safe = norm > _EPS
    norm_s = jnp.where(safe, norm, 1.0)
    u = [jnp.where(safe, -c / norm_s, 0.0) for c in g]
    dot = jnp.clip(sum(u[d] * ns[d] for d in range(dim)), -1.0, 1.0)
    sin_gs = jnp.sqrt(jnp.maximum(1.0 - dot * dot, 0.0))
    ok = sin_gs > 1.0e-9
    sin_ok = jnp.where(ok, sin_gs, 1.0)
    c1 = jnp.where(ok, sin_t * dot / sin_ok, 0.0)
    c2 = jnp.where(ok, sin_t / sin_ok, 0.0)
    n1 = [(cos_t - c1) * ns[d] + c2 * u[d] for d in range(dim)]
    n2 = [(cos_t + c1) * ns[d] - c2 * u[d] for d in range(dim)]
    d1 = jnp.sqrt(sum((n1[d] - u[d]) ** 2 for d in range(dim)))
    d2 = jnp.sqrt(sum((n2[d] - u[d]) ** 2 for d in range(dim)))
    pick1 = d1 < d2
    tie = d1 == d2
    out = []
    for d in range(dim):
        m = jnp.where(pick1, n1[d], n2[d])
        rotated = jnp.where(tie, g[d], -norm * m)
        out.append(jnp.where(wet_mask, rotated, g[d]))
    return tuple(out)


def recolor_lkr_nd(f_total, rho_r, rho_b, g, beta, lat: Lattice):
    """Dimension-generic Latva-Kokko-Rothman segregation on the total PDF."""
    dtype = f_total.dtype
    dim = lat.dim
    rho = rho_r + rho_b
    rho_safe = jnp.where(rho != 0, rho, 1.0)
    frac_r = rho_r / rho_safe
    norm = jnp.sqrt(sum(c * c for c in g))
    safe = norm > _EPS
    norm_s = jnp.where(safe, norm, 1.0)
    eg = sum(bcast_1d(lat.e[:, d], dim, dtype) *
             jnp.expand_dims(g[d], -(dim + 1)) for d in range(dim))
    cos_enorm = jnp.where(jnp.expand_dims(safe, -(dim + 1)),
                          eg / jnp.expand_dims(norm_s, -(dim + 1)), 0.0)
    seg = jnp.expand_dims(beta * rho_r * rho_b / rho_safe, -(dim + 1)) * \
        bcast_1d(lat.w, dim, dtype) * cos_enorm
    qx = jnp.expand_dims(frac_r, -(dim + 1))
    f_r = qx * f_total + seg
    f_b = (1.0 - qx) * f_total - seg
    return f_r, f_b


def recolor_rk_original(f_total, rho_r, rho_b, gx, gy, beta,
                        const_cr: np.ndarray, const_cb: np.ndarray,
                        lat: Lattice = D2Q9):
    """Perturbation-variant recoloring (``calRKCollision23GPU:307-332``):

    f_R = rho_R/rho f_tot + beta rho_R rho_B / rho^2 *
          (rho_R C_R,i + rho_B C_B,i) cos(theta_i)
    with cos(theta_i) = (e_i.g)/(|e_i||g|).
    """
    dtype = f_total.dtype
    rho = rho_r + rho_b
    rho_safe = jnp.where(rho != 0, rho, 1.0)
    frac_r = rho_r / rho_safe
    # cos(theta) without the |e_i| factor
    e_norm = lat.e_norm.copy()
    e_norm[e_norm == 0] = 1.0
    cos_t = _cos_theta_times_enorm(gx, gy, lat, dtype) / \
        bcast_1d(e_norm, gx.ndim, dtype)
    feq_rho = (rho_r[None] * bcast_1d(const_cr, gx.ndim, dtype) +
               rho_b[None] * bcast_1d(const_cb, gx.ndim, dtype))
    seg = (beta * rho_r * rho_b / (rho_safe * rho_safe))[None] * feq_rho * cos_t
    f_r = frac_r[None] * f_total + seg
    f_b = (1.0 - frac_r)[None] * f_total - seg
    return f_r, f_b
