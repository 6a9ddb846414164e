"""Boundary conditions as masked row updates.

The reference applies BCs on specific dense-row offsets of the sparse node
list, in two copies of the kernel library (``ShanChen2D/OptimizedD2Q9GPU.py``
and ``RKCG2D/{AcceleratedRKGPU2D,RKGPU2DBoundary}.py``).  Here every BC is a
closed-form rewrite of one y-row of the dense field, masked by the fluid
cells of that row — one canonical implementation for all models
(SURVEY.md section 0, duplication note).

Row convention matches the reference: y = 0 is the outlet side, y = ny - 1
the inlet side; flow in the canonical configs runs toward -y with a negative
specified v_y at the inlet.

Implemented (reference kernel in parentheses):
  - Zou-He velocity inlet, top row per fluid (``constantVelocityZouHeBoundaryHigher:839-861``)
  - Zou-He pressure inlet, top (``constantPressureZouHeBoundaryHigher:625-652``;
    per-color ``calConstPressureInletGPU:925-961``)
  - Zou-He pressure outlet, bottom (``constantPressureZouHeBoundaryLower:555-583``
    with the density made configurable — the reference hardcodes
    [1.0, 0.02], SURVEY.md section 0)
  - total-momentum velocity inlet via non-equilibrium bounce-back
    (``constantTotalVelocityInlet:2348-2423``)
  - total-PDF pressure outlet (``calConstPressureLowerGPUTotal:2560-2602``)
  - ghost-row copies (``ghostPoints*``: e.g. ``:659-736``)
  - convective outlet: plain copy trio (``convectiveOutletGPU{,Ghost2,Ghost3}:960-1037``)
    and the true convective form f = (f_old + |v| f_up)/(1 + |v|)
    (``convectiveOutletEachGPU:1044-1120``)
  - modified periodic boundary with color swap (``calModifiedPeriodicBoundary:1382-1408``)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "zou_he_velocity_top", "zou_he_pressure_top", "zou_he_pressure_bottom",
    "total_velocity_inlet_top", "total_pressure_outlet_bottom",
    "chang_velocity_top", "chang_pressure_top", "chang_pressure_bottom",
    "copy_row", "copy_rows_from_above", "convective_outlet_rows",
    "modified_periodic_color_swap",
    "total_velocity_inlet_top_c", "total_pressure_outlet_bottom_c",
    "zou_he_pressure_top_total_c",
]


def _set_row(f, i, row, vals, mask):
    """Set population i at row `row` where mask (broadcast over leading axes)."""
    old = f[..., i, row, :]
    return f.at[..., i, row, :].set(jnp.where(mask, vals, old))


def zou_he_velocity_top(f, vy, row, mask):
    """Zou-He constant-velocity (Neumann) inlet at a top-side row.

    f: (..., 9, ny, nx); vy: scalar or broadcastable against leading axes
    (per-fluid inlet speeds; negative = inflow).  Unknowns after streaming at
    the top: f4, f7, f8.

    Returns (f, rho_row) with rho_row the Zou-He density on the row.
    """
    r = f[..., row, :]
    rho = (r[..., 0, :] + r[..., 1, :] + r[..., 3, :] +
           2.0 * (r[..., 2, :] + r[..., 5, :] + r[..., 6, :])) / (1.0 + vy)
    d13 = 0.5 * (r[..., 1, :] - r[..., 3, :])
    f = _set_row(f, 4, row, r[..., 2, :] - (2.0 / 3.0) * rho * vy, mask)
    f = _set_row(f, 7, row, r[..., 5, :] + d13 - rho * vy / 6.0, mask)
    f = _set_row(f, 8, row, r[..., 6, :] - d13 - rho * vy / 6.0, mask)
    return f, rho


def zou_he_pressure_top(f, rho_target, row, mask):
    """Zou-He constant-pressure (Dirichlet) inlet at a top-side row.

    rho_target: scalar or per-fluid; unknowns f4, f7, f8.
    """
    r = f[..., row, :]
    vy = -1.0 + (r[..., 0, :] + r[..., 1, :] + r[..., 3, :] +
                 2.0 * (r[..., 2, :] + r[..., 5, :] + r[..., 6, :])) / rho_target
    d13 = 0.5 * (r[..., 1, :] - r[..., 3, :])
    rv = rho_target * vy
    f = _set_row(f, 4, row, r[..., 2, :] - (2.0 / 3.0) * rv, mask)
    f = _set_row(f, 7, row, r[..., 5, :] + d13 - rv / 6.0, mask)
    f = _set_row(f, 8, row, r[..., 6, :] - d13 - rv / 6.0, mask)
    return f


def zou_he_pressure_bottom(f, rho_target, row, mask):
    """Zou-He constant-pressure outlet at a bottom-side row.

    Unknowns after streaming at the bottom: f2, f5, f6.
    """
    r = f[..., row, :]
    vy = 1.0 - (r[..., 0, :] + r[..., 1, :] + r[..., 3, :] +
                2.0 * (r[..., 4, :] + r[..., 7, :] + r[..., 8, :])) / rho_target
    d31 = 0.5 * (r[..., 3, :] - r[..., 1, :])
    rv = rho_target * vy
    f = _set_row(f, 2, row, r[..., 4, :] + (2.0 / 3.0) * rv, mask)
    f = _set_row(f, 5, row, r[..., 7, :] + d31 + rv / 6.0, mask)
    f = _set_row(f, 6, row, r[..., 8, :] - d31 + rv / 6.0, mask)
    return f


def _feq_row_1d(rho, w_i, ex_i, ey_i, vy):
    """Row equilibrium for u = (0, vy) in direction (ex, ey)."""
    eu = ey_i * vy
    return rho * w_i * (1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * vy * vy)


def total_velocity_inlet_top(f_r, f_b, vy, row, mask):
    """Total-momentum velocity inlet with non-equilibrium bounce-back.

    Computes the Zou-He density of the total PDF, replaces the unknown total
    populations via f_i = feq_i + (f_opp - feq_opp), and splits them between
    the colors by local density fraction
    (``constantTotalVelocityInlet:2348-2412``).

    Note: like the reference, the red fraction is evaluated before the blue
    density is updated on the row.

    Returns (f_r, f_b).
    """
    ft = f_r[..., row, :] + f_b[..., row, :]
    rho = (ft[0] + ft[1] + ft[3] + 2.0 * (ft[2] + ft[5] + ft[6])) / (1.0 + vy)

    def feq(i, w):
        ey = {2: 1.0, 4: -1.0, 5: 1.0, 7: -1.0, 6: 1.0, 8: -1.0}[i]
        return _feq_row_1d(rho, w, 0.0, ey, vy)

    new4 = feq(4, 1 / 9) + (ft[2] - feq(2, 1 / 9))
    new7 = feq(7, 1 / 36) + (ft[5] - feq(5, 1 / 36))
    new8 = feq(8, 1 / 36) + (ft[6] - feq(6, 1 / 36))

    rho_r = jnp.sum(f_r[..., row, :], axis=0)
    rho_b = jnp.sum(f_b[..., row, :], axis=0)
    tot = rho_r + rho_b
    tot_safe = jnp.where(tot != 0, tot, 1.0)
    ratio_r = rho_r / tot_safe
    ratio_b = 1.0 - ratio_r
    for i, val in ((4, new4), (7, new7), (8, new8)):
        f_r = _set_row(f_r, i, row, ratio_r * val, mask)
        f_b = _set_row(f_b, i, row, ratio_b * val, mask)
    return f_r, f_b


def total_pressure_outlet_bottom(f_r, f_b, rho_target, row, mask):
    """Total-PDF constant-pressure outlet, split by color fraction
    (``calConstPressureLowerGPUTotal:2560-2602``)."""
    ft = f_r[..., row, :] + f_b[..., row, :]
    vy = 1.0 - (ft[0] + ft[1] + ft[3] +
                2.0 * (ft[4] + ft[7] + ft[8])) / rho_target
    d31 = 0.5 * (ft[3] - ft[1])
    rv = rho_target * vy
    new2 = ft[4] + (2.0 / 3.0) * rv
    new5 = ft[7] + d31 + rv / 6.0
    new6 = ft[8] - d31 + rv / 6.0
    rho_r = jnp.sum(f_r[..., row, :], axis=0)
    rho_b = jnp.sum(f_b[..., row, :], axis=0)
    tot = rho_r + rho_b
    tot_safe = jnp.where(tot != 0, tot, 1.0)
    ratio_r = rho_r / tot_safe
    ratio_b = 1.0 - ratio_r
    for i, val in ((2, new2), (5, new5), (6, new6)):
        f_r = _set_row(f_r, i, row, ratio_r * val, mask)
        f_b = _set_row(f_b, i, row, ratio_b * val, mask)
    return f_r, f_b


def _update_rows_c(s, row, news, mask):
    """Apply total-PDF row replacements to a compressed state
    s = (10, ny, nx) [planes 0-8 = f_total, plane 9 = rho_r], adjusting
    rho_r by the local density ratio (the per-direction color split on a BC
    row is reconstructed as ratio_r * f_total — exact when the row is
    single-phase, which the reference's buffer-layer init guarantees)."""
    ft = s[..., row, :]
    rho_row = jnp.sum(ft[..., :9, :], axis=-2)
    rho_s = jnp.where(rho_row != 0, rho_row, 1.0)
    ratio_r = ft[..., 9, :] / rho_s
    delta = sum(v - ft[..., i, :] for i, v in news.items())
    for i, v in news.items():
        s = _set_row(s, i, row, v, mask)
    s = _set_row(s, 9, row, ft[..., 9, :] + ratio_r * delta, mask)
    return s


def total_velocity_inlet_top_c(s, vy, row, mask):
    """Compressed-state form of ``total_velocity_inlet_top``."""
    ft = s[..., row, :]
    rho = (ft[0] + ft[1] + ft[3] + 2.0 * (ft[2] + ft[5] + ft[6])) / (1.0 + vy)

    def feq(i, w):
        ey = {2: 1.0, 4: -1.0, 5: 1.0, 7: -1.0, 6: 1.0, 8: -1.0}[i]
        return _feq_row_1d(rho, w, 0.0, ey, vy)

    news = {4: feq(4, 1 / 9) + (ft[2] - feq(2, 1 / 9)),
            7: feq(7, 1 / 36) + (ft[5] - feq(5, 1 / 36)),
            8: feq(8, 1 / 36) + (ft[6] - feq(6, 1 / 36))}
    return _update_rows_c(s, row, news, mask)


def zou_he_pressure_top_total_c(s, rho_target, row, mask):
    """Compressed-state pressure inlet: total-PDF Zou-He at the summed
    per-color target density, split by local ratio (the split path's
    per-color Zou-He is not representable on the compressed state; see
    DEVIATIONS.md)."""
    ft = s[..., row, :]
    vy = -1.0 + (ft[0] + ft[1] + ft[3] +
                 2.0 * (ft[2] + ft[5] + ft[6])) / rho_target
    d13 = 0.5 * (ft[1] - ft[3])
    rv = rho_target * vy
    news = {4: ft[2] - (2.0 / 3.0) * rv,
            7: ft[5] + d13 - rv / 6.0,
            8: ft[6] - d13 - rv / 6.0}
    return _update_rows_c(s, row, news, mask)


def total_pressure_outlet_bottom_c(s, rho_target, row, mask):
    """Compressed-state form of ``total_pressure_outlet_bottom``."""
    ft = s[..., row, :]
    vy = 1.0 - (ft[0] + ft[1] + ft[3] +
                2.0 * (ft[4] + ft[7] + ft[8])) / rho_target
    d31 = 0.5 * (ft[3] - ft[1])
    rv = rho_target * vy
    news = {2: ft[4] + (2.0 / 3.0) * rv,
            5: ft[7] + d31 + rv / 6.0,
            6: ft[8] - d31 + rv / 6.0}
    return _update_rows_c(s, row, news, mask)


def chang_velocity_top(f_new, f_old, vy, row, mask):
    """Chang et al. 2009 corrector velocity inlet at a top-side row.

    Uses both the pre- and post-streaming PDFs
    (``calVelocityBoundaryHigherChangGPU:1127-1165``; the reference zeroes
    the force terms, so they are omitted).  `vy` broadcasts over leading
    (per-fluid) axes.  Returns f_new.
    """
    n = f_new[..., row, :]
    o = f_old[..., row, :]
    rho = (n[..., 0, :] + n[..., 1, :] + n[..., 3, :] +
           2.0 * (n[..., 2, :] + n[..., 5, :] + n[..., 6, :])) / (1.0 + vy)
    rv = rho * vy
    new4 = o[..., 4, :] - (2.0 / 3.0) * (rv + o[..., 4, :] + o[..., 7, :] +
                                         o[..., 8, :]) + \
        (2.0 / 3.0) * (n[..., 2, :] + n[..., 5, :] + n[..., 6, :])
    new7 = o[..., 7, :] + 0.5 * (n[..., 1, :] - n[..., 3, :]) + \
        (n[..., 2, :] - o[..., 4, :]) / 6.0 + \
        (2.0 / 3.0) * (n[..., 5, :] - o[..., 7, :]) - \
        (n[..., 6, :] - o[..., 8, :]) / 3.0 - rv / 6.0
    new8 = o[..., 8, :] - rv / 6.0 - 0.5 * (n[..., 1, :] - n[..., 3, :]) + \
        (n[..., 2, :] - o[..., 4, :]) / 6.0 - \
        (n[..., 5, :] - o[..., 7, :]) / 3.0 + \
        (2.0 / 3.0) * (n[..., 6, :] - o[..., 8, :])
    f_new = _set_row(f_new, 4, row, new4, mask)
    f_new = _set_row(f_new, 7, row, new7, mask)
    f_new = _set_row(f_new, 8, row, new8, mask)
    return f_new


def chang_pressure_top(f_new, f_old, rho_frac_target, row, mask):
    """Chang et al. 2009 pressure inlet at a top-side row
    (``calPressureBoundaryHigherChangGPU:1172-1218``).

    rho_frac_target: per-fluid target density on the row (the reference
    splits the specified total by the local density fraction; pass
    rho_i/rho_tot * rho_target).
    """
    n = f_new[..., row, :]
    o = f_old[..., row, :]
    rt = jnp.where(rho_frac_target != 0, rho_frac_target, 1.0)
    vy = -1.0 + (n[..., 0, :] + n[..., 1, :] + n[..., 3, :] +
                 2.0 * (n[..., 2, :] + n[..., 5, :] + n[..., 6, :])) / rt
    rv = rho_frac_target * vy
    bal_y = rv + o[..., 7, :] + o[..., 8, :] + o[..., 4, :] - \
        n[..., 2, :] - n[..., 5, :] - n[..., 6, :]
    bal_x = n[..., 3, :] + n[..., 6, :] + o[..., 7, :] - \
        n[..., 1, :] - n[..., 5, :] - o[..., 8, :]
    new4 = o[..., 4, :] - (2.0 / 3.0) * bal_y
    new7 = o[..., 7, :] - 0.5 * bal_x - bal_y / 6.0
    # the reference's f8 expression uses f5_old in its balance term
    bal_y8 = rv + o[..., 7, :] + o[..., 8, :] + o[..., 4, :] - \
        n[..., 2, :] - o[..., 5, :] - n[..., 6, :]
    new8 = o[..., 8, :] + 0.5 * bal_x - bal_y8 / 6.0
    f_new = _set_row(f_new, 4, row, new4, mask)
    f_new = _set_row(f_new, 7, row, new7, mask)
    f_new = _set_row(f_new, 8, row, new8, mask)
    return f_new


def chang_pressure_bottom(f_new, f_old, rho_frac_target, row, mask):
    """Chang et al. 2009 pressure outlet at a bottom-side row
    (``calPressureBoundaryLowerChangGPU:1222-1265``)."""
    n = f_new[..., row, :]
    o = f_old[..., row, :]
    rt = jnp.where(rho_frac_target != 0, rho_frac_target, 1.0)
    vy = 1.0 - (n[..., 0, :] + n[..., 1, :] + n[..., 3, :] +
                2.0 * (n[..., 4, :] + n[..., 7, :] + n[..., 8, :])) / rt
    rv = rho_frac_target * vy
    bal_y = rv - o[..., 2, :] + n[..., 4, :] - o[..., 5, :] - \
        o[..., 6, :] + n[..., 7, :] + n[..., 8, :]
    bal_x = -n[..., 1, :] + n[..., 3, :] - o[..., 5, :] + o[..., 6, :] + \
        n[..., 7, :] - n[..., 8, :]
    new2 = o[..., 2, :] + (2.0 / 3.0) * bal_y
    new5 = o[..., 5, :] + 0.5 * bal_x + bal_y / 6.0
    new6 = o[..., 6, :] - 0.5 * bal_x + bal_y / 6.0
    f_new = _set_row(f_new, 2, row, new2, mask)
    f_new = _set_row(f_new, 5, row, new5, mask)
    f_new = _set_row(f_new, 6, row, new6, mask)
    return f_new


def copy_row(f, dst_row, src_row, mask):
    """Copy all populations of src_row into dst_row (ghost-row update)."""
    src = f[..., :, src_row, :]
    dst = f[..., :, dst_row, :]
    return f.at[..., :, dst_row, :].set(jnp.where(mask, src, dst))


def copy_rows_from_above(f, rows, mask_rows):
    """Plain convective outlet: each listed row copies from the row above.

    ``convectiveOutletGPU`` + Ghost2/Ghost3: rows [2, 1, 0] each copy from
    row + 1 sequentially (row 1 picks up row 2's fresh copy, etc.).
    """
    for row, m in zip(rows, mask_rows):
        f = copy_row(f, row, row + 1, m)
    return f


def convective_outlet_rows(f_new, f_old, vy_row, rows, mask_rows):
    """True convective outlet: f = (f_old + |v| f_above) / (1 + |v|).

    vy_row: (nx,) velocity of the reference row (the reference uses the y
    velocity of the neighbor above the outlet layer, ``convectiveOutletEachGPU``).
    """
    speed = jnp.abs(vy_row)
    for row, m in zip(rows, mask_rows):
        upstream = f_new[..., :, row + 1, :]
        old = f_old[..., :, row, :]
        val = (old + speed * upstream) / (1.0 + speed)
        cur = f_new[..., :, row, :]
        f_new = f_new.at[..., :, row, :].set(jnp.where(m, val, cur))
    return f_new


def modified_periodic_color_swap(f_r, f_b, mask_bottom, mask_top):
    """Swap incoming populations between the colors at the periodic seam
    (``calModifiedPeriodicBoundary:1382-1408``): at the bottom row the
    upward-moving populations (2, 5, 6), at the top row the downward ones
    (4, 7, 8)."""
    ny = f_r.shape[-2]
    for i in (2, 5, 6):
        r_val = f_r[..., i, 0, :]
        b_val = f_b[..., i, 0, :]
        f_r = f_r.at[..., i, 0, :].set(jnp.where(mask_bottom, b_val, r_val))
        f_b = f_b.at[..., i, 0, :].set(jnp.where(mask_bottom, r_val, b_val))
    for i in (4, 7, 8):
        r_val = f_r[..., i, ny - 1, :]
        b_val = f_b[..., i, ny - 1, :]
        f_r = f_r.at[..., i, ny - 1, :].set(jnp.where(mask_top, b_val, r_val))
        f_b = f_b.at[..., i, ny - 1, :].set(jnp.where(mask_top, r_val, b_val))
    return f_r, f_b
