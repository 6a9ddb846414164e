"""Fused D3Q19 CSF color-gradient step as a Pallas TPU kernel.

The 3D sibling of ``pallas/csf.py``: the grid iterates over z-slabs spanning
full (ny, nx) planes; x/y stencil accesses are lane/sublane rolls (exact
periodicity), z accesses roll the leading window axis whose wrap garbage
stays in the halo rings.  Halos ride as two extra blocked inputs with
modular index maps on z.  The physics chain needs 4 rings per sub-step
(stream <- force <- gradient <- phi_ext <- phi), and z is a leading
(untiled) dimension, so the halo is exactly 4*steps_per_call slabs plus a
BC-source margin — no sublane rounding.

Physics identical to ``models/flow3d.ColorGradientRK3D._step_impl`` (SRT
with tau(phi), Akai wetting, kappa = (n_a n_b - delta_ab) d_a n_b,
LKR recoloring) including the z-face boundary slabs (NEBB velocity inlet /
pressure outlet, convective outlet; ``CG3DBoundaryConfig``), applied
in-window on global-z masks so temporal blocking works.

Two state modes, as in 2D:
- ``split``: (f_r, f_b) each (19, nz, ny, nx) — 76 f32 planes of HBM
  traffic per step;
- ``compressed``: s = concat([f_total (19), rho_r (1)]) — the collision
  runs on the total PDF and recoloring only needs the red density, so the
  per-step traffic drops to 40 planes; rho_r at t+1 is the streamed sum of
  the recolored red PDFs, computed in-window and never stored.

All 3x3x3 stencils (solid-phi extrapolation, gradient, curvature
derivatives) are computed separably: the D3Q19 edge taps are axis shifts
of axis-shifted row sums, cutting the per-sub-step roll count ~2.5x.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import Geometry, solid_normals_nd, wetting_masks_nd
from ..lattice import D3Q19

__all__ = ["build_cg3d_fused_step"]

_EPS = 1.0e-8

# direction groups by e_z sign (e components are (x, y, z))
_EZ_PLUS = (5, 11, 14, 15, 18)
_EZ_MINUS = (6, 12, 13, 16, 17)
_EZ_ZERO = (0, 1, 2, 3, 4, 7, 8, 9, 10)
# opposite-direction pairs
_PAIRS3 = ((1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14),
           (15, 16), (17, 18))


def _roll3(a, dx: int, dy: int, dz: int, nx: int, ny: int, wz: int):
    """Value at (z, y, x) of a(z + dz, y + dy, x + dx); x/y periodic, z
    wraps within the slab window (garbage stays in the rings)."""
    out = a
    zax = a.ndim - 3
    if dz:
        out = pltpu.roll(out, (-dz) % wz, axis=zax)
    if dy:
        out = pltpu.roll(out, (-dy) % ny, axis=zax + 1)
    if dx:
        out = pltpu.roll(out, (-dx) % nx, axis=zax + 2)
    return out


def geo_stack3(geometry: Geometry) -> np.ndarray:
    """Static geometry channels: is_fluid, wet_fluid, nsx, nsy, nsz,
    den_inv (reciprocal of the solid-phi extrapolation denominator)."""
    lat = D3Q19
    wet_fluid, _ = wetting_masks_nd(geometry.is_solid, lat)
    ns = solid_normals_nd(geometry.is_solid, lat)
    fl = geometry.is_fluid.astype(np.float64)
    den = np.zeros_like(fl)
    for i in range(1, lat.q):
        dx, dy, dz = (int(lat.e[i, 0]), int(lat.e[i, 1]), int(lat.e[i, 2]))
        den += float(lat.w[i]) * np.roll(fl, (-dz, -dy, -dx), axis=(0, 1, 2))
    den_inv = np.where(den > 0, 1.0 / np.where(den > 0, den, 1.0), 0.0)
    return np.stack([fl, wet_fluid.astype(np.float64), *ns, den_inv])


def build_cg3d_fused_step(geometry: Geometry, params, dtype=jnp.float32,
                          slabs_per_block: int | None = None,
                          steps_per_call: int = 1,
                          bc_config=None,
                          state_mode: str = "split",
                          local_nz: int | None = None,
                          interpret: bool = False):
    """Build the fused step for D3Q19 CSF: ``(f_r, f_b) -> (f_r', f_b')``
    (split) or ``s -> s'`` on the 20-plane compressed state.

    ``local_nz`` (compressed only) builds the per-shard kernel for a
    z-decomposed domain (``build_cg3d_sharded_step``): the call takes the
    local slab, H-slab halos received from the z neighbors over ICI, and
    the matching geometry slabs; BC slabs stay in the jnp prologue on the
    globally sharded array, so no global-offset plumbing is needed.

    Returns None when the domain does not slab-decompose, VMEM would
    overflow, or a BC kind is unsupported in-kernel.
    """
    nz, ny, nx = geometry.shape
    T = int(steps_per_call)
    compressed = state_mode == "compressed"
    is_local = local_nz is not None
    if is_local and (not compressed or T != 1):
        return None
    grid_nz = int(local_nz) if is_local else nz

    inlet_kind = getattr(bc_config, "inlet", "periodic")
    outlet_kind = getattr(bc_config, "outlet", "periodic")
    if inlet_kind not in ("periodic", "velocity") or \
            outlet_kind not in ("periodic", "dirichlet", "convective"):
        return None
    has_bcs = inlet_kind != "periodic" or outlet_kind != "periodic"
    inlet_vz = float(getattr(bc_config, "inlet_velocity", 0.0))
    outlet_rho = float(getattr(bc_config, "outlet_density", 1.0))

    # At T=1 the BC slabs apply as a jnp prologue before the kernel call
    # (identical op order to the model: BCs -> physics), which keeps the
    # halo at the pure physics depth; in-window BC rewrites (and their
    # source margin) are only needed for temporal blocking.
    bc_in_kernel = has_bcs and T > 1
    # halo depth: 4 rings per sub-step + BC source margin, rounded up to
    # a common divisor of R and nz (the halo index maps are H-granular)
    need = 4 * T + (4 if bc_in_kernel else 0)

    def _pick_h(r):
        for d in range(need, r + 1):
            if r % d == 0 and grid_nz % d == 0:
                return d
        return None

    n_state = 20 if compressed else 38
    if slabs_per_block is None:
        # empirical VMEM model (v5e 128 MB, Mosaic scoped usage ~2.5x the
        # window-plane estimate)
        for r in (32, 16, 8, 4, 2):
            if grid_nz % r:
                continue
            h = _pick_h(r)
            if h is None:
                continue
            planes = (n_state + 6) * (r + 2 * h) + n_state * r
            mb = planes * ny * nx * 4 * 2.5 / 2**20
            if mb <= 110:
                slabs_per_block = r
                break
        else:
            return None
    R = slabs_per_block
    if not R or grid_nz % R:
        return None
    H = _pick_h(R)
    if H is None:
        return None
    W = R + 2 * H
    nb = grid_nz // R
    hb = grid_nz // H

    lat = D3Q19
    e = lat.e
    w_lat = lat.w
    opp = lat.opp
    Q = lat.q

    _, wet_solid = wetting_masks_nd(geometry.is_solid, lat)
    has_wetting = bool(wet_solid.any())
    geo_np = geo_stack3(geometry)
    n_geo = geo_np.shape[0]
    geo_dev = jnp.asarray(geo_np, dtype)

    theta = math.radians(params.contact_angle_deg)
    cos_t, sin_t = -math.cos(theta), math.sin(theta)  # Akai complement
    sigma = float(params.surface_tension)
    beta = float(params.beta)
    delta = float(params.delta)
    tau_r, tau_b = float(params.tau_r), float(params.tau_b)
    bf = tuple(float(v) for v in params.body_force)

    def sh(a, i):
        return _roll3(a, int(e[i, 0]), int(e[i, 1]), int(e[i, 2]),
                      nx, ny, W)

    def sh_back(a, i):
        return _roll3(a, -int(e[i, 0]), -int(e[i, 1]), -int(e[i, 2]),
                      nx, ny, W)

    def shx(a, d):
        return _roll3(a, d, 0, 0, nx, ny, W)

    def shy(a, d):
        return _roll3(a, 0, d, 0, nx, ny, W)

    def shz(a, d):
        return _roll3(a, 0, 0, d, nx, ny, W)

    def _grad3d(a, w_ax, w_diag):
        """(gx, gy, gz) of the D3Q19 stencil Σ_i w_i e_i a(x+e_i),
        separably: edge taps are axis shifts of the orthogonal-axis row
        sums (12 axis rolls instead of 30)."""
        pE, pW = shx(a, 1), shx(a, -1)
        pN, pS = shy(a, 1), shy(a, -1)
        pU, pD = shz(a, 1), shz(a, -1)
        qx = w_ax * a + w_diag * (pN + pS + pU + pD)
        qy = w_ax * a + w_diag * (pE + pW + pU + pD)
        qz = w_ax * a + w_diag * (pE + pW + pN + pS)
        gx = shx(qx, 1) - shx(qx, -1)
        gy = shy(qy, 1) - shy(qy, -1)
        gz = shz(qz, 1) - shz(qz, -1)
        return gx, gy, gz

    def _feq_src3(rho, u, force):
        """Equilibria + Guo sources for all 19 directions, sharing the
        ±e pair symmetry (as ``csf._feq_src``)."""
        ux, uy, uz = u
        fx, fy, fz = force
        uu = ux * ux + uy * uy + uz * uz
        uf = ux * fx + uy * fy + uz * fz
        base = 1.0 - 1.5 * uu
        eu = {1: ux, 3: uy, 5: uz, 7: ux + uy, 9: ux - uy, 11: ux + uz,
              13: ux - uz, 15: uy + uz, 17: uy - uz}
        ef = {1: fx, 3: fy, 5: fz, 7: fx + fy, 9: fx - fy, 11: fx + fz,
              13: fx - fz, 15: fy + fz, 17: fy - fz}
        feq = [None] * Q
        src = [None] * Q
        feq[0] = float(w_lat[0]) * rho * base
        src[0] = float(w_lat[0]) * (-3.0) * uf
        for i, io in _PAIRS3:
            wi = float(w_lat[i])
            wrho = wi * rho
            eui = eu[i]
            efi = ef[i]
            a = wrho * (base + 4.5 * (eui * eui))
            b = (3.0 * wrho) * eui
            feq[i] = a + b
            feq[io] = a - b
            c = wi * (9.0 * eui * efi - 3.0 * uf)
            d = (3.0 * wi) * efi
            src[i] = c + d
            src[io] = c - d
        return feq, src

    # -- fields: phi, wetted gradient, CSF force ---------------------------
    def _fields(rho_r, rho_b, rho, fl, wet, nsx, nsy, nsz, den_inv):
        rho_safe = jnp.where(rho > 0, rho, 1.0)
        rinv = 1.0 / rho_safe
        phi = jnp.where(rho != 0, (rho_r - rho_b) * rinv, 0.0) * fl

        if has_wetting:
            # phi pre-masked by fl; static denominator rides as den_inv
            pE, pW = shx(phi, 1), shx(phi, -1)
            pN, pS = shy(phi, 1), shy(phi, -1)
            pU, pD = shz(phi, 1), shz(phi, -1)
            pnsud = pN + pS + pU + pD
            num = (1.0 / 18.0) * (pE + pW + pnsud) + (1.0 / 36.0) * (
                shx(pnsud, 1) + shx(pnsud, -1) +
                shy(pU + pD, 1) + shy(pU + pD, -1))
            phi_ext = jnp.where(fl > 0.5, phi, num * den_inv)
        else:
            phi_ext = phi

        # isotropic gradient 3 Σ w_i e_i phi_ext(x+e_i)
        g = list(_grad3d(phi_ext, 1.0 / 6.0, 1.0 / 12.0))

        if has_wetting:
            g2w = g[0] * g[0] + g[1] * g[1] + g[2] * g[2]
            safe = g2w > _EPS * _EPS
            g_rinvw = jax.lax.rsqrt(jnp.where(safe, g2w, 1.0))
            norm = g2w * g_rinvw
            u = [jnp.where(safe, -c * g_rinvw, 0.0) for c in g]
            nsv = (nsx, nsy, nsz)
            dot = jnp.clip(sum(u[d] * nsv[d] for d in range(3)), -1.0, 1.0)
            sin2 = jnp.maximum(1.0 - dot * dot, 0.0)
            ok = sin2 > 1.0e-18
            rsin = jnp.where(ok, jax.lax.rsqrt(jnp.where(ok, sin2, 1.0)),
                             0.0)
            c1 = sin_t * dot * rsin
            c2 = sin_t * rsin
            n1 = [(cos_t - c1) * nsv[d] + c2 * u[d] for d in range(3)]
            n2 = [(cos_t + c1) * nsv[d] - c2 * u[d] for d in range(3)]
            d1 = sum((n1[d] - u[d]) ** 2 for d in range(3))
            d2 = sum((n2[d] - u[d]) ** 2 for d in range(3))
            pick1 = d1 < d2
            tie = d1 == d2
            wetm = wet > 0.5
            for d in range(3):
                m = jnp.where(pick1, n1[d], n2[d])
                rotated = jnp.where(tie, g[d], -norm * m)
                g[d] = jnp.where(wetm, rotated, g[d])

        # curvature + CSF force (inward normal)
        g2 = g[0] * g[0] + g[1] * g[1] + g[2] * g[2]
        safe = g2 > _EPS * _EPS
        g_rinv = jnp.where(safe, jax.lax.rsqrt(jnp.where(safe, g2, 1.0)),
                           0.0)
        nh = [(-c * g_rinv) * fl for c in g]
        nh_st = jnp.stack(nh)
        dx_s, dy_s, dz_s = _grad3d(nh_st, 1.0 / 6.0, 1.0 / 12.0)
        dn = [[dx_s[0], dx_s[1], dx_s[2]],
              [dy_s[0], dy_s[1], dy_s[2]],
              [dz_s[0], dz_s[1], dz_s[2]]]
        kappa = jnp.zeros_like(phi)
        for a2 in range(3):
            for b2 in range(3):
                coef = nh[a2] * nh[b2] - (1.0 if a2 == b2 else 0.0)
                kappa = kappa + coef * dn[a2][b2]
        force = [-0.5 * sigma * kappa * g[d] for d in range(3)]
        if any(bf):
            for d in range(3):
                if bf[d]:
                    force[d] = force[d] + bf[d] * rho
        force = [c * fl for c in force]
        return rho_safe, rinv, phi, g, force, g2, g_rinv

    def _collide_total(ft, rho_r, rho_b, rho, rinv, phi, force):
        mom = [jnp.zeros_like(rho) for _ in range(3)]
        for i in range(1, Q):
            fti = ft[i]
            for d in range(3):
                ed = float(e[i, d])
                if ed:
                    mom[d] = mom[d] + (fti if ed == 1.0 else -fti)
        u = [(mom[d] + 0.5 * force[d]) * rinv for d in range(3)]
        if params.tau_type == 1:
            a0 = 0.5 / (tau_r - 0.5) + 0.5 / (tau_b - 0.5)
            a1 = 0.5 / (tau_r - 0.5) - 0.5 / (tau_b - 0.5)
            amid = a0 + a1 * phi
            inv_mid = amid / (0.5 * amid + 1.0)
        else:
            cr = 3.0 / (tau_r - 0.5)
            cb = 3.0 / (tau_b - 0.5)
            q = (rho_r * cr + rho_b * cb) * rinv
            inv_mid = q / (3.0 + 0.5 * q)
        inv_tau = jnp.where(phi > delta, 1.0 / tau_r,
                            jnp.where(phi < -delta, 1.0 / tau_b, inv_mid))
        pref = 1.0 - 0.5 * inv_tau
        feq, src = _feq_src3(rho, u, force)
        post = [None] * Q
        for i in range(Q):
            fti = ft[i]
            post[i] = fti - (fti - feq[i]) * inv_tau + pref * src[i]
        return post

    def _seg_terms(rho_r, rho_b, rinv, g, g_rinv):
        """(frac_r, seg dict by direction): seg_opp = -seg_i.  Kept as a
        small closure so the recolored red PDFs can be materialized one
        direction at a time inside the streaming loop (VMEM: 19 fewer
        live (W, ny, nx) planes than a full fr_post list)."""
        frac_r = rho_r * rinv
        segc = (beta * rho_r * rho_b * rinv) * g_rinv
        eg = {1: g[0], 3: g[1], 5: g[2], 7: g[0] + g[1], 9: g[0] - g[1],
              11: g[0] + g[2], 13: g[0] - g[2], 15: g[1] + g[2],
              17: g[1] - g[2]}
        seg = {0: None}
        for i, io in _PAIRS3:
            s = (float(w_lat[i]) * segc) * eg[i]
            seg[i] = s
            seg[io] = -s
        return frac_r, seg

    # -- in-window z-face BC slabs (NEBB; CG3DBoundaryConfig) --------------
    def _feq_vz(rho, vz):
        out = []
        for i in range(Q):
            ez = float(e[i, 2])
            eu = ez * vz
            out.append(float(w_lat[i]) * rho *
                       (1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * vz * vz))
        return out

    def _apply_bcs_window_c(ft, rho_r, fl, zrows):
        flb = fl > 0.5
        ft = list(ft)
        rho_row = sum(ft)
        rho_row_s = jnp.where(rho_row != 0, rho_row, 1.0)
        ratio_r = rho_r / rho_row_s

        if inlet_kind == "velocity":
            vz = inlet_vz
            s0 = sum(ft[i] for i in _EZ_ZERO)
            sp = sum(ft[i] for i in _EZ_PLUS)
            rho = (s0 + 2.0 * sp) / (1.0 + vz)
            feq = _feq_vz(rho, vz)
            m = jnp.logical_and(zrows == nz - 2, flb)
            dsum = None
            for i in _EZ_MINUS:
                io = int(opp[i])
                val = feq[i] + (ft[io] - feq[io])
                dv = val - ft[i]
                dsum = dv if dsum is None else dsum + dv
                ft[i] = jnp.where(m, val, ft[i])
            rho_r = jnp.where(m, rho_r + ratio_r * dsum, rho_r)
            # ghost slab nz-1 copies nz-2 (value at z of a(z-1))
            m = jnp.logical_and(zrows == nz - 1, flb)
            for i in range(Q):
                ft[i] = jnp.where(m, shz(ft[i], -1), ft[i])
            rho_r = jnp.where(m, shz(rho_r, -1), rho_r)

        if outlet_kind == "convective":
            for k in (2, 1, 0):
                m = jnp.logical_and(zrows == k, flb)
                for i in range(Q):
                    ft[i] = jnp.where(m, shz(ft[i], 1), ft[i])
                rho_r = jnp.where(m, shz(rho_r, 1), rho_r)
        elif outlet_kind == "dirichlet":
            s0 = sum(ft[i] for i in _EZ_ZERO)
            sm = sum(ft[i] for i in _EZ_MINUS)
            vz = 1.0 - (s0 + 2.0 * sm) / outlet_rho
            feq = _feq_vz(outlet_rho, vz)
            m = jnp.logical_and(zrows == 1, flb)
            dsum = None
            for i in _EZ_PLUS:
                io = int(opp[i])
                val = feq[i] + (ft[io] - feq[io])
                dv = val - ft[i]
                dsum = dv if dsum is None else dsum + dv
                ft[i] = jnp.where(m, val, ft[i])
            rho_r = jnp.where(m, rho_r + ratio_r * dsum, rho_r)
            m = jnp.logical_and(zrows == 0, flb)
            for i in range(Q):
                ft[i] = jnp.where(m, shz(ft[i], 1), ft[i])
            rho_r = jnp.where(m, shz(rho_r, 1), rho_r)
        return ft, rho_r

    def _apply_bcs_window(fr, fb, fl, zrows):
        """Split-state BC slabs: only the unknown directions are rewritten,
        split by the pre-rewrite local red fraction (mirrors
        ``ColorGradientRK3D._apply_inlet/_apply_outlet``)."""
        flb = fl > 0.5
        fr = list(fr)
        fb = list(fb)
        rho_r_row = sum(fr)
        rho_t_row = rho_r_row + sum(fb)
        ratio = rho_r_row / jnp.where(rho_t_row != 0, rho_t_row, 1.0)

        if inlet_kind == "velocity":
            vz = inlet_vz
            ft = [fr[i] + fb[i] for i in range(Q)]
            s0 = sum(ft[i] for i in _EZ_ZERO)
            sp = sum(ft[i] for i in _EZ_PLUS)
            rho = (s0 + 2.0 * sp) / (1.0 + vz)
            feq = _feq_vz(rho, vz)
            m = jnp.logical_and(zrows == nz - 2, flb)
            for i in _EZ_MINUS:
                io = int(opp[i])
                val = feq[i] + (ft[io] - feq[io])
                fr[i] = jnp.where(m, ratio * val, fr[i])
                fb[i] = jnp.where(m, (1.0 - ratio) * val, fb[i])
            m = jnp.logical_and(zrows == nz - 1, flb)
            for i in range(Q):
                fr[i] = jnp.where(m, shz(fr[i], -1), fr[i])
                fb[i] = jnp.where(m, shz(fb[i], -1), fb[i])

        if outlet_kind == "convective":
            for k in (2, 1, 0):
                m = jnp.logical_and(zrows == k, flb)
                for i in range(Q):
                    fr[i] = jnp.where(m, shz(fr[i], 1), fr[i])
                    fb[i] = jnp.where(m, shz(fb[i], 1), fb[i])
        elif outlet_kind == "dirichlet":
            ft = [fr[i] + fb[i] for i in range(Q)]
            s0 = sum(ft[i] for i in _EZ_ZERO)
            sm = sum(ft[i] for i in _EZ_MINUS)
            vz = 1.0 - (s0 + 2.0 * sm) / outlet_rho
            feq = _feq_vz(outlet_rho, vz)
            m = jnp.logical_and(zrows == 1, flb)
            for i in _EZ_PLUS:
                io = int(opp[i])
                val = feq[i] + (ft[io] - feq[io])
                fr[i] = jnp.where(m, ratio * val, fr[i])
                fb[i] = jnp.where(m, (1.0 - ratio) * val, fb[i])
            m = jnp.logical_and(zrows == 0, flb)
            for i in range(Q):
                fr[i] = jnp.where(m, shz(fr[i], 1), fr[i])
                fb[i] = jnp.where(m, shz(fb[i], 1), fb[i])
        return fr, fb

    # -- one physics sub-step ---------------------------------------------
    # upwind-solid masks are computed per direction inside the loops (not
    # hoisted): 18 extra (W, ny, nx) mask planes do not fit VMEM in 3D.
    def _substep_c(ft, rho_r, fl, wet, nsx, nsy, nsz, den_inv, solid):
        rho = sum(ft)
        rho_b = rho - rho_r
        rho_safe, rinv, phi, g, force, g2, g_rinv = \
            _fields(rho_r, rho_b, rho, fl, wet, nsx, nsy, nsz, den_inv)
        post = _collide_total(ft, rho_r, rho_b, rho, rinv, phi, force)
        frac_r, seg = _seg_terms(rho_r, rho_b, rinv, g, g_rinv)

        def frp(i):
            return frac_r * post[i] + seg[i] if seg[i] is not None \
                else frac_r * post[i]

        out_t = [post[0] * fl]
        rho_r_new = frp(0)
        for i in range(1, Q):
            io = int(opp[i])
            us_i = sh_back(solid, i) > 0.5
            out_t.append(jnp.where(us_i, post[io],
                                   sh_back(post[i], i)) * fl)
            rho_r_new = rho_r_new + jnp.where(us_i, frp(io),
                                              sh_back(frp(i), i))
        return out_t, rho_r_new * fl

    def _substep(fr, fb, fl, wet, nsx, nsy, nsz, den_inv, solid):
        rho_r = sum(fr)
        rho_b = sum(fb)
        rho = rho_r + rho_b
        rho_safe, rinv, phi, g, force, g2, g_rinv = \
            _fields(rho_r, rho_b, rho, fl, wet, nsx, nsy, nsz, den_inv)
        ft = [fr[i] + fb[i] for i in range(Q)]
        post = _collide_total(ft, rho_r, rho_b, rho, rinv, phi, force)
        frac_r, seg = _seg_terms(rho_r, rho_b, rinv, g, g_rinv)

        def frp(i):
            return frac_r * post[i] + seg[i] if seg[i] is not None \
                else frac_r * post[i]

        out_r = [frp(0) * fl]
        out_b = [(post[0] - frp(0)) * fl]
        for i in range(1, Q):
            io = int(opp[i])
            us_i = sh_back(solid, i) > 0.5
            fr_i = frp(i)
            fr_io = frp(io)
            out_r.append(jnp.where(us_i, fr_io, sh_back(fr_i, i)) * fl)
            out_b.append(jnp.where(us_i, post[io] - fr_io,
                                   sh_back(post[i] - fr_i, i)) * fl)
        return out_r, out_b

    def kernel(*refs):
        if is_local:
            (s_c, s_u, s_d, up_sl, dn_sl,
             g_c, g_u, g_d, gup_sl, gdn_sl) = refs[:10]
            outs = refs[10:]
            i0 = pl.program_id(0)
            first = i0 == 0
            last = i0 == nb - 1
            s_u = jnp.where(first, up_sl[:], s_u[:])
            s_d = jnp.where(last, dn_sl[:], s_d[:])
            g_u = jnp.where(first, gup_sl[:], g_u[:])
            g_d = jnp.where(last, gdn_sl[:], g_d[:])
        elif compressed:
            s_c, s_u, s_d, g_c, g_u, g_d = refs[:6]
            outs = refs[6:]
        else:
            fr_c, fr_u, fr_d, fb_c, fb_u, fb_d, g_c, g_u, g_d = refs[:9]
            outs = refs[9:]
        if is_local:
            geo = jnp.concatenate([g_u, g_c[:], g_d], axis=1)
        else:
            geo = jnp.concatenate([g_u[:], g_c[:], g_d[:]], axis=1)
        fl = geo[0]
        wet = geo[1]
        den_inv = geo[5]
        solid = 1.0 - fl
        if compressed:
            if is_local:
                s = jnp.concatenate([s_u, s_c[:], s_d], axis=1)
            else:
                s = jnp.concatenate([s_u[:], s_c[:], s_d[:]], axis=1)
            ft = [s[i] for i in range(Q)]
            rho_r = s[Q]
        else:
            f_r = jnp.concatenate([fr_u[:], fr_c[:], fr_d[:]], axis=1)
            f_b = jnp.concatenate([fb_u[:], fb_c[:], fb_d[:]], axis=1)
            fr = [f_r[i] for i in range(Q)]
            fb = [f_b[i] for i in range(Q)]
        zrows = None
        is_edge = None
        if bc_in_kernel:
            i0 = pl.program_id(0)
            z_iota = jax.lax.broadcasted_iota(jnp.int32, (W, ny, nx), 0)
            zrows = (i0 * R - H + z_iota) % nz
            if interpret:
                start = (i0 * R - H) % nz
                is_edge = False
                for k in (0, 1, 2, nz - 2, nz - 1):
                    hit = ((k - start) % nz) < W
                    is_edge = jnp.logical_or(is_edge, hit)
        for _ in range(T):
            # compiled mode: unconditional masked BC rewrites (a lax.cond
            # would materialize both branches = a full state copy);
            # interpret mode: cond, because XLA-CPU execution of the
            # unconditional select chains is pathologically slow
            if compressed:
                if bc_in_kernel:
                    if interpret:
                        ft, rho_r = jax.lax.cond(
                            is_edge,
                            lambda t: _apply_bcs_window_c(t[0], t[1], fl,
                                                          zrows),
                            lambda t: (list(t[0]), t[1]),
                            (tuple(ft), rho_r))
                    else:
                        ft, rho_r = _apply_bcs_window_c(ft, rho_r, fl,
                                                        zrows)
                ft, rho_r = _substep_c(ft, rho_r, fl, wet, geo[2], geo[3],
                                       geo[4], den_inv, solid)
            else:
                if bc_in_kernel:
                    if interpret:
                        fr, fb = jax.lax.cond(
                            is_edge,
                            lambda t: _apply_bcs_window(list(t[0]),
                                                        list(t[1]), fl,
                                                        zrows),
                            lambda t: (list(t[0]), list(t[1])),
                            (tuple(fr), tuple(fb)))
                    else:
                        fr, fb = _apply_bcs_window(fr, fb, fl, zrows)
                fr, fb = _substep(fr, fb, fl, wet, geo[2], geo[3], geo[4],
                                  den_inv, solid)
        if compressed:
            out_s = outs[0]
            for i in range(Q):
                out_s[i] = ft[i][H:H + R]
            out_s[Q] = rho_r[H:H + R]
            return
        out_r, out_b = outs[0], outs[1]
        for i in range(Q):
            out_r[i] = fr[i][H:H + R]
            out_b[i] = fb[i][H:H + R]

    n_st = Q + 1 if compressed else Q
    center = pl.BlockSpec((n_st, R, ny, nx), lambda i: (0, i, 0, 0))
    halo_up = pl.BlockSpec((n_st, H, ny, nx),
                           lambda i: (0, (i * (R // H) - 1) % hb, 0, 0))
    halo_dn = pl.BlockSpec((n_st, H, ny, nx),
                           lambda i: (0, (i * (R // H) + R // H) % hb, 0, 0))
    gc = pl.BlockSpec((n_geo, R, ny, nx), lambda i: (0, i, 0, 0))
    gu = pl.BlockSpec((n_geo, H, ny, nx),
                      lambda i: (0, (i * (R // H) - 1) % hb, 0, 0))
    gd = pl.BlockSpec((n_geo, H, ny, nx),
                      lambda i: (0, (i * (R // H) + R // H) % hb, 0, 0))

    if is_local:
        slab = pl.BlockSpec((n_st, H, ny, nx), lambda i: (0, 0, 0, 0))
        gslab = pl.BlockSpec((n_geo, H, ny, nx), lambda i: (0, 0, 0, 0))
        in_specs = [center, halo_up, halo_dn, slab, slab,
                    gc, gu, gd, gslab, gslab]
        out_specs = (pl.BlockSpec((n_st, R, ny, nx),
                                  lambda i: (0, i, 0, 0)),)
        out_shape = (jax.ShapeDtypeStruct((n_st, grid_nz, ny, nx), dtype),)
    elif compressed:
        in_specs = [center, halo_up, halo_dn, gc, gu, gd]
        out_specs = (pl.BlockSpec((n_st, R, ny, nx),
                                  lambda i: (0, i, 0, 0)),)
        out_shape = (jax.ShapeDtypeStruct((n_st, nz, ny, nx), dtype),)
    else:
        in_specs = [center, halo_up, halo_dn,
                    center, halo_up, halo_dn, gc, gu, gd]
        out_specs = (pl.BlockSpec((Q, R, ny, nx), lambda i: (0, i, 0, 0)),
                     pl.BlockSpec((Q, R, ny, nx), lambda i: (0, i, 0, 0)))
        out_shape = (jax.ShapeDtypeStruct((Q, nz, ny, nx), dtype),
                     jax.ShapeDtypeStruct((Q, nz, ny, nx), dtype))

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )

    # T=1 BC slabs as a jnp prologue (keeps the kernel halo at the pure
    # physics depth; XLA lowers the slab rewrites to in-place
    # dynamic-update-slices under donation)
    fl_np = geometry.is_fluid

    def _slab_mask(z):
        return jnp.asarray(fl_np[z], bool)

    def _bc_prologue_c(s):
        ft = s[:Q]
        rho_r = s[Q]
        if inlet_kind == "velocity":
            z = nz - 2
            m = _slab_mask(z)
            sl = ft[:, z]
            s0 = sum(sl[i] for i in _EZ_ZERO)
            sp = sum(sl[i] for i in _EZ_PLUS)
            rho = (s0 + 2.0 * sp) / (1.0 + inlet_vz)
            feq = _feq_vz(rho, inlet_vz)
            tot = jnp.sum(sl, axis=0)
            ratio = rho_r[z] / jnp.where(tot != 0, tot, 1.0)
            dsum = None
            for i in _EZ_MINUS:
                io = int(opp[i])
                val = feq[i] + (sl[io] - feq[io])
                dv = val - sl[i]
                dsum = dv if dsum is None else dsum + dv
                ft = ft.at[i, z].set(jnp.where(m, val, sl[i]))
            rho_r = rho_r.at[z].set(
                jnp.where(m, rho_r[z] + ratio * dsum, rho_r[z]))
            mg = _slab_mask(nz - 1)
            ft = ft.at[:, nz - 1].set(
                jnp.where(mg, ft[:, nz - 2], ft[:, nz - 1]))
            rho_r = rho_r.at[nz - 1].set(
                jnp.where(mg, rho_r[nz - 2], rho_r[nz - 1]))
        if outlet_kind == "convective":
            for z in (2, 1, 0):
                m = _slab_mask(z)
                ft = ft.at[:, z].set(jnp.where(m, ft[:, z + 1], ft[:, z]))
                rho_r = rho_r.at[z].set(
                    jnp.where(m, rho_r[z + 1], rho_r[z]))
        elif outlet_kind == "dirichlet":
            z = 1
            m = _slab_mask(z)
            sl = ft[:, z]
            s0 = sum(sl[i] for i in _EZ_ZERO)
            sm_ = sum(sl[i] for i in _EZ_MINUS)
            vz = 1.0 - (s0 + 2.0 * sm_) / outlet_rho
            feq = _feq_vz(outlet_rho, vz)
            tot = jnp.sum(sl, axis=0)
            ratio = rho_r[z] / jnp.where(tot != 0, tot, 1.0)
            dsum = None
            for i in _EZ_PLUS:
                io = int(opp[i])
                val = feq[i] + (sl[io] - feq[io])
                dv = val - sl[i]
                dsum = dv if dsum is None else dsum + dv
                ft = ft.at[i, z].set(jnp.where(m, val, sl[i]))
            rho_r = rho_r.at[z].set(
                jnp.where(m, rho_r[z] + ratio * dsum, rho_r[z]))
            mg = _slab_mask(0)
            ft = ft.at[:, 0].set(jnp.where(mg, ft[:, 1], ft[:, 0]))
            rho_r = rho_r.at[0].set(jnp.where(mg, rho_r[1], rho_r[0]))
        return jnp.concatenate([ft, rho_r[None]], axis=0)

    def _bc_prologue_split(f_r, f_b):
        if inlet_kind == "velocity":
            z = nz - 2
            m = _slab_mask(z)
            slr = f_r[:, z]
            slb = f_b[:, z]
            sl = slr + slb
            s0 = sum(sl[i] for i in _EZ_ZERO)
            sp = sum(sl[i] for i in _EZ_PLUS)
            rho = (s0 + 2.0 * sp) / (1.0 + inlet_vz)
            feq = _feq_vz(rho, inlet_vz)
            tot = jnp.sum(sl, axis=0)
            ratio = jnp.sum(slr, axis=0) / jnp.where(tot != 0, tot, 1.0)
            for i in _EZ_MINUS:
                io = int(opp[i])
                val = feq[i] + (sl[io] - feq[io])
                f_r = f_r.at[i, z].set(jnp.where(m, ratio * val, slr[i]))
                f_b = f_b.at[i, z].set(
                    jnp.where(m, (1.0 - ratio) * val, slb[i]))
            mg = _slab_mask(nz - 1)
            f_r = f_r.at[:, nz - 1].set(
                jnp.where(mg, f_r[:, nz - 2], f_r[:, nz - 1]))
            f_b = f_b.at[:, nz - 1].set(
                jnp.where(mg, f_b[:, nz - 2], f_b[:, nz - 1]))
        if outlet_kind == "convective":
            for z in (2, 1, 0):
                m = _slab_mask(z)
                f_r = f_r.at[:, z].set(
                    jnp.where(m, f_r[:, z + 1], f_r[:, z]))
                f_b = f_b.at[:, z].set(
                    jnp.where(m, f_b[:, z + 1], f_b[:, z]))
        elif outlet_kind == "dirichlet":
            z = 1
            m = _slab_mask(z)
            slr = f_r[:, z]
            slb = f_b[:, z]
            sl = slr + slb
            s0 = sum(sl[i] for i in _EZ_ZERO)
            sm_ = sum(sl[i] for i in _EZ_MINUS)
            vz = 1.0 - (s0 + 2.0 * sm_) / outlet_rho
            feq = _feq_vz(outlet_rho, vz)
            tot = jnp.sum(sl, axis=0)
            ratio = jnp.sum(slr, axis=0) / jnp.where(tot != 0, tot, 1.0)
            for i in _EZ_PLUS:
                io = int(opp[i])
                val = feq[i] + (sl[io] - feq[io])
                f_r = f_r.at[i, z].set(jnp.where(m, ratio * val, slr[i]))
                f_b = f_b.at[i, z].set(
                    jnp.where(m, (1.0 - ratio) * val, slb[i]))
            mg = _slab_mask(0)
            f_r = f_r.at[:, 0].set(jnp.where(mg, f_r[:, 1], f_r[:, 0]))
            f_b = f_b.at[:, 0].set(jnp.where(mg, f_b[:, 1], f_b[:, 0]))
        return f_r, f_b

    bc_prologue = has_bcs and not bc_in_kernel
    if is_local:
        def step(s_loc, up, dn, geo_loc, gup, gdn):
            return call(s_loc, s_loc, s_loc, up, dn,
                        geo_loc, geo_loc, geo_loc, gup, gdn)[0]
        step.bc_prologue_c = _bc_prologue_c if bc_prologue else None
        step.halo_slabs = H
        return step
    if compressed:
        def step(s):
            if bc_prologue:
                s = _bc_prologue_c(s)
            return call(s, s, s, geo_dev, geo_dev, geo_dev)[0]
    else:
        def step(f_r, f_b):
            if bc_prologue:
                f_r, f_b = _bc_prologue_split(f_r, f_b)
            return call(f_r, f_r, f_r, f_b, f_b, f_b,
                        geo_dev, geo_dev, geo_dev)

    return step


def build_cg3d_sharded_step(geometry: Geometry, params, mesh,
                            dtype=jnp.float32,
                            slabs_per_block: int | None = None,
                            bc_config=None,
                            interpret: bool = False):
    """Compressed fused D3Q19 CSF step under a z-sharded mesh.

    The domain is slab-decomposed over the mesh "y" axis (x/y stay
    on-shard: lane/sublane rolls need the full cross-section).  Per call,
    the BC prologue rewrites the boundary slabs on the globally sharded
    array (XLA SPMD lowers the slab updates to the owning shards), then
    each shard exchanges H halo slabs of state and geometry with its ring
    neighbors via ``lax.ppermute`` over ICI and runs the local periodic
    kernel.  Returns ``step(s) -> s'`` on the (20, nz, ny, nx) state, or
    None when the decomposition does not apply.
    """
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    nz, ny, nx = geometry.shape
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_sh = axis_sizes.get("y", 1)
    if axis_sizes.get("x", 1) != 1 or nz % n_sh:
        return None
    nz_loc = nz // n_sh
    local = build_cg3d_fused_step(
        geometry, params, dtype, slabs_per_block, steps_per_call=1,
        bc_config=bc_config, state_mode="compressed", local_nz=nz_loc,
        interpret=interpret)
    if local is None:
        return None
    H = local.halo_slabs

    spec = P(None, "y", None, None)
    geo = jax.device_put(jnp.asarray(geo_stack3(geometry), dtype),
                         NamedSharding(mesh, spec))
    fwd = [(j, (j + 1) % n_sh) for j in range(n_sh)]
    bwd = [(j, (j - 1) % n_sh) for j in range(n_sh)]

    def _local_step(s_loc, geo_loc):
        def halo(x):
            up = lax.ppermute(x[:, -H:], "y", fwd)
            dn = lax.ppermute(x[:, :H], "y", bwd)
            return up, dn

        up, dn = halo(s_loc)
        gup, gdn = halo(geo_loc)
        return local(s_loc, up, dn, geo_loc, gup, gdn)

    sharded = shard_map(_local_step, mesh=mesh, in_specs=(spec, spec),
                        out_specs=spec, check_vma=False)
    prologue = getattr(local, "bc_prologue_c", None)

    def step(s):
        if prologue is not None:
            s = prologue(s)
        return sharded(s, geo)

    return step
