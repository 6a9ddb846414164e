"""Fused D3Q19 CSF color-gradient step as a Pallas TPU kernel.

The 3D sibling of ``pallas/csf.py``: the grid iterates over z-slabs spanning
full (ny, nx) planes; x/y stencil accesses are lane/sublane rolls (exact
periodicity), z accesses roll the leading window axis whose wrap garbage
stays in the halo rings.  Halos ride as two extra blocked inputs with
modular index maps on z.  The physics chain needs 4 rings per sub-step
(stream <- force <- gradient <- phi_ext <- phi), and z is a leading
(untiled) dimension, so the halo is exactly 4*steps_per_call slabs — no
sublane rounding.

Physics identical to ``models/flow3d.ColorGradientRK3D._step_impl`` (SRT
with tau(phi), Akai wetting, kappa = (n_a n_b - delta_ab) d_a n_b,
LKR recoloring); domain is periodic (the 3D model has no BC rows).
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


def _roll3(a, dx: int, dy: int, dz: int, nx: int, ny: int, wz: int):
    """Value at (z, y, x) of a(z + dz, y + dy, x + dx); x/y periodic, z
    wraps within the slab window (garbage stays in the rings)."""
    out = a
    if dz:
        out = pltpu.roll(out, (-dz) % wz, axis=0)
    if dy:
        out = pltpu.roll(out, (-dy) % ny, axis=1)
    if dx:
        out = pltpu.roll(out, (-dx) % nx, axis=2)
    return out


def build_cg3d_fused_step(geometry: Geometry, params, dtype=jnp.float32,
                          slabs_per_block: int | None = None,
                          steps_per_call: int = 1,
                          interpret: bool = False):
    """Build the fused step ``(f_r, f_b) -> (f_r', f_b')`` for D3Q19 CSF.

    Returns None when the domain does not slab-decompose or VMEM would
    overflow.
    """
    nz, ny, nx = geometry.shape
    T = int(steps_per_call)
    H = 4 * T
    if slabs_per_block is None:
        # empirical VMEM model (v5e 128 MB): double-buffered in/out windows
        # + halos + ~temps; R=4 fits at 96^2 cross-sections, R=8 does not.
        for r in (16, 8, 4, 2):
            if nz % r:
                continue
            mb = (2 * 19 * (r + 2 * H) + 2 * 19 * r +
                  5 * (r + 2 * H)) * ny * nx * 4 * 2 / 2**20
            if mb <= 50:
                slabs_per_block = r
                break
        else:
            return None
    R = slabs_per_block
    if not R or nz % R or H % 1:
        return None
    if nz // H * H != nz:
        # halo index maps need H | nz
        if nz % H:
            return None
    W = R + 2 * H
    nb = nz // R
    hb = nz // H

    lat = D3Q19
    e = lat.e
    w_lat = lat.w
    opp = lat.opp
    Q = lat.q

    wet_fluid, wet_solid = wetting_masks_nd(geometry.is_solid, lat)
    has_wetting = bool(wet_solid.any())
    ns = solid_normals_nd(geometry.is_solid, lat)
    geo_np = np.stack([geometry.is_fluid.astype(np.float64),
                       wet_fluid.astype(np.float64), *ns])
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

    def _substep(fr, fb, fl, wet, nsx, nsy, nsz):
        rho_r = sum(fr)
        rho_b = sum(fb)
        rho = rho_r + rho_b
        rho_safe = jnp.where(rho > 0, rho, 1.0)
        phi = jnp.where(rho != 0, (rho_r - rho_b) / rho_safe, 0.0) * fl

        if has_wetting:
            num = jnp.zeros_like(phi)
            den = jnp.zeros_like(phi)
            for i in range(1, Q):
                wi = float(w_lat[i])
                fl_n = sh(fl, i)
                num = num + wi * fl_n * sh(phi, i)
                den = den + wi * fl_n
            phi_solid = jnp.where(den > 0,
                                  num / jnp.where(den > 0, den, 1.0), 0.0)
            phi_ext = jnp.where(fl > 0.5, phi, phi_solid)
        else:
            phi_ext = phi

        g = [jnp.zeros_like(phi) for _ in range(3)]
        for i in range(1, Q):
            wi = float(w_lat[i])
            s = sh(phi_ext, i)
            for d in range(3):
                ed = int(e[i, d])
                if ed:
                    g[d] = g[d] + (wi * ed) * s
        g = [3.0 * c for c in g]

        if has_wetting:
            norm = jnp.sqrt(g[0] ** 2 + g[1] ** 2 + g[2] ** 2)
            safe = norm > _EPS
            norm_s = jnp.where(safe, norm, 1.0)
            u = [jnp.where(safe, -c / norm_s, 0.0) for c in g]
            nsv = (nsx, nsy, nsz)
            dot = jnp.clip(sum(u[d] * nsv[d] for d in range(3)), -1.0, 1.0)
            sin_gs = jnp.sqrt(jnp.maximum(1.0 - dot * dot, 0.0))
            ok = sin_gs > 1.0e-9
            sin_ok = jnp.where(ok, sin_gs, 1.0)
            c1 = jnp.where(ok, sin_t * dot / sin_ok, 0.0)
            c2 = jnp.where(ok, sin_t / sin_ok, 0.0)
            n1 = [(cos_t - c1) * nsv[d] + c2 * u[d] for d in range(3)]
            n2 = [(cos_t + c1) * nsv[d] - c2 * u[d] for d in range(3)]
            d1 = jnp.sqrt(sum((n1[d] - u[d]) ** 2 for d in range(3)))
            d2 = jnp.sqrt(sum((n2[d] - u[d]) ** 2 for d in range(3)))
            pick1 = d1 < d2
            tie = d1 == d2
            wetm = wet > 0.5
            for d in range(3):
                m = jnp.where(pick1, n1[d], n2[d])
                rotated = jnp.where(tie, g[d], -norm * m)
                g[d] = jnp.where(wetm, rotated, g[d])

        # curvature + CSF force (inward normal)
        norm = jnp.sqrt(g[0] ** 2 + g[1] ** 2 + g[2] ** 2)
        safe = norm > _EPS
        norm_s = jnp.where(safe, norm, 1.0)
        nh = [jnp.where(safe, -c / norm_s, 0.0) * fl for c in g]
        dn = [[jnp.zeros_like(phi) for _ in range(3)] for _ in range(3)]
        for i in range(1, Q):
            w3 = 3.0 * float(w_lat[i])
            shifted = [sh(nh[b], i) for b in range(3)]
            for a in range(3):
                ea = int(e[i, a])
                if not ea:
                    continue
                for b in range(3):
                    dn[a][b] = dn[a][b] + (w3 * ea) * shifted[b]
        kappa = jnp.zeros_like(phi)
        for a in range(3):
            for b in range(3):
                coef = nh[a] * nh[b] - (1.0 if a == b else 0.0)
                kappa = kappa + coef * dn[a][b]
        force = [-0.5 * sigma * kappa * g[d] for d in range(3)]
        if any(bf):
            for d in range(3):
                if bf[d]:
                    force[d] = force[d] + bf[d] * rho
        force = [c * fl for c in force]

        # velocity, tau(phi)
        mom = [jnp.zeros_like(rho) for _ in range(3)]
        for i in range(1, Q):
            fti = fr[i] + fb[i]
            for d in range(3):
                ed = float(e[i, d])
                if ed:
                    mom[d] = mom[d] + ed * fti
        u = [(mom[d] + 0.5 * force[d]) / rho_safe for d in range(3)]
        if params.tau_type == 1:
            tau_mid = 0.5 + 1.0 / ((1.0 + phi) / (2.0 * (tau_r - 0.5)) +
                                   (1.0 - phi) / (2.0 * (tau_b - 0.5)))
        else:
            mu = 1.0 / ((rho_r / rho_safe) * (3.0 / (tau_r - 0.5)) +
                        (rho_b / rho_safe) * (3.0 / (tau_b - 0.5)))
            tau_mid = 3.0 * mu + 0.5
        tau = jnp.where(phi > delta, tau_r,
                        jnp.where(phi < -delta, tau_b, tau_mid))
        inv_tau = 1.0 / tau
        pref = 1.0 - 0.5 * inv_tau
        uu = u[0] ** 2 + u[1] ** 2 + u[2] ** 2

        # SRT collision on the total PDF + Guo source
        post = [None] * Q
        for i in range(Q):
            eu = sum(float(e[i, d]) * u[d] for d in range(3) if e[i, d])
            if isinstance(eu, int):
                eu = jnp.zeros_like(rho)
            feq_i = float(w_lat[i]) * rho * \
                (1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * uu)
            src_i = float(w_lat[i]) * sum(
                (3.0 * (float(e[i, d]) - u[d]) +
                 9.0 * float(e[i, d]) * eu) * force[d]
                for d in range(3))
            fti = fr[i] + fb[i]
            post[i] = fti - (fti - feq_i) * inv_tau + pref * src_i

        # LKR recoloring
        gnorm = jnp.sqrt(g[0] ** 2 + g[1] ** 2 + g[2] ** 2)
        gsafe = gnorm > _EPS
        gnorm_s = jnp.where(gsafe, gnorm, 1.0)
        frac_r = rho_r / rho_safe
        seg_base = beta * rho_r * rho_b / rho_safe
        fr_post = [None] * Q
        fb_post = [None] * Q
        for i in range(Q):
            if i == 0:
                seg = 0.0
            else:
                eg = sum(float(e[i, d]) * g[d] for d in range(3)
                         if e[i, d])
                cos_enorm = jnp.where(gsafe, eg / gnorm_s, 0.0)
                seg = seg_base * float(w_lat[i]) * cos_enorm
            fr_post[i] = frac_r * post[i] + seg
            fb_post[i] = post[i] - fr_post[i]

        out_r = [fr_post[0] * fl]
        out_b = [fb_post[0] * fl]
        for i in range(1, Q):
            io = int(opp[i])
            up_solid = sh_back(1.0 - fl, i) > 0.5
            out_r.append(jnp.where(up_solid, fr_post[io],
                                   sh_back(fr_post[i], i)) * fl)
            out_b.append(jnp.where(up_solid, fb_post[io],
                                   sh_back(fb_post[i], i)) * fl)
        return out_r, out_b

    def kernel(fr_c, fr_u, fr_d, fb_c, fb_u, fb_d, g_c, g_u, g_d,
               out_r, out_b):
        f_r = jnp.concatenate([fr_u[:], fr_c[:], fr_d[:]], axis=1)
        f_b = jnp.concatenate([fb_u[:], fb_c[:], fb_d[:]], axis=1)
        geo = jnp.concatenate([g_u[:], g_c[:], g_d[:]], axis=1)
        fl = geo[0]
        wet = geo[1]
        fr = [f_r[i] for i in range(Q)]
        fb = [f_b[i] for i in range(Q)]
        for _ in range(T):
            fr, fb = _substep(fr, fb, fl, wet, geo[2], geo[3], geo[4])
        for i in range(Q):
            out_r[i] = fr[i][H:H + R]
            out_b[i] = fb[i][H:H + R]

    center = pl.BlockSpec((Q, R, ny, nx), lambda i: (0, i, 0, 0))
    halo_up = pl.BlockSpec((Q, H, ny, nx),
                           lambda i: (0, (i * (R // H) - 1) % hb, 0, 0)) \
        if R % H == 0 else None
    if R % H:
        return None
    halo_dn = pl.BlockSpec((Q, H, ny, nx),
                           lambda i: (0, (i * (R // H) + R // H) % hb, 0, 0))
    gc = pl.BlockSpec((n_geo, R, ny, nx), lambda i: (0, i, 0, 0))
    gu = pl.BlockSpec((n_geo, H, ny, nx),
                      lambda i: (0, (i * (R // H) - 1) % hb, 0, 0))
    gd = pl.BlockSpec((n_geo, H, ny, nx),
                      lambda i: (0, (i * (R // H) + R // H) % hb, 0, 0))

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[center, halo_up, halo_dn,
                  center, halo_up, halo_dn, gc, gu, gd],
        out_specs=(pl.BlockSpec((Q, R, ny, nx), lambda i: (0, i, 0, 0)),
                   pl.BlockSpec((Q, R, ny, nx), lambda i: (0, i, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((Q, nz, ny, nx), dtype),
                   jax.ShapeDtypeStruct((Q, nz, ny, nx), dtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )

    def step(f_r, f_b):
        return call(f_r, f_r, f_r, f_b, f_b, f_b,
                    geo_dev, geo_dev, geo_dev)

    return step
