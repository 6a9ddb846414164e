"""Fused single-phase D3Q19 Pallas kernel (z-slab windows).

The 3D sibling of ``pallas/single.py`` on the window scheme of
``pallas/sc3d.py``; physics identical to
``models/flow3d.SinglePhaseD3Q19._step_impl`` (SRT / TRT, Guo body
force, pull-streaming with half-way bounce-back, periodic faces).  One
halo slab per sub-step (no interaction stencil).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import Geometry
from ..lattice import D3Q19

__all__ = ["build_single3d_fused_step"]

_PAIRS3 = ((1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14),
           (15, 16), (17, 18))


def _rollxy(a, dx: int, dy: int, nx: int, ny: int):
    out = a
    if dy:
        out = pltpu.roll(out, (-dy) % ny, axis=out.ndim - 2)
    if dx:
        out = pltpu.roll(out, (-dx) % nx, axis=out.ndim - 1)
    return out


def _zcut(a, k: int):
    if k == 0:
        return a
    return a[..., k:a.shape[a.ndim - 3] - k, :, :]


def _zsh(a, dz: int, k: int):
    zax = a.ndim - 3
    return a[..., k + dz:a.shape[zax] - k + dz, :, :]


def build_single3d_fused_step(geometry: Geometry, tau: float,
                              collision: str = "SRT",
                              body_force=(0.0, 0.0, 0.0),
                              dtype=jnp.float32,
                              slabs_per_block: int | None = None,
                              steps_per_call: int = 1,
                              interpret: bool = False,
                              storage: str = "f32"):
    """Build ``f (19, nz, ny, nx) -> f'`` advancing `steps_per_call`
    single-phase steps per call.  Returns None when the domain does not
    slab-decompose or the collision kind is unsupported."""
    if collision not in ("SRT", "TRT"):
        return None  # matches SinglePhaseD3Q19's operator set
    nz, ny, nx = geometry.shape
    lat = D3Q19
    e = lat.e
    w_lat = lat.w
    opp = lat.opp
    Q = lat.q
    T = int(steps_per_call)
    tau = float(tau)
    bf = tuple(float(v) for v in body_force)
    has_force = any(bf)
    # bf16 shifted-PDF storage: 21 bfloat16 planes — 19 deviations
    # f_i - w_i*rho plus rho as a hi/lo bf16 pair (the pallas/sc3d.py
    # scheme at K=1; state traffic 42/76 of f32); VMEM arithmetic
    # stays f32.
    bf16 = storage == "bf16"

    need = T  # one halo slab per sub-step (streaming only)

    def _pick_h(r):
        for d in range(need, r + 1):
            if r % d == 0 and nz % d == 0:
                return d
        return None

    if slabs_per_block is None:
        for r in (32, 16, 8, 4):
            if nz % r:
                continue
            h = _pick_h(r)
            if h is None:
                continue
            if bf16:
                # bf16 windows (half-width) live alongside their f32
                # decode; outputs are half-width
                planes = (Q + (Q + 2) // 2 + 4) * (r + 2 * h) + \
                    (Q + 2) * r // 2
            else:
                planes = (Q + 4) * (r + 2 * h) + Q * r
            if planes * ny * nx * 4 * 2.0 / 2**20 <= 110:
                slabs_per_block = r
                break
        else:
            return None
    R = slabs_per_block
    if not R or nz % R:
        return None
    H = _pick_h(R)
    if H is None:
        return None
    nb = nz // R
    hb = nz // H

    geo_dev = jnp.asarray(geometry.is_fluid.astype(np.float64)[None], dtype)
    inv_t = 1.0 / tau
    if collision == "TRT":
        magic = 3.0 / 16.0
        omega_p = 1.0 / tau
        omega_m = 1.0 / (magic / (tau - 0.5) + 0.5)

    def _feq_src(rho, u):
        """Pair-shared equilibria + Guo sources (cg3d._feq_src3)."""
        ux, uy, uz = u
        fx, fy, fz = bf[0] * rho, bf[1] * rho, bf[2] * rho
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
            a = wrho * (base + 4.5 * (eui * eui))
            b = (3.0 * wrho) * eui
            feq[i] = a + b
            feq[io] = a - b
            if has_force:
                efi = ef[i]
                c = wi * (9.0 * eui * efi - 3.0 * uf)
                d = (3.0 * wi) * efi
                src[i] = c + d
                src[io] = c - d
        return feq, src

    def _substep(f, gcut, solid_sh):
        rho = sum(f)
        rho_safe = jnp.where(rho > 0, rho, 1.0)
        rinv = 1.0 / rho_safe
        mom = [None, None, None]
        for i in range(1, Q):
            fi = f[i]
            for d in range(3):
                ed = float(e[i, d])
                if ed:
                    t = fi if ed == 1.0 else -fi
                    mom[d] = t if mom[d] is None else mom[d] + t
        if has_force:
            u = tuple((mom[d] + (0.5 * bf[d]) * rho) * rinv
                      for d in range(3))
        else:
            u = tuple(mom[d] * rinv for d in range(3))
        feq, src = _feq_src(rho, u)
        post = [None] * Q
        if collision == "SRT":
            pf = 1.0 - 0.5 * inv_t
            for i in range(Q):
                post[i] = f[i] - (f[i] - feq[i]) * inv_t
                if has_force:
                    post[i] = post[i] + pf * src[i]
        else:
            post[0] = f[0] - omega_p * (f[0] - feq[0])
            for i, io in _PAIRS3:
                fs = 0.5 * (f[i] + f[io])
                fa = 0.5 * (f[i] - f[io])
                es = 0.5 * (feq[i] + feq[io])
                ea = 0.5 * (feq[i] - feq[io])
                ds = omega_p * (fs - es)
                da = omega_m * (fa - ea)
                post[i] = f[i] - ds - da
                post[io] = f[io] - ds + da
            if has_force:
                pp = 1.0 - 0.5 * omega_p
                pm = 1.0 - 0.5 * omega_m
                post[0] = post[0] + pp * src[0]
                for i, io in _PAIRS3:
                    ev = 0.5 * (src[i] + src[io])
                    od = 0.5 * (src[i] - src[io])
                    post[i] = post[i] + pp * ev + pm * od
                    post[io] = post[io] + pp * ev - pm * od
        fl1 = gcut(0, 1)
        out = [_zcut(post[0], 1) * fl1]
        for i in range(1, Q):
            io = int(opp[i])
            dx, dy, dz = int(e[i, 0]), int(e[i, 1]), int(e[i, 2])
            pulled = _rollxy(_zsh(post[i], -dz, 1), -dx, -dy, nx, ny)
            out.append(jnp.where(solid_sh(i), _zcut(post[io], 1),
                                 pulled) * fl1)
        return out

    def kernel(f_c, f_u, f_d, g_c, g_u, g_d, *outs):
        geo = jnp.concatenate([g_u[:], g_c[:], g_d[:]], axis=1)
        solid = 1.0 - geo[0]
        win = jnp.concatenate([f_u[:], f_c[:], f_d[:]], axis=1)
        if bf16:
            # unshift the stored deviations to f32 once per window
            rho_in = win[Q].astype(dtype) + win[Q + 1].astype(dtype)
            f = [win[i].astype(dtype) + float(w_lat[i]) * rho_in
                 for i in range(Q)]
        else:
            f = [win[i] for i in range(Q)]
        for t in range(T):
            base = t

            def gcut_s(ch, k, _b=base):
                return _zcut(geo[ch], _b + k)

            def solid_sh_s(i, _b=base):
                dx, dy, dz = int(e[i, 0]), int(e[i, 1]), int(e[i, 2])
                return _rollxy(_zsh(_zcut(solid, _b), -dz, 1),
                               -dx, -dy, nx, ny) > 0.5

            f = _substep(f, gcut_s, solid_sh_s)
        o0 = H - T
        out = outs[0]
        if bf16:
            fc = [f[i][o0:o0 + R] for i in range(Q)]
            rho = fc[0]
            for i in range(1, Q):
                rho = rho + fc[i]
            hi = rho.astype(jnp.bfloat16)
            for i in range(Q):
                out[i] = (fc[i] - float(w_lat[i]) * rho) \
                    .astype(jnp.bfloat16)
            out[Q] = hi
            out[Q + 1] = (rho - hi.astype(dtype)).astype(jnp.bfloat16)
        else:
            for i in range(Q):
                out[i] = f[i][o0:o0 + R]

    n_f = Q + 2 if bf16 else Q
    st_dtype = jnp.bfloat16 if bf16 else dtype
    center = pl.BlockSpec((n_f, R, ny, nx), lambda i: (0, i, 0, 0))
    halo_up = pl.BlockSpec((n_f, H, ny, nx),
                           lambda i: (0, (i * (R // H) - 1) % hb, 0, 0))
    halo_dn = pl.BlockSpec((n_f, H, ny, nx),
                           lambda i: (0, (i * (R // H) + R // H) % hb, 0, 0))
    gc = pl.BlockSpec((1, R, ny, nx), lambda i: (0, i, 0, 0))
    gu = pl.BlockSpec((1, H, ny, nx),
                      lambda i: (0, (i * (R // H) - 1) % hb, 0, 0))
    gd = pl.BlockSpec((1, H, ny, nx),
                      lambda i: (0, (i * (R // H) + R // H) % hb, 0, 0))

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[center, halo_up, halo_dn, gc, gu, gd],
        out_specs=(pl.BlockSpec((n_f, R, ny, nx),
                                lambda i: (0, i, 0, 0)),),
        out_shape=(jax.ShapeDtypeStruct((n_f, nz, ny, nx), st_dtype),),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )

    def step(f):
        """f: (n_f, nz, ny, nx) -> same (n_f = 21 bf16 / 19 f32)."""
        return call(f, f, f, geo_dev, geo_dev, geo_dev)[0]

    return step
