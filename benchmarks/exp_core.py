"""Cost decomposition of the fused CSF core (periodic, no wetting, SRT)
by structural variants on the real kernel shape.

Each variant removes or restructures ONE cost component of the compressed
sub-step; deltas against `full` attribute ms/step to the streaming rolls,
the red-density streaming, the curvature stencil, and the phi gradient.
Variants marked [!] are physics-wrong by construction — costing only.

Usage: python benchmarks/exp_core.py [T] [R] [variants...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_E = np.array([(0, 0), (1, 0), (0, 1), (-1, 0), (0, -1),
               (1, 1), (-1, 1), (-1, -1), (1, -1)])
_W9 = np.array([4 / 9] + [1 / 9] * 4 + [1 / 36] * 4)
_OPP = np.array([0, 3, 4, 1, 2, 7, 8, 5, 6])
_PAIRS = ((1, 3), (2, 4), (5, 7), (6, 8))


def build(variant="full", t_block=4, rows=256, ny=1024, nx=1024):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from openlbmpm_tpu.pallas.csf import _halo_rows, _sh, _rollx, _rolly

    T = t_block
    H = _halo_rows(T, "CSF")
    R = rows
    W = R + 2 * H
    nb = ny // R
    hb = ny // H
    sh = functools.partial(_sh, nx=nx, w=W)

    sigma, beta, delta = 0.1, 0.7, 0.98
    tau_r = tau_b = 1.0

    def _grad2d(a, w_ax, w_diag):
        pN = sh(a, 0, 1)
        pS = sh(a, 0, -1)
        pE = sh(a, 1, 0)
        pW = sh(a, -1, 0)
        q = w_ax * a + w_diag * (pN + pS)
        r = w_ax * a + w_diag * (pE + pW)
        gx = sh(q, 1, 0) - sh(q, -1, 0)
        gy = sh(r, 0, 1) - sh(r, 0, -1)
        return gx, gy

    def substep(ft, rho_r):
        rho = sum(ft)
        rho_safe = jnp.where(rho > 0, rho, 1.0)
        rinv = 1.0 / rho_safe
        rho_b = rho - rho_r
        phi = jnp.where(rho != 0, (rho_r - rho_b) * rinv, 0.0)

        if variant == "nogradphi":  # [!] drop the phi gradient stencil
            gx = phi * 0.01
            gy = phi * 0.02
        else:
            gx, gy = _grad2d(phi, 1.0 / 3.0, 1.0 / 12.0)

        g2 = gx * gx + gy * gy
        safe = g2 > 0.0
        g_rinv = jnp.where(safe, jax.lax.rsqrt(jnp.where(safe, g2, 1.0)),
                           0.0)
        if variant == "nokappa":
            # [!] skip the curvature stencil (second _grad2d)
            kappa = phi
        else:
            nhx = -gx * g_rinv
            nhy = -gy * g_rinv
            nhxy = jnp.stack([nhx, nhy])
            gx_s, gy_s = _grad2d(nhxy, 1.0 / 3.0, 1.0 / 12.0)
            dx_nx, dx_ny = gx_s[0], gx_s[1]
            dy_nx, dy_ny = gy_s[0], gy_s[1]
            kappa = nhx * nhy * (dx_ny + dy_nx) - nhy * nhy * dx_nx \
                - nhx * nhx * dy_ny
        fx = -0.5 * sigma * kappa * gx
        fy = -0.5 * sigma * kappa * gy

        # collision (SRT, tau_type 2)
        mx = ft[1] - ft[3] + ft[5] - ft[6] - ft[7] + ft[8]
        my = ft[2] - ft[4] + ft[5] + ft[6] - ft[7] - ft[8]
        ux = (mx + 0.5 * fx) * rinv
        uy = (my + 0.5 * fy) * rinv
        cr = 3.0 / (tau_r - 0.5)
        cb = 3.0 / (tau_b - 0.5)
        q = (rho_r * cr + rho_b * cb) * rinv
        inv_mid = q / (3.0 + 0.5 * q)
        inv_tau = jnp.where(phi > delta, 1.0 / tau_r,
                            jnp.where(phi < -delta, 1.0 / tau_b, inv_mid))
        uu = ux * ux + uy * uy
        uf = ux * fx + uy * fy
        base = 1.0 - 1.5 * uu
        eu = [None, ux, uy, None, None, ux + uy, uy - ux, None, None]
        ef = [None, fx, fy, None, None, fx + fy, fy - fx, None, None]
        feq = [None] * 9
        src = [None] * 9
        feq[0] = (4.0 / 9.0) * rho * base
        src[0] = (4.0 / 9.0) * (-3.0) * uf
        for i, io in _PAIRS:
            wi = float(_W9[i])
            wrho = wi * rho
            a = wrho * (base + 4.5 * (eu[i] * eu[i]))
            b = (3.0 * wrho) * eu[i]
            feq[i] = a + b
            feq[io] = a - b
            c = wi * (9.0 * eu[i] * ef[i] - 3.0 * uf)
            d = (3.0 * wi) * ef[i]
            src[i] = c + d
            src[io] = c - d
        pref = 1.0 - 0.5 * inv_tau
        post = [ft[i] - (ft[i] - feq[i]) * inv_tau + pref * src[i]
                for i in range(9)]

        # recolor red
        frac_r = rho_r * rinv
        segc = (beta * rho_r * rho_b * rinv) * g_rinv
        eg = [None, gx, gy, None, None, gx + gy, gy - gx, None, None]
        fr_post = [None] * 9
        fr_post[0] = frac_r * post[0]
        for i, io in _PAIRS:
            seg = (float(_W9[i]) * segc) * eg[i]
            fr_post[i] = frac_r * post[i] + seg
            fr_post[io] = frac_r * post[io] - seg
        # streaming (periodic, no solids)
        out_t = [post[0]]
        rho_r_new = fr_post[0]
        if variant == "noredstream":  # [!] skip the red-PDF streaming
            for i in range(1, 9):
                dx, dy = int(_E[i, 0]), int(_E[i, 1])
                out_t.append(sh(post[i], -dx, -dy))
                rho_r_new = rho_r_new + fr_post[i]
        elif variant == "nostreamroll":  # [!] streaming without shifts
            for i in range(1, 9):
                out_t.append(post[i])
                rho_r_new = rho_r_new + fr_post[i]
        elif variant == "stacked":
            # stream (post_i, fr_post_i) as one 2-plane stacked roll
            for i in range(1, 9):
                dx, dy = int(_E[i, 0]), int(_E[i, 1])
                pair = jnp.stack([post[i], fr_post[i]])
                moved = sh(pair, -dx, -dy)
                out_t.append(moved[0])
                rho_r_new = rho_r_new + moved[1]
        else:
            for i in range(1, 9):
                dx, dy = int(_E[i, 0]), int(_E[i, 1])
                out_t.append(sh(post[i], -dx, -dy))
                rho_r_new = rho_r_new + sh(fr_post[i], -dx, -dy)
        return out_t, rho_r_new

    def kernel(s_c, s_u, s_d, out):
        s = jnp.concatenate([s_u[:], s_c[:], s_d[:]], axis=1)
        ft = [s[i] for i in range(9)]
        rho_r = s[9]
        for _ in range(T):
            ft, rho_r = substep(ft, rho_r)
        for i in range(9):
            out[i] = ft[i][H:H + R]
        out[9] = rho_r[H:H + R]

    import jax
    center = pl.BlockSpec((10, R, nx), lambda i: (0, i, 0))
    halo_up = pl.BlockSpec((10, H, nx),
                           lambda i: (0, (i * (R // H) - 1) % hb, 0))
    halo_dn = pl.BlockSpec((10, H, nx),
                           lambda i: (0, (i * (R // H) + R // H) % hb, 0))
    call = pl.pallas_call(
        kernel, grid=(nb,),
        in_specs=[center, halo_up, halo_dn],
        out_specs=pl.BlockSpec((10, R, nx), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((10, ny, nx), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            dimension_semantics=("parallel",)))

    def step(s):
        return call(s, s, s)

    return step


def main(t_block=4, rows=256, variants=None):
    import jax
    import jax.numpy as jnp

    ny = nx = 1024
    variants = variants or ["full", "stacked", "noredstream",
                            "nostreamroll", "nokappa", "nogradphi"]
    rng = np.random.RandomState(0)
    ft0 = _W9[:, None, None] * np.ones((9, ny, nx))
    rr0 = 0.5 + 0.01 * rng.rand(1, ny, nx)
    s0 = jnp.asarray(np.concatenate([ft0, rr0], axis=0), jnp.float32)

    for v in variants:
        step = build(v, t_block, rows, ny, nx)

        def steps(n, s):
            return jax.lax.fori_loop(0, n, lambda _, x: step(x), s)

        run = jax.jit(steps, static_argnums=0, donate_argnums=1)
        n_calls = 150
        t0 = time.perf_counter()
        out = run(n_calls, s0)
        jax.block_until_ready(out)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = run(n_calls, out)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        ms = dt / (n_calls * t_block) * 1e3
        print(f"{v}: {ms:.3f} ms/step ({ny * nx / ms / 1e3:.0f} MLUPS) "
              f"[compile+warm {tc:.0f}s]", flush=True)


if __name__ == "__main__":
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    main(t, r, sys.argv[3:] or None)
