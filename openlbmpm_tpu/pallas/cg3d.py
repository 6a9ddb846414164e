"""Fused D3Q19 CSF color-gradient step as a Pallas TPU kernel.

The 3D sibling of ``pallas/csf.py``: the grid iterates over z-slabs spanning
full (ny, nx) planes; x/y stencil accesses are lane/sublane rolls (exact
periodicity).  z is the *leading* (untiled) window axis, so z-stencil
accesses are plain contiguous slices — no rolls, no sublane alignment
constraints — and every pipeline stage computes only the z-range whose
values are still live:

    phi on [0, W) -> phi_ext on [1, W-1) -> gradient on [2, W-2) ->
    CSF force on [3, W-3) -> collision on [3, W-3) -> streaming
    writes [4, W-4)

so the expensive tail stages (19-direction collision, recoloring,
streaming) run on ~R+2 slabs instead of the full R+2H window — at the
flagship R=8/H=4 that cuts their VPU work ~40%.  Halos ride as two extra
blocked inputs with modular index maps on z.

Physics identical to ``models/flow3d.ColorGradientRK3D._step_impl`` (SRT
with tau(phi), Akai wetting, kappa = (n_a n_b - delta_ab) d_a n_b,
LKR recoloring) including the z-face boundary slabs (NEBB velocity inlet /
pressure outlet, convective outlet; ``CG3DBoundaryConfig``), applied
in-window on global-z masks so temporal blocking works.  In-window BC
application shrinks the valid range by one slab per sub-step (its ghost
copies read z+-1), so the halo need is 5 slabs per blocked sub-step
instead of 4.

Two state modes, as in 2D:
- ``split``: (f_r, f_b) each (19, nz, ny, nx) — 76 f32 planes of HBM
  traffic per step;
- ``compressed``: s = concat([f_total (19), rho_r (1)]) — the collision
  runs on the total PDF and recoloring only needs the red density, so the
  per-step traffic drops to 40 planes; rho_r at t+1 is the streamed sum of
  the recolored red PDFs, computed in-window and never stored.

All 3x3x3 stencils (solid-phi extrapolation, gradient, curvature
derivatives) are computed separably in x/y and by slices in z.
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


def _rollxy(a, dx: int, dy: int, nx: int, ny: int):
    """Value at (y, x) of a(y + dy, x + dx), periodic in both.

    Extents come from ``a``'s own shape (nx/ny are kept for call-site
    clarity): under y-tiling the in-window y extent is TY + 2H, not the
    global ny, and the wrap there only touches the discarded halo rings
    (stencil depth per sub-step is H, by the same windowed-validity
    argument as the z axis)."""
    out = a
    if dy:
        out = pltpu.roll(out, (-dy) % out.shape[out.ndim - 2],
                         axis=out.ndim - 2)
    if dx:
        out = pltpu.roll(out, (-dx) % out.shape[out.ndim - 1],
                         axis=out.ndim - 1)
    return out


def _zcut(a, k: int):
    """Drop k slabs from each side of the window-z axis (axis ndim-3)."""
    if k == 0:
        return a
    idx = (Ellipsis, slice(k, a.shape[a.ndim - 3] - k),
           slice(None), slice(None))
    return a[idx]


def _zsh(a, dz: int, k: int):
    """Value at z+dz on the range shrunk by k slabs per side: for `a`
    valid on window range [la, lb), returns a(z+dz) on [la+k, lb-k);
    requires |dz| <= k (a plain contiguous slice on the leading axis)."""
    zax = a.ndim - 3
    s = k + dz
    e = a.shape[zax] - k + dz
    idx = (Ellipsis, slice(s, e), slice(None), slice(None))
    return a[idx]


def geo_stack3(geometry: Geometry) -> np.ndarray:
    """Static geometry channels, packed to 4 planes of HBM traffic:
    [code, nsx, nsy, nsz].

    ``code`` multiplexes three mutually exclusive per-cell facts into one
    plane (the kernel is DMA-bound, so every halo-amplified geometry plane
    costs ~2% of step time):

    - plain fluid  -> 1.0
    - wet fluid    -> 2.0
    - solid        -> -den_inv, the negated reciprocal of the solid-phi
      extrapolation denominator Σ_i w_i is_fluid(x+e_i); den_inv is either
      0 (no fluid neighbor) or >= 1/(1-w0) = 1.5, and is only ever read on
      solid cells, so the decode thresholds (0.5, 1.5) are exact in f32.
    """
    lat = D3Q19
    wet_fluid, _ = wetting_masks_nd(geometry.is_solid, lat)
    ns = solid_normals_nd(geometry.is_solid, lat)
    fl = geometry.is_fluid.astype(np.float64)
    den = np.zeros_like(fl)
    for i in range(1, lat.q):
        dx, dy, dz = (int(lat.e[i, 0]), int(lat.e[i, 1]), int(lat.e[i, 2]))
        den += float(lat.w[i]) * np.roll(fl, (-dz, -dy, -dx), axis=(0, 1, 2))
    den_inv = np.where(den > 0, 1.0 / np.where(den > 0, den, 1.0), 0.0)
    code = np.where(fl > 0.5, 1.0 + wet_fluid.astype(np.float64), -den_inv)
    return np.stack([code, *ns])


def build_cg3d_fused_step(geometry: Geometry, params, dtype=jnp.float32,
                          slabs_per_block: int | None = None,
                          steps_per_call: int = 1,
                          bc_config=None,
                          state_mode: str = "split",
                          local_nz: int | None = None,
                          local_ny: int | None = None,
                          transport=None,
                          storage: str = "f32",
                          tile_y: int | None = None,
                          vmem_limit_mb: int = 120,
                          interpret: bool = False):
    """Build the fused step for D3Q19 CSF: ``(f_r, f_b) -> (f_r', f_b')``
    (split) or ``s -> s'`` on the 20-plane compressed state.

    ``storage="bf16"`` (compressed only): the HBM state is a 21-plane
    bfloat16 array — 19 planes of *shifted* PDFs ``f_i - w_i·fl`` (the
    FluidX3D-style FP16S memory-compression trick: the deviation from the
    lattice weight carries the physics, so halving the mantissa costs
    ~0.2% of the *deviation*, not of f itself) plus rho_r stored as a
    bf16 hi/lo pair (exact to ~2^-17, so the phase field keeps f32-grade
    precision).  All arithmetic stays f32 in VMEM; only HBM traffic
    halves — which is the bound for this kernel (benchmarks/RESULTS.md).
    Opt-in: total-density deviations below bf16 resolution (~2e-3
    relative) are rounded away, so the f32 path remains the default.

    ``local_nz`` (compressed only) builds the per-shard kernel for a
    z-decomposed domain (``build_cg3d_sharded_step``): the call takes the
    local slab, H-slab halos received from the z neighbors over ICI, and
    the matching geometry slabs; BC slabs stay in the jnp prologue on the
    globally sharded array, so no global-offset plumbing is needed.

    ``transport`` (a ``TransportD3Q7``; compressed, T=1 only) builds the
    coupled step ``(s, g) -> (s', g')`` advancing phase-confined D3Q7
    tracers alongside the flow (``TransportRK3D._step_impl``): the tracer
    collides on the in-window pre-collision flow fields and streams in
    the same pass; the hard interface bounce-back applies as a jnp
    epilogue (it reads post-stream neighbors, which would cost an extra
    halo slab in-window).

    Returns None when the domain does not slab-decompose, VMEM would
    overflow, or a BC kind is unsupported in-kernel.
    """
    nz, ny, nx = geometry.shape
    T = int(steps_per_call)
    compressed = state_mode == "compressed"
    is_local = local_nz is not None
    if is_local and (not compressed or T != 1):
        return None
    if local_ny is not None:
        # (z, y)-sharded decomposition: the shard's y extent is the local
        # width plus the exchanged sublane halos; the kernel treats it as
        # its periodic width (wrap contamination stays in the >= 4-deep
        # pad rings, sliced off by the caller)
        if not is_local:
            return None
        ny = int(local_ny)
    has_transport = transport is not None
    if has_transport and (not compressed or T != 1):
        return None
    bf16 = storage == "bf16"
    # bf16 composes with the coupled-transport kernel (flow planes only:
    # tracer PDFs stay f32 so tracer mass conservation is unaffected);
    # the sharded path stays f32-only.
    if bf16 and (not compressed or is_local):
        return None
    # y-tiling (2-D grid over z-blocks x y-tiles): cuts the in-window
    # cross-section so deeper z-blocks fit VMEM — halo amplification
    # (R+2H)/R * (TY+2H)/TY beats the full-width (R'+2H)/R' whenever the
    # full cross-section caps R' low (128^3 f32 stalls at R'=8, factor
    # 2.0; R=32/TY=32 gives 1.56).  T=1 only: the window shrinks by one
    # validity ring per stencil application in y exactly as in z, and
    # H rings absorb one sub-step; BC slabs stay in the jnp prologue.
    tiled = tile_y is not None
    if tiled and (not compressed or is_local or has_transport or T != 1):
        return None
    if has_transport:
        NT = int(transport.num_tracers)
        tau_tr = tuple(float(t) for t in transport.tau)
        JC = np.asarray(transport.j_coeffs, np.float64)  # (NT, 7)
        tr_crit = float(transport.criteria)
        tr_mode = transport.interface_mode
        if tr_mode not in ("none", "bounceback"):
            return None
        # D3Q7 directions/opposites (e components are (x, y, z))
        E7 = ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
              (0, 0, 1), (0, 0, -1))
        OPP7 = (2, 1, 4, 3, 6, 5)
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
    # halo at the pure physics depth; in-window BC rewrites are only
    # needed for temporal blocking.
    bc_in_kernel = has_bcs and T > 1
    # halo depth: 4 rings physics per sub-step, +1 when the in-window BC
    # ghost copies shrink the range (they read z+-1)
    need = (5 if bc_in_kernel else 4) * T

    def _pick_h(r):
        for d in range(need, r + 1):
            if r % d == 0 and grid_nz % d == 0:
                return d
        return None

    n_state = 20 if compressed else 38
    if slabs_per_block is None:
        # empirical VMEM model (v5e 128 MB; stage-sliced intermediates
        # keep Mosaic's scoped usage ~2x the window-plane estimate).
        # Geometry costs 10 window planes of VMEM: 4 packed inputs plus
        # the 6 decoded logical channels.
        n_tr = 9 * NT if has_transport else 0
        # buffer bytes follow the storage dtype (bf16 windows are 2-byte,
        # which is what lets R=16 — halo amplification 1.5 — fit where
        # f32 stalls at R=8); the kernel's f32 scoped intermediates keep
        # the other half of the empirical 2x headroom pinned at 4 bytes.
        bpe = 2 if bf16 else 4
        for r in (64, 32, 16, 8, 4, 2) if tiled else (32, 16, 8, 4, 2):
            if grid_nz % r:
                continue
            h = _pick_h(r)
            if h is None:
                continue
            hy = max(8, -(-h // 8) * 8)  # sublane-aligned y-halo depth
            wy = (tile_y + 2 * hy) if tiled else ny
            oy = tile_y if tiled else ny
            planes = (n_state + 10 + n_tr) * (r + 2 * h)
            mb = (planes * wy + (n_state + n_tr) * r * oy) * \
                nx * (bpe + 4.0) / 2**20
            if mb <= 110:
                slabs_per_block = r
                break
        else:
            # full-width windows don't fit at any R (large ny*nx
            # cross-section, e.g. 256^3): fall back to y-tiling
            # automatically so model-level "auto" callers get the fused
            # kernel instead of a silent jnp fallback
            if (not tiled and compressed and not is_local and
                    not has_transport and T == 1):
                for ty in (32, 64, 16):
                    if ny % ty == 0:
                        alt = build_cg3d_fused_step(
                            geometry, params, dtype,
                            steps_per_call=T, bc_config=bc_config,
                            state_mode=state_mode, storage=storage,
                            tile_y=ty, vmem_limit_mb=vmem_limit_mb,
                            interpret=interpret)
                        if alt is not None:
                            return alt
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
    if tiled:
        TY = int(tile_y)
        # y-halo depth: the physics needs H rings (same windowed-validity
        # argument as z), but Mosaic requires sublane-dim block extents to
        # be multiples of 8 — so the y halos are fetched HY >= H deep and
        # the extra rings simply widen the valid interior margin.
        HY = max(8, -(-H // 8) * 8)
        if ny % TY or TY % HY or ny % HY:
            return None
        W_y = TY + 2 * HY
        nby = ny // TY
        yb = ny // HY

    lat = D3Q19
    e = lat.e
    w_lat = lat.w
    opp = lat.opp
    Q = lat.q

    _, wet_solid = wetting_masks_nd(geometry.is_solid, lat)
    has_wetting = bool(wet_solid.any())
    geo_np = geo_stack3(geometry)
    n_geo = geo_np.shape[0]
    # bf16 storage carries the geometry planes in bf16 too: the code plane
    # values (1, 2, -den_inv) decode exactly at the 0.5/1.5 thresholds, and
    # bf16 normals (~2e-3) are within the mode's storage tolerance.  Saves
    # ~3 MB of VMEM window at 128^2 cross-sections - the difference between
    # R=8 (halo amplification 2.0) and R=16 (1.5) fitting.
    geo_dtype = jnp.bfloat16 if bf16 else dtype
    geo_dev = jnp.asarray(geo_np, geo_dtype)

    theta = math.radians(params.contact_angle_deg)
    cos_t, sin_t = -math.cos(theta), math.sin(theta)  # Akai complement
    sigma = float(params.surface_tension)
    beta = float(params.beta)
    delta = float(params.delta)
    tau_r, tau_b = float(params.tau_r), float(params.tau_b)
    bf = tuple(float(v) for v in params.body_force)

    def shx(a, d):
        return _rollxy(a, d, 0, nx, ny)

    def shy(a, d):
        return _rollxy(a, 0, d, nx, ny)

    def _grad3d(a, w_ax, w_diag):
        """(gx, gy, gz) of the D3Q19 stencil Σ_i w_i e_i a(x+e_i) on the
        range shrunk by one slab per side, separably: edge taps are axis
        shifts of orthogonal-axis row sums; z taps are slices.  The four
        x/y neighbor rolls run once on the full range (qz needs them) and
        feed qx/qy as z-slices — 8 rolls per field instead of 12."""
        pE, pW = shx(a, 1), shx(a, -1)
        pN, pS = shy(a, 1), shy(a, -1)
        pUD = _zsh(a, 1, 1) + _zsh(a, -1, 1)
        am = _zcut(a, 1)
        qx = w_ax * am + w_diag * (_zcut(pN, 1) + _zcut(pS, 1) + pUD)
        qy = w_ax * am + w_diag * (_zcut(pE, 1) + _zcut(pW, 1) + pUD)
        qz = w_ax * a + w_diag * (pE + pW + pN + pS)
        gx = shx(qx, 1) - shx(qx, -1)
        gy = shy(qy, 1) - shy(qy, -1)
        gz = _zsh(qz, 1, 1) - _zsh(qz, -1, 1)
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
    # Input rho_r/rho_b/rho valid on a window range of length n; returns
    #   rinv, phi       on the same range            (offset 0)
    #   g, g2, g_rinv   shrunk by 2 slabs per side   (offset 2)
    #   force           shrunk by 3 slabs per side   (offset 3)
    # Geometry channels arrive full-range and are sliced per stage via
    # `gcut(ch, k)` where k is the *absolute* window offset.
    def _fields(rho_r, rho_b, rho, gcut):
        rho_safe = jnp.where(rho > 0, rho, 1.0)
        rinv = 1.0 / rho_safe
        phi = jnp.where(rho != 0, (rho_r - rho_b) * rinv, 0.0) * gcut(0, 0)

        if has_wetting:
            # phi pre-masked by fl; static denominator rides as den_inv.
            # phi_ext valid on offset 1.
            pm = _zcut(phi, 1)
            pEm, pWm = shx(pm, 1), shx(pm, -1)
            pNm, pSm = shy(pm, 1), shy(pm, -1)
            pUD = _zsh(phi, 1, 1) + _zsh(phi, -1, 1)
            pnsud = pNm + pSm + pUD
            num = (1.0 / 18.0) * (pEm + pWm + pnsud) + (1.0 / 36.0) * (
                shx(pnsud, 1) + shx(pnsud, -1) +
                shy(pUD, 1) + shy(pUD, -1))
            phi_ext = jnp.where(gcut(0, 1) > 0.5, pm, num * gcut(5, 1))
        else:
            phi_ext = _zcut(phi, 1)

        # isotropic gradient 3 Σ w_i e_i phi_ext(x+e_i): offset 2
        g = list(_grad3d(phi_ext, 1.0 / 6.0, 1.0 / 12.0))

        if has_wetting:
            g2w = g[0] * g[0] + g[1] * g[1] + g[2] * g[2]
            safe = g2w > _EPS * _EPS
            g_rinvw = jax.lax.rsqrt(jnp.where(safe, g2w, 1.0))
            norm = g2w * g_rinvw
            u = [jnp.where(safe, -c * g_rinvw, 0.0) for c in g]
            nsv = (gcut(2, 2), gcut(3, 2), gcut(4, 2))
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
            wetm = gcut(1, 2) > 0.5
            for d in range(3):
                m = jnp.where(pick1, n1[d], n2[d])
                rotated = jnp.where(tie, g[d], -norm * m)
                g[d] = jnp.where(wetm, rotated, g[d])

        # curvature + CSF force (inward normal): offset 3
        g2 = g[0] * g[0] + g[1] * g[1] + g[2] * g[2]
        safe = g2 > _EPS * _EPS
        g_rinv = jnp.where(safe, jax.lax.rsqrt(jnp.where(safe, g2, 1.0)),
                           0.0)
        fl2 = gcut(0, 2)
        nh = [(-c * g_rinv) * fl2 for c in g]
        nh_st = jnp.stack(nh)
        dx_s, dy_s, dz_s = _grad3d(nh_st, 1.0 / 6.0, 1.0 / 12.0)
        dn = [[dx_s[0], dx_s[1], dx_s[2]],
              [dy_s[0], dy_s[1], dy_s[2]],
              [dz_s[0], dz_s[1], dz_s[2]]]
        nh3 = [_zcut(c, 1) for c in nh]
        g3 = [_zcut(c, 1) for c in g]
        kappa = None
        for a2 in range(3):
            for b2 in range(3):
                coef = nh3[a2] * nh3[b2] - (1.0 if a2 == b2 else 0.0)
                term = coef * dn[a2][b2]
                kappa = term if kappa is None else kappa + term
        force = [-0.5 * sigma * kappa * g3[d] for d in range(3)]
        if any(bf):
            rho3 = _zcut(rho, 3)
            for d in range(3):
                if bf[d]:
                    force[d] = force[d] + bf[d] * rho3
        fl3 = gcut(0, 3)
        force = [c * fl3 for c in force]
        return rinv, phi, g, force, g2, g_rinv

    # Collision on the offset-3 range: every input arrives pre-sliced.
    def _collide_total(ft3, rho_r3, rho_b3, rinv3, phi3, force):
        mom = [None, None, None]
        for i in range(1, Q):
            fti = ft3[i]
            for d in range(3):
                ed = float(e[i, d])
                if ed:
                    t = fti if ed == 1.0 else -fti
                    mom[d] = t if mom[d] is None else mom[d] + t
        u = [(mom[d] + 0.5 * force[d]) * rinv3 for d in range(3)]
        if params.tau_type == 1:
            a0 = 0.5 / (tau_r - 0.5) + 0.5 / (tau_b - 0.5)
            a1 = 0.5 / (tau_r - 0.5) - 0.5 / (tau_b - 0.5)
            amid = a0 + a1 * phi3
            inv_mid = amid / (0.5 * amid + 1.0)
        else:
            cr = 3.0 / (tau_r - 0.5)
            cb = 3.0 / (tau_b - 0.5)
            rho3 = rho_r3 + rho_b3
            q = (rho_r3 * cr + rho_b3 * cb) / jnp.where(rho3 > 0, rho3, 1.0)
            inv_mid = q / (3.0 + 0.5 * q)
        inv_tau = jnp.where(phi3 > delta, 1.0 / tau_r,
                            jnp.where(phi3 < -delta, 1.0 / tau_b, inv_mid))
        pref = 1.0 - 0.5 * inv_tau
        rho3 = rho_r3 + rho_b3
        feq, src = _feq_src3(jnp.where(rho3 > 0, rho3, 1.0) * 0.0 + rho3,
                             u, force)
        post = [None] * Q
        for i in range(Q):
            fti = ft3[i]
            post[i] = fti - (fti - feq[i]) * inv_tau + pref * src[i]
        return post, u

    def _seg_terms(rho_r3, rho_b3, rinv3, g3, g_rinv3):
        """(frac_r, seg dict by direction) on the offset-3 range:
        seg_opp = -seg_i."""
        frac_r = rho_r3 * rinv3
        segc = (beta * rho_r3 * rho_b3 * rinv3) * g_rinv3
        eg = {1: g3[0], 3: g3[1], 5: g3[2], 7: g3[0] + g3[1],
              9: g3[0] - g3[1], 11: g3[0] + g3[2], 13: g3[0] - g3[2],
              15: g3[1] + g3[2], 17: g3[1] - g3[2]}
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

    def _zsh_pad(a, dz: int):
        """Full-length z-shift a(z+dz) with clamp padding: the |dz| rows
        at the shifted-in edge carry garbage, which the post-BC shrink
        discards (same absorption as the old roll-wrap scheme)."""
        if dz > 0:
            return jnp.concatenate([a[dz:], a[-dz:]], axis=0)
        return jnp.concatenate([a[:-dz], a[:dz]], axis=0)

    def _zpad1(a):
        """Pad a cut-by-1 array back to full length with one (garbage)
        clamp row per side; the post-BC shrink discards those rows."""
        return jnp.concatenate([a[:1], a, a[-1:]], axis=0)

    # BC application consumes one slab per side (its ghost copies read
    # z+-1): inputs valid on length-n range, outputs on n-2 (offset +1).
    # The ghost-slab/convective cascade reads the *updated* arrays (the
    # reference applies them sequentially), so the rewrites run at full
    # length and the shrink happens at the end.
    def _apply_bcs_window_c(ft, rho_r, flf, zrowsf):
        flbf = flf > 0.5
        ft = list(ft)
        ftm = [_zcut(f, 1) for f in ft]
        rho_row = sum(ftm)
        rho_row_s = jnp.where(rho_row != 0, rho_row, 1.0)
        ratio_r = _zcut(rho_r, 1) / rho_row_s

        if inlet_kind == "velocity":
            vz = inlet_vz
            s0 = sum(ftm[i] for i in _EZ_ZERO)
            sp = sum(ftm[i] for i in _EZ_PLUS)
            rho = (s0 + 2.0 * sp) / (1.0 + vz)
            feq = _feq_vz(rho, vz)
            dsum = None
            news = {}
            for i in _EZ_MINUS:
                io = int(opp[i])
                val = feq[i] + (ftm[io] - feq[io])
                dv = val - ftm[i]
                dsum = dv if dsum is None else dsum + dv
                news[i] = val
            mf = jnp.logical_and(zrowsf == nz - 2, flbf)
            for i in _EZ_MINUS:
                ft[i] = jnp.where(mf, _zpad1(news[i]), ft[i])
            rho_r = jnp.where(mf, _zpad1(_zcut(rho_r, 1) + ratio_r * dsum),
                              rho_r)
            # ghost slab nz-1 copies the *updated* nz-2
            mf = jnp.logical_and(zrowsf == nz - 1, flbf)
            for i in range(Q):
                ft[i] = jnp.where(mf, _zsh_pad(ft[i], -1), ft[i])
            rho_r = jnp.where(mf, _zsh_pad(rho_r, -1), rho_r)

        if outlet_kind == "convective":
            for k in (2, 1, 0):
                mf = jnp.logical_and(zrowsf == k, flbf)
                for i in range(Q):
                    ft[i] = jnp.where(mf, _zsh_pad(ft[i], 1), ft[i])
                rho_r = jnp.where(mf, _zsh_pad(rho_r, 1), rho_r)
        elif outlet_kind == "dirichlet":
            ftm = [_zcut(f, 1) for f in ft]
            rho_row = sum(ftm)
            ratio_r = _zcut(rho_r, 1) / jnp.where(rho_row != 0, rho_row,
                                                  1.0)
            s0 = sum(ftm[i] for i in _EZ_ZERO)
            sm = sum(ftm[i] for i in _EZ_MINUS)
            vz = 1.0 - (s0 + 2.0 * sm) / outlet_rho
            feq = _feq_vz(outlet_rho, vz)
            dsum = None
            news = {}
            for i in _EZ_PLUS:
                io = int(opp[i])
                val = feq[i] + (ftm[io] - feq[io])
                dv = val - ftm[i]
                dsum = dv if dsum is None else dsum + dv
                news[i] = val
            mf = jnp.logical_and(zrowsf == 1, flbf)
            for i in _EZ_PLUS:
                ft[i] = jnp.where(mf, _zpad1(news[i]), ft[i])
            rho_r = jnp.where(mf, _zpad1(_zcut(rho_r, 1) + ratio_r * dsum),
                              rho_r)
            mf = jnp.logical_and(zrowsf == 0, flbf)
            for i in range(Q):
                ft[i] = jnp.where(mf, _zsh_pad(ft[i], 1), ft[i])
            rho_r = jnp.where(mf, _zsh_pad(rho_r, 1), rho_r)
        return [_zcut(f, 1) for f in ft], _zcut(rho_r, 1)

    def _apply_bcs_window(fr, fb, flf, zrowsf):
        """Split-state BC slabs: only the unknown directions are rewritten,
        split by the pre-rewrite local red fraction (mirrors
        ``ColorGradientRK3D._apply_inlet/_apply_outlet``)."""
        flbf = flf > 0.5
        fr = list(fr)
        fb = list(fb)

        if inlet_kind == "velocity":
            vz = inlet_vz
            frm = [_zcut(f, 1) for f in fr]
            fbm = [_zcut(f, 1) for f in fb]
            rho_r_row = sum(frm)
            rho_t_row = rho_r_row + sum(fbm)
            ratio = rho_r_row / jnp.where(rho_t_row != 0, rho_t_row, 1.0)
            ft = [frm[i] + fbm[i] for i in range(Q)]
            s0 = sum(ft[i] for i in _EZ_ZERO)
            sp = sum(ft[i] for i in _EZ_PLUS)
            rho = (s0 + 2.0 * sp) / (1.0 + vz)
            feq = _feq_vz(rho, vz)
            mf = jnp.logical_and(zrowsf == nz - 2, flbf)
            for i in _EZ_MINUS:
                io = int(opp[i])
                val = feq[i] + (ft[io] - feq[io])
                fr[i] = jnp.where(mf, _zpad1(ratio * val), fr[i])
                fb[i] = jnp.where(mf, _zpad1((1.0 - ratio) * val), fb[i])
            mf = jnp.logical_and(zrowsf == nz - 1, flbf)
            for i in range(Q):
                fr[i] = jnp.where(mf, _zsh_pad(fr[i], -1), fr[i])
                fb[i] = jnp.where(mf, _zsh_pad(fb[i], -1), fb[i])

        if outlet_kind == "convective":
            for k in (2, 1, 0):
                mf = jnp.logical_and(zrowsf == k, flbf)
                for i in range(Q):
                    fr[i] = jnp.where(mf, _zsh_pad(fr[i], 1), fr[i])
                    fb[i] = jnp.where(mf, _zsh_pad(fb[i], 1), fb[i])
        elif outlet_kind == "dirichlet":
            frm = [_zcut(f, 1) for f in fr]
            fbm = [_zcut(f, 1) for f in fb]
            rho_r_row = sum(frm)
            rho_t_row = rho_r_row + sum(fbm)
            ratio = rho_r_row / jnp.where(rho_t_row != 0, rho_t_row, 1.0)
            ft = [frm[i] + fbm[i] for i in range(Q)]
            s0 = sum(ft[i] for i in _EZ_ZERO)
            sm = sum(ft[i] for i in _EZ_MINUS)
            vz = 1.0 - (s0 + 2.0 * sm) / outlet_rho
            feq = _feq_vz(outlet_rho, vz)
            mf = jnp.logical_and(zrowsf == 1, flbf)
            for i in _EZ_PLUS:
                io = int(opp[i])
                val = feq[i] + (ft[io] - feq[io])
                fr[i] = jnp.where(mf, _zpad1(ratio * val), fr[i])
                fb[i] = jnp.where(mf, _zpad1((1.0 - ratio) * val), fb[i])
            mf = jnp.logical_and(zrowsf == 0, flbf)
            for i in range(Q):
                fr[i] = jnp.where(mf, _zsh_pad(fr[i], 1), fr[i])
                fb[i] = jnp.where(mf, _zsh_pad(fb[i], 1), fb[i])
        return [_zcut(f, 1) for f in fr], [_zcut(f, 1) for f in fb]

    # -- one physics sub-step ----------------------------------------------
    # Inputs valid on a length-n window range; outputs on n-8 (offset +4).
    # `gcut(ch, k)` slices geometry channel `ch` to the current range
    # shrunk by k slabs per side; `solid_sh(i, k)` gives the upwind-solid
    # mask for direction i on that range (z by slice, x/y by roll).
    def _substep_c(ft, rho_r, gcut, solid_sh, gtr=None, solid_sh7=None):
        rho = sum(ft)
        rho_b = rho - rho_r
        rinv, phi, g, force, g2, g_rinv = _fields(rho_r, rho_b, rho, gcut)
        ft3 = [_zcut(f, 3) for f in ft]
        rho_r3 = _zcut(rho_r, 3)
        rho_b3 = _zcut(rho_b, 3)
        rinv3 = _zcut(rinv, 3)
        post, u3 = _collide_total(ft3, rho_r3, rho_b3, rinv3,
                                  _zcut(phi, 3),
                              force)
        gtr_out = None
        if gtr is not None:
            # D3Q7 tracer: J-scheme collide on the pre-collision flow
            # fields (u3), pull-stream with half-way bounce-back
            # (``TransportD3Q7._step_impl``; interface repair is a jnp
            # epilogue)
            fl4 = gcut(0, 4)
            gtr_out = []
            for t in range(NT):
                g3 = [_zcut(p, 3) for p in gtr[t]]
                conc = sum(g3)
                inv_tt = 1.0 / tau_tr[t]
                ghat = [None] * 7
                eu7 = (u3[0], -u3[0], u3[1], -u3[1], u3[2], -u3[2])
                ghat[0] = g3[0] - (g3[0] - conc * float(JC[t, 0])) * inv_tt
                for i in range(1, 7):
                    geq = conc * (float(JC[t, i]) + 0.5 * eu7[i - 1])
                    ghat[i] = g3[i] - (g3[i] - geq) * inv_tt
                new = [_zcut(ghat[0], 1) * fl4]
                for i in range(1, 7):
                    dx, dy, dz = E7[i - 1]
                    io = OPP7[i - 1]
                    pulled = _rollxy(_zsh(ghat[i], -dz, 1), -dx, -dy,
                                     nx, ny)
                    new.append(jnp.where(solid_sh7(i), _zcut(ghat[io], 1),
                                         pulled) * fl4)
                gtr_out.append(new)
        g3 = [_zcut(c, 1) for c in g]
        frac_r, seg = _seg_terms(rho_r3, rho_b3, rinv3, g3, _zcut(g_rinv, 1))

        def frp(i):
            return frac_r * post[i] + seg[i] if seg[i] is not None \
                else frac_r * post[i]

        fl4 = gcut(0, 4)
        frp_c = [frp(i) for i in range(Q)]
        out_t = [_zcut(post[0], 1) * fl4]
        rho_r_new = _zcut(frp_c[0], 1)
        for i in range(1, Q):
            io = int(opp[i])
            dx, dy, dz = int(e[i, 0]), int(e[i, 1]), int(e[i, 2])
            us_i = solid_sh(i) > 0.5
            pulled = _rollxy(_zsh(post[i], -dz, 1), -dx, -dy, nx, ny)
            out_t.append(jnp.where(us_i, _zcut(post[io], 1), pulled) * fl4)
            pulled_r = _rollxy(_zsh(frp_c[i], -dz, 1), -dx, -dy, nx, ny)
            rho_r_new = rho_r_new + jnp.where(us_i, _zcut(frp_c[io], 1),
                                              pulled_r)
        if gtr is not None:
            return out_t, rho_r_new * fl4, gtr_out
        return out_t, rho_r_new * fl4

    def _substep(fr, fb, gcut, solid_sh):
        rho_r = sum(fr)
        rho_b = sum(fb)
        rho = rho_r + rho_b
        rinv, phi, g, force, g2, g_rinv = _fields(rho_r, rho_b, rho, gcut)
        ft3 = [_zcut(fr[i], 3) + _zcut(fb[i], 3) for i in range(Q)]
        rho_r3 = _zcut(rho_r, 3)
        rho_b3 = _zcut(rho_b, 3)
        rinv3 = _zcut(rinv, 3)
        post, u3 = _collide_total(ft3, rho_r3, rho_b3, rinv3,
                                  _zcut(phi, 3),
                              force)
        g3 = [_zcut(c, 1) for c in g]
        frac_r, seg = _seg_terms(rho_r3, rho_b3, rinv3, g3, _zcut(g_rinv, 1))

        def frp(i):
            return frac_r * post[i] + seg[i] if seg[i] is not None \
                else frac_r * post[i]

        fl4 = gcut(0, 4)
        frp_c = [frp(i) for i in range(Q)]
        out_r = [_zcut(frp_c[0], 1) * fl4]
        out_b = [_zcut(post[0] - frp_c[0], 1) * fl4]
        for i in range(1, Q):
            io = int(opp[i])
            dx, dy, dz = int(e[i, 0]), int(e[i, 1]), int(e[i, 2])
            us_i = solid_sh(i) > 0.5
            fb_i = post[i] - frp_c[i]
            pulled_r = _rollxy(_zsh(frp_c[i], -dz, 1), -dx, -dy, nx, ny)
            pulled_b = _rollxy(_zsh(fb_i, -dz, 1), -dx, -dy, nx, ny)
            out_r.append(jnp.where(us_i, _zcut(frp_c[io], 1), pulled_r)
                         * fl4)
            out_b.append(jnp.where(us_i, _zcut(post[io] - frp_c[io], 1),
                                   pulled_b) * fl4)
        return out_r, out_b

    shrink = 5 if bc_in_kernel else 4

    def kernel(*refs):
        if tiled:
            # 9-operand window: center, z+-H slabs, y+-HY strips, and the
            # four HxHY corner blocks (D3Q19 has z-y diagonals and the
            # stencil reaches H in z / up to HY in y, so corners reach the
            # center region).  Stitch z-strips first (leading-axis
            # concats are free), then one sublane concat (HY, TY, HY).
            (s_c, s_zu, s_zd, s_yu, s_yd, s_uu, s_ud, s_du, s_dd,
             g_c, g_zu, g_zd, g_yu, g_yd, g_uu, g_ud, g_du,
             g_dd) = refs[:18]
            outs = refs[18:]

            def _win(c, zu, zd, yu, yd, uu, ud, du, dd):
                left = jnp.concatenate([uu[:], yu[:], du[:]], axis=1)
                midv = jnp.concatenate([zu[:], c[:], zd[:]], axis=1)
                right = jnp.concatenate([ud[:], yd[:], dd[:]], axis=1)
                return jnp.concatenate([left, midv, right], axis=2)
        elif is_local:
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
            if has_transport:
                tr_c, tr_u, tr_d, trup_sl, trdn_sl = refs[10:15]
                outs = refs[15:]
                tr_u = jnp.where(first, trup_sl[:], tr_u[:])
                tr_d = jnp.where(last, trdn_sl[:], tr_d[:])
        elif compressed:
            s_c, s_u, s_d, g_c, g_u, g_d = refs[:6]
            idx = 6
            if has_transport:
                tr_c, tr_u, tr_d = refs[6:9]
                idx = 9
            outs = refs[idx:]
        else:
            fr_c, fr_u, fr_d, fb_c, fb_u, fb_d, g_c, g_u, g_d = refs[:9]
            outs = refs[9:]
        if tiled:
            geo = _win(g_c, g_zu, g_zd, g_yu, g_yd,
                       g_uu, g_ud, g_du, g_dd)
        elif is_local:
            geo = jnp.concatenate([g_u, g_c[:], g_d], axis=1)
        else:
            geo = jnp.concatenate([g_u[:], g_c[:], g_d[:]], axis=1)
        # decode the packed code plane (geo_stack3) back to the logical
        # 6-channel view [fl, wet, nsx, nsy, nsz, den_inv]; these are
        # cheap full-window selects, static across the T sub-steps
        # decode in f32: comparisons on bf16 vectors trip a Mosaic i1
        # relayout ("replicated in destination but not in source")
        code = geo[0].astype(dtype)
        one = jnp.asarray(1.0, dtype)
        zero = jnp.asarray(0.0, dtype)
        flw = jnp.where(code > 0.5, one, zero)
        wetw = jnp.where(code > 1.5, one, zero)
        den_invw = jnp.maximum(-code, zero)
        geo_d = [flw, wetw, geo[1].astype(dtype), geo[2].astype(dtype),
                 geo[3].astype(dtype), den_invw]
        solid = 1.0 - flw
        if compressed:
            if tiled:
                s = _win(s_c, s_zu, s_zd, s_yu, s_yd,
                         s_uu, s_ud, s_du, s_dd)
            elif is_local:
                s = jnp.concatenate([s_u, s_c[:], s_d], axis=1)
            else:
                s = jnp.concatenate([s_u[:], s_c[:], s_d[:]], axis=1)
            if bf16:
                # unshift to f32 once per window; all physics below is f32
                ft = [s[i].astype(dtype) + float(w_lat[i]) * flw
                      for i in range(Q)]
                rho_r = s[Q].astype(dtype) + s[Q + 1].astype(dtype)
            else:
                ft = [s[i] for i in range(Q)]
                rho_r = s[Q]
            gtr = None
            if has_transport:
                gw = jnp.concatenate([tr_u[:], tr_c[:], tr_d[:]], axis=1)
                gtr = [[gw[t * 7 + i] for i in range(7)]
                       for t in range(NT)]
        else:
            f_r = jnp.concatenate([fr_u[:], fr_c[:], fr_d[:]], axis=1)
            f_b = jnp.concatenate([fb_u[:], fb_c[:], fb_d[:]], axis=1)
            fr = [f_r[i] for i in range(Q)]
            fb = [f_b[i] for i in range(Q)]
        zrows_full = None
        is_edge = None
        if bc_in_kernel:
            i0 = pl.program_id(0)
            z_iota = jax.lax.broadcasted_iota(jnp.int32, (W, ny, nx), 0)
            zrows_full = (i0 * R - H + z_iota) % nz
            if interpret:
                start = (i0 * R - H) % nz
                is_edge = False
                for k in (0, 1, 2, nz - 2, nz - 1):
                    hit = ((k - start) % nz) < W
                    is_edge = jnp.logical_or(is_edge, hit)
        for t in range(T):
            off = t * shrink  # current absolute window offset
            if compressed:
                if bc_in_kernel:
                    flf = _zcut(flw, off)
                    zrf = _zcut(zrows_full, off)
                    if interpret:
                        ft, rho_r = jax.lax.cond(
                            is_edge,
                            lambda a: _apply_bcs_window_c(a[0], a[1],
                                                          flf, zrf),
                            lambda a: ([_zcut(f, 1) for f in a[0]],
                                       _zcut(a[1], 1)),
                            (tuple(ft), rho_r))
                    else:
                        ft, rho_r = _apply_bcs_window_c(ft, rho_r, flf,
                                                        zrf)
                base = off + (shrink - 4)

                def gcut_s(ch, k, _b=base):
                    return _zcut(geo_d[ch], _b + k)

                def solid_sh_s(i, _b=base):
                    dx, dy, dz = int(e[i, 0]), int(e[i, 1]), int(e[i, 2])
                    return _rollxy(_zsh(_zcut(solid, _b + 3), -dz, 1),
                                   -dx, -dy, nx, ny)

                if has_transport:
                    def solid_sh7_s(i, _b=base):
                        dx, dy, dz = E7[i - 1]
                        return _rollxy(
                            _zsh(_zcut(solid, _b + 3), -dz, 1),
                            -dx, -dy, nx, ny) > 0.5

                    ft, rho_r, gtr = _substep_c(ft, rho_r, gcut_s,
                                                solid_sh_s, gtr,
                                                solid_sh7_s)
                else:
                    ft, rho_r = _substep_c(ft, rho_r, gcut_s, solid_sh_s)
            else:
                if bc_in_kernel:
                    flf = _zcut(flw, off)
                    zrf = _zcut(zrows_full, off)
                    if interpret:
                        fr, fb = jax.lax.cond(
                            is_edge,
                            lambda a: _apply_bcs_window(list(a[0]),
                                                        list(a[1]),
                                                        flf, zrf),
                            lambda a: ([_zcut(f, 1) for f in a[0]],
                                       [_zcut(f, 1) for f in a[1]]),
                            (tuple(fr), tuple(fb)))
                    else:
                        fr, fb = _apply_bcs_window(fr, fb, flf, zrf)
                base = off + (shrink - 4)

                def gcut_s(ch, k, _b=base):
                    return _zcut(geo_d[ch], _b + k)

                def solid_sh_s(i, _b=base):
                    dx, dy, dz = int(e[i, 0]), int(e[i, 1]), int(e[i, 2])
                    return _rollxy(_zsh(_zcut(solid, _b + 3), -dz, 1),
                                   -dx, -dy, nx, ny)

                fr, fb = _substep(fr, fb, gcut_s, solid_sh_s)
        # final arrays valid on [T*shrink, W - T*shrink); emit [H, H+R)
        # (tiled: y keeps full W_y width throughout — wrap contamination
        # stays in the HY >= shrink halo rings — so the emit slices
        # [HY, HY+TY))
        lo = T * shrink
        o0 = H - lo

        def _oy(a, z0):
            return a[z0:z0 + R, HY:HY + TY] if tiled else a[z0:z0 + R]

        if compressed:
            out_s = outs[0]
            if bf16:
                flo = _oy(flw, H)
                for i in range(Q):
                    out_s[i] = (_oy(ft[i], o0) -
                                float(w_lat[i]) * flo).astype(jnp.bfloat16)
                rc = _oy(rho_r, o0)
                hi = rc.astype(jnp.bfloat16)
                out_s[Q] = hi
                out_s[Q + 1] = (rc - hi.astype(dtype)).astype(jnp.bfloat16)
            else:
                for i in range(Q):
                    out_s[i] = _oy(ft[i], o0)
                out_s[Q] = _oy(rho_r, o0)
            if has_transport:
                out_g = outs[1]
                for t in range(NT):
                    for i in range(7):
                        out_g[t * 7 + i] = gtr[t][i][o0:o0 + R]
            return
        out_r, out_b = outs[0], outs[1]
        for i in range(Q):
            out_r[i] = fr[i][o0:o0 + R]
            out_b[i] = fb[i][o0:o0 + R]

    n_st = (Q + 2 if bf16 else Q + 1) if compressed else Q
    st_dtype = jnp.bfloat16 if bf16 else dtype
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

    if tiled:
        ryb = R // H
        tyb = TY // HY

        def _zu(i):
            return (i * ryb - 1) % hb

        def _zd(i):
            return (i * ryb + ryb) % hb

        def _yu(j):
            return (j * tyb - 1) % yb

        def _yd(j):
            return (j * tyb + tyb) % yb

        def _tspecs(n_ch):
            return [
                pl.BlockSpec((n_ch, R, TY, nx), lambda i, j: (0, i, j, 0)),
                pl.BlockSpec((n_ch, H, TY, nx),
                             lambda i, j: (0, _zu(i), j, 0)),
                pl.BlockSpec((n_ch, H, TY, nx),
                             lambda i, j: (0, _zd(i), j, 0)),
                pl.BlockSpec((n_ch, R, HY, nx),
                             lambda i, j: (0, i, _yu(j), 0)),
                pl.BlockSpec((n_ch, R, HY, nx),
                             lambda i, j: (0, i, _yd(j), 0)),
                pl.BlockSpec((n_ch, H, HY, nx),
                             lambda i, j: (0, _zu(i), _yu(j), 0)),
                pl.BlockSpec((n_ch, H, HY, nx),
                             lambda i, j: (0, _zu(i), _yd(j), 0)),
                pl.BlockSpec((n_ch, H, HY, nx),
                             lambda i, j: (0, _zd(i), _yu(j), 0)),
                pl.BlockSpec((n_ch, H, HY, nx),
                             lambda i, j: (0, _zd(i), _yd(j), 0)),
            ]

        in_specs = _tspecs(n_st) + _tspecs(n_geo)
        out_specs = (pl.BlockSpec((n_st, R, TY, nx),
                                  lambda i, j: (0, i, j, 0)),)
        out_shape = (jax.ShapeDtypeStruct((n_st, nz, ny, nx), st_dtype),)
    elif is_local:
        slab = pl.BlockSpec((n_st, H, ny, nx), lambda i: (0, 0, 0, 0))
        gslab = pl.BlockSpec((n_geo, H, ny, nx), lambda i: (0, 0, 0, 0))
        in_specs = [center, halo_up, halo_dn, slab, slab,
                    gc, gu, gd, gslab, gslab]
        out_specs = (pl.BlockSpec((n_st, R, ny, nx),
                                  lambda i: (0, i, 0, 0)),)
        out_shape = (jax.ShapeDtypeStruct((n_st, grid_nz, ny, nx), dtype),)
        if has_transport:
            n_g = 7 * NT
            tr_slab = pl.BlockSpec((n_g, H, ny, nx),
                                   lambda i: (0, 0, 0, 0))
            in_specs += [
                pl.BlockSpec((n_g, R, ny, nx), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((n_g, H, ny, nx),
                             lambda i: (0, (i * (R // H) - 1) % hb, 0, 0)),
                pl.BlockSpec((n_g, H, ny, nx),
                             lambda i: (0, (i * (R // H) + R // H) % hb,
                                        0, 0)),
                tr_slab, tr_slab]
            out_specs = out_specs + (
                pl.BlockSpec((n_g, R, ny, nx), lambda i: (0, i, 0, 0)),)
            out_shape = out_shape + (
                jax.ShapeDtypeStruct((n_g, grid_nz, ny, nx), dtype),)
    elif compressed:
        in_specs = [center, halo_up, halo_dn, gc, gu, gd]
        out_specs = (pl.BlockSpec((n_st, R, ny, nx),
                                  lambda i: (0, i, 0, 0)),)
        out_shape = (jax.ShapeDtypeStruct((n_st, nz, ny, nx), st_dtype),)
        if has_transport:
            n_g = 7 * NT
            in_specs += [
                pl.BlockSpec((n_g, R, ny, nx), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((n_g, H, ny, nx),
                             lambda i: (0, (i * (R // H) - 1) % hb, 0, 0)),
                pl.BlockSpec((n_g, H, ny, nx),
                             lambda i: (0, (i * (R // H) + R // H) % hb,
                                        0, 0))]
            out_specs = out_specs + (
                pl.BlockSpec((n_g, R, ny, nx), lambda i: (0, i, 0, 0)),)
            out_shape = out_shape + (
                jax.ShapeDtypeStruct((n_g, nz, ny, nx), dtype),)
    else:
        in_specs = [center, halo_up, halo_dn,
                    center, halo_up, halo_dn, gc, gu, gd]
        out_specs = (pl.BlockSpec((Q, R, ny, nx), lambda i: (0, i, 0, 0)),
                     pl.BlockSpec((Q, R, ny, nx), lambda i: (0, i, 0, 0)))
        out_shape = (jax.ShapeDtypeStruct((Q, nz, ny, nx), dtype),
                     jax.ShapeDtypeStruct((Q, nz, ny, nx), dtype))

    call = pl.pallas_call(
        kernel,
        grid=(nb, nby) if tiled else (nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
            dimension_semantics=("parallel", "parallel") if tiled
            else ("parallel",)),
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

    # bf16-storage T=1 prologue: identical slab math to _bc_prologue_c,
    # on decode-slab / encode-slab accessors (only the 4-6 boundary slabs
    # round-trip through f32, so the full-state traffic stays bf16).
    wq_col = jnp.asarray(np.asarray(w_lat, np.float64), dtype) \
        .reshape(Q, 1, 1)
    fl_f = jnp.asarray(fl_np, dtype)

    def _dec_slab(s, z):
        ft_sl = s[:Q, z].astype(dtype) + wq_col * fl_f[z]
        rr = s[Q, z].astype(dtype) + s[Q + 1, z].astype(dtype)
        return ft_sl, rr

    def _enc_slab(s, z, ft_sl, rr):
        s = s.at[:Q, z].set((ft_sl - wq_col * fl_f[z]).astype(jnp.bfloat16))
        hi = rr.astype(jnp.bfloat16)
        s = s.at[Q, z].set(hi)
        s = s.at[Q + 1, z].set((rr - hi.astype(dtype)).astype(jnp.bfloat16))
        return s

    def _bc_prologue_c_bf16(s):
        if inlet_kind == "velocity":
            z = nz - 2
            m = _slab_mask(z)
            sl, rr = _dec_slab(s, z)
            s0 = sum(sl[i] for i in _EZ_ZERO)
            sp = sum(sl[i] for i in _EZ_PLUS)
            rho = (s0 + 2.0 * sp) / (1.0 + inlet_vz)
            feq = _feq_vz(rho, inlet_vz)
            tot = jnp.sum(sl, axis=0)
            ratio = rr / jnp.where(tot != 0, tot, 1.0)
            dsum = None
            new = sl
            for i in _EZ_MINUS:
                io = int(opp[i])
                val = feq[i] + (sl[io] - feq[io])
                dv = val - sl[i]
                dsum = dv if dsum is None else dsum + dv
                new = new.at[i].set(jnp.where(m, val, sl[i]))
            rr = jnp.where(m, rr + ratio * dsum, rr)
            s = _enc_slab(s, z, new, rr)
            mg = _slab_mask(nz - 1)
            gt, gr = _dec_slab(s, nz - 1)
            s = _enc_slab(s, nz - 1,
                          jnp.where(mg, new, gt), jnp.where(mg, rr, gr))
        if outlet_kind == "convective":
            for z in (2, 1, 0):
                m = _slab_mask(z)
                src_f, src_r = _dec_slab(s, z + 1)
                dst_f, dst_r = _dec_slab(s, z)
                s = _enc_slab(s, z, jnp.where(m, src_f, dst_f),
                              jnp.where(m, src_r, dst_r))
        elif outlet_kind == "dirichlet":
            z = 1
            m = _slab_mask(z)
            sl, rr = _dec_slab(s, z)
            s0 = sum(sl[i] for i in _EZ_ZERO)
            sm_ = sum(sl[i] for i in _EZ_MINUS)
            vz = 1.0 - (s0 + 2.0 * sm_) / outlet_rho
            feq = _feq_vz(outlet_rho, vz)
            tot = jnp.sum(sl, axis=0)
            ratio = rr / jnp.where(tot != 0, tot, 1.0)
            dsum = None
            new = sl
            for i in _EZ_PLUS:
                io = int(opp[i])
                val = feq[i] + (sl[io] - feq[io])
                dv = val - sl[i]
                dsum = dv if dsum is None else dsum + dv
                new = new.at[i].set(jnp.where(m, val, sl[i]))
            rr = jnp.where(m, rr + ratio * dsum, rr)
            s = _enc_slab(s, z, new, rr)
            mg = _slab_mask(0)
            gt, gr = _dec_slab(s, 1)
            dt_, dr_ = _dec_slab(s, 0)
            s = _enc_slab(s, 0, jnp.where(mg, gt, dt_),
                          jnp.where(mg, gr, dr_))
        return s

    bc_prologue = has_bcs and not bc_in_kernel
    if is_local:
        if has_transport:
            def step(s_loc, up, dn, geo_loc, gup, gdn,
                     gf_loc, gf_up, gf_dn):
                """Local coupled step on the reshaped (NT*7, ...) tracer
                stack; the interface bounce-back epilogue runs on the
                GLOBAL sharded arrays in the sharded builder."""
                return call(s_loc, s_loc, s_loc, up, dn,
                            geo_loc, geo_loc, geo_loc, gup, gdn,
                            gf_loc, gf_loc, gf_loc, gf_up, gf_dn)
        else:
            def step(s_loc, up, dn, geo_loc, gup, gdn):
                return call(s_loc, s_loc, s_loc, up, dn,
                            geo_loc, geo_loc, geo_loc, gup, gdn)[0]
        step.bc_prologue_c = _bc_prologue_c if bc_prologue else None
        step.halo_slabs = H
        return step
    if compressed and has_transport:
        from ..ops.common import shift as _shift
        _prologue_tr = _bc_prologue_c_bf16 if bf16 else _bc_prologue_c

        def step(s, g):
            """(s, g) -> (s', g'), g (NT, 7, nz, ny, nx)."""
            if bc_prologue:
                s = _prologue_tr(s)
            if bf16:
                rho_r_pre = s[Q].astype(dtype) + s[Q + 1].astype(dtype)
            else:
                rho_r_pre = s[Q]
            gf = g.reshape((NT * 7, nz, ny, nx))
            s2, g2 = call(s, s, s, geo_dev, geo_dev, geo_dev, gf, gf, gf)
            g2 = g2.reshape((NT, 7, nz, ny, nx))
            if tr_mode == "bounceback":
                # hard interface repair on the post-stream tracers with
                # the pre-collision domain mask (TransportD3Q7._step_impl)
                dom = rho_r_pre < tr_crit
                for i in range(1, 7):
                    dx, dy, dz = E7[i - 1]
                    io = OPP7[i - 1]
                    nbr_out = jnp.logical_and(
                        dom, ~_shift(dom, dx, dy, dz))
                    leaked = _shift(g2[:, i], dx, dy, dz)
                    g2 = g2.at[:, io].set(
                        jnp.where(nbr_out[None], leaked, g2[:, io]))
                    recv = jnp.logical_and(
                        ~dom, _shift(dom, -dx, -dy, -dz))
                    g2 = g2.at[:, i].set(
                        jnp.where(recv[None], 0.0, g2[:, i]))
            return s2, g2
    elif compressed:
        _prologue = _bc_prologue_c_bf16 if bf16 else _bc_prologue_c
        n_ops = 9 if tiled else 3

        def step(s, geo=None):
            # `geo` lets callers thread the packed geometry through their
            # jit boundary as a runtime parameter (step.geo carries the
            # device copy); closed-over by default, which bakes it into
            # the HLO as a constant — fine until the geometry stack gets
            # large (4 planes at 256^3 is 268 MB of serialized constant).
            g = geo_dev if geo is None else geo
            if bc_prologue:
                s = _prologue(s)
            return call(*((s,) * n_ops + (g,) * n_ops))[0]
        step.geo = geo_dev
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
                            transport=None,
                            interpret: bool = False):
    """Compressed fused D3Q19 CSF step under a z-sharded mesh.

    The domain is slab-decomposed over the mesh "y" axis (z slabs) and,
    with an "x" axis of size > 1, additionally over the sublane (y)
    dimension.  Per call, the BC prologue rewrites the boundary slabs on
    the globally sharded array (XLA SPMD lowers the slab updates to the
    owning shards); each shard then exchanges Hy sublane halo rows over
    the "x" ring, exchanges H z-halo slabs of the y-padded arrays over
    the "y" ring (so z-y diagonal corners ride along), and runs the
    local kernel on the padded width (its circular sublane rolls stay
    exact on the center rows for Hy >= 4T), slicing the center back out.
    Returns ``step(s) -> s'`` on the (20, nz, ny, nx) state, or None
    when the decomposition does not apply.
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
    n_sx = axis_sizes.get("x", 1)   # shards the sublane (y) dimension
    if nz % n_sh or ny % n_sx:
        return None
    has_tr = transport is not None
    if has_tr and n_sx > 1:
        return None  # coupled sharding: z-decomposition only
    nz_loc = nz // n_sh
    ny_loc = ny // n_sx
    # sublane halo depth: physics needs 4 rings at T=1; 8 keeps the
    # exchanged strips tile-aligned
    Hy = 8 if n_sx > 1 else 0
    if n_sx > 1 and ny_loc <= 2 * Hy:
        return None
    local = build_cg3d_fused_step(
        geometry, params, dtype, slabs_per_block, steps_per_call=1,
        bc_config=bc_config, state_mode="compressed", local_nz=nz_loc,
        local_ny=(ny_loc + 2 * Hy) if n_sx > 1 else None,
        transport=transport,
        interpret=interpret)
    if local is None:
        return None
    H = local.halo_slabs

    spec = (P(None, "y", "x", None) if n_sx > 1
            else P(None, "y", None, None))
    geo = jax.device_put(jnp.asarray(geo_stack3(geometry), dtype),
                         NamedSharding(mesh, spec))
    fwd = [(j, (j + 1) % n_sh) for j in range(n_sh)]
    bwd = [(j, (j - 1) % n_sh) for j in range(n_sh)]
    yfwd = [(j, (j + 1) % n_sx) for j in range(n_sx)]
    ybwd = [(j, (j - 1) % n_sx) for j in range(n_sx)]

    def _local_step(s_loc, geo_loc, *tr):
        def ypad(x):
            # global y periodicity (or the y-wall geometry riding in the
            # geo planes) comes from the ring permute; padding first
            # means the z-slab halos below ship y-padded rows, so the
            # z-y diagonal corner data rides along for free (same trick
            # as the 2D (y, x) builder, csf.py build_csf_sharded_step)
            lo = lax.ppermute(x[:, :, -Hy:], "x", yfwd)
            hi = lax.ppermute(x[:, :, :Hy], "x", ybwd)
            return jnp.concatenate([lo, x, hi], axis=2)

        def halo(x):
            up = lax.ppermute(x[:, -H:], "y", fwd)
            dn = lax.ppermute(x[:, :H], "y", bwd)
            return up, dn

        if n_sx > 1:
            s_loc = ypad(s_loc)
            geo_loc = ypad(geo_loc)
        up, dn = halo(s_loc)
        gup, gdn = halo(geo_loc)
        if has_tr:
            (gf_loc,) = tr
            gf_up, gf_dn = halo(gf_loc)
            return local(s_loc, up, dn, geo_loc, gup, gdn,
                         gf_loc, gf_up, gf_dn)
        out = local(s_loc, up, dn, geo_loc, gup, gdn)
        if n_sx > 1:
            out = out[:, :, Hy:Hy + ny_loc]
        return out

    prologue = getattr(local, "bc_prologue_c", None)
    if has_tr:
        from ..ops.common import shift as _shift
        NT = int(transport.num_tracers)
        tr_crit = float(transport.criteria)
        tr_mode = transport.interface_mode
        E7 = ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
              (0, 0, 1), (0, 0, -1))
        OPP7 = (2, 1, 4, 3, 6, 5)
        sharded = shard_map(_local_step, mesh=mesh,
                            in_specs=(spec, spec, spec),
                            out_specs=(spec, spec), check_vma=False)

        def step(s, g):
            """(s, g) -> (s', g'), g (NT, 7, nz, ny, nx) z-sharded.

            The hard interface bounce-back repair runs on the GLOBAL
            sharded arrays (its neighbor shifts lower to
            collective-permutes under SPMD), mirroring the single-device
            coupled step's jnp epilogue."""
            if prologue is not None:
                s = prologue(s)
            rho_r_pre = s[19]
            gf = g.reshape((NT * 7, nz, ny, nx))
            s2, g2 = sharded(s, geo, gf)
            g2 = g2.reshape((NT, 7, nz, ny, nx))
            if tr_mode == "bounceback":
                dom = rho_r_pre < tr_crit
                for i in range(1, 7):
                    dx, dy, dz = E7[i - 1]
                    io = OPP7[i - 1]
                    nbr_out = jnp.logical_and(
                        dom, ~_shift(dom, dx, dy, dz))
                    leaked = _shift(g2[:, i], dx, dy, dz)
                    g2 = g2.at[:, io].set(
                        jnp.where(nbr_out[None], leaked, g2[:, io]))
                    recv = jnp.logical_and(
                        ~dom, _shift(dom, -dx, -dy, -dz))
                    g2 = g2.at[:, i].set(
                        jnp.where(recv[None], 0.0, g2[:, i]))
            return s2, g2
    else:
        sharded = shard_map(_local_step, mesh=mesh, in_specs=(spec, spec),
                            out_specs=spec, check_vma=False)

        def step(s):
            if prologue is not None:
                s = prologue(s)
            return sharded(s, geo)

    return step
