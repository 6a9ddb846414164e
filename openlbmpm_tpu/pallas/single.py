"""Fused single-phase D2Q9 step as one Pallas TPU kernel.

One VMEM-resident pass per y-strip computes, per time step:

    rho -> u = (m + F/2)/rho -> feq -> (SRT | TRT | MRT) collision
    (+ Guo source) -> pull-streaming with half-way bounce-back ->
    Zou-He / convective boundary rows

the fused form of ``SinglePhaseD2Q9._step_impl`` (the jnp reference path,
itself the rebuild of the reference's CPU solver ``BasicD2Q9.runModeling``,
``/root/reference/ShanChen2D/SimpleD2Q9.py:221-331``), with the same
strip/halo/temporal-blocking scheme as ``pallas/csf.py``.  One sub-step
touches +-1 neighbors (stream) and the BC rewrites read one row deeper,
so H rounds 2T + 4 up to the Mosaic sublane multiple.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import Geometry
from ..lattice import D2Q9
from .csf import _rolly, _sh

__all__ = ["build_single_phase_fused_step", "build_single_sharded_step"]

_E = D2Q9.e
_W = D2Q9.w
_OPP = D2Q9.opp


def _halo_rows(steps_per_call: int) -> int:
    need = 2 * steps_per_call + 4
    return ((need + 7) // 8) * 8


def build_single_phase_fused_step(geometry: Geometry, tau: float,
                                  collision: str = "SRT",
                                  body_force=(0.0, 0.0),
                                  bc_config=None,
                                  dtype=jnp.float32,
                                  rows_per_block: int | None = None,
                                  steps_per_call: int = 1,
                                  local_ny: int | None = None,
                                  interpret: bool = False,
                                  storage: str = "f32"):
    """Build ``f (9, ny, nx) -> f'`` advancing `steps_per_call` single-phase
    time steps per call.  Returns None when the domain does not
    strip-decompose or a BC kind is unsupported in-kernel.

    ``local_ny`` builds the per-shard kernel for a y-decomposed domain
    (``build_single_sharded_step``): halo slabs + a scalar-prefetched
    global row offset, as pallas/shanchen.py."""
    ny, nx = geometry.shape
    is_local = local_ny is not None
    # bf16 shifted-PDF storage: 11 bfloat16 planes — 9 deviations
    # f_i - w_i*rho plus rho as a hi/lo bf16 pair (the
    # pallas/shanchen.py scheme at K=1); VMEM arithmetic stays f32.
    bf16 = storage == "bf16"
    if bf16 and is_local:
        return None
    grid_ny = int(local_ny) if is_local else ny
    T = int(steps_per_call)
    H = _halo_rows(T)
    if rows_per_block is None:
        # 9-plane state + tiny live set: the VMEM model of
        # pallas/shanchen.py with planes = 30 + 30 T (K = 1)
        planes = 30 + 30 * T
        budget = 110.0 * 2**20
        for r in (256, 128, 64, 32, 16, 8):
            if grid_ny % r == 0 and r % H == 0 and \
                    planes * (r + 2 * H) * nx * 4 <= budget:
                rows_per_block = r
                break
        else:
            return None
    R = rows_per_block
    if not R or grid_ny % R or R % H:
        return None
    W = R + 2 * H
    nb = grid_ny // R
    hb = grid_ny // H

    inlet_kind = getattr(bc_config, "inlet", "periodic")
    outlet_kind = getattr(bc_config, "outlet", "periodic")
    if inlet_kind not in ("periodic", "zou_he_velocity", "zou_he_pressure") \
            or outlet_kind not in ("periodic", "zou_he_pressure",
                                   "convective"):
        return None
    inlet_v = float(getattr(bc_config, "inlet_velocity", 0.0))
    inlet_rho = float(getattr(bc_config, "inlet_density", 1.0)) or 1.0
    outlet_rho = float(getattr(bc_config, "outlet_density", 1.0)) or 1.0
    has_bcs = inlet_kind != "periodic" or outlet_kind != "periodic"

    tau = float(tau)
    inv_t = 1.0 / tau
    bfx, bfy = (float(v) for v in body_force)
    has_force = bool(bfx or bfy)

    if collision == "MRT":
        from ..ops.collision import mrt_relaxation_d2q9_sc
        s_vec = mrt_relaxation_d2q9_sc(tau)
        # moment-space relaxation: only the 6 non-conserved moments relax,
        # so f' = f - Σ_a M_inv[:, a] (s_a m_a) with m = M (f - feq).
        # Fewer live planes than the dense M^-1 S M matrix at T > 1.
        M_np = np.asarray(D2Q9.M, np.float64)
        Minv_np = np.asarray(D2Q9.M_inv, np.float64)
        relax_rows = [a for a in range(9) if s_vec[a] != 0.0]
    elif collision == "TRT":
        magic = 3.0 / 16.0
        omega_p = 1.0 / tau
        omega_m = 1.0 / (magic / (tau - 0.5) + 0.5)

    fluid = geometry.is_fluid.astype(np.float64)
    geo_dev = jnp.asarray(fluid[None], dtype)

    # deferred solid masking (see _substep): valid when every fluid cell
    # in a BC ghost/convective copy-destination row has a fluid same-lane
    # source row
    _fl_np = geometry.is_fluid
    _copy_pairs = []
    if inlet_kind != "periodic":
        _copy_pairs.append((ny - 1, ny - 2))
    if outlet_kind == "convective":
        _copy_pairs += [(2, 3), (1, 2), (0, 1)]
    elif outlet_kind == "zou_he_pressure":
        _copy_pairs.append((0, 1))
    _defer_ok = T > 1 and all(bool(np.all(_fl_np[src][_fl_np[dst]]))
                              for dst, src in _copy_pairs)

    sh = functools.partial(_sh, nx=nx, w=W)

    _PAIRS9 = ((1, 3), (2, 4), (5, 7), (6, 8))

    def _feq9(rho, ux, uy):
        uu = ux * ux + uy * uy
        base = 1.0 - 1.5 * uu
        eu = [None, ux, uy, None, None, ux + uy, uy - ux, None, None]
        feq = [None] * 9
        feq[0] = float(_W[0]) * rho * base
        for i, io in _PAIRS9:
            wrho = float(_W[i]) * rho
            eui = eu[i]
            a = wrho * (base + 4.5 * (eui * eui))
            b = (3.0 * wrho) * eui
            feq[i] = a + b
            feq[io] = a - b
        return feq, eu

    def _substep(f, fl, us, final=True):
        """``final=False`` (interior sub-steps of a temporal block) skips
        the 9 solid-mask multiplies: fluid cells never read solid values
        (streaming is upwind-solid guarded; the BC ghost/convective row
        copies are covered by the static ``_defer_ok`` predicate), so only
        the last sub-step must zero solid cells before the HBM
        write-back."""
        rho = sum(f)
        rho_safe = jnp.where(rho > 0, rho, 1.0)
        rinv = 1.0 / rho_safe
        mx = f[1] - f[3] + f[5] - f[6] - f[7] + f[8]
        my = f[2] - f[4] + f[5] + f[6] - f[7] - f[8]
        if has_force:
            fx = bfx * rho
            fy = bfy * rho
            ux = (mx + 0.5 * fx) * rinv
            uy = (my + 0.5 * fy) * rinv
        else:
            ux = mx * rinv
            uy = my * rinv
        feq, eu = _feq9(rho, ux, uy)

        src = None
        if has_force:
            # Guo source w_i [3(e - u) + 9 e (e.u)] . F (ops/forcing.py)
            euL = [jnp.zeros_like(ux), ux, uy, -ux, -uy,
                   ux + uy, uy - ux, -ux - uy, ux - uy]
            uf = ux * fx + uy * fy
            src = [None] * 9
            for i in range(9):
                ex, ey = float(_E[i, 0]), float(_E[i, 1])
                ef = (ex * fx if ex else 0.0) + (ey * fy if ey else 0.0)
                src[i] = float(_W[i]) * (3.0 * (ef - uf) + 9.0 * euL[i] * ef)

        post = [None] * 9
        if collision == "SRT":
            for i in range(9):
                post[i] = f[i] - (f[i] - feq[i]) * inv_t
            if src is not None:
                pf = 1.0 - 0.5 * inv_t
                for i in range(9):
                    post[i] = post[i] + pf * src[i]
        elif collision == "TRT":
            # symmetric/antisymmetric split over opposite pairs
            post[0] = f[0] - omega_p * (f[0] - feq[0])
            for i, io in _PAIRS9:
                fs = 0.5 * (f[i] + f[io])
                fa = 0.5 * (f[i] - f[io])
                es = 0.5 * (feq[i] + feq[io])
                ea = 0.5 * (feq[i] - feq[io])
                ds = omega_p * (fs - es)
                da = omega_m * (fa - ea)
                post[i] = f[i] - ds - da
                post[io] = f[io] - ds + da
            if src is not None:
                pp = 1.0 - 0.5 * omega_p
                pm = 1.0 - 0.5 * omega_m
                post[0] = post[0] + pp * src[0]
                for i, io in _PAIRS9:
                    ev = 0.5 * (src[i] + src[io])
                    od = 0.5 * (src[i] - src[io])
                    post[i] = post[i] + pp * ev + pm * od
                    post[io] = post[io] + pp * ev - pm * od
        else:
            # MRT in moment space: m_a = (M (f - feq))_a for the 6
            # relaxing moments, f' = f - M^-1[:, a] s_a m_a; Guo source
            # rides as + src - M^-1[:, a] (s_a/2) (M src)_a, i.e. the
            # same scatter with (f - feq + src/2) -> relax, then + src.
            dfh = [f[i] - feq[i] for i in range(9)]
            if src is not None:
                dfh = [dfh[i] + 0.5 * src[i] for i in range(9)]
            post = list(f) if src is None else \
                [f[i] + src[i] for i in range(9)]
            for a in relax_rows:
                acc = None
                for b in range(9):
                    c = float(M_np[a, b])
                    if c == 0.0:
                        continue
                    t = dfh[b] if c == 1.0 else c * dfh[b]
                    acc = t if acc is None else acc + t
                ma = float(s_vec[a]) * acc
                for i in range(9):
                    c = float(Minv_np[i, a])
                    if c == 0.0:
                        continue
                    post[i] = post[i] - (ma if c == 1.0 else c * ma)

        out = [post[0] * fl if final else post[0]]
        for i in range(1, 9):
            dx, dy = int(_E[i, 0]), int(_E[i, 1])
            io = int(_OPP[i])
            pulled = jnp.where(us[i], post[io], sh(post[i], -dx, -dy))
            out.append(pulled * fl if final else pulled)
        return out

    def _apply_bcs_window(f, fl, rows_g, w=None):
        """Post-stream BC rows (``SinglePhaseD2Q9._apply_bcs``): inlet at
        row ny-2 + ghost ny-1, outlet at row 1 + ghost 0 / convective copy
        trio."""
        w = W if w is None else w
        flb = fl > 0.5
        if inlet_kind == "zou_he_velocity":
            m = jnp.logical_and(rows_g == ny - 2, flb)
            rho = (f[0] + f[1] + f[3] +
                   2.0 * (f[2] + f[5] + f[6])) / (1.0 + inlet_v)
            d13 = 0.5 * (f[1] - f[3])
            f[4] = jnp.where(m, f[2] - (2.0 / 3.0) * rho * inlet_v, f[4])
            f[7] = jnp.where(m, f[5] + d13 - rho * inlet_v / 6.0, f[7])
            f[8] = jnp.where(m, f[6] - d13 - rho * inlet_v / 6.0, f[8])
        elif inlet_kind == "zou_he_pressure":
            m = jnp.logical_and(rows_g == ny - 2, flb)
            vy = -1.0 + (f[0] + f[1] + f[3] +
                         2.0 * (f[2] + f[5] + f[6])) / inlet_rho
            d13 = 0.5 * (f[1] - f[3])
            rv = inlet_rho * vy
            f[4] = jnp.where(m, f[2] - (2.0 / 3.0) * rv, f[4])
            f[7] = jnp.where(m, f[5] + d13 - rv / 6.0, f[7])
            f[8] = jnp.where(m, f[6] - d13 - rv / 6.0, f[8])
        if inlet_kind != "periodic":
            m = jnp.logical_and(rows_g == ny - 1, flb)
            for i in range(9):
                f[i] = jnp.where(m, _rolly(f[i], -1, w), f[i])
        if outlet_kind == "zou_he_pressure":
            m = jnp.logical_and(rows_g == 1, flb)
            vy = 1.0 - (f[0] + f[1] + f[3] +
                        2.0 * (f[4] + f[7] + f[8])) / outlet_rho
            d31 = 0.5 * (f[3] - f[1])
            rv = outlet_rho * vy
            f[2] = jnp.where(m, f[4] + (2.0 / 3.0) * rv, f[2])
            f[5] = jnp.where(m, f[7] + d31 + rv / 6.0, f[5])
            f[6] = jnp.where(m, f[8] - d31 + rv / 6.0, f[6])
            m = jnp.logical_and(rows_g == 0, flb)
            for i in range(9):
                f[i] = jnp.where(m, _rolly(f[i], 1, w), f[i])
        elif outlet_kind == "convective":
            for row in (2, 1, 0):
                m = jnp.logical_and(rows_g == row, flb)
                for i in range(9):
                    f[i] = jnp.where(m, _rolly(f[i], 1, w), f[i])
        return f

    # sliced BC bands through a VMEM scratch plane (pallas/shanchen.py)
    bc_sliced = (not interpret) and R >= 16
    use_scratch = bc_sliced and has_bcs
    _seg1 = (H - 8, H + 8)
    _seg2 = (H + R - 8, H + R + 8)
    _scr_cell = []

    def _cat_rows(full, s1, s2):
        scr = _scr_cell[0]
        scr[...] = full
        scr[_seg1[0]:_seg1[1], :] = s1
        scr[_seg2[0]:_seg2[1], :] = s2
        return scr[...]

    def _seg_rows(row0, lo, ws):
        iota = jax.lax.broadcasted_iota(jnp.int32, (ws, nx), 0)
        return (row0 + lo + iota) % ny

    def _bc_sliced_apply(f, fl, row0):
        news = []
        for lo, hi in (_seg1, _seg2):
            ws = hi - lo
            fs = [p[lo:hi] for p in f]
            fs = _apply_bcs_window(fs, fl[lo:hi], _seg_rows(row0, lo, ws),
                                   ws)
            news.append(fs)
        return [_cat_rows(f[i], news[0][i], news[1][i]) for i in range(9)]

    def kernel(*refs):
        if use_scratch:
            _scr_cell[:] = [refs[-1]]
            refs = refs[:-1]
        row0_ref = None
        if is_local:
            (row0_ref, f_c, f_u, f_d, up_sl, dn_sl,
             g_c, g_u, g_d, gup_sl, gdn_sl, out) = refs
            i0 = pl.program_id(0)
            first = i0 == 0
            last = i0 == nb - 1
            f_u = jnp.where(first, up_sl[:], f_u[:])
            f_d = jnp.where(last, dn_sl[:], f_d[:])
            g_u = jnp.where(first, gup_sl[:], g_u[:])
            g_d = jnp.where(last, gdn_sl[:], g_d[:])
            geo = jnp.concatenate([g_u, g_c[:], g_d], axis=1)
            win = jnp.concatenate([f_u, f_c[:], f_d], axis=1)
        else:
            f_c, f_u, f_d, g_c, g_u, g_d, out = refs
            geo = jnp.concatenate([g_u[:], g_c[:], g_d[:]], axis=1)
            win = jnp.concatenate([f_u[:], f_c[:], f_d[:]], axis=1)
        fl = geo[0]
        if bf16:
            # unshift the stored deviations to f32 once per window
            rho_in = win[9].astype(dtype) + win[10].astype(dtype)
            f = [win[i].astype(dtype) + float(_W[i]) * rho_in
                 for i in range(9)]
        else:
            f = [win[i] for i in range(9)]
        rows_g = row0_g = None
        if has_bcs:
            i0 = pl.program_id(0)
            off = row0_ref[0] if is_local else 0
            row0_g = off + i0 * R - H
            if not bc_sliced:
                r_iota = jax.lax.broadcasted_iota(jnp.int32, (W, nx), 0)
                rows_g = (row0_g + r_iota) % ny
        solid_w = 1.0 - fl
        us = [None] + [sh(solid_w, -int(_E[i, 0]), -int(_E[i, 1])) > 0.5
                       for i in range(1, 9)]
        for _t in range(T):
            f = _substep(f, fl, us,
                         final=(not _defer_ok) or _t == T - 1)
            if has_bcs:
                if bc_sliced:
                    f = _bc_sliced_apply(f, fl, row0_g)
                else:
                    f = _apply_bcs_window(f, fl, rows_g)
        if bf16:
            fc = [f[i][H:H + R] for i in range(9)]
            rho = fc[0]
            for i in range(1, 9):
                rho = rho + fc[i]
            hi = rho.astype(jnp.bfloat16)
            for i in range(9):
                out[i] = (fc[i] - float(_W[i]) * rho).astype(jnp.bfloat16)
            out[9] = hi
            out[10] = (rho - hi.astype(dtype)).astype(jnp.bfloat16)
        else:
            for i in range(9):
                out[i] = f[i][H:H + R]

    n_f = 11 if bf16 else 9
    st_dtype = jnp.bfloat16 if bf16 else dtype
    center = pl.BlockSpec((n_f, R, nx), lambda i: (0, i, 0))
    halo_up = pl.BlockSpec((n_f, H, nx),
                           lambda i: (0, (i * (R // H) - 1) % hb, 0))
    halo_dn = pl.BlockSpec((n_f, H, nx),
                           lambda i: (0, (i * (R // H) + R // H) % hb, 0))
    gc = pl.BlockSpec((1, R, nx), lambda i: (0, i, 0))
    gu = pl.BlockSpec((1, H, nx), lambda i: (0, (i * (R // H) - 1) % hb, 0))
    gd = pl.BlockSpec((1, H, nx),
                      lambda i: (0, (i * (R // H) + R // H) % hb, 0))

    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024,
        dimension_semantics=("parallel",))
    scratch_shapes = ([pltpu.VMEM((W, nx), dtype)] if use_scratch else [])

    if is_local:
        center_l = pl.BlockSpec((9, R, nx), lambda i, s: (0, i, 0))
        hu_l = pl.BlockSpec((9, H, nx),
                            lambda i, s: (0, (i * (R // H) - 1) % hb, 0))
        hd_l = pl.BlockSpec(
            (9, H, nx), lambda i, s: (0, (i * (R // H) + R // H) % hb, 0))
        slab = pl.BlockSpec((9, H, nx), lambda i, s: (0, 0, 0))
        gc_l = pl.BlockSpec((1, R, nx), lambda i, s: (0, i, 0))
        gu_l = pl.BlockSpec((1, H, nx),
                            lambda i, s: (0, (i * (R // H) - 1) % hb, 0))
        gd_l = pl.BlockSpec(
            (1, H, nx), lambda i, s: (0, (i * (R // H) + R // H) % hb, 0))
        gslab = pl.BlockSpec((1, H, nx), lambda i, s: (0, 0, 0))
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb,),
                in_specs=[center_l, hu_l, hd_l, slab, slab,
                          gc_l, gu_l, gd_l, gslab, gslab],
                out_specs=pl.BlockSpec((9, R, nx), lambda i, s: (0, i, 0)),
                scratch_shapes=tuple(scratch_shapes)),
            out_shape=jax.ShapeDtypeStruct((9, grid_ny, nx), dtype),
            compiler_params=compiler_params,
            interpret=interpret,
        )

        def step(f_loc, up, dn, geo_loc, gup, gdn, row0):
            return call(row0, f_loc, f_loc, f_loc, up, dn,
                        geo_loc, geo_loc, geo_loc, gup, gdn)

        step.halo_rows = H
        step.defer_mask = _defer_ok
        return step

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[center, halo_up, halo_dn, gc, gu, gd],
        out_specs=pl.BlockSpec((n_f, R, nx), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_f, ny, nx), st_dtype),
        scratch_shapes=scratch_shapes,
        compiler_params=compiler_params,
        interpret=interpret,
    )

    def step(f):
        """f: (9, ny, nx) -> (9, ny, nx)."""
        return call(f, f, f, geo_dev, geo_dev, geo_dev)

    step.defer_mask = _defer_ok
    return step


def build_single_sharded_step(geometry: Geometry, tau: float,
                              collision: str, body_force, mesh,
                              bc_config=None, dtype=jnp.float32,
                              rows_per_block: int | None = None,
                              steps_per_call: int = 1,
                              interpret: bool = False):
    """Fused single-phase step under a y-sharded mesh (ppermute halo
    rows + scalar-prefetched global BC row offsets).  Returns
    ``step(f) -> f'`` on the globally sharded (9, ny, nx) state, or None
    when the decomposition does not apply."""
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    ny, nx = geometry.shape
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_sh = axis_sizes.get("y", 1)
    if axis_sizes.get("x", 1) != 1 or ny % n_sh:
        return None
    ny_loc = ny // n_sh
    local = build_single_phase_fused_step(
        geometry, tau, collision, body_force, bc_config, dtype,
        rows_per_block, steps_per_call, local_ny=ny_loc,
        interpret=interpret)
    if local is None:
        return None
    H = local.halo_rows

    spec = P(None, "y", None)
    geo = jax.device_put(
        jnp.asarray(geometry.is_fluid.astype(np.float64)[None], dtype),
        NamedSharding(mesh, spec))
    fwd = [(j, (j + 1) % n_sh) for j in range(n_sh)]
    bwd = [(j, (j - 1) % n_sh) for j in range(n_sh)]

    def _local_step(f_loc, geo_loc):
        def halo(x):
            up = lax.ppermute(x[:, -H:, :], "y", fwd)
            dn = lax.ppermute(x[:, :H, :], "y", bwd)
            return up, dn

        up, dn = halo(f_loc)
        gup, gdn = halo(geo_loc)
        row0 = jnp.reshape(
            (lax.axis_index("y") * ny_loc).astype(jnp.int32), (1,))
        return local(f_loc, up, dn, geo_loc, gup, gdn, row0)

    sharded = shard_map(_local_step, mesh=mesh, in_specs=(spec, spec),
                        out_specs=spec, check_vma=False)

    def step(f):
        return sharded(f, geo)

    return step
