"""Fused CSF color-gradient step as a single Pallas TPU kernel.

One VMEM-resident pass computes, per y-strip of the domain:

    [boundary-condition rows] -> rho/phi -> solid-phi extrapolation ->
    isotropic gradient -> contact-angle rotation -> curvature + CSF force ->
    u/tau/feq/Guo source -> (SRT | MRT) collision on the total PDF ->
    LKR recoloring -> pull-streaming with half-way bounce-back

replacing ~10 HBM passes of the jnp path (the TPU equivalent of the
reference's fused ``interactionCollisionProcess`` insight,
``/root/reference/ShanChen2D/OptimizedD2Q9GPU.py:1274``; op order follows
``runRKColorGradient2DCSF``, ``/root/reference/RKCG2D/RKD2Q9.py:1225-1493``).

Strip-mining scheme
-------------------
The grid iterates over strips of ``R`` rows spanning the full width.  The
x-direction stencils use ``pltpu.roll`` over the lane axis — since a strip
covers all of x, lane rolls give exact global periodicity.  The y-direction
needs a halo of 4 rows per sub-step on each side (stream <-
post-collision(+-1) <- force(+-1) <- gradient(+-2) <- phi_ext(+-3) <-
phi/f(+-4)); halos are fetched as two extra *blocked* inputs whose index_map
picks H-row slabs of the neighboring strips with modular wrap, so edge
strips see periodic neighbors.  Ring contamination from the window edges
never reaches the R center rows.

Temporal blocking
-----------------
The kernel is DMA-bound (a copy-only kernel with the same block specs costs
~90% of the full kernel), so ``steps_per_call`` advances T sub-steps per
launch inside VMEM: HBM traffic per time step drops by T at the price of
extra (free) compute and a halo of 4T rows.  Boundary-condition rows are
then applied *inside* the kernel before every sub-step, selected by
global-row masks ((strip_row + r) mod ny == bc_row) so every window that
sees a BC row — including wrapped halo slabs — rewrites it identically.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import Geometry, solid_normals, wetting_masks
from ..lattice import D2Q9 as D2Q9_LAT

__all__ = ["build_csf_fused_step", "build_csf_sharded_step",
           "pick_rows_per_block"]

_EPS = 1.0e-8


def _halo_rows(steps_per_call: int, variant: str = "CSF",
               transport: str | None = None) -> int:
    """Rings per sub-step (CSF: 4 — stream <- force <- gradient <- phi_ext
    <- phi; Perturbation: 2 — stream <- gradient; +1 when coupled transport
    uses hard interface bounce-back, whose post-stream repair reads
    neighbor post-stream values), rounded up to the Mosaic sublane multiple
    with a margin for the BC source rows."""
    per = 4 if variant == "CSF" else 2
    if transport == "bounceback":
        per += 1
    margin = 2 if (variant != "CSF" or transport is not None) else 0
    need = per * steps_per_call + margin
    return ((need + 7) // 8) * 8


def pick_rows_per_block(ny: int, nx: int, steps_per_call: int = 1,
                        target_vmem_mb: float = 110.0,
                        variant: str = "CSF", planes: int = 150) -> int:
    """Largest R dividing ny, multiple of H, under the VMEM budget.

    The model `planes` x (R + 2H) x nx f32 is calibrated against Mosaic's
    actual scoped-vmem usage (the compressed T=4 kernel at R=256/nx=1024
    allocates ~106 MB -> ~95 planes; v5e VMEM is 128 MB and the kernels
    request a 120 MB limit)."""
    h = _halo_rows(steps_per_call, variant)
    best = 0
    for r in range(h, ny + 1, h):
        if ny % r:
            continue
        mb = planes * (r + 2 * h) * nx * 4 / 2**20
        if mb <= target_vmem_mb:
            best = r
    return best


def _rollx(a, dx: int, nx: int):
    """Value at x of a(x + dx), periodic in x (lane axis)."""
    if dx == 0:
        return a
    return pltpu.roll(a, (-dx) % nx, axis=a.ndim - 1)


def _rolly(a, dy: int, w: int):
    """Value at row r of a(r + dy) within the strip window (row axis).

    Wrap garbage only touches the outermost |dy| rows of the window, which
    the center rows never consume.
    """
    if dy == 0:
        return a
    return pltpu.roll(a, (-dy) % w, axis=a.ndim - 2)


def _sh(a, dx: int, dy: int, nx: int, w: int):
    return _rollx(_rolly(a, dy, w), dx, nx)


# D2Q9 constants, reference ordering (lattice.py): 0 rest, 1 E, 2 N, 3 W,
# 4 S, 5 NE, 6 NW, 7 SW, 8 SE.
_E = np.array([(0, 0), (1, 0), (0, 1), (-1, 0), (0, -1),
               (1, 1), (-1, 1), (-1, -1), (1, -1)])
_W = np.array([4 / 9] + [1 / 9] * 4 + [1 / 36] * 4)
_OPP = np.array([0, 3, 4, 1, 2, 7, 8, 5, 6])


def geo_stack(geometry: Geometry) -> np.ndarray:
    """Static geometry channels consumed by the fused kernels:
    is_fluid, wet_fluid, nsx, nsy, den_inv.

    den_inv is the reciprocal of the solid-phi extrapolation denominator
    Σ_i w_i is_fluid(x+e_i) (zero where no fluid neighbor exists): the
    denominator depends only on the geometry, so hoisting it here removes
    eight static-mask rolls per sub-step from the kernel."""
    wet_fluid, _ = wetting_masks(geometry.is_solid)
    nsx, nsy = solid_normals(geometry.is_solid)
    fl = geometry.is_fluid.astype(np.float64)
    den = np.zeros_like(fl)
    for i in range(1, 9):
        dx, dy = int(_E[i, 0]), int(_E[i, 1])
        den += float(_W[i]) * np.roll(fl, (-dy, -dx), axis=(0, 1))
    den_inv = np.where(den > 0, 1.0 / np.where(den > 0, den, 1.0), 0.0)
    return np.stack([
        fl,
        wet_fluid.astype(np.float64),
        nsx, nsy,
        den_inv,
    ])


def build_csf_fused_step(geometry: Geometry, params, dtype=jnp.float32,
                         rows_per_block: int | None = None,
                         steps_per_call: int = 1,
                         bc_config=None,
                         transport_params=None,
                         state_mode: str = "split",
                         local_ny: int | None = None,
                         local_nx: int | None = None,
                         interpret: bool = False,
                         band_wetting: bool = True,
                         storage: str = "f32",
                         substep_unroll: int | None = None,
                         phi_outlet_repair: bool | None = None):
    """Build the fused step: ``(f_r, f_b) -> (f_r', f_b')``, or with
    `transport_params` the coupled step ``(f_r, f_b, g) -> (f_r', f_b',
    g')`` advancing phase-confined tracers alongside the flow (the fused
    form of ``TransportRK._step_impl``; D2Q5 SRT transport only).

    `params` is a ``ColorGradientParams`` (CSF or Perturbation variant).
    With ``steps_per_call`` = T > 1 the returned function advances T time
    steps per call; `bc_config` (a ``CGBoundaryConfig``) must then be given
    unless the domain is fully periodic, because BC rows are applied
    in-kernel between sub-steps.  Returns None when the domain does not
    strip-decompose.

    ``state_mode="compressed"`` builds the 10-plane step ``s -> s'`` with
    ``s = concat([f_total (9), rho_r (1)])``: the collision runs on the
    total PDF (``calRKCollision1TotalGPU2DSRTM``,
    ``/root/reference/RKCG2D/AcceleratedRKGPU2D.py:1804-1849``) and the
    recoloring needs only the red density, so carrying (f_total, rho_r)
    instead of (f_r, f_b) cuts HBM traffic per step from 36 to 20 planes;
    rho_r at t+1 is the streamed sum of the recolored red PDFs, computed
    in-window and never stored.

    ``local_ny`` (compressed only) builds the per-shard kernel for a
    y-decomposed domain (``build_csf_sharded_step``): the call takes the
    local (10, local_ny, nx) slab, H-row halo slabs received from the y
    neighbors over ICI, the matching local+halo geometry slabs, and the
    shard's global row offset (scalar-prefetched so BC rows resolve
    against *global* row indices).

    ``local_nx`` (with ``local_ny``; 2-D mesh decomposition) is the
    x-PADDED local width: the caller concatenates Hx halo lanes received
    from the x ring neighbors onto each side of its local columns before
    the call and slices the center after.  The kernel's circular lane
    rolls then contaminate at most 4 lanes per sub-step inward from the
    padded edges — the same validity argument as the y strip windows —
    so the center columns stay exact for Hx >= 4T.  Lane-banded fast
    paths (wetting band, banded bounce-back) key on absolute global
    column positions and are disabled.
    """
    ny, nx = geometry.shape
    if local_nx is not None:
        if local_ny is None or state_mode != "compressed":
            return None
        nx = int(local_nx)
    variant = params.variant
    is_pert = variant == "Perturbation"
    compressed = state_mode == "compressed"
    tp = transport_params
    has_transport = tp is not None
    if has_transport:
        # D2Q5 or D2Q9 tracers, SRT or anisotropic MRT.  conserve_mass is
        # a global reduction (total tracer mass) and lives as a jnp
        # epilogue composed by TransportRK._build_fused — like the
        # reference, which runs a separate cuda.reduce before its repair
        # kernel (``Transport2DRK.py:498-500``).
        if is_pert or tp.scheme not in (5, 9):
            return None
        if tp.scheme == 5:
            if tp.inlet not in ("none", "inamuro", "anti_bounce_back",
                                "zero") or tp.outlet not in ("none",
                                                             "freeflow"):
                return None
        else:
            # the reference's D2Q9 transport loop applies no tracer BCs
            # (SURVEY.md section 3.4, ``Transport2DRK.py:1385-1414``)
            if tp.inlet != "none" or tp.outlet != "none":
                return None
    tr_mode = tp.interface_mode if has_transport else None
    if tr_mode == "redistribute":
        # in-kernel part of redistribute mode = hard bounce-back confinement;
        # the front-motion mass exchange is a local jnp epilogue composed by
        # ``TransportRK.make_block_step`` (like conserve_mass)
        tr_mode = "bounceback"
    is_local = local_ny is not None
    if is_local and not compressed:
        return None  # sharded fused path is compressed-only
    # bf16 shifted-PDF storage (opt-in, compressed only): the HBM flow
    # state becomes 11 bfloat16 planes — 9 *deviations* f_i - w_i*fl plus
    # rho_r as a hi/lo bf16 pair (exact to ~2^-17, f32-grade phase field)
    # — halving the flow state's HBM traffic; all VMEM arithmetic stays
    # f32.  Composes with the coupled-transport kernel: only the FLOW
    # planes compress, tracer PDFs stay f32 (their absolute scale spans
    # conc=0..1 and the mass-conservation bar is tighter than bf16's
    # 2^-8 mantissa).  Same scheme as pallas/cg3d.py storage="bf16".
    bf16 = storage == "bf16"
    if bf16 and (not compressed or is_local):
        return None
    grid_ny = int(local_ny) if is_local else ny
    T = int(steps_per_call)
    H = _halo_rows(T, variant, tr_mode if has_transport else None)
    if rows_per_block is None:
        planes = 90 if compressed else 150
        if has_transport:
            planes += 10 * tp.num_tracers * tp.scheme
        rows_per_block = pick_rows_per_block(
            grid_ny, nx, T, variant=variant, planes=planes)
    R = rows_per_block
    if not R or grid_ny % R or R % H:
        return None
    W = R + 2 * H
    nb = grid_ny // R
    hb = grid_ny // H

    # In-kernel sub-step rolling (``substep_unroll`` = sub-steps per
    # ``lax.fori_loop`` iteration): Mosaic compiles the loop body ONCE, so
    # a T=8 kernel with unroll=4 lowers the same module size as T=4 —
    # ~3 min instead of the ~12-15 min fully-unrolled T=8 compile — while
    # keeping T=8's halo amortization.  Compressed flow-only (the loop
    # carry is the 10-plane window); interior iterations keep deferred
    # solid masking via a traced final-iteration mask.
    loop_iters = 1
    if (substep_unroll is not None and compressed and not has_transport
            and 0 < substep_unroll < T and T % substep_unroll == 0):
        loop_iters = T // substep_unroll

    inlet_kind = getattr(bc_config, "inlet", "periodic")
    outlet_kind = getattr(bc_config, "outlet", "periodic")
    if inlet_kind not in ("periodic", "neumann", "dirichlet") or \
            outlet_kind not in ("periodic", "convective", "dirichlet"):
        return None  # BC combination not supported in-kernel
    if T > 1 and bc_config is None and not (
            inlet_kind == "periodic" and outlet_kind == "periodic"):
        raise ValueError("steps_per_call > 1 requires bc_config")
    # phi Neumann repair at Dirichlet outlets (``calNeumannPhiOutlet``,
    # /root/reference/RKCG2D/AcceleratedRKGPU2D.py:1363-1380; launched at
    # RKD2Q9.py:1150,1370 and unconditionally at Transport2DRK.py:846):
    # overwrite phi on outlet rows 0 and 1 with the row-2 value so the
    # fixed outlet densities cannot manufacture a color gradient -> CSF
    # force at the open boundary.  Runs between the phi computation and
    # the solid-phi extrapolation / gradient, matching the reference
    # order.  ``phi_outlet_repair=None`` derives the default from
    # bc_config; the T=1 external-BC path passes the model's flag.
    if phi_outlet_repair is None:
        phi_repair = (outlet_kind == "dirichlet" and
                      bool(getattr(bc_config, "phi_outlet_repair", True)))
    else:
        phi_repair = bool(phi_outlet_repair)
    inlet_velocity = float(getattr(bc_config, "inlet_velocity", 0.0))
    inlet_rho_r = float(getattr(bc_config, "inlet_density_r", 1.0))
    inlet_rho_b = float(getattr(bc_config, "inlet_density_b", 0.0))
    outlet_rho = float(getattr(bc_config, "outlet_density_r", 0.0)) + \
        float(getattr(bc_config, "outlet_density_b", 1.0))

    # Deferred solid masking: interior sub-steps of a temporal block skip
    # the 10 output mask-multiplies (the last sub-step still zeroes solid
    # cells before write-back, so call outputs are bit-identical).  Safe
    # because fluid cells never read solid values — streaming is
    # upwind-solid guarded and phi is a fluid-guarded select — EXCEPT the
    # BC ghost/convective row copies, which read the same-lane neighbor
    # row.  The static predicate below checks that every fluid cell in a
    # copy-destination row has a fluid source (true for channel walls and
    # for the reference's buffer-layer pore geometries).
    _fl_np = geometry.is_fluid
    _copy_pairs = []
    if inlet_kind in ("neumann", "dirichlet"):
        _copy_pairs.append((ny - 1, ny - 2))
    if outlet_kind == "convective":
        _copy_pairs += [(2, 3), (1, 2), (0, 1)]
    elif outlet_kind == "dirichlet":
        _copy_pairs.append((0, 1))
    _defer_ok = (not has_transport and T > 1
                 and all(bool(np.all(_fl_np[src][_fl_np[dst]]))
                         for dst, src in _copy_pairs))

    # geometry channel stack: is_fluid, wet_fluid, nsx, nsy.  (Precomputing
    # more statics — stencil denominators, upwind-solid masks — was measured
    # slower: the extra geo DMA outweighs the saved in-kernel rolls.)
    wet_fluid, wet_solid = wetting_masks(geometry.is_solid)
    has_wetting = bool(wet_solid.any())
    geo_np = geo_stack(geometry)
    n_geo = geo_np.shape[0]
    geo_dev = jnp.asarray(geo_np, dtype)

    # contact_angle_deg is the red-phase angle; the Akai (type-2) rotation
    # constrains the into-blue normal = 180 deg complement -> cosine flips
    # (see models/colorgradient.py).
    theta = math.radians(params.contact_angle_deg)
    flip = -1.0 if params.wetting_type == 2 else 1.0
    cos_t, sin_t = flip * math.cos(theta), math.sin(theta)
    sigma = float(params.surface_tension)
    beta = float(params.beta)
    delta = float(params.delta)
    tau_r, tau_b = float(params.tau_r), float(params.tau_b)
    bfx, bfy = (float(v) for v in params.body_force)
    inward = params.wetting_type == 2
    sign = -1.0 if inward else 1.0
    is_mrt = params.collision == "MRT"
    # RK MRT base vector with the shear rows zeroed; they get 1/tau(x)
    s_base = np.array([0.0, 1.64, 1.54, 0.0, 1.9, 0.0, 1.9, 0.0, 0.0])
    M = D2Q9_LAT.M
    M_inv = D2Q9_LAT.M_inv
    e, w_lat, opp = _E, _W, _OPP

    sh = functools.partial(_sh, nx=nx, w=W)

    def _grad2d(a, w_ax, w_diag):
        """(gx, gy) of the 3x3 stencil Σ_i w_i e_i a(x+e_i) with axis
        weight w_ax and diagonal weight w_diag, computed separably: the
        diagonal taps are x-shifts of the (N+S) row sum, so the whole
        gradient costs 8 single-axis rolls instead of 12 roll-ops (the
        four diagonal shifts each being a double roll)."""
        pN = sh(a, 0, 1)
        pS = sh(a, 0, -1)
        pE = sh(a, 1, 0)
        pW = sh(a, -1, 0)
        q = w_ax * a + w_diag * (pN + pS)
        r = w_ax * a + w_diag * (pE + pW)
        gx = sh(q, 1, 0) - sh(q, -1, 0)
        gy = sh(r, 0, 1) - sh(r, 0, -1)
        return gx, gy

    # -- in-window boundary-condition rows ---------------------------------
    def _row_mask(rows_g, k):
        return rows_g == k

    def _apply_bcs_window(f_r, f_b, fl, rows_g, w=None):
        """Rewrite the inlet/outlet rows wherever they appear in the window
        (mirrors ``ColorGradientRK._apply_inlet/_apply_outlet``).  `w` is
        the row count of the (possibly sliced) operands."""
        w = W if w is None else w
        flb = fl > 0.5

        def set_rows(f, i, k, vals):
            m = jnp.logical_and(_row_mask(rows_g, k), flb)
            return [vals if j == i else f[j] for j in range(9)], m

        fr = [f_r[i] for i in range(9)]
        fb = [f_b[i] for i in range(9)]

        if inlet_kind == "neumann":
            # total-momentum velocity inlet on row ny-2 + ghost copy ny-1
            vy = inlet_velocity
            ft = [fr[i] + fb[i] for i in range(9)]
            rho = (ft[0] + ft[1] + ft[3] +
                   2.0 * (ft[2] + ft[5] + ft[6])) / (1.0 + vy)

            def feq_row(i):
                ey = float(e[i, 1])
                eu = ey * vy
                return rho * float(w_lat[i]) * \
                    (1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * vy * vy)
            new4 = feq_row(4) + (ft[2] - feq_row(2))
            new7 = feq_row(7) + (ft[5] - feq_row(5))
            new8 = feq_row(8) + (ft[6] - feq_row(6))
            rho_r = sum(fr)
            rho_b = sum(fb)
            tot = rho_r + rho_b
            tot_s = jnp.where(tot != 0, tot, 1.0)
            ratio_r = rho_r / tot_s
            m = jnp.logical_and(_row_mask(rows_g, ny - 2), flb)
            for i, val in ((4, new4), (7, new7), (8, new8)):
                fr[i] = jnp.where(m, ratio_r * val, fr[i])
                fb[i] = jnp.where(m, (1.0 - ratio_r) * val, fb[i])
        elif inlet_kind == "dirichlet":
            for fc, rho_t in ((fr, inlet_rho_r), (fb, inlet_rho_b)):
                rt = rho_t if rho_t != 0 else 1.0
                vy = -1.0 + (fc[0] + fc[1] + fc[3] +
                             2.0 * (fc[2] + fc[5] + fc[6])) / rt
                d13 = 0.5 * (fc[1] - fc[3])
                rv = rt * vy
                m = jnp.logical_and(_row_mask(rows_g, ny - 2), flb)
                fc[4] = jnp.where(m, fc[2] - (2.0 / 3.0) * rv, fc[4])
                fc[7] = jnp.where(m, fc[5] + d13 - rv / 6.0, fc[7])
                fc[8] = jnp.where(m, fc[6] - d13 - rv / 6.0, fc[8])
        if inlet_kind in ("neumann", "dirichlet"):
            # ghost row ny-1 copies ny-2 (value at r of roll(-1) is f[r-1])
            m = jnp.logical_and(_row_mask(rows_g, ny - 1), flb)
            for i in range(9):
                fr[i] = jnp.where(m, _rolly(fr[i], -1, w), fr[i])
                fb[i] = jnp.where(m, _rolly(fb[i], -1, w), fb[i])

        if outlet_kind == "convective":
            for k in (2, 1, 0):
                m = jnp.logical_and(_row_mask(rows_g, k), flb)
                for i in range(9):
                    fr[i] = jnp.where(m, _rolly(fr[i], 1, w), fr[i])
                    fb[i] = jnp.where(m, _rolly(fb[i], 1, w), fb[i])
        elif outlet_kind == "dirichlet":
            # total-PDF pressure outlet on row 1 + ghost copy row 0
            ft = [fr[i] + fb[i] for i in range(9)]
            vy = 1.0 - (ft[0] + ft[1] + ft[3] +
                        2.0 * (ft[4] + ft[7] + ft[8])) / outlet_rho
            d31 = 0.5 * (ft[3] - ft[1])
            rv = outlet_rho * vy
            new2 = ft[4] + (2.0 / 3.0) * rv
            new5 = ft[7] + d31 + rv / 6.0
            new6 = ft[8] - d31 + rv / 6.0
            rho_r = sum(fr)
            rho_b = sum(fb)
            tot = rho_r + rho_b
            tot_s = jnp.where(tot != 0, tot, 1.0)
            ratio_r = rho_r / tot_s
            m = jnp.logical_and(_row_mask(rows_g, 1), flb)
            for i, val in ((2, new2), (5, new5), (6, new6)):
                fr[i] = jnp.where(m, ratio_r * val, fr[i])
                fb[i] = jnp.where(m, (1.0 - ratio_r) * val, fb[i])
            m = jnp.logical_and(_row_mask(rows_g, 0), flb)
            for i in range(9):
                fr[i] = jnp.where(m, _rolly(fr[i], 1, w), fr[i])
                fb[i] = jnp.where(m, _rolly(fb[i], 1, w), fb[i])
        return fr, fb

    def _apply_bcs_window_c(ft, rho_r, fl, rows_g, w=None):
        """Compressed-state BC rows.  Per-direction color splits on BC rows
        are reconstructed from the local density ratio — exact whenever the
        inlet/outlet rows are single-phase (the reference's buffer-layer
        init guarantees this; see DEVIATIONS.md)."""
        w = W if w is None else w
        flb = fl > 0.5
        ft = list(ft)

        rho_row = sum(ft)
        rho_row_s = jnp.where(rho_row != 0, rho_row, 1.0)
        ratio_r = rho_r / rho_row_s

        if inlet_kind == "neumann":
            vy = inlet_velocity
            rho = (ft[0] + ft[1] + ft[3] +
                   2.0 * (ft[2] + ft[5] + ft[6])) / (1.0 + vy)

            def feq_row(i):
                ey = float(e[i, 1])
                eu = ey * vy
                return rho * float(w_lat[i]) * \
                    (1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * vy * vy)
            news = {4: feq_row(4) + (ft[2] - feq_row(2)),
                    7: feq_row(7) + (ft[5] - feq_row(5)),
                    8: feq_row(8) + (ft[6] - feq_row(6))}
            m = jnp.logical_and(_row_mask(rows_g, ny - 2), flb)
            delta = sum(news[i] - ft[i] for i in (4, 7, 8))
            rho_r = jnp.where(m, rho_r + ratio_r * delta, rho_r)
            for i in (4, 7, 8):
                ft[i] = jnp.where(m, news[i], ft[i])
        elif inlet_kind == "dirichlet":
            # total Zou-He with the summed per-color target densities
            rho_t = inlet_rho_r + inlet_rho_b
            vy = -1.0 + (ft[0] + ft[1] + ft[3] +
                         2.0 * (ft[2] + ft[5] + ft[6])) / rho_t
            d13 = 0.5 * (ft[1] - ft[3])
            rv = rho_t * vy
            news = {4: ft[2] - (2.0 / 3.0) * rv,
                    7: ft[5] + d13 - rv / 6.0,
                    8: ft[6] - d13 - rv / 6.0}
            m = jnp.logical_and(_row_mask(rows_g, ny - 2), flb)
            delta = sum(news[i] - ft[i] for i in (4, 7, 8))
            rho_r = jnp.where(m, rho_r + ratio_r * delta, rho_r)
            for i in (4, 7, 8):
                ft[i] = jnp.where(m, news[i], ft[i])
        if inlet_kind in ("neumann", "dirichlet"):
            m = jnp.logical_and(_row_mask(rows_g, ny - 1), flb)
            for i in range(9):
                ft[i] = jnp.where(m, _rolly(ft[i], -1, w), ft[i])
            rho_r = jnp.where(m, _rolly(rho_r, -1, w), rho_r)

        if outlet_kind == "convective":
            for k in (2, 1, 0):
                m = jnp.logical_and(_row_mask(rows_g, k), flb)
                for i in range(9):
                    ft[i] = jnp.where(m, _rolly(ft[i], 1, w), ft[i])
                rho_r = jnp.where(m, _rolly(rho_r, 1, w), rho_r)
        elif outlet_kind == "dirichlet":
            vy = 1.0 - (ft[0] + ft[1] + ft[3] +
                        2.0 * (ft[4] + ft[7] + ft[8])) / outlet_rho
            d31 = 0.5 * (ft[3] - ft[1])
            rv = outlet_rho * vy
            news = {2: ft[4] + (2.0 / 3.0) * rv,
                    5: ft[7] + d31 + rv / 6.0,
                    6: ft[8] - d31 + rv / 6.0}
            m = jnp.logical_and(_row_mask(rows_g, 1), flb)
            delta = sum(news[i] - ft[i] for i in (2, 5, 6))
            rho_r = jnp.where(m, rho_r + ratio_r * delta, rho_r)
            for i in (2, 5, 6):
                ft[i] = jnp.where(m, news[i], ft[i])
            m = jnp.logical_and(_row_mask(rows_g, 0), flb)
            for i in range(9):
                ft[i] = jnp.where(m, _rolly(ft[i], 1, w), ft[i])
            rho_r = jnp.where(m, _rolly(rho_r, 1, w), rho_r)
        return ft, rho_r

    # lane-banded wetting: when every wetting consumer column (solid with
    # a fluid neighbor, or wet fluid) lives in the first/last 128-lane
    # block — e.g. channel side walls — the solid-phi extrapolation and
    # the contact-angle rotation run on a 256-lane band
    # concat(last block, first block) whose center seam IS the true
    # periodic x-adjacency; results merge back with two aligned
    # lane-block updates, cutting the wetting arithmetic ~4x at nx=1024.
    # Consumers at the band's outer edge columns (127, nx-128) would tap
    # garbage across the band wrap, so they disable the banding.
    wet_banded = False
    if band_wetting and has_wetting and local_nx is None \
            and nx % 128 == 0 and nx // 128 >= 4:
        cons = (geometry.is_solid & (geo_np[4] > 0)).any(axis=0) | \
            wet_fluid.astype(bool).any(axis=0)
        cols = np.where(cons)[0]
        wet_banded = bool(
            cols.size and np.all((cols <= 126) | (cols >= nx - 127)))

    # Banded bounce-back streaming for rho_r (compressed CSF only): when
    # every solid column — and so every upwind-solid mask column — sits in
    # the edge lane blocks (e.g. channel side walls), the streamed red
    # density is a pure grouped-roll sum of pre-masked planes plus a
    # pointwise lane-band correction (see _substep_c); 6 x-rolls + 2
    # y-rolls and zero full-window selects instead of 12 roll-ops + 8
    # selects.
    bb_banded = False
    bb_any_solid = bool(geometry.is_solid.any())
    if compressed and not is_pert and local_nx is None \
            and nx % 128 == 0 and nx // 128 >= 4:
        if not bb_any_solid:
            bb_banded = True   # fully periodic: grouped sum, no correction
        else:
            scols = np.where(geometry.is_solid.any(axis=0))[0]
            uscols = np.unique(np.concatenate(
                [(scols - 1) % nx, scols, (scols + 1) % nx]))
            bb_banded = bool(np.all((uscols <= 127) | (uscols >= nx - 128)))

    # Mosaic has no value-level dynamic_update_slice and multi-piece
    # concatenates compile pathologically, so compiled-mode partial
    # writebacks round-trip through a (W, nx) VMEM scratch ref: full
    # plane store, two small static-offset patches, reload.  Interpret
    # mode (XLA-CPU) keeps the value-level DUS, which is cheap there.
    _scr_cell = []

    def _xband(a):
        return jnp.concatenate([a[..., nx - 128:], a[..., :128]], axis=-1)

    def _unband(full, band):
        if not _scr_cell:
            full = jax.lax.dynamic_update_slice(full, band[..., 128:],
                                                (0, 0))
            return jax.lax.dynamic_update_slice(full, band[..., :128],
                                                (0, nx - 128))
        scr = _scr_cell[0]
        scr[...] = full
        scr[:, 0:128] = band[:, 128:]
        scr[:, nx - 128:nx] = band[:, :128]
        return scr[...]

    def _rotate_wetting(gx, gy, ns_x, ns_y):
        """Contact-angle gradient rotation (Xu 2017 / Akai 2018);
        pointwise, so it runs on lane bands or the full window alike."""
        g2w = gx * gx + gy * gy
        safe = g2w > _EPS * _EPS
        g_rinvw = jax.lax.rsqrt(jnp.where(safe, g2w, 1.0))
        norm = g2w * g_rinvw
        if inward:  # Akai 2018 (wetting_type == 2)
            ux_ = jnp.where(safe, -gx * g_rinvw, 0.0)
            uy_ = jnp.where(safe, -gy * g_rinvw, 0.0)
            dot = jnp.clip(ux_ * ns_x + uy_ * ns_y, -1.0, 1.0)
            # cos(theta_gs) = dot, sin = sqrt(1 - dot^2): no arccos
            # (acos does not lower on TPU).
            sin2 = jnp.maximum(1.0 - dot * dot, 0.0)
            ok = sin2 > 1.0e-18
            rsin = jnp.where(ok, jax.lax.rsqrt(jnp.where(ok, sin2, 1.0)),
                             0.0)
            c1 = sin_t * dot * rsin
            c2 = sin_t * rsin
            n1x = (cos_t - c1) * ns_x + c2 * ux_
            n1y = (cos_t - c1) * ns_y + c2 * uy_
            n2x = (cos_t + c1) * ns_x - c2 * ux_
            n2y = (cos_t + c1) * ns_y - c2 * uy_
            d1 = (n1x - ux_) ** 2 + (n1y - uy_) ** 2
            d2 = (n2x - ux_) ** 2 + (n2y - uy_) ** 2
            pick1 = d1 < d2
            tie = d1 == d2
            mx_ = jnp.where(pick1, n1x, n2x)
            my_ = jnp.where(pick1, n1y, n2y)
            gx_new = jnp.where(tie, gx, -norm * mx_)
            gy_new = jnp.where(tie, gy, -norm * my_)
        else:  # Xu 2017 (wetting_type == 1)
            ux_ = jnp.where(safe, gx * g_rinvw, 0.0)
            uy_ = jnp.where(safe, gy * g_rinvw, 0.0)
            n1x = ns_x * cos_t - ns_y * sin_t
            n1y = ns_y * cos_t + ns_x * sin_t
            n2x = ns_x * cos_t + ns_y * sin_t
            n2y = ns_y * cos_t - ns_x * sin_t
            d1 = (ux_ - n1x) ** 2 + (uy_ - n1y) ** 2
            d2 = (ux_ - n2x) ** 2 + (uy_ - n2y) ** 2
            mx_ = jnp.where(d1 < d2, n1x,
                            jnp.where(d1 > d2, n2x, ns_x))
            my_ = jnp.where(d1 < d2, n1y,
                            jnp.where(d1 > d2, n2y, ns_y))
            gx_new = norm * mx_
            gy_new = norm * my_
        return gx_new, gy_new

    def _phi_repair_rows(phi, rg, flb):
        """calNeumannPhiOutlet (AcceleratedRKGPU2D.py:1363-1380): overwrite
        phi on the Dirichlet-outlet rows 0 and 1 with the row-2 value, run
        between the phi computation and the solid-phi extrapolation /
        gradient (RKD2Q9.py:1148-1151,1368-1371; unconditional in the
        coupled loop, Transport2DRK.py:844-847).  Global rows are
        consecutive window rows, so the copies are +1/+2 window rolls of
        the ORIGINAL phi masked to the outlet rows; sources stay in-window
        (window wrap rows fall outside the validity region the halo
        accounting already excludes).  phi is fl-masked, so a solid row-2
        source copies zero (the reference indexes phiValue[-1] there — an
        out-of-bounds quirk not reproduced; DEVIATIONS.md).

        ``rg``: scalar global row offset (compiled sliced mode — the
        repair runs on the two 16-row BC bands, which are the only window
        positions where global rows 0-2 can land, and stitches through
        the VMEM scratch plane; full-window rolls measured 4.7% of the
        flagship step) or the (W, nx) global-row iota (full-window masked
        rolls: interpret mode / small-R domains)."""
        if not phi_repair or rg is None:
            return phi
        if getattr(rg, "ndim", 2) == 0:   # sliced + scratch stitch
            segs = []
            for lo, hi in (_seg1, _seg2):
                ws = hi - lo
                seg = phi[lo:hi]
                fs = flb[lo:hi]
                rows = _seg_rows(rg, lo, ws)
                seg = jnp.where(jnp.logical_and(rows == 1, fs),
                                _rolly(seg, 1, ws), seg)
                seg = jnp.where(jnp.logical_and(rows == 0, fs),
                                _rolly(seg, 2, ws), seg)
                segs.append(seg)
            return _cat_rows(phi, segs[0], segs[1])
        wr = phi.shape[-2]
        phi = jnp.where(jnp.logical_and(rg == 1, flb),
                        _rolly(phi, 1, wr), phi)
        return jnp.where(jnp.logical_and(rg == 0, flb),
                         _rolly(phi, 2, wr), phi)

    # -- flow fields (phi, wetted gradient, CSF force) on the full window ---
    def _fields(rho_r, rho_b, rho, fl, wet, ns_x, ns_y, den_inv,
                rows_g=None):
        rho_safe = jnp.where(rho > 0, rho, 1.0)
        rinv = 1.0 / rho_safe
        # guarded select, not a mask-multiply: with deferred solid masking
        # (``_substep_c(final=False)``) solid cells may hold garbage, and
        # NaN*0 would leak NaN into the phi stencils
        phi = jnp.where(jnp.logical_and(fl > 0.5, rho != 0),
                        (rho_r - rho_b) * rinv, 0.0)
        phi = _phi_repair_rows(phi, rows_g, fl > 0.5)

        if has_wetting and wet_banded:
            shb = functools.partial(_sh, nx=256, w=W)
            phi_b = _xband(phi)
            pns = shb(phi_b, 0, 1) + shb(phi_b, 0, -1)
            num = (1.0 / 9.0) * (shb(phi_b, 1, 0) + shb(phi_b, -1, 0)
                                 + pns) + \
                (1.0 / 36.0) * (shb(pns, 1, 0) + shb(pns, -1, 0))
            ext_b = jnp.where(_xband(fl) > 0.5, phi_b,
                              num * _xband(den_inv))
            phi_ext = _unband(phi, ext_b)
        elif has_wetting:
            # phi is pre-masked by fl, so sh(phi) is already zero at solid
            # neighbors; the static denominator rides in as den_inv (zero
            # where no fluid neighbor exists).  Diagonal taps are x-shifts
            # of the (N+S) row sum (separable, as in _grad2d).
            pns = sh(phi, 0, 1) + sh(phi, 0, -1)
            num = (1.0 / 9.0) * (sh(phi, 1, 0) + sh(phi, -1, 0) + pns) + \
                (1.0 / 36.0) * (sh(pns, 1, 0) + sh(pns, -1, 0))
            phi_ext = jnp.where(fl > 0.5, phi, num * den_inv)
        else:
            phi_ext = phi

        # isotropic gradient 3 Σ w_i e_i phi_ext(x+e_i)
        gx, gy = _grad2d(phi_ext, 1.0 / 3.0, 1.0 / 12.0)

        if has_wetting and wet_banded:
            gx_b = _xband(gx)
            gy_b = _xband(gy)
            gx_new, gy_new = _rotate_wetting(gx_b, gy_b, _xband(ns_x),
                                             _xband(ns_y))
            wetm = _xband(wet) > 0.5
            gx = _unband(gx, jnp.where(wetm, gx_new, gx_b))
            gy = _unband(gy, jnp.where(wetm, gy_new, gy_b))
        elif has_wetting:
            gx_new, gy_new = _rotate_wetting(gx, gy, ns_x, ns_y)
            wetm = wet > 0.5
            gx = jnp.where(wetm, gx_new, gx)
            gy = jnp.where(wetm, gy_new, gy)

        # curvature + CSF force
        g2 = gx * gx + gy * gy
        safe = g2 > (_EPS * _EPS if inward else 0.0)
        g_rinv = jnp.where(safe, jax.lax.rsqrt(jnp.where(safe, g2, 1.0)),
                           0.0)
        # the orientation sign drops out: kappa is odd in the unit normal
        # (cubic terms) and F = sign * 0.5 sigma kappa grad(phi) is even,
        # and +-1 multiplies are exact in FP, so the inward orientation
        # (`sign`) needs no flips here — bit-identical force either way
        c_n = g_rinv * fl
        nhx = gx * c_n
        nhy = gy * c_n
        dx_nx, dy_nx = _grad2d(nhx, 1.0 / 3.0, 1.0 / 12.0)
        dx_ny, dy_ny = _grad2d(nhy, 1.0 / 3.0, 1.0 / 12.0)
        kappa = nhx * nhy * (dx_ny + dy_nx) - nhy * nhy * dx_nx \
            - nhx * nhx * dy_ny
        ks = (0.5 * sigma) * kappa
        fx = ks * gx
        fy = ks * gy
        if bfx or bfy:
            fx = fx + bfx * rho
            fy = fy + bfy * rho
        fx = fx * fl
        fy = fy * fl
        return rho_safe, rinv, phi, gx, gy, fx, fy, g2, g_rinv

    # opposite-direction pairs of the D2Q9 set (i, opp(i))
    _PAIRS = ((1, 3), (2, 4), (5, 7), (6, 8))

    def _mrt_relax(dlist, inv_tau):
        """M^-1 S M applied to the 9-plane list `dlist`, with the RK base
        relaxation vector (s1=1.64, s2=1.54, s4=s6=1.9,
        ``RKD2Q9.py:308-340``) and the pointwise 1/tau(x) on the shear
        moments; zero rows (conserved moments) are skipped.  Returns the
        list of corrections to subtract."""
        moments = []
        for a in range(9):
            acc = None
            for b in range(9):
                c = float(M[a, b])
                if c == 0.0:
                    continue
                term = dlist[b] if c == 1.0 else c * dlist[b]
                acc = term if acc is None else acc + term
            moments.append(acc)
        for a in (7, 8):
            moments[a] = moments[a] * inv_tau
        for a in (0, 3, 5):
            moments[a] = None  # s = 0 on conserved moments
        for a in (1, 2, 4, 6):
            moments[a] = moments[a] * float(s_base[a])
        corr = [None] * 9
        for i in range(9):
            acc = None
            for a in range(9):
                if moments[a] is None:
                    continue
                c = float(M_inv[i, a])
                if c == 0.0:
                    continue
                t = moments[a] if c == 1.0 else c * moments[a]
                acc = t if acc is None else acc + t
            corr[i] = acc
        return corr

    def _feq_src(rho, ux, uy, fx, fy):
        """Equilibria and Guo source terms for all 9 directions, sharing
        the ±e symmetry: feq_i/feq_opp (and src_i/src_opp) differ only in
        the sign of their odd-in-e part, so each pair costs one set of
        products.  src_i = w_i[3(e-u)·F + 9e(e·u)·F] rewritten as
        w_i[3(e·F - u·F) + 9(e·u)(e·F)]."""
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

    def _pair_sums(ft):
        """Opposite-pair sums of the total PDF, shared between the density
        (rho = ft0 + S + D), jx/jy, and the MRT moment transform."""
        return {"s1p": ft[1] + ft[3], "s2p": ft[2] + ft[4],
                "sA": ft[5] + ft[7], "sB": ft[6] + ft[8]}

    # -- shared collision on the total PDF (returns post list) -------------
    def _collide_total(ft, rho_r, rho_b, rho, rinv, phi, gx, gy, fx, fy,
                       ps=None):
        # macroscopic velocity and tau(phi)
        if is_mrt:
            # partial sums shared between jx/jy and the moment transform
            # (and, when the caller passes `ps`, with the density sum)
            if ps is None:
                ps = _pair_sums(ft)
            s1p = ps["s1p"]
            d1 = ft[1] - ft[3]
            s2p = ps["s2p"]
            d2 = ft[2] - ft[4]
            sA = ps["sA"]
            p_ = ft[5] - ft[7]
            sB = ps["sB"]
            q_ = ft[6] - ft[8]
            pq = p_ - q_
            ppq = p_ + q_
            mx = d1 + pq
            my = d2 + ppq
        else:
            mx = ft[1] - ft[3] + ft[5] - ft[6] - ft[7] + ft[8]
            my = ft[2] - ft[4] + ft[5] + ft[6] - ft[7] - ft[8]
        # jx/jy = rho u exactly (the half-force-corrected momenta); the MRT
        # equilibrium moments reuse them instead of re-multiplying rho*u
        jx = mx + 0.5 * fx
        jy = my + 0.5 * fy
        ux = jx * rinv
        uy = jy * rinv

        # inv_tau directly (one divide), tau never materialized; matched
        # viscosities (tau_r == tau_b, e.g. the flagship bench config)
        # collapse the whole interpolation to a compile-time scalar —
        # both TauTypes are exact fixpoints at tau_r == tau_b
        # (``AcceleratedRKGPU2D.py:1757-1772,1818-1833``)
        if tau_r == tau_b:
            inv_tau = 1.0 / tau_r
        elif params.tau_type == 1:
            # tau_mid = 0.5 + 1/A, A linear in phi
            a0 = 0.5 / (tau_r - 0.5) + 0.5 / (tau_b - 0.5)
            a1 = 0.5 / (tau_r - 0.5) - 0.5 / (tau_b - 0.5)
            amid = a0 + a1 * phi
            inv_mid = amid / (0.5 * amid + 1.0)
            inv_tau = jnp.where(phi > delta, 1.0 / tau_r,
                                jnp.where(phi < -delta, 1.0 / tau_b,
                                          inv_mid))
        else:
            cr = 3.0 / (tau_r - 0.5)
            cb = 3.0 / (tau_b - 0.5)
            q = (rho_r * cr + rho_b * cb) * rinv
            inv_mid = q / (3.0 + 0.5 * q)
            inv_tau = jnp.where(phi > delta, 1.0 / tau_r,
                                jnp.where(phi < -delta, 1.0 / tau_b,
                                          inv_mid))

        post = [None] * 9
        if is_mrt:
            # Moment-space MRT on the Gram-Schmidt basis (the reference
            # relaxes in moment space too: calRKCollision1TotalGPU2DMRTM +
            # moment-space Guo force, AcceleratedRKGPU2D.py:1938-2025,2027):
            # f' = f + M⁻¹[−S(m − m^eq) + (I − S/2)F_m] computed ENTIRELY
            # in moment space — the Guo force is never materialized per
            # direction.  vd_a = s_a(m_a − m_a^eq) − (1 − s_a/2)F_a for the
            # relaxed channels (closed-form m^eq = (ρ, ρ(3u²−2), ρ(1−3u²),
            # jx, −jx, jy, −jy, ρ(ux²−uy²), ρ ux uy); force moments F_m =
            # (0, 6u·F, −6u·F, Fx, −Fx, Fy, −Fy, 2(ux Fx − uy Fy),
            # ux Fy + uy Fx)); the conserved channels a=3,5 (s_a = 0)
            # contribute pure force terms whose M⁻¹ columns are e_i/6, so
            # they fold into the existing ± pair groupings (t4/t6/up/vp)
            # as fx/6, fy/6 shifts.  post_i = ft_i − (M⁻¹ vd)_i via the
            # sparse-coefficient reconstruction; ~30 fewer VPU ops per
            # sub-step than the direction-space-source form.
            a_ = ux * fx
            b_ = uy * fy
            uf = a_ + b_                     # u·F
            q7 = a_ - b_                     # ux Fx − uy Fy  (F7 / 2)
            r8 = ux * fy + uy * fx           # F8
            p1 = jx * ux
            p2 = jy * uy
            r3u2 = 3.0 * (p1 + p2)           # 3 ρ u²
            S_ = s1p + s2p
            D_ = sA + sB
            f04 = 4.0 * ft[0]
            m1 = 2.0 * D_ - S_ - f04
            m2 = D_ - 2.0 * S_ + f04
            m4 = pq - 2.0 * d1
            m6 = ppq - 2.0 * d2
            m7 = s1p - s2p
            m8 = sA - sB
            s1_, s2_ = float(s_base[1]), float(s_base[2])
            s4_, s6_ = float(s_base[4]), float(s_base[6])
            vd1 = s1_ * (m1 + 2.0 * rho - r3u2) + (3.0 * s1_ - 6.0) * uf
            vd2 = s2_ * (m2 - rho + r3u2) + (6.0 - 3.0 * s2_) * uf
            vd4 = s4_ * (m4 + jx) + (1.0 - 0.5 * s4_) * fx
            vd6 = s6_ * (m6 + jy) + (1.0 - 0.5 * s6_) * fy
            if tau_r == tau_b:
                # compile-time 1/tau: fold (1 − s/2)F into scalar coeffs
                vd7 = inv_tau * (m7 - (p1 - p2)) + (inv_tau - 2.0) * q7
                vd8 = inv_tau * (m8 - jx * uy) + (0.5 * inv_tau - 1.0) * r8
            else:
                vd7 = inv_tau * (m7 - (p1 - p2) + q7) - 2.0 * q7
                vd8 = inv_tau * (m8 - jx * uy + 0.5 * r8) - r8
            A_ = (vd1 + 2.0 * vd2) * (-1.0 / 36.0)
            B_ = (2.0 * vd1 + vd2) * (1.0 / 36.0)
            tfx = fx * (1.0 / 6.0)
            tfy = fy * (1.0 / 6.0)
            t4 = vd4 * (1.0 / 6.0)
            t6 = vd6 * (1.0 / 6.0)
            t7 = vd7 * 0.25
            t8 = vd8 * 0.25
            up = 0.5 * (t4 + t6) - (tfx + tfy)
            vp = 0.5 * (t4 - t6) + (tfy - tfx)
            t4 = t4 + tfx
            t6 = t6 + tfy
            At7 = A_ + t7
            Am7 = A_ - t7
            Bp = B_ + t8
            Bm = B_ - t8
            post[0] = ft[0] - (vd2 - vd1) * (1.0 / 9.0)
            post[1] = ft[1] - (At7 - t4)
            post[3] = ft[3] - (At7 + t4)
            post[2] = ft[2] - (Am7 - t6)
            post[4] = ft[4] - (Am7 + t6)
            post[5] = ft[5] - (Bp + up)
            post[7] = ft[7] - (Bp - up)
            post[6] = ft[6] - (Bm - vp)
            post[8] = ft[8] - (Bm + vp)
        else:
            feq, src = _feq_src(rho, ux, uy, fx, fy)
            pref = 1.0 - 0.5 * inv_tau
            for i in range(9):
                fti = ft[i]
                post[i] = fti - (fti - feq[i]) * inv_tau + pref * src[i]
        return post, ux, uy

    def _recolor_red(post, rho_r, rho_b, rinv, gx, gy, g2, g_rinv,
                     mask=None):
        """LKR red components frac_r*post_i + seg_i, sharing the ±e
        symmetry of seg (seg_opp = -seg_i).  With `mask` the factors are
        zeroed on solid cells so banded-BB streaming can treat pulls from
        solid as zero contributions."""
        if inward:
            g_rinv_e = g_rinv  # already eps-guarded
        else:
            g_rinv_e = jnp.where(g2 > _EPS * _EPS, g_rinv, 0.0)
        frac_r = rho_r * rinv
        segc = (beta * rho_r * rho_b * rinv) * g_rinv_e
        if mask is not None:
            frac_r = frac_r * mask
            segc = segc * mask
        eg = [None, gx, gy, None, None, gx + gy, gy - gx, None, None]
        fr_post = [None] * 9
        fr_post[0] = frac_r * post[0]
        for i, io in _PAIRS:
            seg = (float(w_lat[i]) * segc) * eg[i]
            fr_post[i] = frac_r * post[i] + seg
            fr_post[io] = frac_r * post[io] - seg
        return fr_post

    # -- one physics sub-step on the full window ---------------------------
    def _substep(fr, fb, fl, wet, ns_x, ns_y, den_inv, us, final=True,
                 rows_g=None):
        """fr, fb: lists of 9 (W, nx) planes -> post-stream lists.
        ``us`` is the list of static upwind-solid masks per direction.
        ``final=False`` defers the output solid masking (see
        ``_substep_c``)."""
        rho_r = sum(fr)
        rho_b = sum(fb)
        rho = rho_r + rho_b
        rho_safe, rinv, phi, gx, gy, fx, fy, g2, g_rinv = \
            _fields(rho_r, rho_b, rho, fl, wet, ns_x, ns_y, den_inv,
                    rows_g=rows_g)
        ft = [fr[i] + fb[i] for i in range(9)]
        post, _, _ = _collide_total(ft, rho_r, rho_b, rho, rinv, phi,
                                    gx, gy, fx, fy)

        # LKR recoloring (f_b' = post - f_r')
        fr_post = _recolor_red(post, rho_r, rho_b, rinv, gx, gy, g2, g_rinv)
        fb_post = [post[i] - fr_post[i] for i in range(9)]

        # pull-streaming with half-way bounce-back on the full window
        out_r = [None] * 9
        out_b = [None] * 9
        out_r[0] = fr_post[0] * fl if final else fr_post[0]
        out_b[0] = fb_post[0] * fl if final else fb_post[0]
        for i in range(1, 9):
            dx, dy = int(e[i, 0]), int(e[i, 1])
            io = int(opp[i])
            pr = jnp.where(us[i], fr_post[io], sh(fr_post[i], -dx, -dy))
            pb = jnp.where(us[i], fb_post[io], sh(fb_post[i], -dx, -dy))
            out_r[i] = pr * fl if final else pr
            out_b[i] = pb * fl if final else pb
        return out_r, out_b

    # -- compressed sub-step: (f_total list, rho_r) -> same -----------------
    def _substep_c(ft, rho_r, fl, wet, ns_x, ns_y, den_inv, us, final=True,
                   usb_f=None, rows_g=None):
        """``final=False`` (interior sub-steps of a temporal block) skips
        the 10 solid-mask multiplies on the outputs: solid-cell values are
        never read by fluid cells (streaming is upwind-solid guarded, phi
        is a fluid-guarded select, BC ghost copies are covered by the
        static ``_defer_ok`` predicate), so only the last sub-step of a
        call must zero them before the write-back to HBM."""
        if is_mrt:
            # opposite-pair partial sums feed both the density and the
            # moment transform
            ps = _pair_sums(ft)
            rho = ft[0] + ((ps["s1p"] + ps["s2p"]) + (ps["sA"] + ps["sB"]))
        else:
            ps = None
            rho = sum(ft)
        rho_b = rho - rho_r
        rho_safe, rinv, phi, gx, gy, fx, fy, g2, g_rinv = \
            _fields(rho_r, rho_b, rho, fl, wet, ns_x, ns_y, den_inv,
                    rows_g=rows_g)
        post, _, _ = _collide_total(ft, rho_r, rho_b, rho, rinv, phi,
                                    gx, gy, fx, fy, ps=ps)

        # LKR recoloring of the red component only (blue = post - red).
        # With banded bounce-back (bb_banded) the factors are pre-masked by
        # fl so pulls from solid cells contribute zero to the grouped sum.
        fr_post = _recolor_red(
            post, rho_r, rho_b, rinv, gx, gy, g2, g_rinv,
            mask=fl if (bb_banded and bb_any_solid) else None)

        # pull-stream the total PDF
        out_t = [None] * 9
        out_t[0] = post[0] * fl if final else post[0]
        for i in range(1, 9):
            dx, dy = int(e[i, 0]), int(e[i, 1])
            io = int(opp[i])
            pulled = jnp.where(us[i], post[io], sh(post[i], -dx, -dy))
            out_t[i] = pulled * fl if final else pulled

        # streamed red density.  Banded-BB form: rho_r' is a SUM of pulled
        # planes, so the nine shifts group by e_y (x-shift each member,
        # one y-roll per row group: 6 x-rolls + 2 y-rolls instead of 12
        # roll-ops), solid sources contribute zero (pre-masked factors),
        # and the bounce-back replacement Σ_i us_i·fr_post_opp(i) — nonzero
        # only in the wall lane bands — is added back as a pointwise
        # banded correction.
        if bb_banded:
            gmid = fr_post[0] + _rollx(fr_post[1], -1, nx) + \
                _rollx(fr_post[3], 1, nx)
            gup = _rolly(fr_post[2] + _rollx(fr_post[5], -1, nx) +
                         _rollx(fr_post[6], 1, nx), -1, W)
            gdn = _rolly(fr_post[4] + _rollx(fr_post[7], 1, nx) +
                         _rollx(fr_post[8], -1, nx), 1, W)
            rho_r_new = gmid + gup + gdn
            if bb_any_solid:
                corr_b = None
                for j in range(1, 9):
                    t = usb_f[j] * _xband(fr_post[j])
                    corr_b = t if corr_b is None else corr_b + t
                rho_r_new = _unband(rho_r_new,
                                    _xband(rho_r_new) + corr_b)
        else:
            rho_r_new = fr_post[0]
            for i in range(1, 9):
                dx, dy = int(e[i, 0]), int(e[i, 1])
                io = int(opp[i])
                rho_r_new = rho_r_new + jnp.where(us[i], fr_post[io],
                                                  sh(fr_post[i], -dx, -dy))
        if final:
            rho_r_new = rho_r_new * fl
        return out_t, rho_r_new

    # -- Perturbation-variant sub-step (Liu et al. 2014) --------------------
    if is_pert:
        from ..ops.colorgrad import B_CONSTANTS
        from ..ops.equilibrium import rk_constants
        c_r = rk_constants(params.alpha_r)
        c_b = rk_constants(params.alpha_b)
        a_kr, a_kb = float(params.a_kr), float(params.a_kb)
        solid_phi = float(params.solid_phi)
        if params.gradient_type == "Anisotropic":
            grad_w = np.array([0.0] + [1 / 3] * 4 + [1 / 12] * 4)
        else:
            grad_w = np.array([0.0] + [1.0] * 8)

    def _substep_pert(fr, fb, fl, us, final=True, rows_g=None):
        rho_r = sum(fr)
        rho_b = sum(fb)
        rho = rho_r + rho_b
        rho_safe = jnp.where(rho > 0, rho, 1.0)
        rinv = 1.0 / rho_safe
        flb = fl > 0.5
        phi = jnp.where(jnp.logical_and(flb, rho != 0),
                        (rho_r - rho_b) * rinv, 0.0)
        phi = _phi_repair_rows(phi, rows_g, flb)
        ft_ = [fr[i] + fb[i] for i in range(9)]
        mx = ft_[1] - ft_[3] + ft_[5] - ft_[6] - ft_[7] + ft_[8]
        my = ft_[2] - ft_[4] + ft_[5] + ft_[6] - ft_[7] - ft_[8]
        ux = mx * rinv
        uy = my * rinv
        # Grunau quadratic tau(phi)
        s1 = 2.0 * tau_r * tau_b / (tau_r + tau_b)
        s2 = 2.0 * (tau_r - s1) / delta
        s3 = -s2 / (2.0 * delta)
        t2 = 2.0 * (s1 - tau_b) / delta
        t3 = t2 / (2.0 * delta)
        tau1 = s1 + s2 * phi + s3 * phi * phi
        tau2 = s1 + t2 * phi + t3 * phi * phi
        tau = jnp.where(phi > delta, tau_r,
                        jnp.where(phi > 0.0, tau1,
                                  jnp.where(phi >= -delta, tau2, tau_b)))
        inv_tau = 1.0 / tau
        uu = ux * ux + uy * uy
        base_u = -1.5 * uu
        # pair-shared equilibria per color (quad_i = qa ± qb; r5 VPU shave)
        eu_p = {1: ux, 2: uy, 5: ux + uy, 6: uy - ux}
        post_r = [None] * 9
        post_b = [None] * 9
        feq_rs = [None] * 9
        feq_bs = [None] * 9
        q0 = float(w_lat[0]) * base_u
        feq_rs[0] = rho_r * (float(c_r[0]) + q0)
        feq_bs[0] = rho_b * (float(c_b[0]) + q0)
        for i, io in _PAIRS:
            w = float(w_lat[i])
            eui = eu_p[i]
            qa = w * (4.5 * (eui * eui) + base_u)
            qb = (3.0 * w) * eui
            ar = float(c_r[i]) + qa
            ab = float(c_b[i]) + qa
            feq_rs[i] = rho_r * (ar + qb)
            feq_rs[io] = rho_r * (ar - qb)
            feq_bs[i] = rho_b * (ab + qb)
            feq_bs[io] = rho_b * (ab - qb)
        if is_mrt:
            # per-color moment-space collision with the shared tau(phi)
            # (``calRKCollision1GPU2DMRT``, AcceleratedRKGPU2D.py:429)
            corr_r = _mrt_relax([fr[i] - feq_rs[i] for i in range(9)],
                                inv_tau)
            corr_b = _mrt_relax([fb[i] - feq_bs[i] for i in range(9)],
                                inv_tau)
            for i in range(9):
                post_r[i] = fr[i] - corr_r[i]
                post_b[i] = fb[i] - corr_b[i]
        else:
            for i in range(9):
                post_r[i] = fr[i] - (fr[i] - feq_rs[i]) * inv_tau
                post_b[i] = fb[i] - (fb[i] - feq_bs[i]) * inv_tau
        # color gradient of (rho_R - rho_B) with solidDiff on solid voxels
        diff = jnp.where(flb, rho_r - rho_b, solid_phi)
        gx, gy = _grad2d(diff, float(grad_w[1]), float(grad_w[5]))
        g2 = gx * gx + gy * gy
        gnorm = jnp.sqrt(g2)
        gsafe = g2 > 0
        g2_s = jnp.where(gsafe, g2, 1.0)
        # perturbation is pair-even (eg² and B_i shared across i/opp(i));
        # the gnorm factor kills both terms where the gradient vanishes
        eg_p = {1: gx, 2: gy, 5: gx + gy, 6: gy - gx}
        cgn = gnorm / g2_s
        gb_a = float(B_CONSTANTS[1]) * gnorm
        gb_d = float(B_CONSTANTS[5]) * gnorm
        hr = 0.5 * a_kr
        hb = 0.5 * a_kb
        p0 = (-float(B_CONSTANTS[0])) * gnorm
        post_r[0] = post_r[0] + hr * p0
        post_b[0] = post_b[0] + hb * p0
        for i, io in _PAIRS:
            egi = eg_p[i]
            p = (float(w_lat[i])) * cgn * (egi * egi) - \
                (gb_a if i < 5 else gb_d)
            pr = hr * p
            pb = hb * p
            post_r[i] = post_r[i] + pr
            post_r[io] = post_r[io] + pr
            post_b[i] = post_b[i] + pb
            post_b[io] = post_b[io] + pb
        # RK-original recoloring on the total PDF: pair-odd segments
        # (cos flips across i/opp(i); the rk-constant part is pair-equal)
        safe2 = gnorm > _EPS
        ginv = jnp.where(safe2, 1.0 / jnp.where(safe2, gnorm, 1.0), 0.0)
        frac_r = rho_r * rinv
        seg_base = beta * rho_r * rho_b * (rinv * rinv)
        lin_a = rho_r * float(c_r[1]) + rho_b * float(c_b[1])
        lin_d = rho_r * float(c_r[5]) + rho_b * float(c_b[5])
        s_a = (seg_base * lin_a) * ginv
        s_d = (seg_base * lin_d) * (ginv * float(1.0 / np.sqrt(2.0)))
        fr_post = [None] * 9
        fb_post = [None] * 9
        ft0 = post_r[0] + post_b[0]
        fr_post[0] = frac_r * ft0
        fb_post[0] = ft0 - fr_post[0]
        for i, io in _PAIRS:
            seg = (s_a if i < 5 else s_d) * eg_p[i]
            fti = post_r[i] + post_b[i]
            fto = post_r[io] + post_b[io]
            fr_post[i] = frac_r * fti + seg
            fb_post[i] = fti - fr_post[i]
            fr_post[io] = frac_r * fto - seg
            fb_post[io] = fto - fr_post[io]
        out_r = [None] * 9
        out_b = [None] * 9
        out_r[0] = fr_post[0] * fl if final else fr_post[0]
        out_b[0] = fb_post[0] * fl if final else fb_post[0]
        for i in range(1, 9):
            dx, dy = int(e[i, 0]), int(e[i, 1])
            io = int(opp[i])
            pr = jnp.where(us[i], fr_post[io], sh(fr_post[i], -dx, -dy))
            pb = jnp.where(us[i], fb_post[io], sh(fb_post[i], -dx, -dy))
            out_r[i] = pr * fl if final else pr
            out_b[i] = pb * fl if final else pb
        return out_r, out_b

    # -- compressed Perturbation sub-step ------------------------------------
    def _substep_pert_c(ft, rho_r, fl, us, final=True, rows_g=None):
        """Per-color BGK collision is linear in the PDFs with a shared
        tau(phi), so the total-PDF update needs only (rho_r, rho_b):
        feq_tot_i = rho_r c_r_i + rho_b c_b_i + rho quad_i.

        ``final=False`` defers the output solid masking (see
        ``_substep_c``); phi and the color-difference field are guarded
        selects so deferred solid garbage cannot leak through stencils."""
        rho = sum(ft)
        rho_b = rho - rho_r
        rho_safe = jnp.where(rho > 0, rho, 1.0)
        rinv = 1.0 / rho_safe
        flb = fl > 0.5
        phi = jnp.where(jnp.logical_and(flb, rho != 0),
                        (rho_r - rho_b) * rinv, 0.0)
        phi = _phi_repair_rows(phi, rows_g, flb)
        mx = ft[1] - ft[3] + ft[5] - ft[6] - ft[7] + ft[8]
        my = ft[2] - ft[4] + ft[5] + ft[6] - ft[7] - ft[8]
        ux = mx * rinv
        uy = my * rinv
        s1 = 2.0 * tau_r * tau_b / (tau_r + tau_b)
        s2 = 2.0 * (tau_r - s1) / delta
        s3 = -s2 / (2.0 * delta)
        t2 = 2.0 * (s1 - tau_b) / delta
        t3 = t2 / (2.0 * delta)
        tau1 = s1 + s2 * phi + s3 * phi * phi
        tau2 = s1 + t2 * phi + t3 * phi * phi
        tau = jnp.where(phi > delta, tau_r,
                        jnp.where(phi > 0.0, tau1,
                                  jnp.where(phi >= -delta, tau2, tau_b)))
        inv_tau = 1.0 / tau
        uu = ux * ux + uy * uy
        base_u = -1.5 * uu
        # rk_constants are 3-valued (rest / axis / diagonal), so the linear
        # part of feq_tot collapses to three shared planes; the quadratic
        # part pair-shares a ± b as in _feq_src3 (r5 VPU shave).
        lin0 = rho_r * float(c_r[0]) + rho_b * float(c_b[0])
        lin_a = rho_r * float(c_r[1]) + rho_b * float(c_b[1])
        lin_d = rho_r * float(c_r[5]) + rho_b * float(c_b[5])
        eu_p = {1: ux, 2: uy, 5: ux + uy, 6: uy - ux}
        post = [None] * 9
        feq_ts = [None] * 9
        feq_ts[0] = lin0 + rho * (float(w_lat[0]) * base_u)
        for i, io in _PAIRS:
            w = float(w_lat[i])
            eui = eu_p[i]
            a = (lin_a if i < 5 else lin_d) + \
                rho * (w * (4.5 * (eui * eui) + base_u))
            b = rho * ((3.0 * w) * eui)
            feq_ts[i] = a + b
            feq_ts[io] = a - b
        if is_mrt:
            # total-PDF moment collision (linear in the per-color PDFs)
            corr = _mrt_relax([ft[i] - feq_ts[i] for i in range(9)],
                              inv_tau)
            for i in range(9):
                post[i] = ft[i] - corr[i]
        else:
            for i in range(9):
                post[i] = ft[i] - (ft[i] - feq_ts[i]) * inv_tau
        diff = jnp.where(flb, rho_r - rho_b, solid_phi)
        gx, gy = _grad2d(diff, float(grad_w[1]), float(grad_w[5]))
        g2 = gx * gx + gy * gy
        gnorm = jnp.sqrt(g2)
        gsafe = g2 > 0
        g2_s = jnp.where(gsafe, g2, 1.0)
        a_k = 0.5 * (a_kr + a_kb)
        # perturbation is pair-even (eg² and B_i shared across i/opp(i));
        # the gnorm factor kills both terms where the gradient vanishes,
        # so no select is needed
        eg_p = {1: gx, 2: gy, 5: gx + gy, 6: gy - gx}
        cg = a_k * (gnorm / g2_s)
        gb_a = (a_k * float(B_CONSTANTS[1])) * gnorm
        gb_d = (a_k * float(B_CONSTANTS[5])) * gnorm
        post[0] = post[0] - (a_k * float(B_CONSTANTS[0])) * gnorm
        for i, io in _PAIRS:
            egi = eg_p[i]
            p = (float(w_lat[i]) * cg) * (egi * egi) - \
                (gb_a if i < 5 else gb_d)
            post[i] = post[i] + p
            post[io] = post[io] + p
        # recoloring is pair-odd: seg_opp(i) = -seg_i (cos flips, the
        # rk-constant linear part lin_a/lin_d is pair-equal)
        safe2 = gnorm > _EPS
        ginv = jnp.where(safe2, 1.0 / jnp.where(safe2, gnorm, 1.0), 0.0)
        frac_r = rho_r * rinv
        seg_base = beta * rho_r * rho_b * (rinv * rinv)
        s_a = (seg_base * lin_a) * ginv
        s_d = (seg_base * lin_d) * (ginv * float(1.0 / np.sqrt(2.0)))
        fr_post = [None] * 9
        fr_post[0] = frac_r * post[0]
        for i, io in _PAIRS:
            seg = (s_a if i < 5 else s_d) * eg_p[i]
            fr_post[i] = frac_r * post[i] + seg
            fr_post[io] = frac_r * post[io] - seg
        out_t = [None] * 9
        out_t[0] = post[0] * fl if final else post[0]
        rho_r_new = fr_post[0]
        for i in range(1, 9):
            dx, dy = int(e[i, 0]), int(e[i, 1])
            io = int(opp[i])
            pulled = jnp.where(us[i], post[io], sh(post[i], -dx, -dy))
            out_t[i] = pulled * fl if final else pulled
            rho_r_new = rho_r_new + jnp.where(us[i], fr_post[io],
                                              sh(fr_post[i], -dx, -dy))
        if final:
            rho_r_new = rho_r_new * fl
        return out_t, rho_r_new

    # -- coupled D2Q5 transport sub-step ------------------------------------
    if has_transport:
        NQ = int(tp.scheme)
        if NQ == 5:
            E5 = np.array([(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)])
            W5 = np.array([1 / 3] + [1 / 6] * 4)
            OPP5 = np.array([0, 2, 1, 4, 3])
            EN5 = np.ones(5)
        else:
            E5 = _E
            W5 = _W
            OPP5 = _OPP
            EN5 = np.sqrt((_E.astype(np.float64) ** 2).sum(axis=1))
            EN5[EN5 == 0] = 1.0
        NT = tp.num_tracers
        from ..ops.transport import j_coefficients
        JC = j_coefficients(np.asarray(tp.j0))  # (NT, 5); D2Q5 only
        tau_tr = tuple(float(t) for t in tp.tau)
        betas = tuple(float(b) for b in tp.beta_interface)
        stoich = tuple(float(s) for s in tp.reaction_stoich)
        crit = float(tp.criteria)
        tr_mrt = tp.relaxation == "MRT"
        if tr_mrt:
            from ..ops.transport import (mrt_matrices_d2q5,
                                         mrt_matrices_d2q9)
            build_u = mrt_matrices_d2q5 if NQ == 5 else mrt_matrices_d2q9
            U5 = build_u(tp.diff_x, tp.diff_y, tp.diff_xy,
                         tp.diff_yx)  # (NT, NQ, NQ), g += U(g-geq)
            tr_quad = tp.mrt_equilibrium == "quadratic"

    def _transport_substep(g, fl, rows_g, ux, uy, gx, gy, rho_r, us5):
        """g: list over NT of lists of 5 planes -> advanced tracer PDFs
        (mirrors ``TransportRK._transport_substep``); ``us5`` are the
        static upwind-solid masks for the four D2Q5 moving directions."""
        conc = [sum(g[t]) for t in range(NT)]
        in_dom = rho_r < crit
        if tr_mrt:
            # anisotropic moment collision g += U (g - geq), U constant
            # per tracer (``mrt_matrices_d2q5``; Transport2DRK.py:330-347)
            uu5 = ux * ux + uy * uy
            for t in range(NT):
                dg = []
                for i in range(NQ):
                    eu = float(E5[i, 0]) * ux + float(E5[i, 1]) * uy
                    if tr_quad:
                        fac = 1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * uu5
                    else:
                        fac = 1.0 + 3.0 * eu
                    dg.append(g[t][i] - conc[t] * (float(W5[i]) * fac))
                U = U5[t]
                new = []
                for i in range(NQ):
                    acc = g[t][i]
                    for b in range(NQ):
                        c = float(U[i, b])
                        if c == 0.0:
                            continue
                        acc = acc + (dg[b] if c == 1.0 else c * dg[b])
                    new.append(acc)
                g[t] = new
        else:
            # SRT: D2Q5 J-scheme eq C(J_i + e.u/2); D2Q9 linear eq
            # C w_i (1 + 3 e.u) (``Transport2DRK`` scheme-9 path)
            for t in range(NT):
                inv_t = 1.0 / tau_tr[t]
                for i in range(NQ):
                    eu = float(E5[i, 0]) * ux + float(E5[i, 1]) * uy
                    if NQ == 5:
                        geq = conc[t] * (float(JC[t, i]) + 0.5 * eu)
                    else:
                        geq = conc[t] * float(W5[i]) * (1.0 + 3.0 * eu)
                    g[t][i] = g[t][i] - (g[t][i] - geq) * inv_t
        # semi-permeable interface (beta partition)
        if tr_mode == "permeable" and any(betas):
            value = jnp.where(in_dom, -1.0, 0.0)
            norm = jnp.sqrt(gx * gx + gy * gy)
            safe = norm > _EPS
            norm_s = jnp.where(safe, norm, 1.0)
            ugx = jnp.where(safe, -gx / norm_s, 0.0)
            ugy = jnp.where(safe, -gy / norm_s, 0.0)
            for t in range(NT):
                if not betas[t % len(betas)]:
                    continue
                bt = betas[t % len(betas)]
                for i in range(1, NQ):
                    cos_i = (float(E5[i, 0]) * ugx +
                             float(E5[i, 1]) * ugy) / float(EN5[i])
                    g[t][i] = g[t][i] + bt * value * float(W5[i]) * \
                        cos_i * conc[t]
        # bilinear reaction A + B -> C
        if getattr(tp, "reaction_rate", 0.0):
            r = float(tp.reaction_rate) * conc[0] * conc[1]
            for t in range(NT):
                st_t = stoich[t % len(stoich)]
                for i in range(NQ):
                    jw = float(JC[t, i]) if NQ == 5 else float(W5[i])
                    g[t][i] = g[t][i] + st_t * r * jw
        flb = fl > 0.5
        # free-flow outlet before streaming (reference order)
        if tp.outlet == "freeflow":
            for row in (2, 1, 0):
                m = jnp.logical_and(rows_g == row, flb)
                for t in range(NT):
                    for i in range(NQ):
                        g[t][i] = jnp.where(m, _rolly(g[t][i], 1, W),
                                            g[t][i])
        # tracer pull-streaming with half-way bounce-back
        for t in range(NT):
            new = [g[t][0] * fl]
            for i in range(1, NQ):
                dx, dy = int(E5[i, 0]), int(E5[i, 1])
                io = int(OPP5[i])
                new.append(jnp.where(us5[i], g[t][io],
                                     sh(g[t][i], -dx, -dy)) * fl)
            g[t] = new
        # hard interface bounce-back (post-stream repair)
        if tr_mode == "bounceback":
            dom_f = jnp.where(in_dom, 1.0, 0.0)
            for i in range(1, NQ):
                dx, dy = int(E5[i, 0]), int(E5[i, 1])
                io = int(OPP5[i])
                nbr_out = jnp.logical_and(in_dom,
                                          sh(dom_f, dx, dy) < 0.5)
                recv = jnp.logical_and(~in_dom,
                                       sh(dom_f, -dx, -dy) > 0.5)
                for t in range(NT):
                    leaked = sh(g[t][i], dx, dy)
                    g[t][io] = jnp.where(nbr_out, leaked, g[t][io])
                    g[t][i] = jnp.where(recv, 0.0, g[t][i])
        # inlet BCs after streaming
        if tp.inlet == "inamuro":
            m = jnp.logical_and(rows_g == ny - 1, flb)
            for t in range(NT):
                tgt = float(tp.inlet_conc[t % len(tp.inlet_conc)])
                known = g[t][0] + g[t][1] + g[t][2] + g[t][3]
                g[t][4] = jnp.where(m, tgt - known, g[t][4])
        elif tp.inlet == "anti_bounce_back":
            # row ny-1 slot 4 <- -g3(ny-2) + 2 w3 C: read g3 one row below
            m = jnp.logical_and(rows_g == ny - 1, flb)
            for t in range(NT):
                tgt = float(tp.inlet_conc[t % len(tp.inlet_conc)])
                val = -_rolly(g[t][3], -1, W) + 2.0 * float(W5[3]) * tgt
                g[t][4] = jnp.where(m, val, g[t][4])
        elif tp.inlet == "zero":
            m = jnp.logical_and(rows_g == ny - 2, flb)
            for t in range(NT):
                for i in range(NQ):
                    g[t][i] = jnp.where(m, _rolly(g[t][i], -1, W), g[t][i])
        return g

    has_bcs = inlet_kind != "periodic" or outlet_kind != "periodic"
    need_rows = T > 1 or has_bcs or has_transport or phi_repair

    # BC rows only ever appear in two 16-row bands of any window: the
    # window start is always ≡ -H (mod R), so global rows {0,1,2} and
    # {ny-2, ny-1} land at window rows r ∈ [H-2, H+3) ∪ [H+R-2, H+R+3).
    # Applying the BC rewrites on 8-aligned slices around those bands and
    # stitching through the VMEM scratch plane cuts the per-sub-step BC
    # arithmetic from W rows to 32.
    bc_sliced = R >= 16
    _seg1 = (H - 8, H + 8)
    _seg2 = (H + R - 8, H + R + 8)

    def _cat_rows(full, s1, s2):
        # compiled mode: scratch-ref roundtrip (one VMEM copy per plane
        # instead of the ~4x-costlier full-window BC roll/select chain);
        # interpret mode: value-level DUS
        if _scr_cell:
            scr = _scr_cell[0]
            scr[...] = full
            scr[_seg1[0]:_seg1[1], :] = s1
            scr[_seg2[0]:_seg2[1], :] = s2
            return scr[...]
        out = jax.lax.dynamic_update_slice(full, s1, (_seg1[0], 0))
        return jax.lax.dynamic_update_slice(out, s2, (_seg2[0], 0))

    def _seg_rows(row0, lo, ws):
        # fresh per-segment global-row iota (slicing the full-window
        # broadcasted iota trips a Mosaic layout check)
        iota = jax.lax.broadcasted_iota(jnp.int32, (ws, nx), 0)
        return (row0 + lo + iota) % ny

    def _bc_sliced_c(ft, rho_r, fl, row0):
        news = []
        for lo, hi in (_seg1, _seg2):
            ws = hi - lo
            fts = [f[lo:hi] for f in ft]
            fts, rrs = _apply_bcs_window_c(fts, rho_r[lo:hi], fl[lo:hi],
                                           _seg_rows(row0, lo, ws), ws)
            news.append((fts, rrs))
        ft = [_cat_rows(f, news[0][0][i], news[1][0][i])
              for i, f in enumerate(ft)]
        rho_r = _cat_rows(rho_r, news[0][1], news[1][1])
        return ft, rho_r

    def _bc_sliced_split(f_r, f_b, fl, row0):
        news = []
        for lo, hi in (_seg1, _seg2):
            ws = hi - lo
            frs = [f[lo:hi] for f in f_r]
            fbs = [f[lo:hi] for f in f_b]
            frs, fbs = _apply_bcs_window(frs, fbs, fl[lo:hi],
                                         _seg_rows(row0, lo, ws), ws)
            news.append((frs, fbs))
        f_r = [_cat_rows(f, news[0][0][i], news[1][0][i])
               for i, f in enumerate(f_r)]
        f_b = [_cat_rows(f, news[0][1][i], news[1][1][i])
               for i, f in enumerate(f_b)]
        return f_r, f_b

    use_scratch = (not interpret) and (
        (bc_sliced and (has_bcs or phi_repair)) or wet_banded or bb_banded)

    def kernel(*refs):
        if use_scratch:
            _scr_cell[:] = [refs[-1]]
            refs = refs[:-1]
        if is_local:
            # scalar-prefetched global row offset of local row 0, then the
            # wrapped center/halo refs plus the ppermuted edge slabs
            (row0_ref, s_c, s_u, s_d, up_sl, dn_sl,
             g_c, g_u, g_d, gup_sl, gdn_sl) = refs[:11]
            idx = 11
            if has_transport:
                tr_c, tr_u, tr_d, trup_sl, trdn_sl = refs[idx:idx + 5]
                idx += 5
            outs = refs[idx:]
            i0 = pl.program_id(0)
            first = i0 == 0
            last = i0 == nb - 1
            # edge strips take their halo from the neighbor-shard slabs;
            # interior strips use the in-shard wrapped slabs
            s_u = jnp.where(first, up_sl[:], s_u[:])
            s_d = jnp.where(last, dn_sl[:], s_d[:])
            g_u = jnp.where(first, gup_sl[:], g_u[:])
            g_d = jnp.where(last, gdn_sl[:], g_d[:])
            if has_transport:
                tr_u = jnp.where(first, trup_sl[:], tr_u[:])
                tr_d = jnp.where(last, trdn_sl[:], tr_d[:])
        elif compressed:
            s_c, s_u, s_d, g_c, g_u, g_d = refs[:6]
            idx = 6
            if has_transport:
                tr_c, tr_u, tr_d = refs[idx:idx + 3]
                idx += 3
            outs = refs[idx:]
        else:
            fr_c, fr_u, fr_d, fb_c, fb_u, fb_d, g_c, g_u, g_d = refs[:9]
            idx = 9
            if has_transport:
                tr_c, tr_u, tr_d = refs[idx:idx + 3]
                idx += 3
            outs = refs[idx:]
        geo = jnp.concatenate([g_u[:], g_c[:], g_d[:]], axis=1)
        fl = geo[0]
        wet = geo[1]
        ns_x = geo[2]
        ns_y = geo[3]
        den_inv = geo[4]
        # static upwind-solid masks, hoisted out of the sub-step loop
        solid = 1.0 - fl
        us = [None] + [sh(solid, -int(e[i, 0]), -int(e[i, 1])) > 0.5
                       for i in range(1, 9)]
        if bb_banded:
            # banded bounce-back replacement masks us_opp(j), as 0/1 floats
            # on the wall lane band (pointwise corr in _substep_c)
            usb_f = ([None] + [_xband(us[int(opp[j])]).astype(dtype)
                               for j in range(1, 9)]) if bb_any_solid \
                else None
        else:
            usb_f = None
        if has_transport:
            us5 = [None] + [
                sh(solid, -int(E5[i, 0]), -int(E5[i, 1])) > 0.5
                for i in range(1, NQ)]

        if compressed:
            s = jnp.concatenate([s_u[:], s_c[:], s_d[:]], axis=1)
            if bf16:
                # unshift the stored deviations to f32 once per window;
                # all physics below runs f32 in VMEM
                ft = [s[i].astype(dtype) + float(w_lat[i]) * fl
                      for i in range(9)]
                rho_r = s[9].astype(dtype) + s[10].astype(dtype)
            else:
                ft = [s[i] for i in range(9)]
                rho_r = s[9]
        else:
            f_r = jnp.concatenate([fr_u[:], fr_c[:], fr_d[:]], axis=1)
            f_b = jnp.concatenate([fb_u[:], fb_c[:], fb_d[:]], axis=1)
            fr = [f_r[i] for i in range(9)]
            fb = [f_b[i] for i in range(9)]
        if has_transport:
            gwin = jnp.concatenate([tr_u[:], tr_c[:], tr_d[:]], axis=2)
            g = [[gwin[t, i] for i in range(NQ)] for t in range(NT)]
        rows_g = None
        is_edge = None
        phi_rg = None
        if need_rows:
            i0 = pl.program_id(0)
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (W, nx), 0)
            off = row0_ref[0] if is_local else 0
            row0_g = off + i0 * R - H
            rows_g = (row0_g + r_iota) % ny
            # phi repair routing: scalar offset selects the sliced
            # scratch-stitch form inside _phi_repair_rows (value-level
            # DUS in interpret mode, so CPU equivalence tests exercise
            # the same two-segment slicing the TPU runs)
            phi_rg = row0_g if bc_sliced else rows_g
            if interpret and has_bcs:
                # interpret-only edge predicate: XLA-CPU execution of the
                # unconditional BC select chains is pathologically slow
                # (~20x), while on TPU a lax.cond would materialize both
                # branches (full state copy).  So: cond in interpret,
                # unconditional masked selects in compiled mode.
                start = (off + i0 * R - H) % ny
                is_edge = False
                for k in (0, 1, 2, ny - 2, ny - 1):
                    hit = ((k - start) % ny) < W
                    is_edge = jnp.logical_or(is_edge, hit)
        def _advance_c(ft, rho_r, final_static, fm=None):
            """One compressed sub-step: BC row rewrites, then
            collide/recolor/stream.  ``final_static`` statically enables
            the solid-output masking; ``fm`` (loop mode only) applies a
            traced mask instead — ones on interior loop iterations, fl on
            the last — so deferred masking survives the rolled loop."""
            if has_bcs:
                if interpret:
                    _bc_c = (_bc_sliced_c if bc_sliced
                             else _apply_bcs_window_c)
                    _rg_c = row0_g if bc_sliced else rows_g
                    ft, rho_r = jax.lax.cond(
                        is_edge,
                        lambda t: _bc_c(list(t[0]), t[1], fl, _rg_c),
                        lambda t: (list(t[0]), t[1]),
                        (tuple(ft), rho_r))
                elif bc_sliced:
                    ft, rho_r = _bc_sliced_c(ft, rho_r, fl, row0_g)
                else:
                    ft, rho_r = _apply_bcs_window_c(ft, rho_r, fl, rows_g)
            if is_pert:
                ft, rho_r = _substep_pert_c(ft, rho_r, fl, us,
                                            final=final_static,
                                            rows_g=phi_rg)
            else:
                ft, rho_r = _substep_c(ft, rho_r, fl, wet, ns_x, ns_y,
                                       den_inv, us, final=final_static,
                                       usb_f=usb_f, rows_g=phi_rg)
            if fm is not None:
                ft = [f * fm for f in ft]
                rho_r = rho_r * fm
            return ft, rho_r

        if compressed and loop_iters > 1:
            U = T // loop_iters

            def _loop_body(it, carry):
                ftc, rrc = list(carry[0]), carry[1]
                fm_last = None
                if _defer_ok:
                    fm_last = jnp.where(it == loop_iters - 1, fl,
                                        jnp.ones_like(fl))
                for _u in range(U):
                    if _defer_ok:
                        ftc, rrc = _advance_c(
                            ftc, rrc, False,
                            fm=fm_last if _u == U - 1 else None)
                    else:
                        ftc, rrc = _advance_c(ftc, rrc, True)
                return (tuple(ftc), rrc)

            ft, rho_r = jax.lax.fori_loop(0, loop_iters, _loop_body,
                                          (tuple(ft), rho_r))
            ft = list(ft)
        for _t in range(T if loop_iters == 1 else 0):
            _final = (not _defer_ok) or _t == T - 1
            if has_transport:
                # transport sees the CURRENT flow fields (pre-BC), as in
                # TransportRK._step_impl
                if compressed:
                    rho_r_ = rho_r
                    ft_ = ft
                    rho_ = sum(ft)
                    rho_b_ = rho_ - rho_r_
                else:
                    rho_r_ = sum(fr)
                    rho_b_ = sum(fb)
                    rho_ = rho_r_ + rho_b_
                    ft_ = [fr[i] + fb[i] for i in range(9)]
                _, rinv_, _, gx_, gy_, fx_, fy_, _, _ = \
                    _fields(rho_r_, rho_b_, rho_, fl, wet, ns_x, ns_y,
                            den_inv, rows_g=phi_rg)
                mx_ = ft_[1] - ft_[3] + ft_[5] - ft_[6] - ft_[7] + ft_[8]
                my_ = ft_[2] - ft_[4] + ft_[5] + ft_[6] - ft_[7] - ft_[8]
                ux_ = (mx_ + 0.5 * fx_) * rinv_
                uy_ = (my_ + 0.5 * fy_) * rinv_
                g = _transport_substep(g, fl, rows_g, ux_, uy_, gx_, gy_,
                                       rho_r_, us5)
            # BC rewrites run unconditionally: they are masked row selects
            # whose arithmetic is free next to the rolls, whereas a
            # lax.cond would materialize both branches' outputs (a full
            # state copy on the identity branch) — measured +0.05 ms/step.
            if compressed:
                ft, rho_r = _advance_c(ft, rho_r, _final)
            else:
                if has_bcs:
                    if interpret:
                        _bc_s = (_bc_sliced_split if bc_sliced
                                 else _apply_bcs_window)
                        _rg_s = row0_g if bc_sliced else rows_g
                        fr, fb = jax.lax.cond(
                            is_edge,
                            lambda t: _bc_s(list(t[0]), list(t[1]), fl,
                                            _rg_s),
                            lambda t: (list(t[0]), list(t[1])),
                            (tuple(fr), tuple(fb)))
                    elif bc_sliced:
                        fr, fb = _bc_sliced_split(fr, fb, fl, row0_g)
                    else:
                        fr, fb = _apply_bcs_window(fr, fb, fl, rows_g)
                if is_pert:
                    fr, fb = _substep_pert(fr, fb, fl, us, final=_final,
                                           rows_g=phi_rg)
                else:
                    fr, fb = _substep(fr, fb, fl, wet, ns_x, ns_y,
                                      den_inv, us, final=_final,
                                      rows_g=phi_rg)
        if compressed:
            out_s = outs[0]
            if bf16:
                flc = fl[H:H + R]
                for i in range(9):
                    out_s[i] = (ft[i][H:H + R] -
                                float(w_lat[i]) * flc).astype(jnp.bfloat16)
                rc = rho_r[H:H + R]
                hi = rc.astype(jnp.bfloat16)
                out_s[9] = hi
                out_s[10] = (rc - hi.astype(dtype)).astype(jnp.bfloat16)
            else:
                for i in range(9):
                    out_s[i] = ft[i][H:H + R]
                out_s[9] = rho_r[H:H + R]
            if has_transport:
                out_g = outs[1]
                for t in range(NT):
                    for i in range(NQ):
                        out_g[t, i] = g[t][i][H:H + R]
            return
        out_r, out_b = outs[0], outs[1]
        for i in range(9):
            out_r[i] = fr[i][H:H + R]
            out_b[i] = fb[i][H:H + R]
        if has_transport:
            out_g = outs[2]
            for t in range(NT):
                for i in range(NQ):
                    out_g[t, i] = g[t][i][H:H + R]

    n_st = (11 if bf16 else 10) if compressed else 9
    st_dtype = jnp.bfloat16 if bf16 else dtype
    center = pl.BlockSpec((n_st, R, nx), lambda i: (0, i, 0))
    halo_up = pl.BlockSpec((n_st, H, nx),
                           lambda i: (0, (i * (R // H) - 1) % hb, 0))
    halo_dn = pl.BlockSpec((n_st, H, nx),
                           lambda i: (0, (i * (R // H) + R // H) % hb, 0))
    gcenter = pl.BlockSpec((n_geo, R, nx), lambda i: (0, i, 0))
    ghalo_up = pl.BlockSpec((n_geo, H, nx),
                            lambda i: (0, (i * (R // H) - 1) % hb, 0))
    ghalo_dn = pl.BlockSpec((n_geo, H, nx),
                            lambda i: (0, (i * (R // H) + R // H) % hb, 0))

    if is_local:
        # under PrefetchScalarGridSpec every index_map also receives the
        # scalar-prefetch ref (unused here)
        center_l = pl.BlockSpec((n_st, R, nx), lambda i, s: (0, i, 0))
        halo_up_l = pl.BlockSpec(
            (n_st, H, nx), lambda i, s: (0, (i * (R // H) - 1) % hb, 0))
        halo_dn_l = pl.BlockSpec(
            (n_st, H, nx),
            lambda i, s: (0, (i * (R // H) + R // H) % hb, 0))
        gcenter_l = pl.BlockSpec((n_geo, R, nx), lambda i, s: (0, i, 0))
        ghalo_up_l = pl.BlockSpec(
            (n_geo, H, nx), lambda i, s: (0, (i * (R // H) - 1) % hb, 0))
        ghalo_dn_l = pl.BlockSpec(
            (n_geo, H, nx),
            lambda i, s: (0, (i * (R // H) + R // H) % hb, 0))
        slab = pl.BlockSpec((n_st, H, nx), lambda i, s: (0, 0, 0))
        gslab = pl.BlockSpec((n_geo, H, nx), lambda i, s: (0, 0, 0))
        in_specs = [center_l, halo_up_l, halo_dn_l, slab, slab,
                    gcenter_l, ghalo_up_l, ghalo_dn_l, gslab, gslab]
        out_specs = [pl.BlockSpec((10, R, nx), lambda i, s: (0, i, 0))]
        out_shape = [jax.ShapeDtypeStruct((10, grid_ny, nx), dtype)]
    elif compressed:
        in_specs = [center, halo_up, halo_dn,
                    gcenter, ghalo_up, ghalo_dn]
        out_specs = [pl.BlockSpec((n_st, R, nx), lambda i: (0, i, 0))]
        out_shape = [jax.ShapeDtypeStruct((n_st, ny, nx), st_dtype)]
    else:
        in_specs = [center, halo_up, halo_dn,
                    center, halo_up, halo_dn,
                    gcenter, ghalo_up, ghalo_dn]
        out_specs = [pl.BlockSpec((9, R, nx), lambda i: (0, i, 0)),
                     pl.BlockSpec((9, R, nx), lambda i: (0, i, 0))]
        out_shape = [jax.ShapeDtypeStruct((9, ny, nx), dtype),
                     jax.ShapeDtypeStruct((9, ny, nx), dtype)]
    if has_transport:
        if is_local:
            tr_slab = pl.BlockSpec((NT, NQ, H, nx),
                                   lambda i, s: (0, 0, 0, 0))
            in_specs += [
                pl.BlockSpec((NT, NQ, R, nx), lambda i, s: (0, 0, i, 0)),
                pl.BlockSpec(
                    (NT, NQ, H, nx),
                    lambda i, s: (0, 0, (i * (R // H) - 1) % hb, 0)),
                pl.BlockSpec(
                    (NT, NQ, H, nx),
                    lambda i, s: (0, 0, (i * (R // H) + R // H) % hb, 0)),
                tr_slab, tr_slab,
            ]
            out_specs.append(
                pl.BlockSpec((NT, NQ, R, nx), lambda i, s: (0, 0, i, 0)))
            out_shape.append(
                jax.ShapeDtypeStruct((NT, NQ, grid_ny, nx), dtype))
        else:
            in_specs += [
                pl.BlockSpec((NT, NQ, R, nx), lambda i: (0, 0, i, 0)),
                pl.BlockSpec((NT, NQ, H, nx),
                             lambda i: (0, 0, (i * (R // H) - 1) % hb, 0)),
                pl.BlockSpec(
                    (NT, NQ, H, nx),
                    lambda i: (0, 0, (i * (R // H) + R // H) % hb, 0)),
            ]
            out_specs.append(
                pl.BlockSpec((NT, NQ, R, nx), lambda i: (0, 0, i, 0)))
            out_shape.append(jax.ShapeDtypeStruct((NT, NQ, ny, nx), dtype))

    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=120 * 1024 * 1024,
        dimension_semantics=("parallel",))
    scratch_shapes = ([pltpu.VMEM((W, nx), dtype)] if use_scratch else [])
    if is_local:
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb,),
                in_specs=in_specs,
                out_specs=tuple(out_specs),
                scratch_shapes=tuple(scratch_shapes)),
            out_shape=tuple(out_shape),
            compiler_params=compiler_params,
            interpret=interpret,
        )

        if has_transport:
            def step(s_loc, up, dn, geo_loc, gup, gdn,
                     g_loc, g_up, g_dn, row0):
                outs = call(row0, s_loc, s_loc, s_loc, up, dn,
                            geo_loc, geo_loc, geo_loc, gup, gdn,
                            g_loc, g_loc, g_loc, g_up, g_dn)
                return outs[0], outs[1]
        else:
            def step(s_loc, up, dn, geo_loc, gup, gdn, row0):
                return call(row0, s_loc, s_loc, s_loc, up, dn,
                            geo_loc, geo_loc, geo_loc, gup, gdn)[0]

        return step

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch_shapes,
        compiler_params=compiler_params,
        interpret=interpret,
    )

    if compressed and has_transport:
        def step(s, g):
            outs = call(s, s, s, geo_dev, geo_dev, geo_dev, g, g, g)
            return outs[0], outs[1]
    elif compressed:
        def step(s):
            return call(s, s, s, geo_dev, geo_dev, geo_dev)[0]
    elif has_transport:
        def step(f_r, f_b, g):
            return call(f_r, f_r, f_r, f_b, f_b, f_b,
                        geo_dev, geo_dev, geo_dev, g, g, g)
    else:
        def step(f_r, f_b):
            return call(f_r, f_r, f_r, f_b, f_b, f_b,
                        geo_dev, geo_dev, geo_dev)

    step.defer_mask = _defer_ok
    return step


def build_csf_sharded_step(geometry: Geometry, params, mesh,
                           dtype=jnp.float32,
                           rows_per_block: int | None = None,
                           steps_per_call: int = 1,
                           bc_config=None,
                           transport_params=None,
                           interpret: bool = False):
    """Compressed fused CSF/Perturbation step under a y- or (y, x)-sharded
    mesh.

    The domain is row-decomposed over the mesh "y" axis and (optionally)
    column-decomposed over the mesh "x" axis.  Per call, each shard
    exchanges H halo rows of the state and the static geometry with its
    ring neighbors via ``lax.ppermute`` over ICI, then runs the local-grid
    kernel; boundary-condition rows resolve against global row indices
    through a scalar-prefetched shard offset, so the same program serves
    every shard (SPMD).  With an "x" axis of size > 1, Hx halo LANES are
    exchanged over the "x" ring first and concatenated onto the local
    columns; the following y exchange then ships rows of the x-padded
    arrays, so the diagonal-neighbor corner data rides along for free.
    The kernel runs on the padded width (``local_nx``; the circular lane
    rolls stay exact on the center columns for Hx >= 4T) and the center
    is sliced back out.  Returns ``step(s) -> s'`` on the
    globally-sharded (10, ny, nx) state — or, with ``transport_params``,
    the coupled ``step(s, g) -> (s', g')`` with the tracer PDFs
    (NT, NQ, ny, nx) row-sharded alongside the flow (y-decomposition
    only; interface-mode epilogues beyond the in-kernel bounce-back are
    jnp and compose at the model level under SPMD).  None when the
    decomposition does not apply.
    """
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    ny, nx = geometry.shape
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_sh = axis_sizes.get("y", 1)
    n_sx = axis_sizes.get("x", 1)
    if ny % n_sh or nx % n_sx:
        return None
    ny_loc = ny // n_sh
    nx_loc = nx // n_sx
    has_tr = transport_params is not None
    T = int(steps_per_call)
    tr_mode = None
    if has_tr:
        tr_mode = ("bounceback"
                   if transport_params.interface_mode in
                   ("bounceback", "redistribute") else
                   transport_params.interface_mode)
    H = _halo_rows(T, params.variant, tr_mode)
    Hx = H if n_sx > 1 else 0
    if n_sx > 1 and nx_loc <= 2 * Hx:
        return None
    local = build_csf_fused_step(
        geometry, params, dtype, rows_per_block, steps_per_call, bc_config,
        state_mode="compressed", local_ny=ny_loc,
        local_nx=(nx_loc + 2 * Hx) if n_sx > 1 else None,
        transport_params=transport_params,
        interpret=interpret)
    if local is None:
        return None

    spec = P(None, "y", "x") if n_sx > 1 else P(None, "y", None)
    geo = jax.device_put(jnp.asarray(geo_stack(geometry), dtype),
                         NamedSharding(mesh, spec))
    fwd = [(j, (j + 1) % n_sh) for j in range(n_sh)]
    bwd = [(j, (j - 1) % n_sh) for j in range(n_sh)]
    xfwd = [(j, (j + 1) % n_sx) for j in range(n_sx)]
    xbwd = [(j, (j - 1) % n_sx) for j in range(n_sx)]

    def _local_step(s_loc, geo_loc, *tr):
        def xpad(x):
            # global x periodicity comes from the ring permute (shard 0's
            # left halo is shard n_sx-1's right edge), matching the
            # full-width kernel's circular lane rolls; lanes are the last
            # axis for the 3-D flow/geo stacks and the 4-D tracer PDFs
            left = lax.ppermute(x[..., -Hx:], "x", xfwd)
            right = lax.ppermute(x[..., :Hx], "x", xbwd)
            return jnp.concatenate([left, x, right], axis=-1)

        def halo(x):
            # rows are axis -2 for both the 3-D flow/geo stacks and the
            # 4-D tracer PDFs
            up = lax.ppermute(x[..., -H:, :], "y", fwd)
            dn = lax.ppermute(x[..., :H, :], "y", bwd)
            return up, dn

        row0 = jnp.reshape(
            (lax.axis_index("y") * ny_loc).astype(jnp.int32), (1,))
        if n_sx > 1:
            s_loc = xpad(s_loc)
            geo_loc = xpad(geo_loc)
        up, dn = halo(s_loc)
        gup, gdn = halo(geo_loc)
        if has_tr:
            (g_loc,) = tr
            if n_sx > 1:
                g_loc = xpad(g_loc)
            g_up, g_dn = halo(g_loc)
            out_s, out_g = local(s_loc, up, dn, geo_loc, gup, gdn,
                                 g_loc, g_up, g_dn, row0)
            if n_sx > 1:
                out_s = out_s[..., Hx:Hx + nx_loc]
                out_g = out_g[..., Hx:Hx + nx_loc]
            return out_s, out_g
        out = local(s_loc, up, dn, geo_loc, gup, gdn, row0)
        if n_sx > 1:
            out = out[..., Hx:Hx + nx_loc]
        return out

    # check_vma=False: pallas_call's ShapeDtypeStruct outputs carry no vma
    if has_tr:
        tr_spec = P(None, None, "y", "x") if n_sx > 1 \
            else P(None, None, "y", None)
        sharded = shard_map(_local_step, mesh=mesh,
                            in_specs=(spec, spec, tr_spec),
                            out_specs=(spec, tr_spec), check_vma=False)

        def step(s, g):
            return sharded(s, geo, g)
    else:
        sharded = shard_map(_local_step, mesh=mesh, in_specs=(spec, spec),
                            out_specs=spec, check_vma=False)

        def step(s):
            return sharded(s, geo)

    return step
