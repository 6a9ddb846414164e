"""Fused original-Shan-Chen MCMP step as a single Pallas TPU kernel.

One VMEM-resident pass per y-strip computes, for K fluids:

    [BC rows] -> rho_k -> common velocity u' -> psi -> interaction force
    (nearest-neighbor stencil + static adhesion field) -> u_eq = u' + tau F
    / rho -> BGK at u_eq -> pull-streaming with half-way bounce-back

the fused form of the reference's hot SC path
(``interactionCollisionProcess``, ``OptimizedD2Q9GPU.py:1274-1446`` +
``calStreaming1GPU:452-533``), with the same strip/halo/temporal-blocking
scheme as ``pallas/csf.py``.  The SC data chain touches only +-1 neighbors
per sub-step (force stencil) plus +-1 for streaming = 2 halo rings per
sub-step, so H = 8 supports steps_per_call up to 4.

The EFS scheme (Porter 2012: iso-4/8/10 difference-form force, EDM update
on the transformed PDF fbar = f - f^F/2, SRT or constant-matrix MRT) fuses
into the same kernel with (stencil radius + 1) halo rings per sub-step
(``ExplicitD2Q9GPU.py`` kernels; jnp path ``ShanChenMCMP._step_efs``).
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
from .csf import _rollx, _rolly, _sh

__all__ = ["build_sc_fused_step", "build_sc_sharded_step"]

_E = D2Q9.e
_W = D2Q9.w
_OPP = D2Q9.opp


def _halo_rows(steps_per_call: int, rings: int = 2, radius: int = 1) -> int:
    # `rings` per sub-step (force stencil radius + stream), plus margin so
    # the deepest BC source row (convective outlet row radius+1 reads row
    # radius+2; inlet ghost chain is `radius` copies) stays valid through
    # the last sub-step's post-stream outlet rewrite.
    need = rings * steps_per_call + 2 * radius + 2
    return ((need + 7) // 8) * 8


def _sc_geo_stack(geometry: Geometry, params) -> np.ndarray:
    """Static geometry channels.

    SC: [is_fluid, adhesion_x, adhesion_y] with D2Q9 weights
    (``OptimizedD2Q9GPU.py:209-312``).
    EFS: [is_fluid, fluid_vec_x, fluid_vec_y, adh_st_x, adh_st_y] with the
    iso-stencil weights (``ExplicitD2Q9GPU.py`` schemes): fluid_vec is the
    difference-form correction sum_dir(fluid) w e, adh_st the
    solid-adsorption sum."""
    is_efs = params.scheme == "EFS"
    iso = int(getattr(params, "iso_order", 4)) if is_efs else 4
    solid = geometry.is_solid.astype(np.float64)
    fluid = geometry.is_fluid.astype(np.float64)
    if is_efs:
        from ..lattice import ISO_STENCILS
        st = ISO_STENCILS[iso]
        offsets = [(int(o[0]), int(o[1])) for o in st.offsets]
        st_w = [float(w) for w in st.weights]
        fvx = np.zeros_like(solid)
        fvy = np.zeros_like(solid)
        asx = np.zeros_like(solid)
        asy = np.zeros_like(solid)
        for (dx, dy), w in zip(offsets, st_w):
            sf = np.roll(np.roll(fluid, -dy, 0), -dx, 1)
            ss = np.roll(np.roll(solid, -dy, 0), -dx, 1)
            fvx += w * dx * sf
            fvy += w * dy * sf
            asx += w * dx * ss
            asy += w * dy * ss
        return np.stack([fluid, fvx, fvy, asx, asy])
    adx = np.zeros_like(solid)
    ady = np.zeros_like(solid)
    for i in range(1, 9):
        dx, dy = int(_E[i, 0]), int(_E[i, 1])
        s = np.roll(np.roll(solid, -dy, 0), -dx, 1)
        adx += float(_W[i]) * dx * s
        ady += float(_W[i]) * dy * s
    return np.stack([fluid, adx, ady])


def build_sc_fused_step(geometry: Geometry, params, dtype=jnp.float32,
                        rows_per_block: int | None = None,
                        steps_per_call: int = 1,
                        bc_config=None,
                        local_ny: int | None = None,
                        interpret: bool = False,
                        storage: str = "f32"):
    """Build ``f (K, 9, ny, nx) -> f'`` for the Shan-Chen family: original
    SC or explicit-forcing EFS (iso 4/8/10), SRT or constant-matrix MRT,
    psi = rho or Peng-Robinson EOS.  Returns None only when the domain
    does not strip-decompose or a BC kind is unsupported in-kernel.

    ``local_ny`` builds the per-shard kernel for a y-decomposed domain
    (``build_sc_sharded_step``): the call takes the local (K, 9,
    local_ny, nx) block, per-fluid H-row halo slabs from the ring
    neighbors, matching geometry slabs, and the shard's global row
    offset (scalar-prefetched so BC rows resolve against global row
    indices)."""
    is_efs = params.scheme == "EFS"
    is_pr = params.psi == "PR"
    ny, nx = geometry.shape
    is_local = local_ny is not None
    # bf16 shifted-PDF storage (opt-in): the HBM state becomes, per fluid,
    # 11 bfloat16 planes — 9 *deviations* f_i - w_i*rho_k plus rho_k as a
    # hi/lo bf16 pair (exact to ~2^-17).  Unlike the CSF scheme
    # (pallas/csf.py), the shift is w_i*rho_k reconstructed from the pair
    # rather than w_i*fl, because MCMP per-fluid densities span orders of
    # magnitude (dissolved ~0.06 vs bulk ~2).  All VMEM arithmetic stays
    # f32; HBM traffic drops to 22/36 of the f32 state.
    bf16 = storage == "bf16"
    if bf16 and is_local:
        return None
    grid_ny = int(local_ny) if is_local else ny
    K = params.num_fluids
    T = int(steps_per_call)
    iso = int(getattr(params, "iso_order", 4)) if is_efs else 4
    radius = {4: 1, 8: 2, 10: 3}[iso]
    H = _halo_rows(T, rings=(radius + 1) if is_efs else 2, radius=radius)
    if rows_per_block is None:
        # Largest R under the VMEM budget: the scoped live set grows with
        # the unrolled K x T sub-step chain.  planes = 30 + 30*K*T is
        # calibrated on the real chip (K=2/T=4: W=96 fits the 110 MB
        # limit, W=160 does not).
        planes = 30 + 30 * K * T * (2 if is_efs else 1)
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
    inlet_v = tuple(float(v) for v in
                    getattr(bc_config, "inlet_velocity", (0.0,) * K))
    inlet_rho = tuple(float(v) for v in
                      getattr(bc_config, "inlet_density", (1.0,) * K))
    outlet_rho = tuple(float(v) for v in
                       getattr(bc_config, "outlet_density", (1.0,) * K))
    has_bcs = inlet_kind != "periodic" or outlet_kind != "periodic"
    if T > 1 and has_bcs and bc_config is None:
        raise ValueError("steps_per_call > 1 requires bc_config")

    # Deferred solid masking (see pallas/csf.py): interior sub-steps of a
    # temporal block skip the K*9 output mask-multiplies; psi becomes a
    # fluid-guarded select so solid garbage cannot enter the interaction
    # stencils.  Valid when every fluid cell in a BC ghost/convective
    # copy-destination row has a fluid same-lane source row.
    _fl_np = geometry.is_fluid
    _copy_pairs = []
    if inlet_kind != "periodic":
        _copy_pairs += [(g, g - 1) for g in range(ny - radius, ny)]
    if outlet_kind == "zou_he_pressure":
        _copy_pairs += [(g, g + 1) for g in range(radius - 1, -1, -1)]
    elif outlet_kind == "convective":
        _copy_pairs += [(g, g + 1) for g in range(radius + 1, -1, -1)]
    _defer_ok = T > 1 and all(bool(np.all(_fl_np[src][_fl_np[dst]]))
                              for dst, src in _copy_pairs)

    tau = tuple(float(t) for t in params.tau)
    g_mat = np.asarray(params.g_matrix, np.float64)
    g_sol = np.asarray(params.g_solid, np.float64)
    bfx, bfy = (float(v) for v in params.body_force)

    geo_np = _sc_geo_stack(geometry, params)
    n_geo = geo_np.shape[0]
    geo_dev = jnp.asarray(geo_np, dtype)

    if params.collision == "MRT":
        from ..ops.collision import mrt_relaxation_d2q9_sc
        _s_sc = mrt_relaxation_d2q9_sc(1.0)
        assert not _s_sc[[0, 3, 5]].any()  # conserved moments skipped below

    if is_pr:
        prp = dict(params.pr_params)
        pr_cr = float(prp.get("const_r", 1.0))
        pr_t = float(prp.get("temperature", 0.06))
        pr_a = float(prp.get("coeff_a", 1.0))
        pr_b = float(prp.get("coeff_b", 4.0))
        pr_alpha = float(prp.get("alpha", 1.0))
        pr_c0g = float(prp.get("c0", 6.0)) * float(prp.get("g", -1.0))

    def _psi(r):
        """Pseudopotential (``calFluidPotentialGPUEql``/``...GPUPR``,
        OptimizedD2Q9GPU.py:99-127).  psi(0) = 0 so solids stay inert."""
        if not is_pr:
            return r
        p = (r * (pr_cr * pr_t)) / (1.0 - pr_b * r) - \
            (pr_a * pr_alpha) * r * r / \
            (1.0 + 2.0 * pr_b * r - (pr_b * pr_b) * r * r)
        arg = (2.0 / pr_c0g) * (p - r / 3.0)
        return jnp.sqrt(jnp.maximum(arg, 0.0))

    sh = functools.partial(_sh, nx=nx, w=W)

    _PAIRS9 = ((1, 3), (2, 4), (5, 7), (6, 8))

    def _feq9(rho_k, ux, uy):
        """Pair-shared quadratic equilibria (feq_opp flips the odd part)."""
        uu = ux * ux + uy * uy
        base = 1.0 - 1.5 * uu
        eu = [None, ux, uy, None, None, ux + uy, uy - ux, None, None]
        feq = [None] * 9
        feq[0] = float(_W[0]) * rho_k * base
        for i, io in _PAIRS9:
            wrho = float(_W[i]) * rho_k
            eui = eu[i]
            a = wrho * (base + 4.5 * (eui * eui))
            b = (3.0 * wrho) * eui
            feq[i] = a + b
            feq[io] = a - b
        return feq, eu

    def _moments6(g):
        """Non-conserved Gram-Schmidt moments (m1, m2, m4, m6, m7, m8) of a
        9-plane list via shared partial sums (the flagship's
        ``csf._collide_total`` transform)."""
        s1p = g[1] + g[3]
        d1 = g[1] - g[3]
        s2p = g[2] + g[4]
        d2 = g[2] - g[4]
        sA = g[5] + g[7]
        p_ = g[5] - g[7]
        sB = g[6] + g[8]
        q_ = g[6] - g[8]
        S_ = s1p + s2p
        D_ = sA + sB
        g04 = 4.0 * g[0]
        return (2.0 * D_ - S_ - g04, D_ - 2.0 * S_ + g04,
                (p_ - q_) - 2.0 * d1, (p_ + q_) - 2.0 * d2,
                s1p - s2p, sA - sB)

    def _mrt_moment_post(fk, rho_k, ux, uy, inv_t, ff=None, fxy=None):
        """Moment-space MRT collision for the SC family: post_i = f_i
        [+ ff_i] − (M⁻¹ S (m(f) − m_eq(ρ,u) [+ m(ff)/2]))_i, with the SC
        relaxation vector (s1=0.6, s2=1.5, s4=s6=1.2, s7=s8=1/τ_k;
        ``mrt_relaxation_d2q9_sc``, mirrors ``ShanChenD2Q9.py:484-498``).
        Closed-form equilibrium moments replace the per-direction feq, and
        the sparse-coefficient inverse transform replaces the dense
        9×9 M⁻¹SM apply (~2x fewer VPU ops, as in ``csf._collide_total``).

        ``fxy=(Fx, Fy)`` is the closed-form EFS force path (r5): the EDM
        force PDF ff_i = 3 w_i (1 − 1.5u² + 3e·u + 4.5(e·u)²)((e_i−u)·F)
        never materializes — its MRT moments h = M·ff are short
        polynomials in (u, F) (sympy-derived; ρ cancels):
            h0 = 0,  h3 = Fx,  h5 = Fy,  h2 = −h1,
            h1 = 3(u·F)(2 − 3u²),
            h4 = 3 uy (Fx uy + 2 Fy ux) − Fx,
            h6 = 3 ux (Fy ux + 2 Fx uy) − Fy,
            h7 = 2(Fx ux − Fy uy) − 3(u·F)(ux² − uy²),
            h8 = (Fx uy + Fy ux) − 3(u·F) ux uy
        and post = f − M⁻¹[S d − (I − S/2) h]: the non-conserved rows
        fold into the relaxed moments, the conserved jx/jy rows (−Fx,
        −Fy) fold into the inverse transform as e_i·F/6.  Replaces
        ~55 plane ops per fluid (feq + 9 ff planes + their moment
        transform) with ~25."""
        m1, m2, m4, m6, m7, m8 = _moments6(fk)
        uu = ux * ux + uy * uy
        r3u2 = (3.0 * rho_k) * uu
        rux = rho_k * ux
        ruy = rho_k * uy
        d1 = m1 + 2.0 * rho_k - r3u2
        d2 = m2 - rho_k + r3u2
        d4 = m4 + rux
        d6 = m6 + ruy
        d7 = m7 - (rux * ux - ruy * uy)
        d8 = m8 - rux * uy
        if ff is not None:
            h1, h2, h4, h6, h7, h8 = _moments6(ff)
            d1 = d1 + 0.5 * h1
            d2 = d2 + 0.5 * h2
            d4 = d4 + 0.5 * h4
            d6 = d6 + 0.5 * h6
            d7 = d7 + 0.5 * h7
            d8 = d8 + 0.5 * h8
        s1, s2, s4, s6 = (float(_s_sc[1]), float(_s_sc[2]),
                          float(_s_sc[4]), float(_s_sc[6]))
        if fxy is not None:
            fx_, fy_ = fxy
            px = fx_ * ux
            py = fy_ * uy
            ufd = px + py
            tyx = fy_ * ux
            txy = fx_ * uy
            cf = tyx + txy
            tuf = 3.0 * ufd
            h1 = ufd * (6.0 - 9.0 * uu)
            h4 = (3.0 * uy) * (cf + tyx) - fx_
            h6 = (3.0 * ux) * (cf + txy) - fy_
            h7 = 2.0 * (px - py) - tuf * (ux * ux - uy * uy)
            h8 = cf - tuf * (ux * uy)
            md1 = s1 * d1 - (1.0 - 0.5 * s1) * h1
            md2 = s2 * d2 + (1.0 - 0.5 * s2) * h1
            md4 = s4 * d4 - (1.0 - 0.5 * s4) * h4
            md6 = s6 * d6 - (1.0 - 0.5 * s6) * h6
            md7 = inv_t * d7 - (1.0 - 0.5 * inv_t) * h7
            md8 = inv_t * d8 - (1.0 - 0.5 * inv_t) * h8
        else:
            md1 = s1 * d1
            md2 = s2 * d2
            md4 = s4 * d4
            md6 = s6 * d6
            md7 = inv_t * d7
            md8 = inv_t * d8
        A_ = (md1 + 2.0 * md2) * (-1.0 / 36.0)
        B_ = (2.0 * md1 + md2) * (1.0 / 36.0)
        t4 = md4 * (1.0 / 6.0)
        t6 = md6 * (1.0 / 6.0)
        t7 = md7 * 0.25
        t8 = md8 * 0.25
        up = 0.5 * (t4 + t6)
        vp = 0.5 * (t4 - t6)
        if fxy is not None:
            # conserved jx/jy force rows of M⁻¹: post_i += (e_i·F)/6
            fx6 = fx_ * (1.0 / 6.0)
            fy6 = fy_ * (1.0 / 6.0)
            t4 = t4 + fx6
            t6 = t6 + fy6
            up = up - (fx6 + fy6)
            vp = vp + (fy6 - fx6)
        At7 = A_ + t7
        Am7 = A_ - t7
        Bp = B_ + t8
        Bm = B_ - t8
        base = fk if ff is None else [fk[i] + ff[i] for i in range(9)]
        post = [None] * 9
        post[0] = base[0] - (md2 - md1) * (1.0 / 9.0)
        post[1] = base[1] - (At7 - t4)
        post[3] = base[3] - (At7 + t4)
        post[2] = base[2] - (Am7 - t6)
        post[4] = base[4] - (Am7 + t6)
        post[5] = base[5] - (Bp + up)
        post[7] = base[7] - (Bp - up)
        post[6] = base[6] - (Bm - vp)
        post[8] = base[8] - (Bm + vp)
        return post

    def _apply_inlet_window(f, fl, rows_g, w=None):
        """f: list over K of lists over 9 planes.  BC row sits `radius`
        rows inside (iso-8/10 ghost depth, matching
        ``ShanChenMCMP._apply_inlet``).  `w` is the row count of the
        (possibly sliced) operands."""
        w = W if w is None else w
        flb = fl > 0.5
        bc_row = ny - 1 - radius
        if inlet_kind == "zou_he_velocity":
            m = jnp.logical_and(rows_g == bc_row, flb)
            for k in range(K):
                vy = inlet_v[k % len(inlet_v)]
                fk = f[k]
                rho = (fk[0] + fk[1] + fk[3] +
                       2.0 * (fk[2] + fk[5] + fk[6])) / (1.0 + vy)
                d13 = 0.5 * (fk[1] - fk[3])
                fk[4] = jnp.where(m, fk[2] - (2.0 / 3.0) * rho * vy, fk[4])
                fk[7] = jnp.where(m, fk[5] + d13 - rho * vy / 6.0, fk[7])
                fk[8] = jnp.where(m, fk[6] - d13 - rho * vy / 6.0, fk[8])
        elif inlet_kind == "zou_he_pressure":
            m = jnp.logical_and(rows_g == bc_row, flb)
            for k in range(K):
                rt = inlet_rho[k % len(inlet_rho)] or 1.0
                fk = f[k]
                vy = -1.0 + (fk[0] + fk[1] + fk[3] +
                             2.0 * (fk[2] + fk[5] + fk[6])) / rt
                d13 = 0.5 * (fk[1] - fk[3])
                rv = rt * vy
                fk[4] = jnp.where(m, fk[2] - (2.0 / 3.0) * rv, fk[4])
                fk[7] = jnp.where(m, fk[5] + d13 - rv / 6.0, fk[7])
                fk[8] = jnp.where(m, fk[6] - d13 - rv / 6.0, fk[8])
        if inlet_kind != "periodic":
            # ghost rows copy the BC row (row g reads g-1 repeatedly)
            for g in range(bc_row + 1, ny):
                m = jnp.logical_and(rows_g == g, flb)
                for k in range(K):
                    for i in range(9):
                        f[k][i] = jnp.where(m, _rolly(f[k][i], -1, w),
                                            f[k][i])
        return f

    def _apply_outlet_window(f, fl, rows_g, w=None):
        w = W if w is None else w
        flb = fl > 0.5
        if outlet_kind == "zou_he_pressure":
            m = jnp.logical_and(rows_g == radius, flb)
            for k in range(K):
                rt = outlet_rho[k % len(outlet_rho)] or 1.0
                fk = f[k]
                vy = 1.0 - (fk[0] + fk[1] + fk[3] +
                            2.0 * (fk[4] + fk[7] + fk[8])) / rt
                d31 = 0.5 * (fk[3] - fk[1])
                rv = rt * vy
                fk[2] = jnp.where(m, fk[4] + (2.0 / 3.0) * rv, fk[2])
                fk[5] = jnp.where(m, fk[7] + d31 + rv / 6.0, fk[5])
                fk[6] = jnp.where(m, fk[8] - d31 + rv / 6.0, fk[6])
            for g in range(radius - 1, -1, -1):
                m = jnp.logical_and(rows_g == g, flb)
                for k in range(K):
                    for i in range(9):
                        f[k][i] = jnp.where(m, _rolly(f[k][i], 1, w),
                                            f[k][i])
        elif outlet_kind == "convective":
            for row in range(radius + 1, -1, -1):
                m = jnp.logical_and(rows_g == row, flb)
                for k in range(K):
                    for i in range(9):
                        f[k][i] = jnp.where(m, _rolly(f[k][i], 1, w),
                                            f[k][i])
        return f

    if is_efs:
        # isotropy weights depend only on (|dx|, |dy|): build the lookup
        # once for the separable stencil evaluation below
        from ..lattice import ISO_STENCILS
        _st = ISO_STENCILS[iso]
        _wmap = {}
        for _o, _w in zip(_st.offsets, _st.weights):
            _wmap[(abs(int(_o[0])), abs(int(_o[1])))] = float(_w)

    def _iso_sums(a, wmap, r):
        """(vx, vy) of the separable iso-stencil Σ_d w(|d|²) d a(x+d):
        vx = Σ_{c=1..r} c·[P_c(x+c) − P_c(x−c)] with column profiles
        P_c(y) = w(c,0) a + Σ_{d>0} w(c,d)(a(y+d)+a(y−d)), and vy the
        transpose.  8r single-axis rolls per field instead of the ~(2.5x
        more) per-offset double rolls of the direct form."""
        ysum = {0: a}
        xsum = {0: a}
        for d in range(1, r + 1):
            ysum[d] = _rolly(a, d, W) + _rolly(a, -d, W)
            xsum[d] = _rollx(a, d, nx) + _rollx(a, -d, nx)
        vx = None
        vy = None
        for c in range(1, r + 1):
            prof_p = None
            prof_q = None
            for d in range(0, r + 1):
                w = wmap.get((c, d), 0.0)
                if not w:
                    continue
                tp = w * ysum[d]
                tq = w * xsum[d]
                prof_p = tp if prof_p is None else prof_p + tp
                prof_q = tq if prof_q is None else prof_q + tq
            if prof_p is None:
                continue
            tx = float(c) * (_rollx(prof_p, c, nx) - _rollx(prof_p, -c, nx))
            ty = float(c) * (_rolly(prof_q, c, W) - _rolly(prof_q, -c, W))
            vx = tx if vx is None else vx + tx
            vy = ty if vy is None else vy + ty
        return vx, vy

    def _substep_efs(f, fl, fvx, fvy, asx, asy, us, final=True):
        """EFS sub-step on the transformed PDF fbar = f - f^F/2
        (``ShanChenMCMP._step_efs``).  ``final=False`` defers the output
        solid masking; psi is then a fluid-guarded select so the stencils
        still see psi(solid) = 0."""
        rho = [sum(f[k]) for k in range(K)]
        rho_safe = [jnp.where(r > 0, r, 1.0) for r in rho]
        psi = rho if not is_pr else [_psi(r) for r in rho]
        if _defer_ok:
            flb = fl > 0.5
            psi = [jnp.where(flb, p, 0.0) for p in psi]
        # separable iso-stencil sums of psi (zero on solid)
        vx = [None] * K
        vy = [None] * K
        for k in range(K):
            vx[k], vy[k] = _iso_sums(psi[k], _wmap, radius)
        fx = [None] * K
        fy = [None] * K
        for k in range(K):
            gvx = jnp.zeros_like(rho[0])
            gvy = jnp.zeros_like(rho[0])
            for j in range(K):
                if not g_mat[k, j]:
                    continue
                gvx = gvx + float(g_mat[k, j]) * (vx[j] - psi[j] * fvx)
                gvy = gvy + float(g_mat[k, j]) * (vy[j] - psi[j] * fvy)
            fx[k] = -6.0 * psi[k] * gvx - float(g_sol[k]) * psi[k] * asx
            fy[k] = -6.0 * psi[k] * gvy - float(g_sol[k]) * psi[k] * asy
            if bfx:
                fx[k] = fx[k] + bfx * rho[k]
            if bfy:
                fy[k] = fy[k] + bfy * rho[k]
        # shared equilibrium velocity sum_k (m_k + F_k/2)/tau_k / sum rho/tau
        den = sum(rho[k] / tau[k] for k in range(K))
        den = jnp.where(den != 0, den, 1.0)
        numx = jnp.zeros_like(rho[0])
        numy = jnp.zeros_like(rho[0])
        for k in range(K):
            mxk = jnp.zeros_like(rho[0])
            myk = jnp.zeros_like(rho[0])
            for i in range(1, 9):
                exi, eyi = float(_E[i, 0]), float(_E[i, 1])
                if exi:
                    mxk = mxk + exi * f[k][i]
                if eyi:
                    myk = myk + eyi * f[k][i]
            numx = numx + (mxk + 0.5 * fx[k]) / tau[k]
            numy = numy + (myk + 0.5 * fy[k]) / tau[k]
        ux = numx / den
        uy = numy / den
        uu = ux * ux + uy * uy

        out = [[None] * 9 for _ in range(K)]
        for k in range(K):
            inv_t = 1.0 / tau[k]
            if params.collision == "SRT":
                feq, eu = _feq9(rho[k], ux, uy)
                # force PDF f^F_i = 3 ((e-u).F) feq_i / rho
                ef = [None, fx[k], fy[k], None, None, fx[k] + fy[k],
                      fy[k] - fx[k], None, None]
                uf = ux * fx[k] + uy * fy[k]
                r3 = 3.0 / rho_safe[k]
                ff = [None] * 9
                ff[0] = (-uf) * feq[0] * r3
                for i, io in _PAIRS9:
                    ff[i] = (ef[i] - uf) * feq[i] * r3
                    ff[io] = (-ef[i] - uf) * feq[io] * r3
                post = [None] * 9
                for i in range(9):
                    post[i] = f[k][i] + \
                        (feq[i] - f[k][i] - 0.5 * ff[i]) * inv_t + ff[i]
            else:
                # f' = f + ff - M^-1 S (m(f) - m_eq + m(ff)/2), with ff
                # folded in closed form (no feq / ff planes — see
                # _mrt_moment_post's fxy docstring)
                post = _mrt_moment_post(f[k], rho[k], ux, uy, inv_t,
                                        fxy=(fx[k], fy[k]))
            out[k][0] = post[0] * fl if final else post[0]
            for i in range(1, 9):
                dx, dy = int(_E[i, 0]), int(_E[i, 1])
                io = int(_OPP[i])
                pulled = jnp.where(us[i], post[io], sh(post[i], -dx, -dy))
                out[k][i] = pulled * fl if final else pulled
        return out

    def _substep(f, fl, adh_x, adh_y, us, final=True):
        rho = [sum(f[k]) for k in range(K)]
        rho_safe = [jnp.where(r > 0, r, 1.0) for r in rho]

        # common velocity u' = sum_k (sum_i f e / tau_k) / sum_k rho_k/tau_k
        den = sum(rho[k] / tau[k] for k in range(K))
        den = jnp.where(den != 0, den, 1.0)
        numx = jnp.zeros_like(rho[0])
        numy = jnp.zeros_like(rho[0])
        for k in range(K):
            mxk = jnp.zeros_like(rho[0])
            myk = jnp.zeros_like(rho[0])
            for i in range(1, 9):
                exi, eyi = float(_E[i, 0]), float(_E[i, 1])
                if exi:
                    mxk = mxk + exi * f[k][i]
                if eyi:
                    myk = myk + eyi * f[k][i]
            numx = numx + mxk / tau[k]
            numy = numy + myk / tau[k]
        upx = numx / den
        upy = numy / den

        # interaction force on the pseudopotential (zero on solid),
        # separable D2Q9 stencil: 8 single-axis rolls per fluid
        psi = rho if not is_pr else [_psi(r) for r in rho]
        if _defer_ok:
            flb = fl > 0.5
            psi = [jnp.where(flb, p, 0.0) for p in psi]
        vx = [None] * K
        vy = [None] * K
        for k in range(K):
            vx[k], vy[k] = _iso_sums(
                psi[k], {(1, 0): float(_W[1]), (1, 1): float(_W[5])}, 1)
        fx = [None] * K
        fy = [None] * K
        for k in range(K):
            gvx = sum(float(g_mat[k, j]) * vx[j] for j in range(K)
                      if g_mat[k, j])
            gvy = sum(float(g_mat[k, j]) * vy[j] for j in range(K)
                      if g_mat[k, j])
            gvx = gvx if not isinstance(gvx, int) else jnp.zeros_like(rho[0])
            gvy = gvy if not isinstance(gvy, int) else jnp.zeros_like(rho[0])
            fx[k] = -psi[k] * (gvx + float(g_sol[k]) * adh_x)
            fy[k] = -psi[k] * (gvy + float(g_sol[k]) * adh_y)
            if bfx:
                fx[k] = fx[k] + bfx * rho[k]
            if bfy:
                fy[k] = fy[k] + bfy * rho[k]

        # per-fluid u_eq, feq, (SRT|MRT) collision, stream
        out = [[None] * 9 for _ in range(K)]
        for k in range(K):
            ux = upx + tau[k] * fx[k] / rho_safe[k]
            uy = upy + tau[k] * fy[k] / rho_safe[k]
            inv_t = 1.0 / tau[k]
            if params.collision == "MRT":
                # moment relaxation toward feq(u_eq); forcing rides in the
                # shifted equilibrium velocity (``ShanChenMCMP._step_sc``).
                # feq is never materialized per direction: closed-form
                # equilibrium moments in _mrt_moment_post.
                post = _mrt_moment_post(f[k], rho[k], ux, uy, inv_t)
            else:
                feq, _ = _feq9(rho[k], ux, uy)
                post = [None] * 9
                for i in range(9):
                    post[i] = f[k][i] - (f[k][i] - feq[i]) * inv_t
            out[k][0] = post[0] * fl if final else post[0]
            for i in range(1, 9):
                dx, dy = int(_E[i, 0]), int(_E[i, 1])
                io = int(_OPP[i])
                pulled = jnp.where(us[i], post[io], sh(post[i], -dx, -dy))
                out[k][i] = pulled * fl if final else pulled
        return out

    # BC rows live within 8 rows of the two window seams (inlet rows
    # >= ny-1-radius, outlet rows <= radius+1, radius <= 3; window start
    # is always ≡ -H mod R), so in compiled mode the rewrites run on two
    # 16-row aligned bands stitched through a VMEM scratch plane — the
    # same scheme as ``csf._bc_sliced_*`` — instead of full-window
    # roll/select chains.  Interpret mode keeps the full-window path.
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

    def _bc_sliced_apply(apply_fn, f, fl, row0):
        news = []
        for lo, hi in (_seg1, _seg2):
            ws = hi - lo
            fs = [[p[lo:hi] for p in fk] for fk in f]
            fs = apply_fn(fs, fl[lo:hi], _seg_rows(row0, lo, ws), ws)
            news.append(fs)
        return [[_cat_rows(f[k][i], news[0][k][i], news[1][k][i])
                 for i in range(9)] for k in range(K)]

    def kernel(*refs):
        if use_scratch:
            _scr_cell[:] = [refs[-1]]
            refs = refs[:-1]
        row0_ref = None
        if is_local:
            # scalar-prefetched global row offset, K x (c, u, d), the
            # ppermuted per-fluid edge slabs, wrapped geo + its edge slabs
            row0_ref = refs[0]
            f_refs = refs[1:1 + 3 * K]
            slab_refs = refs[1 + 3 * K:1 + 5 * K]
            g_c, g_u, g_d, gup_sl, gdn_sl = refs[1 + 5 * K:1 + 5 * K + 5]
            out_refs = refs[1 + 5 * K + 5:]
            i0 = pl.program_id(0)
            first = i0 == 0
            last = i0 == nb - 1
            g_u = jnp.where(first, gup_sl[:], g_u[:])
            g_d = jnp.where(last, gdn_sl[:], g_d[:])
        else:
            # refs: K fields x (c, u, d) + geo (c, u, d) + K outputs
            f_refs = refs[:3 * K]
            g_c, g_u, g_d = refs[3 * K:3 * K + 3]
            out_refs = refs[3 * K + 3:]
            geo = jnp.concatenate([g_u[:], g_c[:], g_d[:]], axis=1)
        if is_local:
            geo = jnp.concatenate([g_u, g_c[:], g_d], axis=1)
        fl = geo[0]
        f = []
        for k in range(K):
            c, u, d = f_refs[3 * k:3 * k + 3]
            u = u[:]
            d = d[:]
            if is_local:
                u = jnp.where(first, slab_refs[2 * k][:], u)
                d = jnp.where(last, slab_refs[2 * k + 1][:], d)
            win = jnp.concatenate([u, c[:], d], axis=1)
            if bf16:
                # unshift the stored deviations to f32 once per window
                rk = win[9].astype(dtype) + win[10].astype(dtype)
                f.append([win[i].astype(dtype) + float(_W[i]) * rk
                          for i in range(9)])
            else:
                f.append([win[i] for i in range(9)])
        rows_g = row0_g = None
        if T > 1 or has_bcs:
            i0 = pl.program_id(0)
            off = row0_ref[0] if is_local else 0
            row0_g = off + i0 * R - H
            if not bc_sliced:
                r_iota = jax.lax.broadcasted_iota(jnp.int32, (W, nx), 0)
                rows_g = (row0_g + r_iota) % ny
        # static upwind-solid masks, hoisted out of the fluid/time loops
        solid_w = 1.0 - fl
        us = [None] + [sh(solid_w, -int(_E[i, 0]), -int(_E[i, 1])) > 0.5
                       for i in range(1, 9)]
        # Op order matches the jnp path (``_step_sc``/``_step_efs``):
        # inlet BC -> physics -> outlet BC per time step.
        for _t in range(T):
            _final = (not _defer_ok) or _t == T - 1
            if has_bcs:
                if bc_sliced:
                    f = _bc_sliced_apply(_apply_inlet_window, f, fl, row0_g)
                else:
                    f = _apply_inlet_window(f, fl, rows_g)
            if is_efs:
                f = _substep_efs(f, fl, geo[1], geo[2], geo[3], geo[4], us,
                                 final=_final)
            else:
                f = _substep(f, fl, geo[1], geo[2], us, final=_final)
            if has_bcs:
                if bc_sliced:
                    f = _bc_sliced_apply(_apply_outlet_window, f, fl,
                                         row0_g)
                else:
                    f = _apply_outlet_window(f, fl, rows_g)
        for k in range(K):
            if bf16:
                fk = [f[k][i][H:H + R] for i in range(9)]
                rho = fk[0]
                for i in range(1, 9):
                    rho = rho + fk[i]
                hi = rho.astype(jnp.bfloat16)
                for i in range(9):
                    out_refs[k][i] = (fk[i] - float(_W[i]) * rho) \
                        .astype(jnp.bfloat16)
                out_refs[k][9] = hi
                out_refs[k][10] = (rho - hi.astype(dtype)) \
                    .astype(jnp.bfloat16)
            else:
                for i in range(9):
                    out_refs[k][i] = f[k][i][H:H + R]

    n_f = 11 if bf16 else 9
    st_dtype = jnp.bfloat16 if bf16 else dtype
    center = pl.BlockSpec((n_f, R, nx), lambda i: (0, i, 0))
    halo_up = pl.BlockSpec((n_f, H, nx),
                           lambda i: (0, (i * (R // H) - 1) % hb, 0))
    halo_dn = pl.BlockSpec((n_f, H, nx),
                           lambda i: (0, (i * (R // H) + R // H) % hb, 0))
    gc = pl.BlockSpec((n_geo, R, nx), lambda i: (0, i, 0))
    gu = pl.BlockSpec((n_geo, H, nx),
                      lambda i: (0, (i * (R // H) - 1) % hb, 0))
    gd = pl.BlockSpec((n_geo, H, nx),
                      lambda i: (0, (i * (R // H) + R // H) % hb, 0))

    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024,
        dimension_semantics=("parallel",))
    scratch_shapes = ([pltpu.VMEM((W, nx), dtype)] if use_scratch else [])

    if is_local:
        # under PrefetchScalarGridSpec every index_map also receives the
        # scalar-prefetch ref (unused here)
        center_l = pl.BlockSpec((9, R, nx), lambda i, s: (0, i, 0))
        hu_l = pl.BlockSpec((9, H, nx),
                            lambda i, s: (0, (i * (R // H) - 1) % hb, 0))
        hd_l = pl.BlockSpec(
            (9, H, nx), lambda i, s: (0, (i * (R // H) + R // H) % hb, 0))
        slab = pl.BlockSpec((9, H, nx), lambda i, s: (0, 0, 0))
        gc_l = pl.BlockSpec((n_geo, R, nx), lambda i, s: (0, i, 0))
        gu_l = pl.BlockSpec((n_geo, H, nx),
                            lambda i, s: (0, (i * (R // H) - 1) % hb, 0))
        gd_l = pl.BlockSpec(
            (n_geo, H, nx),
            lambda i, s: (0, (i * (R // H) + R // H) % hb, 0))
        gslab = pl.BlockSpec((n_geo, H, nx), lambda i, s: (0, 0, 0))
        in_specs = [*([center_l, hu_l, hd_l] * K), *([slab, slab] * K),
                    gc_l, gu_l, gd_l, gslab, gslab]
        call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb,),
                in_specs=in_specs,
                out_specs=tuple(
                    pl.BlockSpec((9, R, nx), lambda i, s: (0, i, 0))
                    for _ in range(K)),
                scratch_shapes=tuple(scratch_shapes)),
            out_shape=tuple(jax.ShapeDtypeStruct((9, grid_ny, nx), dtype)
                            for _ in range(K)),
            compiler_params=compiler_params,
            interpret=interpret,
        )

        def step(f_loc, slabs, geo_loc, gup, gdn, row0):
            """f_loc: (K, 9, local_ny, nx); slabs: per fluid (up, dn)."""
            parts = []
            for k in range(K):
                parts.extend([f_loc[k]] * 3)
            for k in range(K):
                parts.extend(slabs[k])
            outs = call(row0, *parts, geo_loc, geo_loc, geo_loc, gup, gdn)
            return jnp.stack(outs)

        step.halo_rows = H
        step.defer_mask = _defer_ok
        return step

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[*([center, halo_up, halo_dn] * K), gc, gu, gd],
        out_specs=tuple(pl.BlockSpec((n_f, R, nx), lambda i: (0, i, 0))
                        for _ in range(K)),
        out_shape=tuple(jax.ShapeDtypeStruct((n_f, ny, nx), st_dtype)
                        for _ in range(K)),
        scratch_shapes=scratch_shapes,
        compiler_params=compiler_params,
        interpret=interpret,
    )

    def step(f):
        """f: (K, 9, ny, nx) -> same (or (K, 11, ny, nx) bf16 when
        ``storage='bf16'``; see ``ShanChenMCMP.pack_state_bf16``)."""
        parts = []
        for k in range(K):
            parts.extend([f[k]] * 3)
        outs = call(*parts, geo_dev, geo_dev, geo_dev)
        return jnp.stack(outs)

    step.defer_mask = _defer_ok
    return step


def build_sc_sharded_step(geometry: Geometry, params, mesh,
                          dtype=jnp.float32,
                          rows_per_block: int | None = None,
                          steps_per_call: int = 1,
                          bc_config=None,
                          interpret: bool = False):
    """Fused Shan-Chen/EFS step under a y-sharded mesh (the SC sibling of
    ``csf.build_csf_sharded_step``): per call each shard exchanges H halo
    rows of every fluid's PDFs and the static geometry with its ring
    neighbors via ``lax.ppermute`` over ICI, then runs the local kernel;
    BC rows resolve against global row indices through a
    scalar-prefetched shard offset.  Returns ``step(f) -> f'`` on the
    globally sharded (K, 9, ny, nx) state, or None when the decomposition
    does not apply."""
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    ny, nx = geometry.shape
    K = params.num_fluids
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_sh = axis_sizes.get("y", 1)
    if axis_sizes.get("x", 1) != 1 or ny % n_sh:
        return None
    ny_loc = ny // n_sh
    local = build_sc_fused_step(geometry, params, dtype, rows_per_block,
                                steps_per_call, bc_config,
                                local_ny=ny_loc, interpret=interpret)
    if local is None:
        return None
    H = local.halo_rows

    spec = P(None, None, "y", None)
    gspec = P(None, "y", None)
    geo_np = _sc_geo_stack(geometry, params)
    geo = jax.device_put(jnp.asarray(geo_np, dtype),
                         NamedSharding(mesh, gspec))
    fwd = [(j, (j + 1) % n_sh) for j in range(n_sh)]
    bwd = [(j, (j - 1) % n_sh) for j in range(n_sh)]

    def _local_step(f_loc, geo_loc):
        def halo(x, axis_from_end):
            up = lax.ppermute(
                jax.lax.slice_in_dim(x, x.shape[axis_from_end] - H,
                                     x.shape[axis_from_end],
                                     axis=axis_from_end), "y", fwd)
            dn = lax.ppermute(
                jax.lax.slice_in_dim(x, 0, H, axis=axis_from_end),
                "y", bwd)
            return up, dn

        slabs = []
        for k in range(K):
            up, dn = halo(f_loc[k], 1)
            slabs.append((up, dn))
        gup, gdn = halo(geo_loc, 1)
        row0 = jnp.reshape(
            (lax.axis_index("y") * ny_loc).astype(jnp.int32), (1,))
        return local(f_loc, slabs, geo_loc, gup, gdn, row0)

    sharded = shard_map(_local_step, mesh=mesh, in_specs=(spec, gspec),
                        out_specs=spec, check_vma=False)

    def step(f):
        return sharded(f, geo)

    return step
