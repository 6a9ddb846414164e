"""Fused D3Q19 Shan-Chen MCMP step as a Pallas TPU kernel.

The 3D sibling of ``pallas/shanchen.py``, built on the z-slab window
scheme of ``pallas/cg3d.py``: the grid iterates over z-slabs spanning
full (ny, nx) planes, x/y stencil taps are lane/sublane rolls, z taps are
plain slices, and every pipeline stage computes only the z-range still
live:

    psi on [0, W) -> interaction force on [1, W-1) -> collision on
    [1, W-1) -> streaming writes [2, W-2)

so each sub-step costs 2 halo slabs per side (the SC interaction stencil
is nearest-neighbor, unlike the CSF chain's 4).

Physics identical to ``models/flow3d.ShanChenMCMP3D._step_impl``
(the 3D generalization of the reference's original-SC velocity-shift
scheme, ``OptimizedD2Q9GPU.calInteractionForce:186-313`` /
``ShanChenD2Q9.runOptimizedLBM``): psi = rho, separable D3Q19
interaction stencil, common velocity u', per-fluid shifted-velocity
equilibria, SRT collision, pull-streaming with half-way bounce-back.
Periodic z (the 3D SC model defines no z-face boundary conditions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import Geometry
from ..lattice import D3Q19

__all__ = ["build_sc3d_fused_step", "build_sc3d_sharded_step"]

# opposite-direction pairs (e components are (x, y, z))
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


def geo_stack_sc3(geometry: Geometry) -> np.ndarray:
    """[is_fluid, adh_x, adh_y, adh_z]: the static solid-adhesion stencil
    field Σ_i w_i e_i is_solid(x+e_i) (as ``ShanChenMCMP3D.adhesion``)."""
    lat = D3Q19
    solid = geometry.is_solid.astype(np.float64)
    adh = [np.zeros_like(solid) for _ in range(3)]
    for i in range(1, lat.q):
        s = np.roll(np.roll(np.roll(solid, -int(lat.e[i, 2]), 0),
                            -int(lat.e[i, 1]), 1),
                    -int(lat.e[i, 0]), 2)
        for d in range(3):
            ed = int(lat.e[i, d])
            if ed:
                adh[d] += float(lat.w[i]) * ed * s
    return np.stack([geometry.is_fluid.astype(np.float64), *adh])


def build_sc3d_fused_step(geometry: Geometry, params, dtype=jnp.float32,
                          slabs_per_block: int | None = None,
                          steps_per_call: int = 1,
                          local_nz: int | None = None,
                          interpret: bool = False,
                          storage: str = "f32"):
    """Build the fused step ``f (K, 19, nz, ny, nx) -> f'`` advancing
    ``steps_per_call`` SC time steps per call.  Returns None when the
    domain does not slab-decompose or VMEM would overflow.

    ``local_nz`` builds the per-shard kernel for a z-decomposed domain
    (``build_sc3d_sharded_step``): the call takes the local block,
    per-fluid H-slab halos from the ring neighbors, and matching
    geometry slabs (z is periodic — no global-offset plumbing)."""
    nz, ny, nx = geometry.shape
    is_local = local_nz is not None
    lat = D3Q19
    e = lat.e
    w_lat = lat.w
    opp = lat.opp
    Q = lat.q
    K = params.num_fluids
    T = int(steps_per_call)
    tau = tuple(float(t) for t in params.tau)
    g_mat = np.asarray(params.g_matrix, np.float64)
    g_sol = np.asarray(params.g_solid, np.float64)
    bf = tuple(float(v) for v in params.body_force)
    if getattr(params, "psi", "rho") != "rho":
        return None  # 3D SC model is psi = rho (flow3d.ShanChenMCMP3D)

    # bf16 shifted-PDF storage: per fluid 21 bfloat16 planes — 19
    # deviations f_i - w_i*rho_k plus rho_k as a hi/lo bf16 pair — the
    # 2D scheme of pallas/shanchen.py storage='bf16' on D3Q19 (state
    # traffic 42/76 of f32); VMEM arithmetic stays f32.
    bf16 = storage == "bf16"
    if bf16 and is_local:
        return None

    need = 2 * T  # 2 halo slabs per sub-step: stencil ring + streaming
    grid_nz = int(local_nz) if is_local else nz

    def _pick_h(r):
        for d in range(need, r + 1):
            if r % d == 0 and grid_nz % d == 0:
                return d
        return None

    n_state = Q * K
    if slabs_per_block is None:
        for r in (32, 16, 8, 4, 2):
            if grid_nz % r:
                continue
            h = _pick_h(r)
            if h is None:
                continue
            if bf16:
                # bf16 windows (half-width) live alongside their f32
                # decode; outputs are half-width.  Calibrated: K=2 at
                # 128^3 R=8/H=2 models 128 MB and compiles/runs (1044
                # MLUPS); R=16 and T=2/R=8 (219/163 MB) both OOM.
                planes = (n_state + (n_state + 2 * K) // 2 + 12) * \
                    (r + 2 * h) + (n_state + 2 * K) * r // 2
            else:
                planes = (n_state + 12) * (r + 2 * h) + n_state * r
            mb = planes * ny * nx * 4 * 2.0 / 2**20
            # calibrated against the 126 MB scoped limit: K=2 at 128^3
            # R=8/H=2 models 113 MB and compiles at ~121 MB actual
            if mb <= (145 if bf16 else 118):
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

    geo_np = geo_stack_sc3(geometry)
    n_geo = geo_np.shape[0]
    geo_dev = jnp.asarray(geo_np, dtype)

    def shx(a, d):
        return _rollxy(a, d, 0, nx, ny)

    def shy(a, d):
        return _rollxy(a, 0, d, nx, ny)

    def _grad3d(a):
        """Σ_i w_i e_i a(x+e_i) per component on the range shrunk by one
        slab per side (separable D3Q19 stencil; see cg3d._grad3d)."""
        w_ax, w_diag = 1.0 / 18.0, 1.0 / 36.0
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

    def _feq19(rho, u):
        """Pair-shared quadratic equilibria (as cg3d._feq_src3, no
        source)."""
        ux, uy, uz = u
        uu = ux * ux + uy * uy + uz * uz
        base = 1.0 - 1.5 * uu
        eu = {1: ux, 3: uy, 5: uz, 7: ux + uy, 9: ux - uy, 11: ux + uz,
              13: ux - uz, 15: uy + uz, 17: uy - uz}
        feq = [None] * Q
        feq[0] = float(w_lat[0]) * rho * base
        for i, io in _PAIRS3:
            wrho = float(w_lat[i]) * rho
            eui = eu[i]
            a = wrho * (base + 4.5 * (eui * eui))
            b = (3.0 * wrho) * eui
            feq[i] = a + b
            feq[io] = a - b
        return feq

    # one sub-step: inputs valid on a window range of length n; outputs on
    # n-4 (offset +2).  `gcut(ch, k)` slices geometry channel ch by the
    # absolute offset k; `sm[i]` is the direction-i upwind-solid mask at
    # offset 2, hoisted out of the fluid loop (one rollxy+compare per
    # direction instead of K).
    #
    # Deferred solid masking (r5, as the 2D kernels): interior sub-steps
    # of a temporal block skip the 19*K output masks; psi/rho is a
    # fluid-guarded SELECT so solid garbage (which can reach inf through
    # the guarded-divide chain) cannot leak into the interaction stencil,
    # and the final sub-step masks outputs with a select (not a multiply
    # — inf*0 = NaN would stick at solid cells).
    def _substep(f, gcut, sm, final=True, masked_in=True):
        fl0 = gcut(0, 0)
        if masked_in:
            rho = [sum(f[k]) for k in range(K)]
        else:
            rho = [jnp.where(fl0 > 0.5, sum(f[k]), 0.0) for k in range(K)]
        # separable interaction stencil of psi = rho: offset 1
        v = [_grad3d(rho[k]) for k in range(K)]
        rho1 = [_zcut(rho[k], 1) for k in range(K)]
        force = []  # [K][3] at offset 1
        for k in range(K):
            fk = []
            for d in range(3):
                gv = None
                for j in range(K):
                    if not g_mat[k, j]:
                        continue
                    t = float(g_mat[k, j]) * v[j][d]
                    gv = t if gv is None else gv + t
                if gv is None:
                    gv = jnp.zeros_like(rho1[k])
                c = -rho1[k] * (gv + float(g_sol[k]) * gcut(1 + d, 1))
                if bf[d]:
                    c = c + bf[d] * rho1[k]
                fk.append(c)
            force.append(fk)

        # common velocity u' = Σ_k m_k/τ_k / Σ_k ρ_k/τ_k at offset 1;
        # momenta as opposite-pair differences (21 VPU ops per fluid
        # instead of 30): e7=x+y, e9=x-y, e11=x+z, e13=x-z, e15=y+z,
        # e17=y-z (lattice.py D3Q19 ordering)
        den = None
        for k in range(K):
            t = rho1[k] * (1.0 / tau[k])
            den = t if den is None else den + t
        den = jnp.where(den != 0, den, 1.0)
        num = [None, None, None]
        for k in range(K):
            dp = {}
            for i, io in _PAIRS3:
                dp[i] = _zcut(f[k][i], 1) - _zcut(f[k][io], 1)
            mom = (dp[1] + ((dp[7] + dp[9]) + (dp[11] + dp[13])),
                   dp[3] + ((dp[7] - dp[9]) + (dp[15] + dp[17])),
                   dp[5] + ((dp[11] - dp[13]) + (dp[15] - dp[17])))
            for d in range(3):
                t = mom[d] * (1.0 / tau[k])
                num[d] = t if num[d] is None else num[d] + t
        up = [num[d] / den for d in range(3)]

        out = [[None] * Q for _ in range(K)]
        fl2b = gcut(0, 2) > 0.5
        for k in range(K):
            rs = jnp.where(rho1[k] > 0, rho1[k], 1.0)
            ueq = tuple(up[d] + tau[k] * force[k][d] / rs
                        for d in range(3))
            inv_t = 1.0 / tau[k]
            # feq is linear in rho, so feeding rho/tau yields feq/tau
            # directly: post = (1 - 1/tau) f + feq/tau (one madd per
            # plane, no 19 inv_t multiplies)
            feq_s = _feq19(rho1[k] * inv_t, ueq)
            c1 = 1.0 - inv_t
            post = [None] * Q
            for i in range(Q):
                post[i] = c1 * _zcut(f[k][i], 1) + feq_s[i]
            o0 = _zcut(post[0], 1)
            out[k][0] = jnp.where(fl2b, o0, 0.0) if final else o0
            for i in range(1, Q):
                io = int(opp[i])
                dx, dy, dz = int(e[i, 0]), int(e[i, 1]), int(e[i, 2])
                pulled = _rollxy(_zsh(post[i], -dz, 1), -dx, -dy, nx, ny)
                oi = jnp.where(sm[i], _zcut(post[io], 1), pulled)
                out[k][i] = jnp.where(fl2b, oi, 0.0) if final else oi
        return out

    def kernel(*refs):
        f_refs = refs[:3 * K]
        if is_local:
            slab_refs = refs[3 * K:5 * K]
            g_c, g_u, g_d, gup_sl, gdn_sl = refs[5 * K:5 * K + 5]
            outs = refs[5 * K + 5:]
            i0 = pl.program_id(0)
            first = i0 == 0
            last = i0 == nb - 1
            g_u = jnp.where(first, gup_sl[:], g_u[:])
            g_d = jnp.where(last, gdn_sl[:], g_d[:])
            geo = jnp.concatenate([g_u, g_c[:], g_d], axis=1)
        else:
            g_c, g_u, g_d = refs[3 * K:3 * K + 3]
            outs = refs[3 * K + 3:]
            geo = jnp.concatenate([g_u[:], g_c[:], g_d[:]], axis=1)
        solid = 1.0 - geo[0]
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
                rk = win[Q].astype(dtype) + win[Q + 1].astype(dtype)
                f.append([win[i].astype(dtype) + float(w_lat[i]) * rk
                          for i in range(Q)])
            else:
                f.append([win[i] for i in range(Q)])
        for t in range(T):
            base = 2 * t

            def gcut_s(ch, k, _b=base):
                return _zcut(geo[ch], _b + k)

            def solid_sh_s(i, _b=base):
                dx, dy, dz = int(e[i, 0]), int(e[i, 1]), int(e[i, 2])
                return _rollxy(_zsh(_zcut(solid, _b + 1), -dz, 1),
                               -dx, -dy, nx, ny) > 0.5

            sm = [None] + [solid_sh_s(i) for i in range(1, Q)]
            f = _substep(f, gcut_s, sm, final=(t == T - 1),
                         masked_in=(t == 0))
        o0 = H - 2 * T
        for k in range(K):
            if bf16:
                fk = [f[k][i][o0:o0 + R] for i in range(Q)]
                rho = fk[0]
                for i in range(1, Q):
                    rho = rho + fk[i]
                hi = rho.astype(jnp.bfloat16)
                for i in range(Q):
                    outs[k][i] = (fk[i] - float(w_lat[i]) * rho) \
                        .astype(jnp.bfloat16)
                outs[k][Q] = hi
                outs[k][Q + 1] = (rho - hi.astype(dtype)) \
                    .astype(jnp.bfloat16)
            else:
                for i in range(Q):
                    outs[k][i] = f[k][i][o0:o0 + R]

    n_f = Q + 2 if bf16 else Q
    st_dtype = jnp.bfloat16 if bf16 else dtype
    center = pl.BlockSpec((n_f, R, ny, nx), lambda i: (0, i, 0, 0))
    halo_up = pl.BlockSpec((n_f, H, ny, nx),
                           lambda i: (0, (i * (R // H) - 1) % hb, 0, 0))
    halo_dn = pl.BlockSpec((n_f, H, ny, nx),
                           lambda i: (0, (i * (R // H) + R // H) % hb, 0, 0))
    gc = pl.BlockSpec((n_geo, R, ny, nx), lambda i: (0, i, 0, 0))
    gu = pl.BlockSpec((n_geo, H, ny, nx),
                      lambda i: (0, (i * (R // H) - 1) % hb, 0, 0))
    gd = pl.BlockSpec((n_geo, H, ny, nx),
                      lambda i: (0, (i * (R // H) + R // H) % hb, 0, 0))

    in_specs = [*([center, halo_up, halo_dn] * K)]
    if is_local:
        slab = pl.BlockSpec((Q, H, ny, nx), lambda i: (0, 0, 0, 0))
        gslab = pl.BlockSpec((n_geo, H, ny, nx), lambda i: (0, 0, 0, 0))
        in_specs += [*([slab, slab] * K), gc, gu, gd, gslab, gslab]
    else:
        in_specs += [gc, gu, gd]

    call = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec((n_f, R, ny, nx),
                                     lambda i: (0, i, 0, 0))
                        for _ in range(K)),
        out_shape=tuple(jax.ShapeDtypeStruct((n_f, grid_nz, ny, nx),
                                             st_dtype)
                        for _ in range(K)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )

    if is_local:
        def step(f_loc, slabs, geo_loc, gup, gdn):
            """f_loc: (K, 19, local_nz, ny, nx); slabs per fluid."""
            parts = []
            for k in range(K):
                parts.extend([f_loc[k]] * 3)
            for k in range(K):
                parts.extend(slabs[k])
            outs = call(*parts, geo_loc, geo_loc, geo_loc, gup, gdn)
            return jnp.stack(outs)

        step.halo_slabs = H
        return step

    def step(f):
        """f: (K, 19, nz, ny, nx) -> same."""
        parts = []
        for k in range(K):
            parts.extend([f[k]] * 3)
        outs = call(*parts, geo_dev, geo_dev, geo_dev)
        return jnp.stack(outs)

    return step


def build_sc3d_sharded_step(geometry: Geometry, params, mesh,
                            dtype=jnp.float32,
                            slabs_per_block: int | None = None,
                            steps_per_call: int = 1,
                            interpret: bool = False):
    """Fused D3Q19 SC step under a z-sharded mesh: per call each shard
    exchanges H halo slabs of every fluid's PDFs and the static geometry
    with its ring neighbors via ``lax.ppermute`` over ICI, then runs the
    local periodic kernel.  Returns ``step(f) -> f'`` on the globally
    sharded (K, 19, nz, ny, nx) state, or None when the decomposition
    does not apply."""
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    nz, ny, nx = geometry.shape
    K = params.num_fluids
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_sh = axis_sizes.get("y", 1)
    if axis_sizes.get("x", 1) != 1 or nz % n_sh:
        return None
    nz_loc = nz // n_sh
    local = build_sc3d_fused_step(geometry, params, dtype, slabs_per_block,
                                  steps_per_call, local_nz=nz_loc,
                                  interpret=interpret)
    if local is None:
        return None
    H = local.halo_slabs

    spec = P(None, None, "y", None, None)
    gspec = P(None, "y", None, None)
    geo = jax.device_put(jnp.asarray(geo_stack_sc3(geometry), dtype),
                         NamedSharding(mesh, gspec))
    fwd = [(j, (j + 1) % n_sh) for j in range(n_sh)]
    bwd = [(j, (j - 1) % n_sh) for j in range(n_sh)]

    def _local_step(f_loc, geo_loc):
        def halo(x, ax):
            up = lax.ppermute(
                jax.lax.slice_in_dim(x, x.shape[ax] - H, x.shape[ax],
                                     axis=ax), "y", fwd)
            dn = lax.ppermute(jax.lax.slice_in_dim(x, 0, H, axis=ax),
                              "y", bwd)
            return up, dn

        slabs = []
        for k in range(K):
            slabs.append(halo(f_loc[k], 1))
        gup, gdn = halo(geo_loc, 1)
        return local(f_loc, slabs, geo_loc, gup, gdn)

    sharded = shard_map(_local_step, mesh=mesh, in_specs=(spec, gspec),
                        out_specs=spec, check_vma=False)

    def step(f):
        return sharded(f, geo)

    return step
