"""Fused Pallas Shan-Chen kernel vs the jnp path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openlbmpm_tpu import geometry as geo
from openlbmpm_tpu.models.shanchen import (SCBoundaryConfig, ShanChenMCMP,
                                           ShanChenParams)
from openlbmpm_tpu.pallas.shanchen import build_sc_fused_step


def _params(g_solid=(0.0, 0.0), tau=(1.0, 0.8)):
    return ShanChenParams(g_matrix=((0.0, 3.6), (3.6, 0.0)),
                          g_solid=g_solid, tau=tau)


@pytest.mark.parametrize("t_block", [1, 2, 4])
def test_sc_fused_periodic(t_block):
    n = 32
    p = _params()
    m = ShanChenMCMP(geo.from_solid_mask(np.zeros((n, n), bool)), p,
                     dtype=jnp.float32, use_pallas=False)
    fused = build_sc_fused_step(
        m.geo, p, jnp.float32, rows_per_block=16 if t_block > 2 else 8,
        steps_per_call=t_block, bc_config=m.bcs, interpret=True)
    a = m.init_state_droplet((1.0, 1.0), (0.02, 0.02), radius=8.0)
    c = a
    for _ in range(4):
        a = m._step_sc(a)
    for _ in range(4 // t_block):
        c = fused(c)
    assert float(jnp.max(jnp.abs(a - c))) < 5e-6


@pytest.mark.parametrize("inlet,outlet", [
    ("zou_he_velocity", "convective"),
    ("zou_he_pressure", "zou_he_pressure")])
def test_sc_fused_channel_bcs(inlet, outlet):
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    bcs = SCBoundaryConfig(inlet=inlet, outlet=outlet,
                           inlet_velocity=(-1e-3, 0.0),
                           inlet_density=(1.02, 0.02),
                           outlet_density=(0.02, 1.0))
    p = _params(g_solid=(-0.3, 0.3), tau=(1.0, 1.0))
    m = ShanChenMCMP(geo.from_solid_mask(solid), p, bcs,
                     dtype=jnp.float32, use_pallas=False)
    fused = build_sc_fused_step(m.geo, p, jnp.float32, rows_per_block=8,
                                steps_per_call=2, bc_config=bcs,
                                interpret=True)
    a = m.init_state_layers((1.0, 1.0), (0.02, 0.02), invading_rows=8)
    c = a
    for _ in range(4):
        a = m._step_sc(a)
    for _ in range(2):
        c = fused(c)
    assert float(jnp.max(jnp.abs(a - c))) < 5e-6


@pytest.mark.parametrize("t_block", [1, 2])
def test_sc_fused_pr_psi_matches_jnp(t_block):
    """psi = Peng-Robinson EOS computed in-kernel (single-component
    liquid-vapor; ``calFluidPotentialGPUPR``, OptimizedD2Q9GPU.py:112-127).
    t_block=2 also exercises the deferred-masking psi select on the PR
    branch (walled geometry)."""
    n = 32
    solid = np.zeros((n, n), bool)
    if t_block > 1:
        solid[:, 0] = solid[:, -1] = True
    p = ShanChenParams(g_matrix=((-1.0,),), g_solid=(0.0,), tau=(1.0,),
                       psi="PR")
    m = ShanChenMCMP(geo.from_solid_mask(solid), p,
                     dtype=jnp.float32, use_pallas=False)
    fused = build_sc_fused_step(m.geo, p, jnp.float32, rows_per_block=8,
                                steps_per_call=t_block,
                                bc_config=m.bcs, interpret=True)
    a = m.init_state_droplet((0.2,), (0.05,), radius=8.0)
    c = a
    for _ in range(4):
        a = m._step_sc(a)
    for _ in range(4 // t_block):
        c = fused(c)
    assert bool(jnp.isfinite(a).all())
    assert float(jnp.max(jnp.abs(a - c))) < 5e-6


def test_sc_fused_mrt_matches_jnp():
    """Original SC with MRT collision toward feq(u_eq) in-kernel."""
    n = 32
    p = ShanChenParams(g_matrix=((0.0, 3.6), (3.6, 0.0)),
                       g_solid=(0.0, 0.0), tau=(1.0, 0.8), collision="MRT")
    m = ShanChenMCMP(geo.from_solid_mask(np.zeros((n, n), bool)), p,
                     dtype=jnp.float32, use_pallas=False)
    fused = build_sc_fused_step(m.geo, p, jnp.float32, rows_per_block=8,
                                bc_config=m.bcs, interpret=True)
    a = m.init_state_droplet((1.0, 1.0), (0.02, 0.02), radius=8.0)
    c = a
    for _ in range(4):
        a = m._step_sc(a)
        c = fused(c)
    assert float(jnp.max(jnp.abs(a - c))) < 5e-6


@pytest.mark.parametrize("iso,coll,t_block", [
    (4, "SRT", 1), (8, "SRT", 1), (10, "SRT", 1),
    (4, "MRT", 1), (8, "MRT", 2)])
def test_efs_fused_matches_jnp(iso, coll, t_block):
    """EFS fused kernel (iso-4/8/10 force, EDM SRT / constant-matrix MRT)
    matches the jnp transformed-PDF path with full BC choreography."""
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    bcs = SCBoundaryConfig(inlet="zou_he_velocity", outlet="convective",
                           inlet_velocity=(-1e-3, 0.0))
    p = ShanChenParams(g_matrix=((0.0, 0.2), (0.2, 0.0)),
                       g_solid=(-0.14, 0.14), tau=(1.0, 0.8),
                       scheme="EFS", iso_order=iso, collision=coll)
    m = ShanChenMCMP(geo.from_solid_mask(solid), p, bcs,
                     dtype=jnp.float32, use_pallas=False)
    fused = build_sc_fused_step(m.geo, p, jnp.float32, rows_per_block=16,
                                steps_per_call=t_block, bc_config=bcs,
                                interpret=True)
    a = m.init_state_layers((1.0, 1.0), (0.02, 0.02), invading_rows=8)
    c = a
    for _ in range(4):
        a = m._step_efs(a)
    for _ in range(4 // t_block):
        c = fused(c)
    assert float(jnp.max(jnp.abs(a - c))) < 5e-6


def test_sc_fused_three_fluids_matches_jnp():
    """The fused SC kernel is K-general: K=3 matches the jnp step."""
    n = 32
    g = 3.6
    p = ShanChenParams(
        g_matrix=((0.0, g, g), (g, 0.0, g), (g, g, 0.0)),
        g_solid=(0.0, 0.0, 0.0), tau=(1.0, 0.9, 0.8))
    m = ShanChenMCMP(geo.from_solid_mask(np.zeros((n, n), bool)), p,
                     dtype=jnp.float32, use_pallas=False)
    fused = build_sc_fused_step(m.geo, p, jnp.float32, rows_per_block=8,
                                steps_per_call=1, bc_config=m.bcs,
                                interpret=True)
    assert fused is not None
    rho = np.full((3, n, n), 0.02)
    rho[0, : n // 3] = 1.0
    rho[1, n // 3: 2 * n // 3] = 1.0
    rho[2, 2 * n // 3:] = 1.0
    a = m._feq_init(jnp.asarray(rho, jnp.float32))
    c = a
    for _ in range(3):
        a = m._step_sc(a)
        c = fused(c)
    assert float(jnp.max(jnp.abs(a - c))) < 5e-6


def test_sc_bf16_storage_tracks_f32():
    """bf16 shifted-PDF storage (storage='bf16') tracks the f32 SC
    trajectory: PDF planes inherit the bf16 rounding of the stored
    deviations f_i - w_i*rho_k, while each rho_k rides a hi/lo bf16 pair
    (~2^-17) so densities keep near-f32 precision.  Unlike the CSF scheme
    the shift is w_i*rho_k (MCMP densities span 0.02..2), see
    pallas/shanchen.py storage='bf16'."""
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    bcs = SCBoundaryConfig(inlet="zou_he_velocity", outlet="convective",
                           inlet_velocity=(-1e-3, 0.0),
                           outlet_density=(0.02, 1.0))
    p = _params(g_solid=(-0.3, 0.3), tau=(1.0, 1.0))
    m = ShanChenMCMP(geo.from_solid_mask(solid), p, bcs,
                     dtype=jnp.float32, use_pallas=False)
    f32_step = m.make_block_step(steps_per_call=2, rows_per_block=8,
                                 interpret=True)
    bf_step = m.make_block_step(steps_per_call=2, rows_per_block=8,
                                interpret=True, storage="bf16")
    assert f32_step is not None and bf_step is not None
    a = m.init_state_layers((1.0, 1.0), (0.02, 0.02), invading_rows=8)
    h = m.pack_state_bf16(a)

    # pack/unpack round-trip: deviation rounding only, rho near-exact
    rt = m.unpack_bf16(h)
    assert float(jnp.max(jnp.abs(rt - a))) < 2e-3
    rho_rt = jnp.sum(rt, axis=1)
    assert float(jnp.max(jnp.abs(rho_rt - jnp.sum(a, axis=1)))) < 1e-4

    s = a
    for _ in range(3):
        s = f32_step(s)
        h = bf_step(h)
    assert h.dtype == jnp.bfloat16 and h.shape[1] == 11
    u = m.unpack_bf16(h)
    assert bool(jnp.isfinite(u).all())
    assert float(jnp.max(jnp.abs(u - s))) < 5e-3
    # per-fluid mass within storage rounding
    for k in range(2):
        ms_ = float(jnp.sum(s[k]))
        assert abs(float(jnp.sum(u[k])) - ms_) / ms_ < 1e-3
