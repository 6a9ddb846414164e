"""Fused D3Q19 Shan-Chen kernel vs the jnp model path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openlbmpm_tpu import geometry as geo
from openlbmpm_tpu.models.flow3d import ShanChenMCMP3D, ShanChenParams3D
from openlbmpm_tpu.pallas.sc3d import build_sc3d_fused_step


def _model(walls: bool, n: int = 16):
    solid = np.zeros((n, n, n), bool)
    if walls:
        solid[:, 0, :] = solid[:, -1, :] = True
    p = ShanChenParams3D(g_matrix=((0.0, 3.6), (3.6, 0.0)),
                         g_solid=(-0.3, 0.3), tau=(1.0, 0.8),
                         body_force=(0.0, 0.0, -1e-5) if walls
                         else (0.0, 0.0, 0.0))
    m = ShanChenMCMP3D(geo.from_solid_mask(solid), p, dtype=jnp.float64,
                       use_pallas=False)
    return m, p


@pytest.mark.slow
@pytest.mark.parametrize("walls,t_block", [
    (False, 1), (True, 1), (True, 2)])
def test_sc3d_fused_matches_jnp(walls, t_block):
    m, p = _model(walls)
    fused = build_sc3d_fused_step(m.geo, p, jnp.float64,
                                  slabs_per_block=4,
                                  steps_per_call=t_block, interpret=True)
    assert fused is not None
    f = m.init_state_droplet((1.0, 1.0), (0.02, 0.02), radius=5.0)
    a = f
    c = f
    for _ in range(4):
        a = m._step_impl(a)
    for _ in range(4 // t_block):
        c = fused(c)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
@pytest.mark.parametrize("collision,force,t_block", [
    ("SRT", False, 1), ("SRT", True, 2), ("TRT", True, 1)])
def test_single3d_fused_matches_jnp(collision, force, t_block):
    """Fused single-phase D3Q19 kernel (pallas/single3d.py) matches the
    jnp SinglePhaseD3Q19 step (SRT/TRT, Guo force, walls)."""
    from openlbmpm_tpu.models.flow3d import SinglePhaseD3Q19
    from openlbmpm_tpu.pallas.single3d import build_single3d_fused_step
    n = 16
    solid = np.zeros((n, n, n), bool)
    solid[:, 0, :] = solid[:, -1, :] = True
    bf = (0.0, 0.0, -1e-5) if force else (0.0, 0.0, 0.0)
    m = SinglePhaseD3Q19(geo.from_solid_mask(solid), tau=0.8,
                         collision=collision, body_force=bf,
                         dtype=jnp.float64, use_pallas=False)
    fused = build_single3d_fused_step(m.geo, 0.8, collision, bf,
                                      jnp.float64, slabs_per_block=4,
                                      steps_per_call=t_block,
                                      interpret=True)
    assert fused is not None
    f = m.init_state()
    a = f
    c = f
    for _ in range(4):
        a = m._step_impl(a)
    for _ in range(4 // t_block):
        c = fused(c)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_coupled3d_fused_matches_jnp():
    """Fused coupled 3D step (compressed flow + in-window D3Q7 tracer +
    interface-bounce-back epilogue) matches TransportRK3D._step_impl."""
    from openlbmpm_tpu.models.flow3d import (CG3DBoundaryConfig,
                                             ColorGradientParams3D,
                                             TransportRK3D)
    n = 16
    solid = np.zeros((n, n, n), bool)
    solid[:, 0, :] = solid[:, -1, :] = True
    fp = ColorGradientParams3D(surface_tension=0.01, tau_r=1.0, tau_b=0.8,
                               contact_angle_deg=60.0)
    m = TransportRK3D(geo.from_solid_mask(solid), fp, num_tracers=1,
                      tau=(1.0,), j0=(0.25,),
                      interface_mode="bounceback", dtype=jnp.float64)
    # open z faces: velocity inlet + convective outlet (BC prologue path)
    m.flow.bcs = CG3DBoundaryConfig(inlet="velocity", outlet="convective",
                                    inlet_velocity=-1e-3)
    fused = m.make_fused_step(slabs_per_block=4, interpret=True)
    assert fused is not None
    fs = m.flow.init_state_layers(1.0, 1.0, invading_slabs=6)
    conc0 = np.zeros((1, n, n, n))
    conc0[0, 2:6] = 1.0
    state = m.init_state(fs, conc0)
    s = m.flow.pack_state(state[0], state[1])
    g = state[2]
    for _ in range(4):
        state = m._step_impl(state)
        s, g = fused(s, g)
    ref_s = m.flow.pack_state(state[0], state[1])
    np.testing.assert_allclose(np.asarray(ref_s), np.asarray(s),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(state[2]), np.asarray(g),
                               rtol=0, atol=1e-12)


def test_coupled3d_bf16_storage_tracks_f32():
    """storage='bf16' composes with the coupled 3D flow+transport kernel:
    FLOW planes ride the 21-plane bf16 state while D3Q7 tracer PDFs stay
    f32 — the bf16 trajectory tracks the f32 coupled trajectory within
    storage rounding and tracer mass conservation is f32-grade."""
    from openlbmpm_tpu.models.flow3d import (CG3DBoundaryConfig,
                                             ColorGradientParams3D,
                                             TransportRK3D)
    n = 16
    solid = np.zeros((n, n, n), bool)
    solid[:, 0, :] = solid[:, -1, :] = True
    fp = ColorGradientParams3D(surface_tension=0.01, tau_r=1.0, tau_b=0.8,
                               contact_angle_deg=60.0)
    m = TransportRK3D(geo.from_solid_mask(solid), fp, num_tracers=1,
                      tau=(1.0,), j0=(0.25,),
                      interface_mode="bounceback", dtype=jnp.float32)
    m.flow.bcs = CG3DBoundaryConfig(inlet="velocity", outlet="convective",
                                    inlet_velocity=-1e-3)
    f32_step = m.make_fused_step(slabs_per_block=4, interpret=True)
    bf_step = m.make_fused_step(slabs_per_block=4, interpret=True,
                                storage="bf16")
    assert f32_step is not None and bf_step is not None
    fs = m.flow.init_state_layers(1.0, 1.0, invading_slabs=6)
    conc0 = np.zeros((1, n, n, n))
    conc0[0, 2:6] = 1.0
    state = m.init_state(fs, conc0)
    s = m.flow.pack_state(state[0], state[1])
    h = m.flow.pack_state_bf16(state[0], state[1])
    g_s = state[2]
    g_h = state[2]
    for _ in range(3):
        s, g_s = f32_step(s, g_s)
        h, g_h = bf_step(h, g_h)
    assert h.dtype == jnp.bfloat16 and h.shape[0] == 21
    assert g_h.dtype == jnp.float32
    u = m.flow.unpack_bf16(h)
    assert bool(jnp.isfinite(u).all())
    assert float(jnp.max(jnp.abs(u[:19] - s[:19]))) < 1e-2
    assert float(jnp.max(jnp.abs(u[19] - s[19]))) < 2e-2
    assert float(jnp.max(jnp.abs(g_h - g_s))) < 2e-2
    # tracer mass: compare against the f32 path's mass (same summation
    # order) so the bar measures bf16-induced drift only
    assert abs(float(jnp.sum(g_h)) - float(jnp.sum(g_s))) / \
        max(float(jnp.sum(g_s)), 1e-30) < 1e-6


def test_sc3d_bf16_storage_tracks_f32():
    """bf16 shifted-PDF storage on D3Q19 SC (storage='bf16') tracks the
    f32 trajectory: deviations f_i - w_i*rho_k round at bf16, rho_k
    rides a hi/lo pair (same scheme as pallas/shanchen.py)."""
    n = 16
    p = ShanChenParams3D(g_matrix=((0.0, 3.6), (3.6, 0.0)),
                         g_solid=(0.0, 0.0), tau=(1.0, 0.8))
    m = ShanChenMCMP3D(geo.from_solid_mask(np.zeros((n, n, n), bool)), p,
                       dtype=jnp.float32, use_pallas=False)
    f32_step = m.make_block_step(steps_per_call=1, slabs_per_block=4,
                                 interpret=True)
    bf_step = m.make_block_step(steps_per_call=1, slabs_per_block=4,
                                interpret=True, storage="bf16")
    assert f32_step is not None and bf_step is not None
    f = m.init_state_droplet((1.0, 1.0), (0.02, 0.02), radius=5.0)
    h = m.pack_state_bf16(f)
    rt = m.unpack_bf16(h)
    assert float(jnp.max(jnp.abs(rt - f))) < 2e-3
    assert float(jnp.max(jnp.abs(jnp.sum(rt, axis=1) -
                                 jnp.sum(f, axis=1)))) < 1e-4
    s = f
    for _ in range(3):
        s = f32_step(s)
        h = bf_step(h)
    assert h.dtype == jnp.bfloat16 and h.shape[1] == 21
    u = m.unpack_bf16(h)
    assert bool(jnp.isfinite(u).all())
    assert float(jnp.max(jnp.abs(u - s))) < 5e-3
    for k in range(2):
        ms_ = float(jnp.sum(s[k]))
        assert abs(float(jnp.sum(u[k])) - ms_) / ms_ < 1e-3
