"""Fused Pallas CSF kernel vs the jnp reference path (interpret mode).

The fused kernel (``openlbmpm_tpu/pallas/csf.py``) must reproduce the jnp
step bit-for-bit up to f32 rounding for every variant combination: SRT/MRT,
periodic/walled (wetting machinery), with and without body force.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from openlbmpm_tpu import geometry as geo
from openlbmpm_tpu.models.colorgradient import (
    CGBoundaryConfig, ColorGradientParams, ColorGradientRK)
from openlbmpm_tpu.pallas.csf import build_csf_fused_step, pick_rows_per_block


def _model(walls: bool, collision: str, n: int = 32, **kw):
    solid = np.zeros((n, n), bool)
    if walls:
        solid[:, 0] = solid[:, -1] = True
    defaults = dict(
        variant="CSF", collision=collision, surface_tension=0.01,
        tau_r=1.0, tau_b=0.8, tau_type=2, wetting_type=2,
        contact_angle_deg=60.0, beta=0.7)
    defaults.update(kw)
    params = ColorGradientParams(**defaults)
    m = ColorGradientRK(geo.from_solid_mask(solid), params,
                        CGBoundaryConfig(), dtype=jnp.float32,
                        use_pallas=False)
    return m


@pytest.mark.parametrize("walls,collision", [
    (False, "SRT"), (False, "MRT"), (True, "SRT"), (True, "MRT")])
def test_fused_matches_jnp(walls, collision):
    m = _model(walls, collision)
    fused = build_csf_fused_step(m.geo, m.p, jnp.float32,
                                 rows_per_block=8, interpret=True)
    a, b = m.init_state_droplet(1.0, 1.0, radius=8.0)
    c, d = a, b
    for _ in range(5):
        a, b = m._step_impl(a, b)
        c, d = fused(c, d)
    assert float(jnp.max(jnp.abs(a - c))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra
    assert float(jnp.max(jnp.abs(b - d))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra


def test_fused_with_body_force_and_tau_type1():
    m = _model(True, "SRT", body_force=(1e-6, -2e-6), tau_type=1,
               wetting_type=1, contact_angle_deg=120.0)
    fused = build_csf_fused_step(m.geo, m.p, jnp.float32,
                                 rows_per_block=8, interpret=True)
    a, b = m.init_state_droplet(1.0, 1.0, radius=8.0)
    c, d = a, b
    for _ in range(3):
        a, b = m._step_impl(a, b)
        c, d = fused(c, d)
    assert float(jnp.max(jnp.abs(a - c))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra
    assert float(jnp.max(jnp.abs(b - d))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra


@pytest.mark.slow
def test_fused_contact_line_matches_jnp_f64():
    """Contact-line cells (interface meeting the side walls) exercise the
    wetting-rotation distance tie-breaks; at f32 a 1-ulp input difference
    flips them (seen on TPU at the walls, ~2e-3 locally), so algorithmic
    equivalence must be proven at f64 where the selects agree."""
    import jax
    if not jax.config.read("jax_enable_x64"):
        pytest.skip("needs x64")
    ny, nx = 48, 32
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        variant="CSF", collision="MRT", surface_tension=0.01,
        tau_r=1.0, tau_b=0.8, tau_type=2, wetting_type=2,
        contact_angle_deg=60.0, beta=0.7)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    m = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                        dtype=jnp.float64, use_pallas=False)
    # layered interface spans the full width -> contact line at both walls
    a, b = m.init_state_layers(1.0, 1.0, invading_rows=16)
    fused = build_csf_fused_step(m.geo, m.p, jnp.float64,
                                 rows_per_block=8, steps_per_call=1,
                                 bc_config=bcs, interpret=True)
    fused_c = build_csf_fused_step(m.geo, m.p, jnp.float64,
                                   rows_per_block=8, steps_per_call=1,
                                   bc_config=bcs, state_mode="compressed",
                                   interpret=True)
    c, d = a, b
    s = m.pack_state(a, b)
    for _ in range(6):
        a, b = m._step_impl(a, b)
        c, d = fused(c, d)
        s = fused_c(s)
    assert float(jnp.max(jnp.abs(a - c))) < 1e-12
    assert float(jnp.max(jnp.abs(b - d))) < 1e-12
    s_ref = m.pack_state(a, b)
    assert float(jnp.max(jnp.abs(s - s_ref))) < 1e-12


def test_pick_rows_per_block():
    assert pick_rows_per_block(1024, 1024) % 8 == 0
    assert 1024 % pick_rows_per_block(1024, 1024) == 0
    # tiny domains that do not decompose return 0 -> model falls back to jnp
    assert pick_rows_per_block(24, 24) in (0, 8, 24)


@pytest.mark.parametrize("t_block", [2, 4])
def test_temporal_blocking_matches_sequential(t_block):
    """make_block_step(T) with in-kernel BC rows == T sequential jnp steps
    (flagship neumann-inlet / dirichlet-outlet config)."""
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        variant="CSF", collision="MRT", surface_tension=0.01,
        tau_r=1.0, tau_b=0.8, tau_type=2, wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    m = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                        dtype=jnp.float32, use_pallas=False)
    blk = m.make_block_step(steps_per_call=t_block,
                            rows_per_block=8 if t_block <= 2 else 16,
                            interpret=True)
    a, b = m.init_state_layers(1.0, 1.0, invading_rows=8)
    c, d = a, b
    for _ in range(4):
        a, b = m._step_impl(a, b)
    for _ in range(4 // t_block):
        c, d = blk(c, d)
    assert float(jnp.max(jnp.abs(a - c))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra
    assert float(jnp.max(jnp.abs(b - d))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra


def test_model_interpret_integration():
    """use_pallas='interpret' routes the model step through the kernel."""
    m_ref = _model(True, "MRT")
    solid = np.zeros((32, 32), bool)
    solid[:, 0] = solid[:, -1] = True
    m_pal = ColorGradientRK(geo.from_solid_mask(solid), m_ref.p,
                            CGBoundaryConfig(), dtype=jnp.float32,
                            use_pallas="interpret")
    assert m_pal._fused is not None
    a, b = m_ref.init_state_droplet(1.0, 1.0, radius=8.0)
    c, d = a, b
    for _ in range(3):
        a, b = m_ref._step_impl(a, b)
        c, d = m_pal._step_impl(c, d)
    assert float(jnp.max(jnp.abs(a - c))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra


@pytest.mark.parametrize("t_block", [1, 2])
def test_perturbation_fused_matches_jnp(t_block):
    """The Perturbation-variant kernel (per-color BGK + perturbation +
    RK-original recoloring) matches the jnp path."""
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        variant="Perturbation", collision="SRT", surface_tension=0.005,
        a_kr=0.005, a_kb=0.005, alpha_r=4 / 9, alpha_b=4 / 9,
        solid_phi=0.5, tau_r=1.0, tau_b=0.8)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    m = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                        dtype=jnp.float32, use_pallas=False)
    fused = build_csf_fused_step(m.geo, params, jnp.float32,
                                 rows_per_block=8, steps_per_call=t_block,
                                 bc_config=bcs, interpret=True)
    a, b = m.init_state_layers(1.0, 1.0, invading_rows=8)
    c, d = a, b
    for _ in range(4):
        a, b = m._step_perturbation(a, b)
    for _ in range(4 // t_block):
        c, d = fused(c, d)
    assert float(jnp.max(jnp.abs(a - c))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra
    assert float(jnp.max(jnp.abs(b - d))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra


@pytest.mark.parametrize("walls,collision", [
    (False, "SRT"), (True, "MRT")])
def test_compressed_fused_matches_compressed_jnp(walls, collision):
    """state_mode='compressed' kernel (10-plane f_total+rho_r state) vs the
    compressed jnp step."""
    m = _model(walls, collision)
    fused = build_csf_fused_step(m.geo, m.p, jnp.float32,
                                 rows_per_block=8, state_mode="compressed",
                                 interpret=True)
    s = m.pack_state(*m.init_state_droplet(1.0, 1.0, radius=8.0))
    s2 = s
    for _ in range(5):
        s = m._step_impl_c(s)
        s2 = fused(s2)
    assert float(jnp.max(jnp.abs(s - s2))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra


@pytest.mark.parametrize("t_block", [2, 4])
def test_compressed_blocked_matches_sequential(t_block):
    """Compressed temporal blocking with in-kernel BC rows == T sequential
    compressed jnp steps (f64: the layered-interface tau(phi) select sits
    at |phi| ~ delta, so f32 noise flips branches)."""
    import jax
    if not jax.config.read("jax_enable_x64"):
        pytest.skip("needs x64")
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        variant="CSF", collision="MRT", surface_tension=0.01,
        tau_r=1.0, tau_b=0.8, tau_type=2, wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    m = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                        dtype=jnp.float64, use_pallas=False)
    blk = build_csf_fused_step(m.geo, params, jnp.float64,
                               rows_per_block=8 if t_block <= 2 else 16,
                               steps_per_call=t_block, bc_config=bcs,
                               state_mode="compressed", interpret=True)
    s = m.pack_state(*m.init_state_layers(1.0, 1.0, invading_rows=8))
    s2 = s
    for _ in range(4):
        s = m._step_impl_c(s)
    for _ in range(4 // t_block):
        s2 = blk(s2)
    assert float(jnp.max(jnp.abs(s - s2))) < 1e-12


def test_substep_unroll_loop_matches_unrolled():
    """`substep_unroll` (in-kernel ``lax.fori_loop`` over sub-step groups)
    matches the fully-unrolled temporal block (same arithmetic, rolled
    control flow — differences are pure compiler-fusion rounding): Mosaic
    then compiles the body once, collapsing the T=8 flagship compile from
    ~12-15 min to T=4-like (~3 min)."""
    import jax
    if not jax.config.read("jax_enable_x64"):
        pytest.skip("needs x64")
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        variant="CSF", collision="MRT", surface_tension=0.01,
        tau_r=1.0, tau_b=0.8, tau_type=2, wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    m = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                        dtype=jnp.float64, use_pallas=False)
    unrolled = build_csf_fused_step(m.geo, params, jnp.float64,
                                    rows_per_block=16, steps_per_call=4,
                                    bc_config=bcs, state_mode="compressed",
                                    interpret=True)
    looped = build_csf_fused_step(m.geo, params, jnp.float64,
                                  rows_per_block=16, steps_per_call=4,
                                  bc_config=bcs, state_mode="compressed",
                                  interpret=True, substep_unroll=2)
    assert unrolled.defer_mask and looped.defer_mask
    s = m.pack_state(*m.init_state_layers(1.0, 1.0, invading_rows=8))
    s2 = s
    for _ in range(3):
        s = unrolled(s)
        s2 = looped(s2)
    assert float(jnp.max(jnp.abs(s - s2))) < 1e-12


def test_compressed_perturbation_fused_matches_jnp():
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        variant="Perturbation", collision="SRT", surface_tension=0.005,
        a_kr=0.005, a_kb=0.003, alpha_r=4 / 9, alpha_b=4 / 9,
        solid_phi=0.5, tau_r=1.0, tau_b=0.8)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    m = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                        dtype=jnp.float32, use_pallas=False)
    fused = build_csf_fused_step(m.geo, params, jnp.float32,
                                 rows_per_block=8, steps_per_call=2,
                                 bc_config=bcs, state_mode="compressed",
                                 interpret=True)
    s = m.pack_state(*m.init_state_layers(1.0, 1.0, invading_rows=8))
    s2 = s
    for _ in range(4):
        s = m._step_impl_c(s)
    for _ in range(2):
        s2 = fused(s2)
    assert float(jnp.max(jnp.abs(s - s2))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra


def test_perturbation_mrt_fused_matches_jnp():
    """Perturbation variant with per-color moment-space MRT collision
    (``calRKCollision1GPU2DMRT``, AcceleratedRKGPU2D.py:429) in-kernel."""
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        variant="Perturbation", collision="MRT", surface_tension=0.005,
        a_kr=0.005, a_kb=0.005, alpha_r=4 / 9, alpha_b=4 / 9,
        solid_phi=0.5, tau_r=1.0, tau_b=0.8)
    m = ColorGradientRK(geo.from_solid_mask(solid), params,
                        CGBoundaryConfig(), dtype=jnp.float32,
                        use_pallas=False)
    fused = build_csf_fused_step(m.geo, params, jnp.float32,
                                 rows_per_block=8, interpret=True)
    a, b = m.init_state_layers(1.0, 1.0, invading_rows=8)
    c, d = a, b
    for _ in range(4):
        a, b = m._step_perturbation(a, b)
        c, d = fused(c, d)
    assert float(jnp.max(jnp.abs(a - c))) < 3e-5
    assert float(jnp.max(jnp.abs(b - d))) < 3e-5


def test_perturbation_mrt_compressed_matches_split():
    """Compressed Perturbation+MRT: total-PDF moment collision tracks the
    split per-color trajectories (sum and red density)."""
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        variant="Perturbation", collision="MRT", surface_tension=0.005,
        a_kr=0.005, a_kb=0.005, alpha_r=4 / 9, alpha_b=4 / 9,
        solid_phi=0.5, tau_r=1.0, tau_b=0.8)
    m = ColorGradientRK(geo.from_solid_mask(solid), params,
                        CGBoundaryConfig(), dtype=jnp.float32,
                        use_pallas=False)
    fused = build_csf_fused_step(m.geo, params, jnp.float32,
                                 rows_per_block=8, state_mode="compressed",
                                 interpret=True)
    s = m.pack_state(*m.init_state_layers(1.0, 1.0, invading_rows=8))
    s2 = s
    for _ in range(4):
        s = m._step_impl_c(s)
        s2 = fused(s2)
    assert float(jnp.max(jnp.abs(s - s2))) < 3e-5


@pytest.mark.parametrize("mode,t_block,rpb", [
    ("permeable", 1, 8), ("bounceback", 1, 8), ("permeable", 2, 16)])
def test_coupled_transport_fused_matches_jnp(mode, t_block, rpb):
    """The coupled flow+transport kernel (CSF + D2Q5 SRT tracers with
    interface handling, reaction, Inamuro inlet) matches TransportRK."""
    from openlbmpm_tpu.models.transport import TransportParams, TransportRK
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    fp = ColorGradientParams(variant="CSF", collision="MRT", tau_type=2,
                             wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    kw = dict(num_tracers=2, scheme=5, tau=(1.0, 0.9), j0=(1 / 3, 1 / 3),
              interface_mode=mode, beta_interface=(0.5, 0.2),
              inlet="inamuro", inlet_conc=(1.0, 0.5), outlet="freeflow")
    if mode == "bounceback":
        kw["beta_interface"] = (0.0, 0.0)
    tp = TransportParams(**kw)
    m = TransportRK(geo.from_solid_mask(solid), fp, tp, bcs,
                    dtype=jnp.float32, use_pallas=False)
    fused = build_csf_fused_step(m.geo, fp, jnp.float32,
                                 rows_per_block=rpb,
                                 steps_per_call=t_block, bc_config=bcs,
                                 transport_params=tp, interpret=True)
    fs = m.flow.init_state_layers(1.0, 1.0, invading_rows=10)
    conc0 = np.zeros((2, n, n))
    conc0[:, 20:28, :] = 1.0
    st = m.init_state(fs, conc0)
    a = st
    for _ in range(4):
        a = m._step_impl(a)
    fr, fb, g = st.f_r, st.f_b, st.g
    for _ in range(4 // t_block):
        fr, fb, g = fused(fr, fb, g)
    assert float(jnp.max(jnp.abs(a.f_r - fr))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra
    assert float(jnp.max(jnp.abs(a.g - g))) < 3e-5  # f32 drift: fused path uses rsqrt + reassociated algebra


@pytest.mark.parametrize("t_block,rpb", [(1, 8), (2, 16)])
def test_coupled_transport_compressed_matches_jnp(t_block, rpb):
    """Compressed coupled state (f_total, rho_r, g): the flow half runs
    the 10-plane moment-space path while tracers advance alongside;
    checked against the split jnp coupled step at f64 (the moment-space
    collision's reassociated reductions flip f32 contact-line tie-breaks,
    see test_fused_contact_line_matches_jnp_f64)."""
    import jax
    if not jax.config.read("jax_enable_x64"):
        pytest.skip("needs x64")
    from openlbmpm_tpu.models.transport import TransportParams, TransportRK
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    fp = ColorGradientParams(variant="CSF", collision="MRT", tau_type=2,
                             wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    tp = TransportParams(num_tracers=2, scheme=5, tau=(1.0, 0.9),
                         j0=(1 / 3, 1 / 3), interface_mode="permeable",
                         beta_interface=(0.5, 0.2), inlet="inamuro",
                         inlet_conc=(1.0, 0.5), outlet="freeflow")
    m = TransportRK(geo.from_solid_mask(solid), fp, tp, bcs,
                    dtype=jnp.float64, use_pallas=False)
    fused = m.make_block_step(steps_per_call=t_block, rows_per_block=rpb,
                              compressed=True, interpret=True)
    assert fused is not None
    fs = m.flow.init_state_layers(1.0, 1.0, invading_rows=10)
    conc0 = np.zeros((2, n, n))
    conc0[:, 20:28, :] = 1.0
    st = m.init_state(fs, conc0)
    a = st
    for _ in range(4):
        a = m._step_impl(a)
    s = m.flow.pack_state(st.f_r, st.f_b)
    g = st.g
    for _ in range(4 // t_block):
        s, g = fused(s, g)
    want = m.flow.pack_state(a.f_r, a.f_b)
    assert float(jnp.max(jnp.abs(want - s))) < 1e-12
    assert float(jnp.max(jnp.abs(a.g - g))) < 1e-12


def test_coupled_bf16_storage_tracks_f32():
    """storage='bf16' composes with the coupled flow+transport kernel:
    FLOW planes ride the 11-plane bf16 shifted-PDF state while tracer
    PDFs stay f32 — the bf16 trajectory tracks the f32 compressed
    coupled trajectory within storage rounding, and tracer mass
    conservation is f32-grade (tracers are never stored in bf16)."""
    from openlbmpm_tpu.models.transport import TransportParams, TransportRK
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    fp = ColorGradientParams(variant="CSF", collision="MRT", tau_type=2,
                             wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    tp = TransportParams(num_tracers=1, scheme=5, tau=(1.0,), j0=(1 / 3,),
                         interface_mode="permeable", beta_interface=(0.5,))
    m = TransportRK(geo.from_solid_mask(solid), fp, tp, bcs,
                    dtype=jnp.float32, use_pallas=False)
    f32_step = m.make_block_step(steps_per_call=2, rows_per_block=16,
                                 compressed=True, interpret=True)
    bf_step = m.make_block_step(steps_per_call=2, rows_per_block=16,
                                compressed=True, interpret=True,
                                storage="bf16")
    assert f32_step is not None and bf_step is not None
    fs = m.flow.init_state_layers(1.0, 1.0, invading_rows=10)
    conc0 = np.zeros((1, n, n))
    conc0[0, 20:28, :] = 1.0
    st = m.init_state(fs, conc0)
    s = m.flow.pack_state(st.f_r, st.f_b)
    h = m.flow.pack_state_bf16(st.f_r, st.f_b)
    g_s = st.g
    g_h = st.g
    mass0 = float(jnp.sum(st.g))
    for _ in range(3):
        s, g_s = f32_step(s, g_s)
        h, g_h = bf_step(h, g_h)
    assert h.dtype == jnp.bfloat16 and h.shape[0] == 11
    assert g_h.dtype == jnp.float32
    u = m.flow.unpack_bf16(h)
    assert bool(jnp.isfinite(u).all())
    # flow planes: bf16 storage rounding only (the Dirichlet-outlet row
    # rewrites amplify the deviation rounding slightly past the pure-flow
    # test's 5e-3)
    assert float(jnp.max(jnp.abs(u[:9] - s[:9]))) < 1e-2
    assert float(jnp.max(jnp.abs(u[9] - s[9]))) < 2e-2
    # tracers: advected by a bf16-rounded velocity field but stored f32 —
    # trajectory drift stays at interface-node storage-rounding scale and
    # mass conservation is f32-grade
    assert float(jnp.max(jnp.abs(g_h - g_s))) < 2e-2
    # compare against the f32 path's mass (same summation order) so the
    # bar measures bf16-induced drift, not f32 global-sum accumulation
    assert abs(float(jnp.sum(g_h)) - float(jnp.sum(g_s))) / mass0 < 1e-6


@pytest.mark.parametrize("mrt_eq", ["linear", "quadratic"])
def test_coupled_transport_mrt_fused_matches_jnp(mrt_eq):
    """Anisotropic D2Q5 MRT tracer collision in-kernel
    (``mrt_matrices_d2q5``; Transport2DRK.py:330-347)."""
    from openlbmpm_tpu.models.transport import TransportParams, TransportRK
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    fp = ColorGradientParams(variant="CSF", collision="MRT", tau_type=2,
                             wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    tp = TransportParams(num_tracers=2, scheme=5, tau=(1.0, 0.9),
                         relaxation="MRT", mrt_equilibrium=mrt_eq,
                         diff_x=(0.08, 0.12), diff_y=(0.15, 0.05),
                         diff_xy=(0.02, 0.0), diff_yx=(0.0, 0.01),
                         interface_mode="permeable",
                         beta_interface=(0.5, 0.2),
                         inlet="inamuro", inlet_conc=(1.0, 0.5),
                         outlet="freeflow")
    m = TransportRK(geo.from_solid_mask(solid), fp, tp, bcs,
                    dtype=jnp.float32, use_pallas=False)
    fused = build_csf_fused_step(m.geo, fp, jnp.float32, rows_per_block=8,
                                 bc_config=bcs, transport_params=tp,
                                 interpret=True)
    fs = m.flow.init_state_layers(1.0, 1.0, invading_rows=10)
    conc0 = np.zeros((2, n, n))
    conc0[:, 20:28, :] = 1.0
    st = m.init_state(fs, conc0)
    a = st
    for _ in range(4):
        a = m._step_impl(a)
    fr, fb, g = st.f_r, st.f_b, st.g
    for _ in range(4):
        fr, fb, g = fused(fr, fb, g)
    assert float(jnp.max(jnp.abs(a.f_r - fr))) < 3e-5
    assert float(jnp.max(jnp.abs(a.g - g))) < 3e-5


def test_coupled_transport_conserve_mass_fused_matches_jnp():
    """conserve_mass repair composes with the fused kernel as a jnp
    epilogue (global mass reduction, like the reference's cuda.reduce +
    repair kernel, Transport2DRK.py:498-500)."""
    from openlbmpm_tpu.models.transport import TransportParams, TransportRK
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    fp = ColorGradientParams(variant="CSF", collision="MRT", tau_type=2,
                             wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    tp = TransportParams(num_tracers=1, scheme=5, tau=(1.0,),
                         j0=(1 / 3,), interface_mode="permeable",
                         beta_interface=(0.3,), conserve_mass=True)
    # f64: the renorm's active mask (u_norm_sq > 1e-20, rho_r < criteria)
    # is discrete, so f32 noise flips whole-node equilibrium rebuilds
    m_ref = TransportRK(geo.from_solid_mask(solid), fp, tp, bcs,
                        dtype=jnp.float64, use_pallas=False)
    m_pal = TransportRK(geo.from_solid_mask(solid), fp, tp, bcs,
                        dtype=jnp.float64, use_pallas="interpret")
    assert m_pal._fused is not None
    assert getattr(m_pal._fused, "needs_mass0", False)
    fs = m_ref.flow.init_state_layers(1.0, 1.0, invading_rows=10)
    conc0 = np.zeros((1, n, n))
    conc0[:, 20:28, :] = 1.0
    a = m_ref.init_state(fs, conc0)
    b = m_pal.init_state(fs, conc0)
    for _ in range(4):
        a = m_ref._step_impl(a)
        b = m_pal._step_impl(b)
    assert float(jnp.max(jnp.abs(a.f_r - b.f_r))) < 1e-11
    assert float(jnp.max(jnp.abs(a.g - b.g))) < 1e-11


@pytest.mark.parametrize("relaxation", ["SRT", "MRT"])
def test_coupled_transport_d2q9_fused_matches_jnp(relaxation):
    """D2Q9 tracer scheme in-kernel (the reference's scheme-9 transport
    loop applies no tracer BCs, SURVEY.md section 3.4): collision
    (linear eq SRT / anisotropic MRT), semi-permeable interface,
    reaction, streaming."""
    from openlbmpm_tpu.models.transport import TransportParams, TransportRK
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    fp = ColorGradientParams(variant="CSF", collision="MRT", tau_type=2,
                             wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    tp = TransportParams(num_tracers=2, scheme=9, tau=(1.0, 0.9),
                         relaxation=relaxation,
                         diff_x=(0.08, 0.12), diff_y=(0.15, 0.05),
                         diff_xy=(0.02, 0.0), diff_yx=(0.0, 0.01),
                         interface_mode="permeable",
                         beta_interface=(0.5, 0.2),
                         reaction_rate=1e-4,
                         reaction_stoich=(-1.0, -1.0),
                         inlet="none", outlet="none")
    m = TransportRK(geo.from_solid_mask(solid), fp, tp, bcs,
                    dtype=jnp.float32, use_pallas=False)
    fused = build_csf_fused_step(m.geo, fp, jnp.float32, rows_per_block=8,
                                 bc_config=bcs, transport_params=tp,
                                 interpret=True)
    assert fused is not None
    fs = m.flow.init_state_layers(1.0, 1.0, invading_rows=10)
    conc0 = np.zeros((2, n, n))
    conc0[:, 20:28, :] = 1.0
    st = m.init_state(fs, conc0)
    a = st
    for _ in range(4):
        a = m._step_impl(a)
    fr, fb, g = st.f_r, st.f_b, st.g
    for _ in range(4):
        fr, fb, g = fused(fr, fb, g)
    assert float(jnp.max(jnp.abs(a.f_r - fr))) < 3e-5
    assert float(jnp.max(jnp.abs(a.g - g))) < 3e-5


def test_fused_wet_banded_matches_jnp():
    """Lane-banded wetting (nx >= 512, consumers confined to the first/
    last 128-lane block) must match the full-width path: the 256-lane
    band's center seam carries the true periodic x-adjacency."""
    ny, nx = 32, 512
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        variant="CSF", collision="MRT", surface_tension=0.01,
        tau_r=1.0, tau_b=0.8, tau_type=2, wetting_type=2,
        contact_angle_deg=60.0, beta=0.7)
    m = ColorGradientRK(geo.from_solid_mask(solid), params,
                        CGBoundaryConfig(), dtype=jnp.float32,
                        use_pallas=False)
    fused = build_csf_fused_step(m.geo, m.p, jnp.float32,
                                 rows_per_block=8, interpret=True)
    fused_c = build_csf_fused_step(m.geo, m.p, jnp.float32,
                                   rows_per_block=8,
                                   state_mode="compressed",
                                   interpret=True)
    rng = np.random.RandomState(3)
    a, b = m.init_state_droplet(1.0, 1.0, radius=10.0,
                                center=(16.0, 24.0))
    c, d = a, b
    s = m.pack_state(a, b)
    for _ in range(4):
        a, b = m._step_impl(a, b)
        c, d = fused(c, d)
        s = fused_c(s)
    assert float(jnp.max(jnp.abs(a - c))) < 3e-5
    assert float(jnp.max(jnp.abs(b - d))) < 3e-5
    assert float(jnp.max(jnp.abs(a.sum(0) - s[9]))) < 1e-4
    assert float(jnp.max(jnp.abs((a + b).sum(0) - s[:9].sum(0)))) < 1e-4


def test_defer_mask_predicate():
    """Deferred solid masking engages for channel geometries (walls along
    the BC rows' lanes are solid at both dest and source) and disengages
    when a BC ghost-row fluid cell would copy from a solid source."""
    n = 32
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)

    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    m = _model(True, "MRT")
    step = build_csf_fused_step(m.geo, m.p, jnp.float32, rows_per_block=8,
                                steps_per_call=2, bc_config=bcs,
                                state_mode="compressed", interpret=True)
    assert step.defer_mask

    # fluid ghost cell (row n-1) above a solid source cell (row n-2)
    solid_bad = solid.copy()
    solid_bad[n - 2, 5] = True
    m2 = ColorGradientRK(geo.from_solid_mask(solid_bad), m.p,
                         CGBoundaryConfig(), dtype=jnp.float32,
                         use_pallas=False)
    step2 = build_csf_fused_step(m2.geo, m2.p, jnp.float32,
                                 rows_per_block=8, steps_per_call=2,
                                 bc_config=bcs, state_mode="compressed",
                                 interpret=True)
    assert not step2.defer_mask

    # T=1 never defers (outputs go straight to HBM)
    step3 = build_csf_fused_step(m.geo, m.p, jnp.float32, rows_per_block=8,
                                 steps_per_call=1, bc_config=bcs,
                                 state_mode="compressed", interpret=True)
    assert not step3.defer_mask


def test_coupled_redistribute_fused_matches_jnp():
    """`interface_mode="redistribute"`: the fused kernel confines in-step
    (bounce-back) and `TransportRK.make_block_step` composes the
    front-motion mass exchange as a jnp epilogue; both paths must agree at
    f64 1e-12 across steps that flip transport-domain cells."""
    from openlbmpm_tpu.models.transport import TransportParams, TransportRK
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    fp = ColorGradientParams(variant="CSF", collision="SRT", tau_type=2,
                             wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="convective",
                           inlet_velocity=-2e-3)
    tp = TransportParams(num_tracers=1, scheme=5, tau=(1.0,), j0=(1 / 3,),
                         interface_mode="redistribute")
    m = TransportRK(geo.from_solid_mask(solid), fp, tp, bcs,
                    dtype=jnp.float64, use_pallas=False)
    fs = m.flow.init_state_layers(1.0, 1.0, invading_rows=10)
    conc0 = np.zeros((1, n, n))
    conc0[:, 8:20, 1:-1] = 1.0
    st = m.init_state(fs, conc0)
    # develop the front, then rescale f_r so interface cells straddle the
    # 0.5 threshold and the next steps flip transport-domain membership
    for _ in range(40):
        st = m._step_impl(st)
    rho_r = np.asarray(jnp.sum(st.f_r, axis=0))
    band = rho_r[(rho_r > 0.3) & (rho_r < 0.7)]
    assert band.size > 0
    scale = 0.4999 / np.median(band)
    st = st._replace(f_r=st.f_r * scale)
    fused = m.make_block_step(steps_per_call=1, rows_per_block=8,
                              interpret=True)
    assert fused is not None
    a = st
    fr, fb, g = st.f_r, st.f_b, st.g
    flipped = 0
    for _ in range(3):
        dom_before = np.asarray(jnp.sum(a.f_r, axis=0)) < 0.5
        a = m._step_impl(a)
        dom_after = np.asarray(jnp.sum(a.f_r, axis=0)) < 0.5
        flipped += int((dom_before != dom_after).sum())
        fr, fb, g = fused(fr, fb, g)
    assert flipped > 0   # the window exercised the redistribution
    assert float(jnp.max(jnp.abs(a.f_r - fr))) < 1e-12
    assert float(jnp.max(jnp.abs(a.g - g))) < 1e-12


def test_bb_banded_grouped_streaming_matches_jnp_f64():
    """Banded bounce-back rho_r streaming (grouped rolls + pointwise wall
    band correction; engaged when all solid columns sit in the edge lane
    blocks, as in the flagship bench geometry) must match the jnp
    compressed step at f64 1e-12 through a T=4 deferred-masking block with
    full BC choreography."""
    ny, nx = 64, 512
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        variant="CSF", collision="MRT", surface_tension=0.1,
        tau_r=1.0, tau_b=1.0, tau_type=2, wetting_type=2,
        contact_angle_deg=60.0, beta=0.7, delta=0.98)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    m = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                        dtype=jnp.float64, use_pallas=False)
    fused = m.make_block_step(steps_per_call=4, rows_per_block=16,
                              compressed=True, interpret=True)
    assert fused is not None
    s = m.pack_state(*m.init_state_layers(1.0, 1.0, invading_rows=12))
    s2 = fused(s)
    for _ in range(4):
        s = m._step_impl_c(s)
    assert float(jnp.max(jnp.abs(s - s2))) < 1e-12


def test_csf_bf16_storage_tracks_f32():
    """2D bf16 shifted-PDF storage (storage='bf16') tracks the f32
    compressed trajectory: PDF planes inherit the bf16 rounding of the
    stored *deviations* f_i - w_i*fl, while rho_r rides a hi/lo bf16 pair
    (exact to ~2^-17) so the phase field keeps f32-grade precision.
    Mirrors the 3D scheme (pallas/cg3d.py storage='bf16')."""
    m = _model(True, "MRT")
    bcs = CGBoundaryConfig(inlet="neumann", outlet="convective",
                           inlet_velocity=-1e-4)
    m2 = ColorGradientRK(m.geo, m.p, bcs, dtype=jnp.float32,
                         use_pallas=False)
    f32_step = m2.make_block_step(steps_per_call=2, rows_per_block=16,
                                  compressed=True, interpret=True)
    bf_step = m2.make_block_step(steps_per_call=2, rows_per_block=16,
                                 compressed=True, interpret=True,
                                 storage="bf16")
    assert f32_step is not None and bf_step is not None
    a, b = m2.init_state_layers(1.0, 1.0, invading_rows=10)
    s = m2.pack_state(a, b)
    h = m2.pack_state_bf16(a, b)

    # pack/unpack round-trip: deviation rounding only
    rt = m2.unpack_bf16(h)
    assert float(jnp.max(jnp.abs(rt[:9] - s[:9]))) < 2e-3
    assert float(jnp.max(jnp.abs(rt[9] - s[9]))) < 2e-5

    for _ in range(3):
        s = f32_step(s)
        h = bf_step(h)
    assert h.dtype == jnp.bfloat16 and h.shape[0] == 11
    u = m2.unpack_bf16(h)
    assert bool(jnp.isfinite(u).all())
    assert float(jnp.max(jnp.abs(u[:9] - s[:9]))) < 5e-3
    assert float(jnp.max(jnp.abs(u[9] - s[9]))) < 2e-2
    # per-color mass conservation within storage rounding
    assert abs(float(jnp.sum(u[9]) - jnp.sum(s[9]))) / \
        float(jnp.sum(s[9])) < 1e-3


def test_pert_bf16_storage_tracks_f32():
    """storage='bf16' composes with the Perturbation variant (same
    compressed (f_total, rho_r) state as CSF): the bf16 trajectory
    tracks f32 within storage rounding."""
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        variant="Perturbation", collision="MRT", surface_tension=0.01,
        tau_r=1.0, tau_b=0.8, tau_type=2, wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="convective",
                           inlet_velocity=-1e-4)
    m = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                        dtype=jnp.float32, use_pallas=False)
    f32_step = m.make_block_step(steps_per_call=2, rows_per_block=16,
                                 compressed=True, interpret=True)
    bf_step = m.make_block_step(steps_per_call=2, rows_per_block=16,
                                compressed=True, interpret=True,
                                storage="bf16")
    assert f32_step is not None and bf_step is not None
    a, b = m.init_state_layers(1.0, 1.0, invading_rows=10)
    s = m.pack_state(a, b)
    h = m.pack_state_bf16(a, b)
    for _ in range(3):
        s = f32_step(s)
        h = bf_step(h)
    u = m.unpack_bf16(h)
    assert bool(jnp.isfinite(u).all())
    assert float(jnp.max(jnp.abs(u[:9] - s[:9]))) < 2e-2
    assert float(jnp.max(jnp.abs(u[9] - s[9]))) < 2e-2
