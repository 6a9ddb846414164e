"""Physics tests for the color-gradient model: Laplace law, mass
conservation, static contact angle (SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openlbmpm_tpu import geometry as geo
from openlbmpm_tpu.models.base import run_chunked
from openlbmpm_tpu.models.colorgradient import (
    CGBoundaryConfig, ColorGradientParams, ColorGradientRK)


def _droplet_model(variant="CSF", collision="SRT", sigma=0.01, n=64,
                   tau_r=1.0, tau_b=1.0):
    solid = np.zeros((n, n), bool)  # fully periodic, no walls
    # equal unit densities => matched RK alphas (4/9 reduces the RK original
    # equilibrium to the standard D2Q9 weights); mismatched alphas encode a
    # density ratio and would crush the droplet.
    params = ColorGradientParams(
        variant=variant, collision=collision, surface_tension=sigma,
        tau_r=tau_r, tau_b=tau_b, beta=0.7, a_kr=sigma, a_kb=sigma,
        alpha_r=4.0 / 9.0, alpha_b=4.0 / 9.0)
    return ColorGradientRK(geo.from_solid_mask(solid), params,
                           CGBoundaryConfig(), dtype=jnp.float64)


@pytest.mark.parametrize("collision", ["SRT", "MRT"])
def test_laplace_law_csf(collision):
    sigma = 0.01
    radius = 14.0
    model = _droplet_model("CSF", collision, sigma)
    state = model.init_state_droplet(1.0, 1.0, radius=radius, background=0.0)
    state = run_chunked(model.step, state, num_steps=3000, io_interval=1000)
    rho_r, rho_b, phi, (ux, uy) = model.macro(state)
    phi = np.asarray(phi)
    rho = np.asarray(rho_r + rho_b)
    p = rho / 3.0
    inside = phi > 0.8
    outside = phi < -0.8
    # measured radius from droplet area
    r_meas = np.sqrt(inside.sum() / np.pi)
    dp = p[inside].mean() - p[outside].mean()
    dp_analytic = sigma / r_meas
    assert dp > 0
    assert abs(dp - dp_analytic) / dp_analytic < 0.15, (dp, dp_analytic)


def test_mass_conservation_per_color():
    model = _droplet_model("CSF", "SRT")
    state = model.init_state_droplet(1.0, 1.0, radius=12.0)
    m_r0 = float(jnp.sum(state[0]))
    m_b0 = float(jnp.sum(state[1]))
    state = run_chunked(model.step, state, num_steps=500, io_interval=500)
    assert abs(float(jnp.sum(state[0])) - m_r0) / m_r0 < 1e-12
    assert abs(float(jnp.sum(state[1])) - m_b0) / m_b0 < 1e-12


def test_spurious_currents_bounded():
    model = _droplet_model("CSF", "SRT", sigma=0.01)
    state = model.init_state_droplet(1.0, 1.0, radius=14.0)
    state = run_chunked(model.step, state, num_steps=2000, io_interval=1000)
    _, _, _, (ux, uy) = model.macro(state)
    umax = float(jnp.max(jnp.sqrt(ux**2 + uy**2)))
    assert umax < 0.01, umax


def test_laplace_law_perturbation_variant():
    sigma_param = 0.005
    model = _droplet_model("Perturbation", "SRT", sigma_param)
    state = model.init_state_droplet(1.0, 1.0, radius=14.0, background=0.0)
    state = run_chunked(model.step, state, num_steps=2000, io_interval=1000)
    rho_r, rho_b, phi, _ = model.macro(state)
    phi = np.asarray(phi)
    # droplet must stay intact and phase-separated
    assert (phi > 0.9).sum() > 300
    assert (phi < -0.9).sum() > 2000
    # pressure jump positive across the interface
    rho = np.asarray(rho_r + rho_b)
    p = rho / 3.0
    dp = p[phi > 0.8].mean() - p[phi < -0.8].mean()
    assert dp > 0


def test_static_contact_angle_neutral_wetting():
    """theta = 90 deg: a droplet sitting on a flat wall must keep a
    half-circle shape => measured angle ~ 90 deg (spherical-cap fit as in
    ``ShanChenD2Q9.calMeasuredContactAngle:864-886``)."""
    n = 64
    solid = np.zeros((n, n), bool)
    solid[:2, :] = True  # floor
    params = ColorGradientParams(
        variant="CSF", collision="SRT", surface_tension=0.01,
        contact_angle_deg=90.0, wetting_type=2)
    model = ColorGradientRK(geo.from_solid_mask(solid), params,
                            CGBoundaryConfig(), dtype=jnp.float64)
    state = model.init_state_droplet(1.0, 1.0, center=(2.0, n / 2),
                                     radius=12.0)
    state = run_chunked(model.step, state, num_steps=3000, io_interval=1500)
    _, _, phi, _ = model.macro(state)
    phi = np.asarray(phi)
    drop = phi > 0.0
    drop[:2, :] = False
    base = drop[2, :].sum()          # base chord length
    height = drop[:, n // 2].sum()   # cap height
    # spherical-cap: R = (base^2/4 + h^2) / (2h), cos(theta) = (R - h)/R
    r_cap = (base**2 / 4.0 + height**2) / (2.0 * height)
    cos_theta = (r_cap - height) / r_cap
    theta = np.degrees(np.arccos(np.clip(cos_theta, -1, 1)))
    assert 75.0 < theta < 105.0, theta


def test_modified_periodic_color_swap_outlet():
    """modified_periodic outlet: the invading red front re-enters the
    domain as blue at the seam — total mass conserved, colors swap."""
    n = 32
    params = ColorGradientParams(variant="CSF", collision="SRT",
                                 surface_tension=0.0)
    bcs = CGBoundaryConfig(inlet="periodic", outlet="modified_periodic")
    model = ColorGradientRK(geo.from_solid_mask(np.zeros((n, n), bool)),
                            params, bcs, dtype=jnp.float64)
    assert model._fused is None  # jnp path required for the seam swap
    state = model.init_state_layers(1.0, 1.0, invading_rows=6,
                                    background=0.0)
    m_tot0 = float(jnp.sum(state[0]) + jnp.sum(state[1]))
    state = run_chunked(model.step, state, num_steps=50, io_interval=50)
    m_tot = float(jnp.sum(state[0]) + jnp.sum(state[1]))
    assert abs(m_tot - m_tot0) / m_tot0 < 1e-12


def test_capillary_intrusion_direction():
    """Canonical reference validation (README.md:54-63 'CapillaryRise'):
    a wetting fluid spontaneously intrudes a narrow slot, a non-wetting one
    does not.  Compare red mass inside the slot after the same number of
    steps for theta = 45 vs theta = 135."""
    ny, nx = 64, 32
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    # slot walls for y < 40: open channel of width 8 (columns 12..19)
    solid[:40, 1:12] = True
    solid[:40, 20:-1] = True
    masses = {}
    for theta in (45.0, 135.0):
        params = ColorGradientParams(
            variant="CSF", collision="SRT", surface_tension=0.05,
            contact_angle_deg=theta, wetting_type=2, beta=0.7)
        model = ColorGradientRK(geo.from_solid_mask(solid), params,
                                CGBoundaryConfig(), dtype=jnp.float64)
        # red reservoir fills the open region above the slot
        state = model.init_state_layers(1.0, 1.0, invading_rows=22)
        m0 = float(jnp.sum(jnp.sum(state[0], axis=0)[:38, 12:20]))
        state = run_chunked(model.step, state, num_steps=3000,
                            io_interval=1500)
        rho_r = jnp.sum(state[0], axis=0)
        masses[theta] = float(jnp.sum(rho_r[:38, 12:20])) - m0
    # wetting intrudes, non-wetting at most marginally
    assert masses[45.0] > 3.0, masses
    assert masses[45.0] > 4.0 * max(masses[135.0], 0.1), masses


@pytest.mark.parametrize("theta", [60.0, 120.0])
def test_static_contact_angle_sweep(theta):
    """Measured spherical-cap angle tracks the input theta (+-15 deg)."""
    n = 64
    solid = np.zeros((n, n), bool)
    solid[:2, :] = True
    params = ColorGradientParams(
        variant="CSF", collision="SRT", surface_tension=0.01,
        contact_angle_deg=theta, wetting_type=2)
    model = ColorGradientRK(geo.from_solid_mask(solid), params,
                            CGBoundaryConfig(), dtype=jnp.float64)
    state = model.init_state_droplet(1.0, 1.0, center=(2.0, n / 2),
                                     radius=12.0)
    state = run_chunked(model.step, state, num_steps=4000, io_interval=2000)
    _, _, phi, _ = model.macro(state)
    phi = np.asarray(phi)
    drop = phi > 0.0
    drop[:2, :] = False
    base = drop[2, :].sum()
    height = drop[:, n // 2].sum()
    r_cap = (base**2 / 4.0 + height**2) / (2.0 * height)
    cos_theta = (r_cap - height) / r_cap
    meas = np.degrees(np.arccos(np.clip(cos_theta, -1, 1)))
    assert abs(meas - theta) < 15.0, (meas, theta)


@pytest.mark.parametrize("variant,collision", [
    ("CSF", "SRT"), ("CSF", "MRT"), ("Perturbation", "SRT")])
def test_compressed_state_matches_split(variant, collision):
    """The compressed (f_total, rho_r) step tracks the split (f_r, f_b)
    step: identical trajectories of (f_r + f_b, sum f_r) to fp roundoff
    (f64, few steps — the tau(phi) selects amplify roundoff discretely
    once |phi| ~ delta interface cells accumulate noise)."""
    n = 32
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    kw = dict(variant=variant, collision=collision, surface_tension=0.01,
              tau_r=1.0, tau_b=0.8)
    if variant == "CSF":
        kw.update(tau_type=2, wetting_type=2)
    else:
        kw.update(a_kr=0.005, a_kb=0.003, alpha_r=4 / 9, alpha_b=4 / 9,
                  solid_phi=0.5)
    params = ColorGradientParams(**kw)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    m = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                        dtype=jnp.float64, use_pallas=False)
    f_r, f_b = m.init_state_layers(1.0, 1.0, invading_rows=8)
    s = m.pack_state(f_r, f_b)
    for _ in range(6):
        f_r, f_b = m._step_impl(f_r, f_b)
        s = m._step_impl_c(s)
    assert float(jnp.max(jnp.abs((f_r + f_b) - s[:9]))) < 1e-12
    assert float(jnp.max(jnp.abs(jnp.sum(f_r, 0) - s[9]))) < 1e-12
    # diagnostics agree
    rho_r_a, rho_b_a, phi_a, (ux_a, uy_a) = m.macro((f_r, f_b))
    rho_r_b, rho_b_b, phi_b, (ux_b, uy_b) = m.macro_c(s)
    assert float(jnp.max(jnp.abs(rho_r_a - rho_r_b))) < 1e-12
    assert float(jnp.max(jnp.abs(ux_a - ux_b))) < 1e-12
