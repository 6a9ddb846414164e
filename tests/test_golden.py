"""Golden-file regressions (SURVEY.md section 4d): tiny canonical runs
compared against committed snapshots in f64 — any physics-changing edit to
the step pipelines shows up as a diff here before it shows up as a subtle
validation drift."""

import os

import jax.numpy as jnp
import numpy as np

from openlbmpm_tpu import geometry as geo
from openlbmpm_tpu.models.base import run_chunked
from openlbmpm_tpu.models.colorgradient import (
    CGBoundaryConfig, ColorGradientParams, ColorGradientRK)
from openlbmpm_tpu.models.shanchen import ShanChenMCMP, ShanChenParams

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_golden_csf_mini():
    solid = np.zeros((48, 24), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        variant="CSF", collision="MRT", surface_tension=0.01,
        tau_r=1.0, tau_b=0.8, tau_type=2, wetting_type=2,
        contact_angle_deg=60.0)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    m = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                        dtype=jnp.float64)
    st = m.init_state_layers(1.0, 1.0, invading_rows=10)
    st = run_chunked(m.step, st, num_steps=50, io_interval=50)
    with np.load(os.path.join(GOLDEN, "csf_mini.npz")) as z:
        np.testing.assert_allclose(np.asarray(jnp.sum(st[0], axis=0)),
                                   z["rho_r"], rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(jnp.sum(st[1], axis=0)),
                                   z["rho_b"], rtol=0, atol=1e-10)


def test_golden_sc_mini():
    solid = np.zeros((48, 24), bool)
    solid[:, 0] = solid[:, -1] = True
    p = ShanChenParams(g_matrix=((0.0, 3.6), (3.6, 0.0)),
                       g_solid=(-0.3, 0.3), tau=(1.0, 1.0))
    m = ShanChenMCMP(geo.from_solid_mask(solid), p, dtype=jnp.float64)
    f = m.init_state_droplet((1.0, 1.0), (0.02, 0.02), center=(24, 12),
                             radius=7.0)
    f = run_chunked(m.step, f, num_steps=50, io_interval=50)
    with np.load(os.path.join(GOLDEN, "sc_mini.npz")) as z:
        np.testing.assert_allclose(np.asarray(jnp.sum(f, axis=1)),
                                   z["rho"], rtol=0, atol=1e-10)
