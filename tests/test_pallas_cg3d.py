"""Fused D3Q19 CSF kernel vs the jnp 3D path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openlbmpm_tpu import geometry as geo
from openlbmpm_tpu.models.flow3d import (ColorGradientParams3D,
                                         ColorGradientRK3D)
from openlbmpm_tpu.pallas.cg3d import build_cg3d_fused_step


@pytest.mark.parametrize("t_block", [1, 2])
def test_cg3d_fused_periodic(t_block):
    n = 16
    params = ColorGradientParams3D(surface_tension=0.01, tau_r=1.0,
                                   tau_b=0.8, contact_angle_deg=60.0)
    m = ColorGradientRK3D(geo.from_solid_mask(np.zeros((n, n, n), bool)),
                          params, dtype=jnp.float32, use_pallas=False)
    fused = build_cg3d_fused_step(m.geo, params, jnp.float32,
                                  slabs_per_block=8, steps_per_call=t_block,
                                  interpret=True)
    a, b = m.init_state_droplet(1.0, 1.0, radius=5.0)
    c, d = a, b
    for _ in range(2 * t_block):
        a, b = m._step_impl(a, b)
    for _ in range(2):
        c, d = fused(c, d)
    assert float(jnp.max(jnp.abs(a - c))) < 5e-6
    assert float(jnp.max(jnp.abs(b - d))) < 5e-6


def test_cg3d_fused_wetting():
    n = 16
    solid = np.zeros((n, n, n), bool)
    solid[:2] = True
    params = ColorGradientParams3D(surface_tension=0.01,
                                   contact_angle_deg=60.0)
    m = ColorGradientRK3D(geo.from_solid_mask(solid), params,
                          dtype=jnp.float32, use_pallas=False)
    fused = build_cg3d_fused_step(m.geo, params, jnp.float32,
                                  slabs_per_block=8, interpret=True)
    a, b = m.init_state_droplet(1.0, 1.0, center=(2.0, n / 2, n / 2),
                                radius=5.0)
    c, d = a, b
    for _ in range(3):
        a, b = m._step_impl(a, b)
        c, d = fused(c, d)
    assert float(jnp.max(jnp.abs(a - c))) < 5e-6
    assert float(jnp.max(jnp.abs(b - d))) < 5e-6
