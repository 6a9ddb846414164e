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
