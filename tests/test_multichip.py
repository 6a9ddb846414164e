"""Multi-chip domain decomposition: the same case on 1 device and on a
sharded 8-device mesh must agree to rounding (SURVEY.md section 4c).

The virtual mesh comes from --xla_force_host_platform_device_count=8
(conftest).  XLA's SPMD partitioner lowers the jnp.roll halo reads into
collective-permute exchanges; no code changes between the two runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openlbmpm_tpu import geometry as geo
from openlbmpm_tpu.models.colorgradient import (
    CGBoundaryConfig, ColorGradientParams, ColorGradientRK)
from openlbmpm_tpu.models.shanchen import ShanChenMCMP, ShanChenParams
from openlbmpm_tpu.parallel.mesh import (domain_sharding, make_mesh,
                                         shard_domain)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device CPU mesh")


def _run_sharded(model, state, steps, n_devices=8, ndim=3):
    mesh = make_mesh(n_devices)
    state = shard_domain(state, mesh)
    shard = domain_sharding(mesh, ndim)
    if isinstance(state, tuple):
        step = jax.jit(model._step_impl,
                       in_shardings=(shard,) * len(state),
                       out_shardings=(shard,) * len(state))
        for _ in range(steps):
            state = step(*state)
    else:
        step = jax.jit(model._step_impl, in_shardings=shard,
                       out_shardings=shard)
        for _ in range(steps):
            state = step(state)
    return state


def test_csf_sharded_equals_single():
    ny, nx = 64, 128   # nx divisible by 8
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(variant="CSF", collision="MRT",
                                 surface_tension=0.01, tau_type=2,
                                 wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    model = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                            dtype=jnp.float64, use_pallas=False)
    state0 = model.init_state_layers(1.0, 1.0, invading_rows=12)

    ref = state0
    for _ in range(20):
        ref = model._step_impl(*ref)
    shd = _run_sharded(model, state0, 20)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(shd[0]),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(shd[1]),
                               rtol=0, atol=1e-12)


def test_shanchen_sharded_equals_single():
    ny, nx = 48, 64
    params = ShanChenParams(g_matrix=((0.0, 3.6), (3.6, 0.0)),
                            g_solid=(0.0, 0.0), tau=(1.0, 1.0))
    model = ShanChenMCMP(geo.from_solid_mask(np.zeros((ny, nx), bool)),
                         params, dtype=jnp.float64)
    state0 = model.init_state_droplet((1.0, 1.0), (0.02, 0.02), radius=10.0)
    ref = state0
    for _ in range(20):
        ref = model._step_impl(ref)
    shd = _run_sharded(model, state0, 20, ndim=4)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(shd),
                               rtol=0, atol=1e-12)


def test_sharded_2d_mesh():
    """2D ('y','x') mesh decomposition also reproduces the single-device
    run (both spatial axes sharded)."""
    ny, nx = 64, 64
    params = ColorGradientParams(variant="CSF", collision="SRT",
                                 surface_tension=0.01)
    model = ColorGradientRK(geo.from_solid_mask(np.zeros((ny, nx), bool)),
                            params, CGBoundaryConfig(), dtype=jnp.float64,
                            use_pallas=False)
    state0 = model.init_state_droplet(1.0, 1.0, radius=14.0)
    ref = state0
    for _ in range(10):
        ref = model._step_impl(*ref)
    mesh = make_mesh(shape=(2, 4))
    state = shard_domain(state0, mesh)
    shard = domain_sharding(mesh, 3)
    step = jax.jit(model._step_impl, in_shardings=(shard, shard),
                   out_shardings=(shard, shard))
    for _ in range(10):
        state = step(*state)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(state[0]),
                               rtol=0, atol=1e-12)


def test_cg3d_sharded_equals_single():
    """3D model sharded over an 8-device x-mesh == single device."""
    from openlbmpm_tpu.models.flow3d import (ColorGradientParams3D,
                                             ColorGradientRK3D)
    nz, ny, nx = 16, 16, 32
    params = ColorGradientParams3D(surface_tension=0.005)
    m = ColorGradientRK3D(geo.from_solid_mask(np.zeros((nz, ny, nx), bool)),
                          params, dtype=jnp.float64, use_pallas=False)
    state0 = m.init_state_droplet(1.0, 1.0, radius=5.0)
    ref = state0
    for _ in range(10):
        ref = m._step_impl(*ref)
    mesh = make_mesh(8)
    state = shard_domain(state0, mesh)
    shard = domain_sharding(mesh, 4)
    step = jax.jit(m._step_impl, in_shardings=(shard, shard),
                   out_shardings=(shard, shard))
    for _ in range(10):
        state = step(*state)
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(state[0]),
                               rtol=0, atol=1e-12)


def test_explicit_halo_exchange_matches_global():
    """The explicit shard_map + ppermute halo path (parallel/halo.py)
    reproduces the global computation for a radius-2 stencil step."""
    from openlbmpm_tpu.parallel.halo import make_sharded_stepper

    ny, nx = 16, 64

    def stencil_step(a, b):
        # radius-2 periodic stencil in x, radius-1 in y
        lap = (jnp.roll(a, 1, -1) + jnp.roll(a, -1, -1) +
               0.5 * jnp.roll(a, 2, -1) + 0.5 * jnp.roll(a, -2, -1) +
               jnp.roll(a, 1, -2) + jnp.roll(a, -1, -2) - 5.0 * a)
        return a + 0.05 * lap + 0.01 * b, b + 0.02 * a

    rng = np.random.RandomState(0)
    a0 = jnp.asarray(rng.randn(ny, nx))
    b0 = jnp.asarray(rng.randn(ny, nx))
    ref_a, ref_b = a0, b0
    for _ in range(5):
        ref_a, ref_b = stencil_step(ref_a, ref_b)

    mesh = make_mesh(8)
    step = make_sharded_stepper(stencil_step, mesh, state_ndim=2, halo=2)
    shard = domain_sharding(mesh, 2)
    a = jax.device_put(a0, shard)
    b = jax.device_put(b0, shard)
    for _ in range(5):
        a, b = step(a, b)
    np.testing.assert_allclose(np.asarray(ref_a), np.asarray(a),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ref_b), np.asarray(b),
                               rtol=0, atol=1e-12)


@pytest.mark.parametrize("t_block,ny,nx,rows", [
    (1, 64, 64, 8), (2, 64, 64, 8),
    # T=4 is the production blocking depth (bench.py): H=16, so the
    # shard-local grid must be >= 2H wide
    pytest.param(4, 256, 32, 16, marks=pytest.mark.slow)])
def test_fused_compressed_sharded_equals_single(t_block, ny, nx, rows):
    """The production multi-chip configuration: the compressed fused Pallas
    kernel under shard_map on a 4-shard y-mesh (interpret mode), with
    ppermute halo slabs and scalar-prefetched global row offsets, matches
    the single-device compressed jnp step — full BC choreography included
    (VERDICT round 1, item 3)."""
    from openlbmpm_tpu.pallas.csf import build_csf_sharded_step

    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(variant="CSF", collision="MRT",
                                 surface_tension=0.01, tau_type=2,
                                 wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    model = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                            dtype=jnp.float64, use_pallas=False)
    mesh = make_mesh(shape=(4, 1))
    step = build_csf_sharded_step(model.geo, params, mesh, jnp.float64,
                                  rows_per_block=rows,
                                  steps_per_call=t_block,
                                  bc_config=bcs, interpret=True)
    assert step is not None
    s_ref = model.pack_state(*model.init_state_layers(1.0, 1.0,
                                                      invading_rows=12))
    s_sh = jax.device_put(s_ref, domain_sharding(mesh, 3))
    for _ in range(4):
        s_ref = model._step_impl_c(s_ref)
    jstep = jax.jit(step)
    for _ in range(4 // t_block):
        s_sh = jstep(s_sh)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_sh),
                               rtol=0, atol=1e-12)


@pytest.mark.parametrize("t_block", [1, 2])
def test_fused_compressed_2d_mesh_equals_single(t_block):
    """Fused 2-D mesh decomposition (VERDICT round 3, item 6): the
    compressed fused kernel under shard_map on a (2, 4) 'y' x 'x' mesh —
    row halos AND lane halos over ppermute rings, corner data riding the
    y exchange of the x-padded arrays — matches the single-device
    compressed jnp step at 1e-12 with full BC choreography."""
    from openlbmpm_tpu.pallas.csf import build_csf_sharded_step

    ny, nx = 64, 256
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(variant="CSF", collision="MRT",
                                 surface_tension=0.01, tau_type=2,
                                 wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    model = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                            dtype=jnp.float64, use_pallas=False)
    mesh = make_mesh(shape=(2, 4))
    step = build_csf_sharded_step(model.geo, params, mesh, jnp.float64,
                                  rows_per_block=16,
                                  steps_per_call=t_block,
                                  bc_config=bcs, interpret=True)
    assert step is not None
    s_ref = model.pack_state(*model.init_state_layers(1.0, 1.0,
                                                      invading_rows=12))
    s_sh = jax.device_put(s_ref, domain_sharding(mesh, 3))
    for _ in range(4):
        s_ref = model._step_impl_c(s_ref)
    jstep = jax.jit(step)
    for _ in range(4 // t_block):
        s_sh = jstep(s_sh)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(s_sh),
                               rtol=0, atol=1e-12)


def test_cg3d_fused_sharded_equals_single():
    """The compressed fused D3Q19 step under a z-sharded mesh (ppermute
    halo slabs + BC prologue on the global array) matches the
    single-device fused step."""
    import jax
    from openlbmpm_tpu.models.flow3d import (CG3DBoundaryConfig,
                                             ColorGradientParams3D,
                                             ColorGradientRK3D)
    from openlbmpm_tpu.pallas.cg3d import (build_cg3d_fused_step,
                                           build_cg3d_sharded_step)
    from openlbmpm_tpu.parallel.mesh import make_mesh
    nz, n = 32, 16
    solid = np.zeros((nz, n, n), bool)
    solid[:, 0, :] = solid[:, -1, :] = True
    params = ColorGradientParams3D(surface_tension=0.01, tau_r=1.0,
                                   tau_b=0.8, contact_angle_deg=60.0)
    bcs = CG3DBoundaryConfig(inlet="velocity", outlet="convective",
                             inlet_velocity=-1e-3)
    m = ColorGradientRK3D(geo.from_solid_mask(solid), params, bcs,
                          dtype=jnp.float32, use_pallas=False)
    single = build_cg3d_fused_step(m.geo, params, jnp.float32,
                                   slabs_per_block=8, bc_config=bcs,
                                   state_mode="compressed", interpret=True)
    mesh = make_mesh(shape=(4, 1))
    sharded = build_cg3d_sharded_step(m.geo, params, mesh, jnp.float32,
                                      slabs_per_block=4, bc_config=bcs,
                                      interpret=True)
    assert sharded is not None
    s = m.pack_state(*m.init_state_layers(1.0, 1.0, invading_slabs=8))
    a = s
    b = s
    for _ in range(2):
        a = single(a)
        b = jax.jit(sharded)(b)
    assert float(jnp.max(jnp.abs(a - b))) < 3e-5


@pytest.mark.slow
@pytest.mark.parametrize("scheme", ["SC", "EFS"])
def test_sc_fused_sharded_equals_single(scheme):
    """The fused Shan-Chen/EFS kernel under shard_map on a 4-shard y-mesh
    (ppermute halo slabs + scalar-prefetched global row offsets) matches
    the single-device jnp step with full BC choreography."""
    from openlbmpm_tpu.models.shanchen import (SCBoundaryConfig,
                                               ShanChenMCMP,
                                               ShanChenParams)
    from openlbmpm_tpu.pallas.shanchen import build_sc_sharded_step

    ny, nx = 64, 64
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    bcs = SCBoundaryConfig(inlet="zou_he_velocity", outlet="convective",
                           inlet_velocity=(-1e-3, 0.0))
    if scheme == "SC":
        p = ShanChenParams(g_matrix=((0.0, 3.6), (3.6, 0.0)),
                           g_solid=(-0.3, 0.3), tau=(1.0, 1.0))
    else:
        p = ShanChenParams(g_matrix=((0.0, 0.2), (0.2, 0.0)),
                           g_solid=(-0.14, 0.14), tau=(1.0, 0.8),
                           scheme="EFS", iso_order=8, collision="MRT")
    m = ShanChenMCMP(geo.from_solid_mask(solid), p, bcs,
                     dtype=jnp.float64, use_pallas=False)
    mesh = make_mesh(shape=(4, 1))
    step = build_sc_sharded_step(m.geo, p, mesh, jnp.float64,
                                 rows_per_block=16, steps_per_call=2,
                                 bc_config=bcs, interpret=True)
    assert step is not None
    f_ref = m.init_state_layers((1.0, 1.0), (0.02, 0.02), invading_rows=12)
    f_sh = jax.device_put(f_ref, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, None, "y", None)))
    stepper = m._step_sc if scheme == "SC" else m._step_efs
    for _ in range(4):
        f_ref = stepper(f_ref)
    jstep = jax.jit(step)
    for _ in range(2):
        f_sh = jstep(f_sh)
    np.testing.assert_allclose(np.asarray(f_ref), np.asarray(f_sh),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_sc3d_fused_sharded_equals_single():
    """The fused D3Q19 SC kernel under shard_map on a 4-shard z-mesh
    (ppermute halo slabs) matches the single-device jnp step."""
    from openlbmpm_tpu.models.flow3d import (ShanChenMCMP3D,
                                             ShanChenParams3D)
    from openlbmpm_tpu.pallas.sc3d import build_sc3d_sharded_step

    n = 16
    solid = np.zeros((n, n, n), bool)
    solid[:, 0, :] = solid[:, -1, :] = True
    p = ShanChenParams3D(g_matrix=((0.0, 3.6), (3.6, 0.0)),
                         g_solid=(-0.3, 0.3), tau=(1.0, 0.8),
                         body_force=(0.0, 0.0, -1e-5))
    m = ShanChenMCMP3D(geo.from_solid_mask(solid), p, dtype=jnp.float64,
                       use_pallas=False)
    mesh = make_mesh(shape=(4, 1))
    step = build_sc3d_sharded_step(m.geo, p, mesh, jnp.float64,
                                   slabs_per_block=4, interpret=True)
    assert step is not None
    f_ref = m.init_state_droplet((1.0, 1.0), (0.02, 0.02), radius=5.0)
    f_sh = jax.device_put(f_ref, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, None, "y", None, None)))
    for _ in range(3):
        f_ref = m._step_impl(f_ref)
    jstep = jax.jit(step)
    for _ in range(3):
        f_sh = jstep(f_sh)
    np.testing.assert_allclose(np.asarray(f_ref), np.asarray(f_sh),
                               rtol=0, atol=1e-12)


@pytest.mark.slow
def test_single_fused_sharded_equals_single():
    """The fused single-phase kernel under shard_map on a 4-shard y-mesh
    matches the single-device jnp step (Zou-He + convective BCs)."""
    from openlbmpm_tpu.models.single_phase import (BoundaryConfig,
                                                   SinglePhaseD2Q9)
    from openlbmpm_tpu.pallas.single import build_single_sharded_step

    ny, nx = 64, 64
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    bcs = BoundaryConfig(inlet="zou_he_velocity", outlet="convective",
                         inlet_velocity=-1e-3)
    m = SinglePhaseD2Q9(geo.from_solid_mask(solid), tau=0.8,
                        collision="MRT", boundaries=bcs,
                        dtype=jnp.float64)
    mesh = make_mesh(shape=(4, 1))
    step = build_single_sharded_step(m.geo, 0.8, "MRT", (0.0, 0.0), mesh,
                                     bc_config=bcs, dtype=jnp.float64,
                                     rows_per_block=16, steps_per_call=2,
                                     interpret=True)
    assert step is not None
    f_ref = m.init_state()
    f_sh = jax.device_put(f_ref, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "y", None)))
    for _ in range(4):
        f_ref = m._step_impl(f_ref)
    jstep = jax.jit(step)
    for _ in range(2):
        f_sh = jstep(f_sh)
    np.testing.assert_allclose(np.asarray(f_ref), np.asarray(f_sh),
                               rtol=0, atol=1e-12)


def test_cg3d_fused_sharded_zy_mesh_equals_single():
    """The compressed fused D3Q19 step under a (z, y) 2-D mesh — sublane
    halo lanes exchanged over the "x" ring first, z slabs of the
    y-padded arrays after (corners ride along) — matches the
    single-device fused step, with y walls (wetting) crossing the
    y-shard seams and z-face BCs."""
    import jax
    from openlbmpm_tpu.models.flow3d import (CG3DBoundaryConfig,
                                             ColorGradientParams3D,
                                             ColorGradientRK3D)
    from openlbmpm_tpu.pallas.cg3d import (build_cg3d_fused_step,
                                           build_cg3d_sharded_step)
    from openlbmpm_tpu.parallel.mesh import make_mesh
    nz, ny, nx = 16, 64, 16
    solid = np.zeros((nz, ny, nx), bool)
    solid[:, 0, :] = solid[:, -1, :] = True
    params = ColorGradientParams3D(surface_tension=0.01, tau_r=1.0,
                                   tau_b=0.8, contact_angle_deg=60.0)
    bcs = CG3DBoundaryConfig(inlet="velocity", outlet="convective",
                             inlet_velocity=-1e-3)
    m = ColorGradientRK3D(geo.from_solid_mask(solid), params, bcs,
                          dtype=jnp.float32, use_pallas=False)
    single = build_cg3d_fused_step(m.geo, params, jnp.float32,
                                   slabs_per_block=8, bc_config=bcs,
                                   state_mode="compressed", interpret=True)
    mesh = make_mesh(shape=(2, 2))
    sharded = build_cg3d_sharded_step(m.geo, params, mesh, jnp.float32,
                                      slabs_per_block=4, bc_config=bcs,
                                      interpret=True)
    assert sharded is not None
    s = m.pack_state(*m.init_state_layers(1.0, 1.0, invading_slabs=6))
    a = s
    b = s
    for _ in range(2):
        a = single(a)
        b = jax.jit(sharded)(b)
    assert float(jnp.max(jnp.abs(a - b))) < 3e-5


def test_coupled_transport_sharded_equals_single():
    """Coupled CSF flow + phase-confined tracer transport (jnp path,
    interface redistribution active) sharded over the 8-device mesh ==
    single device at 1e-12: the β-partition shifts, hard bounce-back
    repair, and moving-front mass redistribution all lower to
    collective-permute exchanges under XLA SPMD."""
    from openlbmpm_tpu.models.transport import (TransportParams,
                                                TransportRK)
    ny, nx = 64, 128
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    fp = ColorGradientParams(variant="CSF", collision="MRT",
                             surface_tension=0.01, tau_type=2,
                             wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-3, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    tp = TransportParams(num_tracers=1, scheme=5, tau=(1.0,),
                         beta_interface=(0.2,),
                         interface_mode="redistribute")
    m = TransportRK(geo.from_solid_mask(solid), fp, tp, bcs,
                    dtype=jnp.float64, use_pallas=False)
    flow0 = m.flow.init_state_layers(1.0, 1.0, invading_rows=12)
    conc0 = np.zeros((1, ny, nx))
    conc0[0, ny // 2:] = 1.0
    state0 = m.init_state(flow0, conc0)

    ref = state0
    step1 = jax.jit(m._step_impl)
    for _ in range(10):
        ref = step1(ref)

    mesh = make_mesh(8)
    shd = shard_domain(state0, mesh)
    stepn = jax.jit(m._step_impl)
    for _ in range(10):
        shd = stepn(shd)
    for a, b in zip(ref, shd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)


def test_coupled_fused_sharded_equals_single():
    """The compressed fused coupled flow+transport kernel under a
    4-shard y-mesh (ppermute halo rows for the flow state AND the
    tracer PDFs, scalar-prefetched row offsets) matches the
    single-device compressed coupled kernel."""
    from openlbmpm_tpu.models.transport import (TransportParams,
                                                TransportRK)
    from openlbmpm_tpu.pallas.csf import (build_csf_fused_step,
                                          build_csf_sharded_step)
    ny, nx = 64, 64
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    fp = ColorGradientParams(variant="CSF", collision="MRT",
                             surface_tension=0.01, tau_type=2,
                             wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-3, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    tp = TransportParams(num_tracers=2, scheme=5, tau=(1.0, 0.8),
                         j0=(0.25, 0.25), beta_interface=(0.2, 0.0),
                         interface_mode="bounceback")
    m = TransportRK(geo.from_solid_mask(solid), fp, tp, bcs,
                    dtype=jnp.float32, use_pallas=False)
    single = build_csf_fused_step(
        m.geo, fp, jnp.float32, rows_per_block=16, steps_per_call=1,
        bc_config=bcs, transport_params=tp, state_mode="compressed",
        interpret=True)
    assert single is not None
    from openlbmpm_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(shape=(4, 1))
    sharded = build_csf_sharded_step(
        m.geo, fp, mesh, jnp.float32, rows_per_block=8, steps_per_call=1,
        bc_config=bcs, transport_params=tp, interpret=True)
    assert sharded is not None
    flow0 = m.flow.init_state_layers(1.0, 1.0, invading_rows=12)
    conc0 = np.zeros((2, ny, nx))
    conc0[:, ny // 2:] = 1.0
    st = m.init_state(flow0, conc0)
    s = m.flow.pack_state(st.f_r, st.f_b)
    g = st.g
    a, ga = s, g
    b, gb = s, g
    for _ in range(3):
        a, ga = single(a, ga)
        b, gb = jax.jit(sharded)(b, gb)
    assert float(jnp.max(jnp.abs(a - b))) < 3e-5
    assert float(jnp.max(jnp.abs(ga - gb))) < 3e-5


def test_coupled3d_fused_sharded_equals_single():
    """The fused coupled 3D flow+transport kernel under a 4-shard z-mesh
    (ppermute halo slabs for the flow state AND the tracer PDFs, the
    interface bounce-back epilogue on the global sharded arrays) matches
    the single-device fused coupled step."""
    from openlbmpm_tpu.models.flow3d import (ColorGradientParams3D,
                                             TransportRK3D)
    from openlbmpm_tpu.pallas.cg3d import build_cg3d_sharded_step
    from openlbmpm_tpu.parallel.mesh import make_mesh
    nz, n = 32, 16
    solid = np.zeros((nz, n, n), bool)
    solid[:, 0, :] = solid[:, -1, :] = True
    params = ColorGradientParams3D(surface_tension=0.01, tau_r=1.0,
                                   tau_b=0.8, contact_angle_deg=60.0)
    m = TransportRK3D(geo.from_solid_mask(solid), params, num_tracers=1,
                      tau=(1.0,), interface_mode="bounceback",
                      dtype=jnp.float32)
    single = m.make_fused_step(slabs_per_block=8, interpret=True)
    assert single is not None
    mesh = make_mesh(shape=(4, 1))
    sharded = build_cg3d_sharded_step(
        m.geo, params, mesh, jnp.float32, slabs_per_block=4,
        bc_config=m.flow.bcs, transport=m.transport, interpret=True)
    assert sharded is not None
    f_r, f_b = m.flow.init_state_layers(1.0, 1.0, invading_slabs=8)
    conc0 = np.zeros((1, nz, n, n))
    conc0[:, nz // 2:] = 1.0
    g0 = m.transport.init_state(conc0)
    s = m.flow.pack_state(f_r, f_b)
    a, ga = s, g0
    b, gb = s, g0
    for _ in range(2):
        a, ga = single(a, ga)
        b, gb = jax.jit(sharded)(b, gb)
    assert float(jnp.max(jnp.abs(a - b))) < 3e-5
    assert float(jnp.max(jnp.abs(ga - gb))) < 3e-5


def test_coupled_fused_sharded_2d_mesh_equals_single():
    """Coupled flow+transport under a TRUE 2-D (2, 2) (y, x) mesh: the
    tracer PDFs ride the same x ring permute (halo lanes) as the flow
    state, then the y halo rows of the x-padded arrays carry the corner
    data.  Must match the single-device compressed coupled kernel
    (VERDICT r4 item 8)."""
    from openlbmpm_tpu.models.transport import (TransportParams,
                                                TransportRK)
    from openlbmpm_tpu.parallel.mesh import make_mesh
    from openlbmpm_tpu.pallas.csf import (build_csf_fused_step,
                                          build_csf_sharded_step)
    ny, nx = 64, 64
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    fp = ColorGradientParams(variant="CSF", collision="MRT",
                             surface_tension=0.01, tau_type=2,
                             wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-3, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    tp = TransportParams(num_tracers=2, scheme=5, tau=(1.0, 0.8),
                         j0=(0.25, 0.25), beta_interface=(0.2, 0.0),
                         interface_mode="bounceback")
    m = TransportRK(geo.from_solid_mask(solid), fp, tp, bcs,
                    dtype=jnp.float32, use_pallas=False)
    single = build_csf_fused_step(
        m.geo, fp, jnp.float32, rows_per_block=16, steps_per_call=1,
        bc_config=bcs, transport_params=tp, state_mode="compressed",
        interpret=True)
    assert single is not None
    mesh = make_mesh(shape=(2, 2))
    sharded = build_csf_sharded_step(
        m.geo, fp, mesh, jnp.float32, rows_per_block=8, steps_per_call=1,
        bc_config=bcs, transport_params=tp, interpret=True)
    assert sharded is not None
    flow0 = m.flow.init_state_layers(1.0, 1.0, invading_rows=12)
    conc0 = np.zeros((2, ny, nx))
    conc0[:, ny // 2:] = 1.0
    st = m.init_state(flow0, conc0)
    s = m.flow.pack_state(st.f_r, st.f_b)
    g = st.g
    a, ga = s, g
    b, gb = s, g
    for _ in range(3):
        a, ga = single(a, ga)
        b, gb = jax.jit(sharded)(b, gb)
    assert float(jnp.max(jnp.abs(a - b))) < 3e-5
    assert float(jnp.max(jnp.abs(ga - gb))) < 3e-5
