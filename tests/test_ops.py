import jax.numpy as jnp
import numpy as np

from openlbmpm_tpu.lattice import D2Q5, D2Q9
from openlbmpm_tpu.ops import collision as col
from openlbmpm_tpu.ops import equilibrium as eq
from openlbmpm_tpu.ops import macroscopic as mac
from openlbmpm_tpu.ops.forcing import efs_force_pdf, guo_source


def _fields(seed=0, ny=6, nx=5):
    rng = np.random.default_rng(seed)
    rho = jnp.asarray(1.0 + 0.1 * rng.random((ny, nx)))
    ux = jnp.asarray(0.05 * (rng.random((ny, nx)) - 0.5))
    uy = jnp.asarray(0.05 * (rng.random((ny, nx)) - 0.5))
    return rho, ux, uy


def test_feq_moments():
    rho, ux, uy = _fields()
    feq = eq.feq_quadratic(D2Q9, rho, (ux, uy))
    np.testing.assert_allclose(np.asarray(mac.density(feq)), np.asarray(rho),
                               rtol=1e-12)
    mx, my = mac.momentum(D2Q9, feq)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(rho * ux), rtol=1e-10,
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(my), np.asarray(rho * uy), rtol=1e-10,
                               atol=1e-14)


def test_feq_rk_original_moments():
    rho, ux, uy = _fields(1)
    c = eq.rk_constants(alpha=0.92)
    feq = eq.feq_rk_original(D2Q9, rho, (ux, uy), c)
    # zeroth moment: rho (sum C_i = alpha + 5*(1-a)/5*... = 1)
    assert abs(c.sum() - 1.0) < 1e-14
    np.testing.assert_allclose(np.asarray(mac.density(feq)), np.asarray(rho),
                               rtol=1e-12)
    mx, my = mac.momentum(D2Q9, feq)
    np.testing.assert_allclose(np.asarray(mx), np.asarray(rho * ux), rtol=1e-10,
                               atol=1e-14)


def test_feq_transport_moments():
    rng = np.random.default_rng(2)
    conc = jnp.asarray(rng.random((4, 4)))
    ux = jnp.asarray(0.02 * rng.random((4, 4)))
    uy = jnp.asarray(0.02 * rng.random((4, 4)))
    j0 = 0.25
    j = np.array([j0] + [(1 - j0) / 4] * 4)
    feq = eq.feq_transport_j(D2Q5, conc, (ux, uy), j)
    np.testing.assert_allclose(np.asarray(feq.sum(0)), np.asarray(conc),
                               rtol=1e-12)
    # first moment: C u / 2 * 2 = sum C (J + e.u/2) e = C u / 2 ... per J-scheme
    mx = np.asarray((feq * D2Q5.e[:, 0].reshape(-1, 1, 1)).sum(0))
    np.testing.assert_allclose(mx, np.asarray(conc * ux), rtol=1e-10, atol=1e-15)

    feq_lin = eq.feq_transport_linear(D2Q5, conc, (ux, uy))
    np.testing.assert_allclose(np.asarray(feq_lin.sum(0)), np.asarray(conc),
                               rtol=1e-12)
    mx = np.asarray((feq_lin * D2Q5.e[:, 0].reshape(-1, 1, 1)).sum(0))
    # linear eq: sum C w (1+3 e.u) e_x = C ux (since 3 sum w ex^2 = 1)
    np.testing.assert_allclose(mx, np.asarray(conc * ux), rtol=1e-10, atol=1e-15)


def test_mrt_reduces_to_bgk():
    rho, ux, uy = _fields(3)
    feq = eq.feq_quadratic(D2Q9, rho, (ux, uy))
    rng = np.random.default_rng(4)
    f = feq + 0.01 * jnp.asarray(rng.random(feq.shape))
    tau = 0.8
    s = np.full(9, 1.0 / tau)
    got = col.mrt(f, feq, D2Q9, s)
    want = col.bgk(f, feq, tau)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_mrt_conserves_mass_momentum():
    rho, ux, uy = _fields(5)
    feq = eq.feq_quadratic(D2Q9, rho, (ux, uy))
    rng = np.random.default_rng(6)
    df = 0.01 * rng.random(feq.shape)
    # zero out conserved moments of the perturbation? No: MRT with s[0]=s[3]=s[5]=0
    f = feq + jnp.asarray(df)
    s = col.mrt_relaxation_d2q9_sc(tau=0.7)
    got = col.mrt(f, feq, D2Q9, s)
    np.testing.assert_allclose(np.asarray(mac.density(got)),
                               np.asarray(mac.density(f)), rtol=1e-12)
    mx0, my0 = mac.momentum(D2Q9, f)
    mx1, my1 = mac.momentum(D2Q9, got)
    np.testing.assert_allclose(np.asarray(mx1), np.asarray(mx0), atol=1e-13)
    np.testing.assert_allclose(np.asarray(my1), np.asarray(my0), atol=1e-13)


def test_mrt_variable_nu_matches_constant():
    rho, ux, uy = _fields(7)
    feq = eq.feq_quadratic(D2Q9, rho, (ux, uy))
    rng = np.random.default_rng(8)
    f = feq + 0.01 * jnp.asarray(rng.random(feq.shape))
    tau = 0.9
    s = col.mrt_relaxation_d2q9_rk(tau)
    want = col.mrt(f, feq, D2Q9, s)
    inv_tau = jnp.full(rho.shape, 1.0 / tau)
    got = col.mrt_variable_nu(f, feq, D2Q9, col.mrt_relaxation_d2q9_rk(),
                              inv_tau)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_trt_reduces_to_bgk_at_matched_magic():
    rho, ux, uy = _fields(9)
    feq = eq.feq_quadratic(D2Q9, rho, (ux, uy))
    rng = np.random.default_rng(10)
    f = feq + 0.01 * jnp.asarray(rng.random(feq.shape))
    tau = 0.8
    # magic such that tau_minus == tau ==> TRT == BGK
    magic = (tau - 0.5) ** 2
    got = col.trt(f, feq, D2Q9, tau, magic=magic)
    want = col.bgk(f, feq, tau)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_guo_source_moments():
    rho, ux, uy = _fields(11)
    fx = jnp.full(rho.shape, 1e-4)
    fy = jnp.full(rho.shape, -2e-4)
    src = guo_source(D2Q9, (ux, uy), (fx, fy))
    # zeroth moment of Guo source vanishes; first moment equals F
    np.testing.assert_allclose(np.asarray(src.sum(0)), 0.0, atol=1e-15)
    sx = np.asarray((src * D2Q9.e[:, 0].reshape(-1, 1, 1)).sum(0))
    sy = np.asarray((src * D2Q9.e[:, 1].reshape(-1, 1, 1)).sum(0))
    np.testing.assert_allclose(sx, np.asarray(fx), rtol=1e-10)
    np.testing.assert_allclose(sy, np.asarray(fy), rtol=1e-10)


def test_efs_force_pdf_moments():
    rho, ux, uy = _fields(12)
    feq = eq.feq_quadratic(D2Q9, rho, (ux, uy))
    fx = jnp.full(rho.shape, 1e-4)
    fy = jnp.full(rho.shape, -2e-4)
    ff = efs_force_pdf(D2Q9, feq, rho, (ux, uy), (fx, fy))
    # sum_i f^F_i = 3/rho * F.(rho u - rho u) = 0
    np.testing.assert_allclose(np.asarray(ff.sum(0)), 0.0, atol=1e-12)


def test_sc_common_velocity_single_fluid():
    rho, ux, uy = _fields(13)
    feq = eq.feq_quadratic(D2Q9, rho, (ux, uy))
    f_k = feq[None]
    rho_k = rho[None]
    upx, upy = mac.sc_common_velocity(D2Q9, f_k, rho_k, np.array([0.8]))
    np.testing.assert_allclose(np.asarray(upx), np.asarray(ux), rtol=1e-10,
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(upy), np.asarray(uy), rtol=1e-10,
                               atol=1e-14)


def test_pressure_definitions():
    """Three SC pressure definitions (Huang/Shan/Kang,
    ``AccelerateGPU2D.py:100-149``)."""
    import jax.numpy as jnp
    from openlbmpm_tpu.ops import macroscopic as mac
    r0 = jnp.asarray([[1.0]])
    r1 = jnp.asarray([[0.5]])
    g = 3.0
    assert abs(float(mac.pressure_sc_huang(r0, r1, g)[0, 0]) -
               (1.5 / 3.0 + (g / 3.0) * 1.0 * 0.5)) < 1e-12
    assert abs(float(mac.pressure_sc_shan(r0, r1, g)[0, 0]) -
               (1.5 / 3.0 + 0.5 * g * 1.0 * 0.5)) < 1e-12
    assert float(mac.pressure_sc_kang(r0, r1, g)[0, 0]) == \
        float(mac.pressure_sc_shan(r0, r1, g)[0, 0])


def test_analytic_sc_contact_angle():
    from openlbmpm_tpu.metrics import analytic_sc_contact_angle
    # symmetric adhesion => 90 degrees
    assert abs(analytic_sc_contact_angle(0.0, 0.0, 3.8, 1.0, 0.02) - 90) < 1e-9
    # g_s1 > g_s0 => cos > 0 => angle < 90 (fluid 0 wets)
    assert analytic_sc_contact_angle(-0.4, 0.4, 3.8, 1.0, 0.02) < 90


def test_stream_moving_wall_lid_cavity():
    """Moving-wall link bounce-back drives a shear flow: a lid moving in +x
    above a closed cavity sets the adjacent fluid in motion (momentum is
    injected with the 6 w rho (e.u_wall) term)."""
    import jax.numpy as jnp
    import numpy as np
    from openlbmpm_tpu import geometry as geo
    from openlbmpm_tpu.lattice import D2Q9
    from openlbmpm_tpu.ops import equilibrium as eq
    from openlbmpm_tpu.ops import macroscopic as mac
    from openlbmpm_tpu.ops.streaming import (stream_moving_wall,
                                             upwind_solid_masks)
    n = 24
    solid = np.zeros((n, n), bool)
    solid[0, :] = solid[-1, :] = True     # floor + moving lid
    solid[:, 0] = solid[:, -1] = True
    g = geo.from_solid_mask(solid)
    us = jnp.asarray(upwind_solid_masks(D2Q9, g.is_solid))
    fl = jnp.asarray(g.is_fluid, jnp.float64)
    rho = jnp.ones((n, n)) * fl
    z = jnp.zeros((n, n))
    f = eq.feq_quadratic(D2Q9, rho, (z, z)) * fl
    # only the lid (top wall) moves: mask the wall velocity to bounced
    # populations whose upwind solid is the top row
    u_lid = 0.05
    yy = jnp.arange(n).reshape(-1, 1)
    lid_zone = jnp.broadcast_to(yy >= n - 2, (n, n))
    uxw = jnp.where(lid_zone, u_lid, 0.0)
    tau = 0.8
    for _ in range(200):
        rho = mac.density(f)
        u = mac.velocity(D2Q9, f, rho)
        feq = eq.feq_quadratic(D2Q9, rho, u)
        f = f - (f - feq) / tau
        f = stream_moving_wall(f, D2Q9, us, rho, (uxw, 0.0 * uxw)) * fl
    rho = mac.density(f)
    ux, uy = mac.velocity(D2Q9, f, rho)
    ux = np.asarray(ux)
    # fluid under the lid moves with it; bottom stays nearly still
    assert ux[n - 2, n // 2] > 0.01
    assert abs(ux[2, n // 2]) < abs(ux[n - 2, n // 2]) * 0.2
    assert np.isfinite(np.asarray(f)).all()


def test_chang_bcs_consistency():
    """Chang 2009 corrector BCs: at steady uniform state with matching
    velocity/density they reproduce the equilibrium row (no-op fixpoint)."""
    import jax.numpy as jnp
    from openlbmpm_tpu.lattice import D2Q9
    from openlbmpm_tpu.ops import boundaries as bc
    from openlbmpm_tpu.ops import equilibrium as eq
    nx = 16
    rho = jnp.ones((4, nx))
    z = jnp.zeros((4, nx))
    f = eq.feq_quadratic(D2Q9, rho, (z, z))  # (9, 4, nx) uniform rest state
    mask = jnp.ones(nx, bool)
    out = bc.chang_velocity_top(f, f, 0.0, 2, mask)
    assert float(jnp.max(jnp.abs(out - f))) < 1e-12
    out = bc.chang_pressure_top(f, f, jnp.ones(nx), 2, mask)
    assert float(jnp.max(jnp.abs(out - f))) < 1e-12
    out = bc.chang_pressure_bottom(f, f, jnp.ones(nx), 1, mask)
    assert float(jnp.max(jnp.abs(out - f))) < 1e-12
