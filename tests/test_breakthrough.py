"""Steps-to-breakthrough validation (the literal BASELINE metric:
"MLUPS/chip at fixed steps-to-breakthrough", BASELINE.json:2).

A small pore-throat drainage case runs to breakthrough — the invading
phase reaching the outlet band (``metrics.flow_diagnostics``; reference
semantics: the drainage configs of ``IniFiles/RKtwophasesetup2D.ini``
with fixed outlet densities) — on every cheap-on-CPU step path: jnp f64
split, jnp f32 split, jnp f32 compressed, and the f32 compressed step
under a 2-device y-sharding.  The breakthrough step must agree across
paths at the checking resolution.  The TPU-side companion
(``benchmarks/bench_accuracy.py --part breakthrough``) runs the same
family on the fused f32/bf16 kernels at 256^2.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openlbmpm_tpu import geometry as geo
from openlbmpm_tpu.metrics import flow_diagnostics
from openlbmpm_tpu.models.colorgradient import (
    CGBoundaryConfig, ColorGradientParams, ColorGradientRK)

NY, NX = 64, 32
V_IN = -3e-3
CHECK = 100
MAX_STEPS = 40_000


def _solid():
    """Side walls + two staggered grains forming ~8-wide throats."""
    s = np.zeros((NY, NX), bool)
    s[:, 0] = s[:, -1] = True
    s[30:34, 1:20] = True     # throat on the right
    s[44:48, 12:31] = True    # throat on the left
    return s


def _model(dtype):
    params = ColorGradientParams(
        tau_r=1.0, tau_b=1.0, surface_tension=0.01, contact_angle_deg=60.0,
        beta=0.7, delta=0.98, tau_type=2, wetting_type=2, variant="CSF",
        collision="MRT")
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=V_IN, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    return ColorGradientRK(geo.from_solid_mask(_solid()), params, bcs,
                           dtype=dtype)


def _breakthrough_step(model, step_fn, state, kind):
    fl = model.geo.is_fluid

    def loop(k, s):
        def body(_, s):
            out = step_fn(*s) if kind == "split" else (step_fn(s[0]),)
            return out if isinstance(out, tuple) else (out,)
        return jax.lax.fori_loop(0, k, body, s)

    run = jax.jit(loop, static_argnums=0, donate_argnums=1)
    done = 0
    while done < MAX_STEPS:
        state = run(CHECK, state)
        done += CHECK
        if kind == "split":
            rho_r = jnp.sum(state[0], axis=0)
            rho_b = jnp.sum(state[1], axis=0)
        else:
            rho = jnp.sum(state[0][:9], axis=0)
            rho_r = state[0][9]
            rho_b = rho - rho_r
        met = flow_diagnostics(rho_r, rho_b, jnp.zeros_like(rho_r),
                               jnp.zeros_like(rho_r), fl,
                               breakthrough_row=3)
        if met["breakthrough"]:
            return done
    return -1


# Tolerances.  Same-precision / same-rounding paths must agree at the
# checking resolution (CHECK steps).  f32 paths against the f64 anchor
# get 5%: the wetted grains put contact lines in every throat, and the
# documented f32 wetting-rotation tie-break sensitivity (DEVIATIONS.md
# "f32 contact-line tie-break") shifts the invasion by a few hundred
# steps between compute graphs (measured: split f32 = f64 +- CHECK,
# compressed f32 = f64 + ~4%).
F32_REL_TOL = 0.05


@pytest.fixture(scope="module")
def bt_f64():
    m = _model(jnp.float64)
    st = m.init_state_layers(1.0, 1.0, invading_rows=12)
    bt = _breakthrough_step(m, m._step_impl, st, "split")
    assert bt > 0, "f64 drainage never broke through — case mis-sized"
    return bt


@pytest.fixture(scope="module")
def bt_c32():
    m = _model(jnp.float32)
    st = m.init_state_layers(1.0, 1.0, invading_rows=12)
    s = m.pack_state(*st)
    bt = _breakthrough_step(m, m._step_impl_c, (s,), "c")
    assert bt > 0
    return bt


def test_breakthrough_f32_split_matches_f64(bt_f64):
    m = _model(jnp.float32)
    st = m.init_state_layers(1.0, 1.0, invading_rows=12)
    bt = _breakthrough_step(m, m._step_impl, st, "split")
    assert bt > 0
    assert abs(bt - bt_f64) <= max(CHECK, F32_REL_TOL * bt_f64), \
        (bt, bt_f64)


@pytest.mark.slow
def test_breakthrough_compressed_layout_matches_split_f64(bt_f64):
    """Layout comparison at f64.  Exactness is NOT attainable across
    layouts even at f64: the compressed state computes rho_b as
    rho_total - rho_r (different-but-equivalent algebra, ~1e-15 per
    step), and over the ~10k steps to breakthrough the contact-line
    tie-breaks amplify that into the same few-percent shift the f32
    graphs show (measured: 10700 vs 10300, +3.9%).  Bit-exactness
    holds across *shardings* of the same layout
    (test_breakthrough_sharded_matches_single_device); across layouts
    the physics-level tolerance applies."""
    m = _model(jnp.float64)
    st = m.init_state_layers(1.0, 1.0, invading_rows=12)
    s = m.pack_state(*st)
    bt = _breakthrough_step(m, m._step_impl_c, (s,), "c")
    assert bt > 0
    assert abs(bt - bt_f64) <= F32_REL_TOL * bt_f64, (bt, bt_f64)


def test_breakthrough_compressed_f32_within_tolerance(bt_f64, bt_c32):
    assert abs(bt_c32 - bt_f64) <= F32_REL_TOL * bt_f64, (bt_c32, bt_f64)


def test_breakthrough_sharded_matches_single_device(bt_c32):
    """Compressed f32 step with the state row-sharded over a 2-device
    y-mesh (XLA inserts the halo collectives): per-cell arithmetic is
    order-identical, so the breakthrough step must match the
    single-device compressed path at CHECK resolution."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.array(devs[:2]), ("y",))
    m = _model(jnp.float32)
    st = m.init_state_layers(1.0, 1.0, invading_rows=12)
    s = jax.device_put(m.pack_state(*st),
                       NamedSharding(mesh, P(None, "y", None)))
    bt = _breakthrough_step(m, m._step_impl_c, (s,), "c")
    assert bt > 0
    assert abs(bt - bt_c32) <= CHECK, (bt, bt_c32)
