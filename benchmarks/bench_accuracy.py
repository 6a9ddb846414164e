"""Accuracy companion to bench.py: quantifies what the scored flagship's
precision modes cost in physics, at the bench config itself.

Two measurements (VERDICT r4 items 1 and 3; BASELINE.json's metric is
"MLUPS/chip at fixed steps-to-breakthrough ... matching reference physics
to 1e-6 relative density error"):

1. ``--part density``: the EXACT bench.py config (1024^2 D2Q9 CSF MRT,
   Neumann inlet / Dirichlet outlet, 600 steps) advanced through the same
   physics on three precision paths --
     - f64 jnp anchor (CPU; TPUs have no native f64),
     - f32 fused kernel (the bench kernel with storage="f32"),
     - bf16-storage fused kernel (bench.py's scored mode) --
   reporting max/p99.9 relative total-density error and max rho_r error
   of each path against the f64 anchor and of bf16 against f32.

2. ``--part breakthrough``: a reduced drainage variant (256^2 pore-throat
   image, same BC family, v_in = -2e-3) run to breakthrough on the jnp
   f32 path, the fused f32 kernel, and the fused bf16 kernel (plus an
   f64 anchor on CPU at 128^2), reporting steps-to-breakthrough per path
   and the bf16-vs-f32 delta.  Breakthrough = invading phase reaching
   the outlet band (metrics.invasion_metrics; reference semantics:
   IniFiles/RKtwophasesetup2D.ini drainage with fixed outlet densities).

Run on the TPU:   python benchmarks/bench_accuracy.py
CPU-only parts:   JAX_PLATFORMS=cpu python benchmarks/bench_accuracy.py \
                      --part density --paths f64
Prints one JSON line per measurement; the r5 table in RESULTS.md is
generated from these.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NY = NX = 1024
N_STEPS = 600  # same horizon bench.py times


def _bench_model(dtype, ny=NY, nx=NX):
    import jax.numpy as jnp

    from openlbmpm_tpu import geometry as geo
    from openlbmpm_tpu.models.colorgradient import (
        CGBoundaryConfig, ColorGradientParams, ColorGradientRK)
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        tau_r=1.0, tau_b=1.0, surface_tension=0.1, contact_angle_deg=60.0,
        beta=0.7, delta=0.98, tau_type=2, wetting_type=2, variant="CSF",
        collision="MRT")
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    return ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                           dtype=dtype)


def _pore_throat_solid(ny, nx):
    """Deterministic 2D pore-throat image: side walls plus two rows of
    staggered rectangular grains leaving ~nx/8-wide throats (a reduced
    stand-in for the reference's imaged pore spaces)."""
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    gy = ny // 4
    gh = max(2, ny // 16)
    gw = nx // 4
    # row of grains at y ~ ny/2 with throats at x = nx/8, 3nx/8, ...
    for x0 in range(nx // 8, nx - 1, nx // 4):
        solid[2 * gy - gh:2 * gy + gh, x0:x0 + gw // 2] = True
    # staggered row at y ~ ny/4
    for x0 in range(nx // 4, nx - 1, nx // 4):
        solid[gy - gh:gy + gh, x0:x0 + gw // 2] = True
    solid[:, 0] = solid[:, -1] = True
    return solid


def _drainage_model(dtype, ny, nx, v_in):
    import jax.numpy as jnp  # noqa: F401

    from openlbmpm_tpu import geometry as geo
    from openlbmpm_tpu.models.colorgradient import (
        CGBoundaryConfig, ColorGradientParams, ColorGradientRK)
    params = ColorGradientParams(
        tau_r=1.0, tau_b=1.0, surface_tension=0.01, contact_angle_deg=60.0,
        beta=0.7, delta=0.98, tau_type=2, wetting_type=2, variant="CSF",
        collision="MRT")
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=v_in, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    return ColorGradientRK(geo.from_solid_mask(_pore_throat_solid(ny, nx)),
                           params, bcs, dtype=dtype)


def _rho_fields(model, kind, state):
    """(rho_total, rho_r) as float64 numpy from any state layout."""
    import jax.numpy as jnp
    if kind == "split":
        f_r, f_b = state
        rho_r = jnp.sum(f_r, axis=0)
        rho = rho_r + jnp.sum(f_b, axis=0)
    else:
        s = state[0] if isinstance(state, tuple) else state
        if kind == "bf16":
            s = model.unpack_bf16(s)
        rho = jnp.sum(s[:9], axis=0)
        rho_r = s[9]
    return (np.asarray(rho, np.float64), np.asarray(rho_r, np.float64))


def _run_fused(model, storage, n_steps, t_block=4, rows=256):
    import jax
    block = model.make_block_step(steps_per_call=t_block,
                                  rows_per_block=rows, compressed=True,
                                  storage=storage)
    f_r, f_b = model.init_state_layers(1.0, 1.0, invading_rows=100)
    if block is None:
        raise SystemExit("fused kernel unavailable (not on TPU?)")
    s = (model.pack_state_bf16(f_r, f_b) if storage == "bf16"
         else model.pack_state(f_r, f_b))

    def loop(k, s):
        return jax.lax.fori_loop(0, k, lambda _, x: block(x), s)

    run = jax.jit(loop, static_argnums=0, donate_argnums=1)
    s = run(n_steps // t_block, s)
    jax.block_until_ready(s)
    return _rho_fields(model, "bf16" if storage == "bf16" else "c", s)


def _run_jnp(model, n_steps, chunk=100):
    import jax
    state = model.init_state_layers(1.0, 1.0, invading_rows=100)

    def loop(k, st):
        return jax.lax.fori_loop(0, k, lambda _, x: model._step_impl(*x),
                                 st)

    run = jax.jit(loop, static_argnums=0, donate_argnums=1)
    done = 0
    t0 = time.time()
    while done < n_steps:
        state = run(min(chunk, n_steps - done), state)
        jax.block_until_ready(state)
        done += chunk
        print(f"# f64 anchor: {done}/{n_steps} steps "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
    return _rho_fields(model, "split", state)


def _err(a, ref):
    rel = np.abs(a - ref) / np.maximum(np.abs(ref), 1e-30)
    rel = rel[np.isfinite(rel)]
    return {"max": float(rel.max()),
            "p999": float(np.percentile(rel, 99.9)),
            "p99": float(np.percentile(rel, 99.0)),
            "p50": float(np.percentile(rel, 50.0)),
            "mean": float(rel.mean()),
            "frac_le_1e-6": float((rel <= 1e-6).mean())}


def _force_cpu_if_requested():
    """The ambient axon sitecustomize registers the TPU plugin at
    interpreter start, so JAX_PLATFORMS=cpu alone is NOT enough (see
    tests/conftest.py); f64 paths must run on CPU."""
    import jax
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")


def part_density(paths, anchor_file):
    """Density-error table at the bench config."""
    import jax
    recs = {}
    if "f64" in paths:
        if jax.devices()[0].platform != "cpu":
            raise SystemExit(
                "f64 anchor must run on CPU: JAX_PLATFORMS=cpu python "
                "benchmarks/bench_accuracy.py --part density --paths f64")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        m64 = _bench_model(jnp.float64)
        rho, rho_r = _run_jnp(m64, N_STEPS)
        np.savez(anchor_file, rho=rho, rho_r=rho_r)
        print(json.dumps({"part": "density", "path": "f64-anchor",
                          "saved": anchor_file}), flush=True)
        recs["f64"] = (rho, rho_r)
    if "f32" in paths or "bf16" in paths:
        import jax.numpy as jnp
        m32 = _bench_model(jnp.float32)
        base = os.path.dirname(os.path.abspath(__file__))
        if "f32" in paths:
            recs["f32"] = _run_fused(m32, "f32", N_STEPS)
            np.savez(os.path.join(base, "rho_f32.npz"),
                     rho=recs["f32"][0], rho_r=recs["f32"][1])
        if "bf16" in paths:
            recs["bf16"] = _run_fused(m32, "bf16", N_STEPS)
            np.savez(os.path.join(base, "rho_bf16.npz"),
                     rho=recs["bf16"][0], rho_r=recs["bf16"][1])
    if "f64" not in recs and os.path.exists(anchor_file):
        with np.load(anchor_file) as z:
            recs["f64"] = (z["rho"], z["rho_r"])
    out = {"part": "density", "config": "bench.py 1024^2 CSF MRT",
           "steps": N_STEPS}
    fl = None
    if "f64" in recs:
        fl = recs["f64"][0] > 0
    for name in ("f32", "bf16"):
        if name in recs and "f64" in recs:
            out[f"{name}_vs_f64_rho"] = _err(recs[name][0][fl],
                                             recs["f64"][0][fl])
    if "f32" in recs and "bf16" in recs:
        fl32 = recs["f32"][0] > 0
        out["bf16_vs_f32_rho"] = _err(recs["bf16"][0][fl32],
                                      recs["f32"][0][fl32])
    print(json.dumps(out), flush=True)


def _steps_to_breakthrough(step_fn, state, model, kind, max_steps,
                           check_every=200, breakthrough_row=3):
    import jax
    from openlbmpm_tpu.metrics import flow_diagnostics
    import jax.numpy as jnp

    def loop(k, s):
        def body(_, s):
            out = step_fn(*s) if kind == "split" else (step_fn(s[0]),)
            return out if isinstance(out, tuple) else (out,)
        return jax.lax.fori_loop(0, k, body, s)

    run = jax.jit(loop, static_argnums=0, donate_argnums=1)
    fl = model.geo.is_fluid
    done = 0
    while done < max_steps:
        state = run(check_every, state)
        done += check_every
        rho, rho_r = _rho_fields(model, kind, state)
        met = flow_diagnostics(jnp.asarray(rho_r),
                               jnp.asarray(rho - rho_r),
                               jnp.zeros_like(jnp.asarray(rho)),
                               jnp.zeros_like(jnp.asarray(rho)), fl,
                               breakthrough_row=breakthrough_row)
        if met["breakthrough"]:
            return done, met["front_row"]
    return -1, met["front_row"]


def part_breakthrough(paths, check_every=200):
    """Steps-to-breakthrough across precision paths on the reduced
    drainage variant.  The granularity of the answer is ``check_every``
    steps; paths agreeing at this resolution are reported as equal."""
    import jax
    import jax.numpy as jnp
    ny = nx = 256
    v_in = -2e-3
    max_steps = 200_000
    inv_rows = 32
    out = {"part": "breakthrough",
           "config": f"{ny}x{nx} pore-throat drainage, v_in={v_in}",
           "check_every": check_every}
    t_block = 4

    if "f64" in paths:
        if jax.devices()[0].platform != "cpu":
            raise SystemExit("f64 paths must run with JAX_PLATFORMS=cpu")
        jax.config.update("jax_enable_x64", True)
        m = _drainage_model(jnp.float64, 128, 128, v_in)
        st = m.init_state_layers(1.0, 1.0, invading_rows=16)
        steps, front = _steps_to_breakthrough(
            m._step_impl, st, m, "split", max_steps, check_every)
        out["f64_jnp_128"] = steps
        print(json.dumps({"part": "breakthrough", "path": "f64-128",
                          "steps": steps}), flush=True)
    for name in paths:
        if name == "f64":
            continue
        if name == "f32_128":
            # same case as the f64 CPU anchor (128^2, invading_rows=16)
            # through the fused f32 kernel: the direct f32-vs-f64
            # breakthrough comparison
            m = _drainage_model(jnp.float32, 128, 128, v_in)
            f_r, f_b = m.init_state_layers(1.0, 1.0, invading_rows=16)
            block = m.make_block_step(steps_per_call=t_block,
                                      rows_per_block=32, compressed=True,
                                      storage="f32")
            if block is None:
                out[name] = "fused kernel unavailable"
                continue
            s = m.pack_state(f_r, f_b)
            steps, front = _steps_to_breakthrough(
                block, (s,), m, "c", max_steps // t_block,
                max(1, check_every // t_block))
            steps *= t_block
            out[name] = steps
            print(json.dumps({"part": "breakthrough", "path": name,
                              "steps": steps}), flush=True)
            continue
        m = _drainage_model(jnp.float32, ny, nx, v_in)
        f_r, f_b = m.init_state_layers(1.0, 1.0, invading_rows=inv_rows)
        if name == "jnp32":
            steps, front = _steps_to_breakthrough(
                m._step_impl, (f_r, f_b), m, "split", max_steps,
                check_every)
        else:
            block = m.make_block_step(steps_per_call=t_block,
                                      rows_per_block=64, compressed=True,
                                      storage=name)
            if block is None:
                out[name] = "fused kernel unavailable"
                continue
            s = (m.pack_state_bf16(f_r, f_b) if name == "bf16"
                 else m.pack_state(f_r, f_b))
            steps, front = _steps_to_breakthrough(
                block, (s,), m, "bf16" if name == "bf16" else "c",
                max_steps // t_block, max(1, check_every // t_block))
            steps *= t_block
        out[name] = steps
        print(json.dumps({"part": "breakthrough", "path": name,
                          "steps": steps}), flush=True)
    if isinstance(out.get("f32"), int) and isinstance(out.get("bf16"), int) \
            and out["f32"] > 0:
        out["bf16_vs_f32_delta_steps"] = out["bf16"] - out["f32"]
        out["bf16_vs_f32_delta_rel"] = round(
            (out["bf16"] - out["f32"]) / out["f32"], 4)
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["density", "breakthrough", "all"],
                    default="all")
    ap.add_argument("--paths", default="f64,f32,bf16",
                    help="comma list: f64,f32,bf16,jnp32")
    ap.add_argument("--anchor", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "anchor_f64.npz"))
    args = ap.parse_args()
    _force_cpu_if_requested()
    paths = [p.strip() for p in args.paths.split(",") if p.strip()]
    if args.part in ("density", "all"):
        part_density(paths, args.anchor)
    if args.part in ("breakthrough", "all"):
        part_breakthrough([p for p in paths if p != "f64"] +
                          (["f64"] if "f64" in paths else []))


if __name__ == "__main__":
    main()
