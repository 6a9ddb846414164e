"""Benchmark harness: MLUPS of the flagship CSF color-gradient two-phase
model on a 1024^2 D2Q9 grid (BASELINE.json north-star config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver-set target of 5000 MLUPS/chip
(BASELINE.md; the reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_MLUPS = 5000.0


def _wait_for_chip(max_wait_s: float = 1200.0) -> None:
    """Block until the TPU tunnel answers a device probe (wedged claims
    clear in ~30-45 min; a probe that hangs would otherwise hang the
    whole bench before jax initializes in this process).  Probes run in
    subprocesses so a hung jax.devices() can be abandoned."""
    import subprocess
    import sys
    deadline = time.time() + max_wait_s
    first = True
    while True:
        try:
            p = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                capture_output=True, text=True,
                timeout=max(5.0, min(300.0, deadline - time.time())))
            if p.returncode == 0 and "ok" in (p.stdout or ""):
                return
            # probe *completed* with an error (broken env, not a hung
            # tunnel): surface it and fail fast in the real run
            print("# device probe failed:\n" +
                  (p.stderr or "").strip()[-500:], flush=True)
            return
        except subprocess.TimeoutExpired:
            pass  # hung tunnel claim: wait and retry
        if time.time() >= deadline:
            return  # proceed; let the real run surface the error
        if first:
            print("# waiting for the TPU tunnel...", flush=True)
            first = False
        time.sleep(30.0)


def _enable_compile_cache(jax) -> None:
    """Persistent compilation cache next to this file: the flagship
    kernel's Mosaic compile is minutes-long at deep temporal blocks, but
    identical across runs on this machine, so the second run starts in
    seconds (verified to hit across processes over the axon tunnel)."""
    import os
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the cache config: compile every run


def main():
    _wait_for_chip()
    import jax
    import jax.numpy as jnp

    _enable_compile_cache(jax)

    from openlbmpm_tpu import geometry as geo
    from openlbmpm_tpu.models.colorgradient import (
        CGBoundaryConfig, ColorGradientParams, ColorGradientRK)

    ny = nx = 1024
    solid = np.zeros((ny, nx), bool)
    solid[:, 0] = solid[:, -1] = True
    params = ColorGradientParams(
        tau_r=1.0, tau_b=1.0, surface_tension=0.1, contact_angle_deg=60.0,
        beta=0.7, delta=0.98, tau_type=2, wetting_type=2, variant="CSF",
        collision="MRT")
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    model = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                            dtype=jnp.float32)
    f_r, f_b = model.init_state_layers(1.0, 1.0, invading_rows=100)

    # temporally-blocked fused Pallas kernel on the compressed bf16
    # 11-plane (shifted f_total deviations, rho_r hi/lo) state with the
    # boundary rows applied in-kernel (models/colorgradient
    # make_block_step, storage="bf16" — all VMEM arithmetic stays f32,
    # only HBM storage is bf16; the phase field keeps f32-grade
    # precision through the rho_r hi/lo pair); falls back to the
    # single-step split path off-TPU.
    #
    # T=8 early measurements suggested ~15% over T=4 (5316 vs 4638) but
    # a cleaner same-chip back-to-back A/B (probe_loop.py, RESULTS.md
    # r4 substep_unroll section) shows them tied (5123.7 vs 5119.7):
    # the kernel is VPU-bound, so deeper halo amortization buys nothing
    # at R=256.  Default stays T=4 (~3 min cold compile); BENCH_T=8
    # opts in via the rolled-loop kernel (substep_unroll=4), which
    # compiles in ~3 min instead of the ~12-15 min unrolled module.
    import os as _os
    t_block = int(_os.environ.get("BENCH_T", "4"))
    block = model.make_block_step(steps_per_call=t_block, rows_per_block=256,
                                  compressed=True, storage="bf16",
                                  substep_unroll=4 if t_block > 4 else None)
    if block is not None:
        state = (model.pack_state_bf16(f_r, f_b),)
    else:
        t_block = 1
        block = model._step_impl
        state = (f_r, f_b)

    def steps(n_calls, *s):
        def body(_, s):
            out = block(*s)
            return out if isinstance(out, tuple) else (out,)
        return jax.lax.fori_loop(0, n_calls, body, s)

    run = jax.jit(steps, static_argnums=0,
                  donate_argnums=tuple(range(1, 1 + len(state))))

    # warmup + compile with the SAME call count as the timed run: each
    # distinct static n compiles a separate executable, so warming with a
    # different n would leave the timed call paying a full compile.
    n_steps = 600  # ~0.4 s timed region: stable against tunnel jitter
    n_calls = n_steps // t_block
    state = run(n_calls, *state)
    jax.block_until_ready(state)

    # best-of-N timed regions: the tunnel adds occasional multi-ms stalls
    # and chip-to-chip variance is ~10%; the minimum is the honest
    # steady-state kernel time (same executable, same donated buffers).
    dt = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        state = run(n_calls, *state)
        jax.block_until_ready(state)
        dt = min(dt, time.perf_counter() - t0)
    assert bool(jnp.isfinite(state[0]).all())

    sites = int(np.prod((ny, nx)))
    mlups = sites * n_steps / dt / 1e6
    print(json.dumps({
        "metric": "MLUPS/chip (1024^2 D2Q9 CSF color-gradient two-phase, "
                  "MRT, bf16 HBM storage / f32 compute)",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / TARGET_MLUPS, 4),
    }))


if __name__ == "__main__":
    main()
