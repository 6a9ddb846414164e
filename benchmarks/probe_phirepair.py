"""Same-chip A/B of the phi Neumann outlet repair cost on the flagship
kernel (bench.py config, compressed bf16, T=4/R=256): builds the kernel
with ``phi_outlet_repair`` off and on in one process (same chip, same
tunnel), measures steady-state MLUPS for each back-to-back.

Usage: python benchmarks/probe_phirepair.py [T] [R] [STORAGE]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def build_and_time(repair: bool, t_block: int, rpb: int, storage: str):
    import jax
    import jax.numpy as jnp

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
                           outlet_density_b=1.0, phi_outlet_repair=repair)
    model = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                            dtype=jnp.float32)
    f_r, f_b = model.init_state_layers(1.0, 1.0, invading_rows=100)

    t0 = time.time()
    block = model.make_block_step(
        steps_per_call=t_block, rows_per_block=rpb, compressed=True,
        storage=storage)
    assert block is not None
    state = ((model.pack_state_bf16 if storage == "bf16"
              else model.pack_state)(f_r, f_b),)

    def steps(n_calls, *s):
        return jax.lax.fori_loop(0, n_calls,
                                 lambda _, x: (block(*x),), s)

    run = jax.jit(steps, static_argnums=0, donate_argnums=(1,))
    n_steps = 600
    n_calls = n_steps // t_block
    state = run(n_calls, *state)
    jax.block_until_ready(state)
    compile_s = time.time() - t0
    dt = float("inf")
    for _ in range(4):
        t0 = time.time()
        state = run(n_calls, *state)
        jax.block_until_ready(state)
        dt = min(dt, time.time() - t0)
    assert bool(jnp.isfinite(
        jnp.sum(state[0][:9].astype(jnp.float32))))
    mlups = 1024 * 1024 * n_steps / dt / 1e6
    print(f"repair={repair} storage={storage} T={t_block} R={rpb}: "
          f"{mlups:.1f} MLUPS (compile {compile_s:.0f}s)", flush=True)
    return mlups


def main():
    t_block = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rpb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    storage = sys.argv[3] if len(sys.argv) > 3 else "bf16"
    off = build_and_time(False, t_block, rpb, storage)
    on = build_and_time(True, t_block, rpb, storage)
    print(f"repair cost: {100 * (off - on) / off:.2f}% "
          f"({off:.1f} -> {on:.1f})", flush=True)


if __name__ == "__main__":
    main()
