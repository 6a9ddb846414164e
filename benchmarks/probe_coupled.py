"""A/B the coupled CSF + D2Q5 transport kernel (compressed vs split vs
bf16 flow-plane storage).

Usage: python benchmarks/probe_coupled.py [split|comp|bf16] [T,R ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(mode, configs):
    import jax
    import jax.numpy as jnp

    from openlbmpm_tpu import geometry as geo
    from openlbmpm_tpu.models.colorgradient import (CGBoundaryConfig,
                                                    ColorGradientParams)
    from openlbmpm_tpu.models.transport import TransportParams, TransportRK

    n = 1024
    solid = np.zeros((n, n), bool)
    solid[:, 0] = solid[:, -1] = True
    fp = ColorGradientParams(variant="CSF", collision="MRT", tau_type=2,
                             wetting_type=2)
    bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                           inlet_velocity=-1e-4, outlet_density_r=0.0,
                           outlet_density_b=1.0)
    tp = TransportParams(num_tracers=1, scheme=5, tau=(1.0,), j0=(1 / 3,),
                         interface_mode="permeable", beta_interface=(0.5,))
    m = TransportRK(geo.from_solid_mask(solid), fp, tp, bcs,
                    dtype=jnp.float32, use_pallas=False)
    fs = m.flow.init_state_layers(1.0, 1.0, invading_rows=100)
    conc0 = np.zeros((1, n, n))
    conc0[0, n - 120:, :] = 1.0
    st0 = m.init_state(fs, conc0)

    for t_block, rows in configs:
        try:
            blk = m.make_block_step(steps_per_call=t_block,
                                    rows_per_block=rows,
                                    compressed=(mode in ("comp", "bf16")),
                                    storage="bf16" if mode == "bf16"
                                    else "f32")
            if blk is None:
                print(f"{mode} T={t_block} R={rows}: does not decompose",
                      flush=True)
                continue
            if mode == "bf16":
                state = (m.flow.pack_state_bf16(st0.f_r, st0.f_b),
                         jnp.array(st0.g))
            elif mode == "comp":
                state = (m.flow.pack_state(st0.f_r, st0.f_b),
                         jnp.array(st0.g))
            else:
                state = (jnp.array(st0.f_r), jnp.array(st0.f_b),
                         jnp.array(st0.g))

            def steps(k, s):
                return jax.lax.fori_loop(0, k, lambda _, x: blk(*x), s)

            run = jax.jit(steps, static_argnums=0, donate_argnums=1)
            n_calls = 600 // t_block
            state = run(n_calls, state)
            jax.block_until_ready(state)
            t0 = time.perf_counter()
            state = run(n_calls, state)
            jax.block_until_ready(state)
            dt = time.perf_counter() - t0
            mlups = n * n * (n_calls * t_block) / dt / 1e6
            fin = bool(np.isfinite(np.asarray(state[0],
                                              np.float32)).all())
            print(f"{mode} T={t_block} R={rows}: {mlups:.0f} MLUPS "
                  f"({dt / (n_calls * t_block) * 1e3:.3f} ms/step) "
                  f"finite={fin}", flush=True)
        except Exception as ex:
            print(f"{mode} T={t_block} R={rows}: FAILED "
                  f"({type(ex).__name__}: {str(ex)[:120]})", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "comp"
    args = sys.argv[2:]
    cfgs = ([tuple(int(v) for v in a.split(",")) for a in args]
            if args else [(2, 128), (4, 128)])
    main(mode, cfgs)
