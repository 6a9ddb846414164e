"""Bench the fused single-phase D2Q9 kernel (pallas/single.py) at 1024x512
(BASELINE config 1 geometry) and 1024^2 across (T, R) configs.

Usage: python benchmarks/probe_single.py [T,R ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(configs):
    import jax
    import jax.numpy as jnp

    from openlbmpm_tpu import geometry as geo
    from openlbmpm_tpu.models.single_phase import SinglePhaseD2Q9

    nx, ny = 512, 1024
    m = SinglePhaseD2Q9(geo.box_with_walls(nx, ny), tau=0.9,
                        collision="MRT", body_force=(0.0, -1e-6),
                        dtype=jnp.float32)
    f0 = m.init_state()

    for cfg in configs:
        t_block, rows = cfg[0], cfg[1]
        storage = cfg[2] if len(cfg) > 2 else "f32"
        try:
            f = jnp.array(f0)
            if storage == "bf16":
                f = m.pack_state_bf16(f)
            blk = m.make_block_step(steps_per_call=t_block,
                                    rows_per_block=rows, storage=storage)
            if blk is None:
                print(f"T={t_block} R={rows} {storage}: does not "
                      "decompose", flush=True)
                continue

            def steps(k, s):
                return jax.lax.fori_loop(0, k, lambda _, x: blk(x), s)

            run = jax.jit(steps, static_argnums=0, donate_argnums=1)
            n_calls = 1200 // t_block
            f = run(n_calls, f)
            jax.block_until_ready(f)
            t0 = time.perf_counter()
            f = run(n_calls, f)
            jax.block_until_ready(f)
            dt = time.perf_counter() - t0
            mlups = nx * ny * (n_calls * t_block) / dt / 1e6
            fin = bool(np.isfinite(np.asarray(f, np.float32)).all())
            print(f"T={t_block} R={rows} {storage}: {mlups:.0f} MLUPS "
                  f"({dt / (n_calls * t_block) * 1e3:.4f} ms/step) "
                  f"finite={fin}", flush=True)
        except Exception as ex:
            print(f"T={t_block} R={rows}: FAILED "
                  f"({type(ex).__name__}: {str(ex)[:120]})", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    cfgs = ([tuple(int(v) if v.isdigit() else v for v in a.split(","))
             for a in args]
            if args else [(4, 256), (4, 128)])
    main(cfgs)
