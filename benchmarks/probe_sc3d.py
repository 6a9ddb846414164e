"""Bench the fused D3Q19 Shan-Chen kernel (pallas/sc3d.py) at n^3.

Usage: python benchmarks/probe_sc3d.py [n] [T,R ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n, configs):
    import jax
    import jax.numpy as jnp

    from openlbmpm_tpu import geometry as geo
    from openlbmpm_tpu.models.flow3d import (ShanChenMCMP3D,
                                             ShanChenParams3D)
    from openlbmpm_tpu.pallas.sc3d import build_sc3d_fused_step

    solid = np.zeros((n, n, n), bool)
    solid[:, 0, :] = solid[:, -1, :] = True
    p = ShanChenParams3D(g_matrix=((0.0, 3.6), (3.6, 0.0)),
                         g_solid=(-0.3, 0.3), tau=(1.0, 0.8),
                         body_force=(0.0, 0.0, -1e-6))
    m = ShanChenMCMP3D(geo.from_solid_mask(solid), p, dtype=jnp.float32,
                       use_pallas=False)
    f0 = m.init_state_droplet((1.0, 1.0), (0.02, 0.02), radius=n / 4)

    for cfg in configs:
        t_block, rows = cfg[0], cfg[1]
        storage = cfg[2] if len(cfg) > 2 else "f32"
        try:
            fused = build_sc3d_fused_step(m.geo, p, jnp.float32,
                                          slabs_per_block=rows or None,
                                          steps_per_call=t_block,
                                          storage=storage)
            if fused is None:
                print(f"T={t_block} R={rows} {storage}: does not "
                      "decompose", flush=True)
                continue
            f = jnp.array(f0)
            if storage == "bf16":
                f = m.pack_state_bf16(f)

            def steps(k, s):
                return jax.lax.fori_loop(0, k, lambda _, x: fused(x), s)

            run = jax.jit(steps, static_argnums=0, donate_argnums=1)
            n_calls = 120 // t_block
            f = run(n_calls, f)
            jax.block_until_ready(f)
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                f = run(n_calls, f)
                jax.block_until_ready(f)
                dt = min(dt, time.perf_counter() - t0)
            mlups = n ** 3 * (n_calls * t_block) / dt / 1e6
            fin = bool(np.isfinite(np.asarray(f, np.float32)).all())
            print(f"T={t_block} R={rows} {storage}: {mlups:.0f} MLUPS "
                  f"finite={fin}", flush=True)
        except Exception as ex:
            print(f"T={t_block} R={rows}: FAILED "
                  f"({type(ex).__name__}: {str(ex)[:150]})", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:]
    n = int(args[0]) if args else 128
    cfgs = ([tuple(int(v) if v.isdigit() else v for v in a.split(","))
             for a in args[1:]]
            if len(args) > 1 else [(1, 8), (2, 8), (1, 4)])
    main(n, cfgs)
