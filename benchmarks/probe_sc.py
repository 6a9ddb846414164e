"""A/B the SC-family fused kernels on the real chip.

Covers original SC (SRT), SC+MRT, and EFS iso-8 MRT at 1024^2 with the
BASELINE bench_all BC-free / wall geometries, across (T, R) configs.
Usage: python benchmarks/probe_sc.py [sc|efs] [T,R ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(which, configs):
    import jax
    import jax.numpy as jnp

    from openlbmpm_tpu import geometry as geo
    from openlbmpm_tpu.models.shanchen import ShanChenMCMP, ShanChenParams

    n = 1024
    if which == "sc":
        solid = np.zeros((n, n), bool)
        solid[:2, :] = True
        p = ShanChenParams(g_matrix=((0.0, 3.8), (3.8, 0.0)),
                           g_solid=(-0.4, 0.4), tau=(1.0, 1.0))
        m = ShanChenMCMP(geo.from_solid_mask(solid), p, dtype=jnp.float32)
        f0 = m.init_state_droplet((1.0, 1.0), (0.02, 0.02),
                                  center=(2.0, n / 2), radius=100.0)
    else:
        p = ShanChenParams(g_matrix=((0.0, 0.2), (0.2, 0.0)),
                           g_solid=(0.0, 0.0), tau=(1.0, 0.55),
                           scheme="EFS", iso_order=8, collision="MRT")
        m = ShanChenMCMP(geo.from_solid_mask(np.zeros((n, n), bool)), p,
                         dtype=jnp.float32)
        f0 = m.init_state_droplet((1.0, 1.0), (0.02, 0.02), radius=120.0)

    for cfg in configs:
        t_block, rows = cfg[0], cfg[1]
        storage = cfg[2] if len(cfg) > 2 else "f32"
        try:
            _run_one(m, f0, which, t_block, rows, n, storage)
        except Exception as ex:
            print(f"{which} T={t_block} R={rows} {storage}: FAILED "
                  f"({type(ex).__name__}: {str(ex)[:120]})")


def _run_one(m, f0, which, t_block, rows, n, storage="f32"):
    import jax
    import jax.numpy as jnp
    f = jnp.array(f0)
    if storage == "bf16":
        f = m.pack_state_bf16(f)
    blk = m.make_block_step(steps_per_call=t_block, rows_per_block=rows,
                            storage=storage)
    if blk is None:
        print(f"T={t_block} R={rows}: does not decompose")
        return

    def steps(k, s):
        return jax.lax.fori_loop(0, k, lambda _, x: blk(x), s)

    run = jax.jit(steps, static_argnums=0, donate_argnums=1)
    n_steps = 600
    n_calls = n_steps // t_block
    f = run(n_calls, f)
    jax.block_until_ready(f)
    t0 = time.perf_counter()
    f = run(n_calls, f)
    jax.block_until_ready(f)
    dt = time.perf_counter() - t0
    mlups = n * n * (n_calls * t_block) / dt / 1e6
    fin = bool(np.isfinite(np.asarray(f, np.float32)).all())
    print(f"{which} T={t_block} R={rows} {storage}: {mlups:.0f} MLUPS "
          f"({dt / (n_calls * t_block) * 1e3:.3f} ms/step) finite={fin}",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "sc"
    args = sys.argv[2:]
    if args:
        cfgs = [tuple(int(v) if v.isdigit() else v for v in a.split(","))
                for a in args]
    else:
        cfgs = [(4, 64), (4, 128), (4, 256), (8, 128)]
    main(which, cfgs)
