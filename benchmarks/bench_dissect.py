"""Dissect the fused compressed CSF kernel's time budget on the real chip.

Times variants that each remove one cost component, so the deltas
attribute ms/step to: DMA floor (copy-only kernel with identical block
specs), wetting machinery (periodic domain, no solid), MRT vs SRT
collision, and BC rows.

Usage: python benchmarks/bench_dissect.py [T] [R] [variant-substring ...]
(variant filter: only build() tags containing one of the substrings run;
'copy' enables the copy-only floor measurement)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_step(step, state, t_block, ny, nx, n_steps=400):
    import jax

    def steps(n_calls, s):
        def body(_, s):
            return step(s)
        return jax.lax.fori_loop(0, n_calls, body, s)

    run = jax.jit(steps, static_argnums=0, donate_argnums=1)
    n_calls = max(1, n_steps // t_block)
    out = run(n_calls, state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(n_calls, out)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return ny * nx * (n_calls * t_block) / dt / 1e6, dt / (n_calls * t_block)


def main(t_block=4, rows=128, only=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from openlbmpm_tpu import geometry as geo
    from openlbmpm_tpu.models.colorgradient import (
        CGBoundaryConfig, ColorGradientParams, ColorGradientRK)

    ny = nx = 1024
    results = {}

    def build(tag, solid_walls, collision, bcs_on):
        if only and not any(s in tag for s in only):
            return
        solid = np.zeros((ny, nx), bool)
        if solid_walls:
            solid[:, 0] = solid[:, -1] = True
        params = ColorGradientParams(
            tau_r=1.0, tau_b=1.0, surface_tension=0.1,
            contact_angle_deg=60.0, beta=0.7, delta=0.98, tau_type=2,
            wetting_type=2, variant="CSF", collision=collision)
        if bcs_on:
            bcs = CGBoundaryConfig(inlet="neumann", outlet="dirichlet",
                                   inlet_velocity=-1e-4, outlet_density_r=0.0,
                                   outlet_density_b=1.0)
        else:
            bcs = CGBoundaryConfig(inlet="periodic", outlet="periodic")
        model = ColorGradientRK(geo.from_solid_mask(solid), params, bcs,
                                dtype=jnp.float32, use_pallas=False)
        blk = model.make_block_step(steps_per_call=t_block,
                                    rows_per_block=rows, compressed=True)
        if blk is None:
            print(f"{tag}: does not decompose")
            return
        s = model.pack_state(*model.init_state_layers(1.0, 1.0,
                                                      invading_rows=100))
        mlups, ms = _time_step(blk, s, t_block, ny, nx)
        results[tag] = (mlups, ms * 1e3)
        print(f"{tag}: {mlups:.0f} MLUPS  ({ms * 1e3:.3f} ms/step)", flush=True)

    # copy-only kernel with identical block shapes: the DMA floor
    from openlbmpm_tpu.pallas.csf import _halo_rows
    H = _halo_rows(t_block, "CSF")
    R = rows
    nb = ny // R
    hb = ny // H

    def copy_kernel(s_c, s_u, s_d, g_c, g_u, g_d, out):
        out[:] = s_c[:] + s_u[0, 0, 0] + g_u[0, 0, 0] + g_d[0, 0, 0] \
            + s_d[0, 0, 0] + g_c[0, 0, 0]

    center = pl.BlockSpec((10, R, nx), lambda i: (0, i, 0))
    halo_up = pl.BlockSpec((10, H, nx),
                           lambda i: (0, (i * (R // H) - 1) % hb, 0))
    halo_dn = pl.BlockSpec((10, H, nx),
                           lambda i: (0, (i * (R // H) + R // H) % hb, 0))
    gc = pl.BlockSpec((4, R, nx), lambda i: (0, i, 0))
    gu = pl.BlockSpec((4, H, nx), lambda i: (0, (i * (R // H) - 1) % hb, 0))
    gd = pl.BlockSpec((4, H, nx),
                      lambda i: (0, (i * (R // H) + R // H) % hb, 0))
    copy_call = pl.pallas_call(
        copy_kernel, grid=(nb,),
        in_specs=[center, halo_up, halo_dn, gc, gu, gd],
        out_specs=pl.BlockSpec((10, R, nx), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((10, ny, nx), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",)))
    gstat = jnp.zeros((4, ny, nx), jnp.float32)

    def copy_step(s):
        return copy_call(s, s, s, gstat, gstat, gstat)

    if not only or any(s in "copy" for s in only):
        s0 = jnp.zeros((10, ny, nx), jnp.float32)
        mlups, ms = _time_step(copy_step, s0, 1, ny, nx)
        print(f"copy-only (per call = 1 'step'): {ms * 1e3:.3f} ms/call "
              f"-> {ms * 1e3 / t_block:.3f} ms/step at T={t_block}",
              flush=True)

    build("full (walls, MRT, BCs)", True, "MRT", True)
    build("walls MRT periodic-BC", True, "MRT", False)
    build("SRT (walls, BCs)", True, "SRT", True)
    build("no wetting (periodic, MRT)", False, "MRT", False)
    build("no wetting SRT (periodic)", False, "SRT", False)


if __name__ == "__main__":
    argv = sys.argv[1:]
    nums = [int(a) for a in argv[:2] if a.isdigit()]
    only = [a for a in argv[len(nums):]] or None
    main(*(nums or [4, 128]), only=only)

# appended variant: walls but periodic BCs (isolates wetting cost from BC rows)
