"""TPU numerics probe: compiled fused CSF kernels vs the jnp path on a
flagship-style walled channel (wetting + in-kernel BC rows engaged).

Split state must match the jnp step to f32 roundoff.  The compressed
state is reported informationally: at contact-line cells (interface
meeting the side walls) the wetting-rotation distance tie-breaks flip
under 1-ulp input differences (the kernel sums the total PDF in a
different order than the jnp reduction), giving local ~1e-3 deviations
that are benign — algorithmic equivalence is proven at f64 by
tests/test_pallas_csf.py::test_fused_contact_line_matches_jnp_f64.
"""
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from openlbmpm_tpu import geometry as geo
from openlbmpm_tpu.models.colorgradient import (
    CGBoundaryConfig, ColorGradientParams, ColorGradientRK)
from openlbmpm_tpu.pallas.csf import build_csf_fused_step


def main():
    ny, nx = 256, 1024
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
                            dtype=jnp.float32, use_pallas=False)
    f_r, f_b = model.init_state_layers(1.0, 1.0, invading_rows=40)

    fused_c = build_csf_fused_step(model.geo, model.p, jnp.float32,
                                   rows_per_block=64, steps_per_call=1,
                                   bc_config=bcs, state_mode="compressed")
    fused_s = build_csf_fused_step(model.geo, model.p, jnp.float32,
                                   rows_per_block=64, steps_per_call=1,
                                   bc_config=bcs)
    assert fused_c is not None and fused_s is not None

    step_jnp = jax.jit(model._step_impl)
    step_jnp_c = jax.jit(model._step_impl_c)
    step_c = jax.jit(fused_c)
    step_s = jax.jit(fused_s)

    a, b = f_r, f_b
    c, d = f_r, f_b
    s = model.pack_state(f_r, f_b)
    s0 = model.pack_state(f_r, f_b)
    for _ in range(8):
        a, b = step_jnp(a, b)
        c, d = step_s(c, d)
        s = step_c(s)
        s0 = step_jnp_c(s0)
    jax.block_until_ready((a, c, s, s0))

    def confined(diff):
        """Sites >1e-4 must sit where tie flips live: near the side
        walls (contact line / wetting columns) or on BC ghost rows."""
        dd = np.asarray(diff)
        idx = np.argwhere(dd > 1e-4)
        if not len(idx):
            return True, 0
        cols = idx[:, -1]
        rows = idx[:, -2]
        near = (cols < 16) | (cols >= nx - 16) | (rows < 3) | \
            (rows >= ny - 3)
        return bool(near.all()), len(idx)

    d_split_r = float(jnp.max(jnp.abs(a - c)))
    d_split_b = float(jnp.max(jnp.abs(b - d)))
    d_comp = float(jnp.max(jnp.abs(s - s0)))
    ok_r, n_r = confined(jnp.abs(a - c))
    ok_b, n_b = confined(jnp.abs(b - d))
    ok_s, n_s = confined(jnp.abs(s - s0))
    print(f"split:  max|df_r|={d_split_r:.3e} max|df_b|={d_split_b:.3e} "
          f"(sites>1e-4: {n_r}/{n_b}, wall/BC-confined: {ok_r}/{ok_b})")
    print(f"compr fused vs compr jnp: max|ds|={d_comp:.3e} "
          f"(sites>1e-4: {n_s}, confined: {ok_s}; contact-line tie "
          "flips expected, see docstring)")
    ok = ok_r and ok_b and ok_s
    print("PROBE", "OK" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
