"""Pull-streaming equivalence against a NumPy oracle of the reference's
push/scatter streaming with fused half-way bounce-back
(``OptimizedD2Q9GPU.calStreaming1GPU:452-533``)."""

import jax.numpy as jnp
import numpy as np

from openlbmpm_tpu.lattice import D2Q5, D2Q9
from openlbmpm_tpu.ops.streaming import stream, stream_and_mask, upwind_solid_masks


def reference_push_stream(f, lat, is_solid):
    """NumPy oracle: push each population to the neighbor slot, or reflect
    into the opposite slot when the neighbor is solid.  Only fluid nodes
    push; rest population is untouched."""
    ny, nx = is_solid.shape
    out = f.copy()  # reference copies only directions 1..Q-1; dir 0 persists
    fluid = ~is_solid
    for y in range(ny):
        for x in range(nx):
            if is_solid[y, x]:
                continue
            for i in range(1, lat.q):
                dx, dy = int(lat.e[i, 0]), int(lat.e[i, 1])
                yn, xn = (y + dy) % ny, (x + dx) % nx
                if fluid[yn, xn]:
                    out[i, yn, xn] = f[i, y, x]
                else:
                    out[lat.opp[i], y, x] = f[i, y, x]
    return out


def _random_geometry(rng, ny, nx):
    is_solid = rng.random((ny, nx)) < 0.3
    # keep at least some fluid
    is_solid[1:3, 1:3] = False
    return is_solid


def test_pull_matches_reference_push_d2q9():
    rng = np.random.default_rng(0)
    ny, nx = 12, 10
    is_solid = _random_geometry(rng, ny, nx)
    f = rng.random((9, ny, nx))
    f[:, is_solid] = 0.0

    oracle = reference_push_stream(f, D2Q9, is_solid)
    masks = upwind_solid_masks(D2Q9, is_solid)
    got = np.asarray(stream(jnp.asarray(f), D2Q9, jnp.asarray(masks)))

    fluid = ~is_solid
    np.testing.assert_allclose(got[:, fluid], oracle[:, fluid], atol=1e-14)


def test_pull_matches_reference_push_d2q5():
    rng = np.random.default_rng(1)
    ny, nx = 9, 7
    is_solid = _random_geometry(rng, ny, nx)
    f = rng.random((5, ny, nx))
    f[:, is_solid] = 0.0

    oracle = reference_push_stream(f, D2Q5, is_solid)
    masks = upwind_solid_masks(D2Q5, is_solid)
    got = np.asarray(stream(jnp.asarray(f), D2Q5, jnp.asarray(masks)))

    fluid = ~is_solid
    np.testing.assert_allclose(got[:, fluid], oracle[:, fluid], atol=1e-14)


def test_mass_conserved_closed_box():
    rng = np.random.default_rng(2)
    ny, nx = 16, 16
    is_solid = np.zeros((ny, nx), bool)
    is_solid[0, :] = is_solid[-1, :] = True
    is_solid[:, 0] = is_solid[:, -1] = True
    f = rng.random((9, ny, nx))
    fluid_mask = jnp.asarray(~is_solid, jnp.float64)
    f = jnp.asarray(f) * fluid_mask
    masks = jnp.asarray(upwind_solid_masks(D2Q9, is_solid))
    total0 = float(jnp.sum(f))
    for _ in range(5):
        f = stream_and_mask(f, D2Q9, masks, fluid_mask)
    assert abs(float(jnp.sum(f)) - total0) < 1e-10


def test_batched_multifluid_streaming():
    rng = np.random.default_rng(3)
    ny, nx = 8, 8
    is_solid = _random_geometry(rng, ny, nx)
    f = rng.random((2, 9, ny, nx))
    f[:, :, is_solid] = 0.0
    masks = upwind_solid_masks(D2Q9, is_solid)
    # vmapped semantics: leading fluid axis broadcasts
    got = np.asarray(stream(jnp.asarray(f), D2Q9, jnp.asarray(masks)))
    for k in range(2):
        single = np.asarray(stream(jnp.asarray(f[k]), D2Q9, jnp.asarray(masks)))
        np.testing.assert_allclose(got[k], single)
