"""Does one x-roll over a stacked (3W, NX) window beat three x-rolls over
three separate (W, NX) arrays?  Same data volume, no concat bias: the
separate variant carries three arrays through the repeat loop."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    W, NX, REP = 96, 1024, 64

    def mk_stack(axis):
        def kernel(x_ref, o_ref):
            a = x_ref[...]
            for _ in range(REP):
                a = pltpu.roll(a, 1, axis=axis)
            o_ref[...] = a
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3 * W, NX), jnp.float32)), 3 * W

    def mk_sep(axis):
        def kernel(x1, x2, x3, o1, o2, o3):
            a, b, c = x1[...], x2[...], x3[...]
            for _ in range(REP):
                a = pltpu.roll(a, 1, axis=axis)
                b = pltpu.roll(b, 1, axis=axis)
                c = pltpu.roll(c, 1, axis=axis)
            o1[...], o2[...], o3[...] = a, b, c
        sds = jax.ShapeDtypeStruct((W, NX), jnp.float32)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_shape=[sds] * 3), W

    for name, (call, w), nin in (
            ("xroll_stack3", mk_stack(1), 1),
            ("xroll_sep3", mk_sep(1), 3),
            ("yroll_stack3", mk_stack(0), 1),
            ("yroll_sep3", mk_sep(0), 3)):
        xs = [jnp.asarray(np.random.rand(w, NX).astype(np.float32))
              for _ in range(nin)]
        f = jax.jit(lambda *v, c=call: c(*v))
        y = f(*xs); jax.block_until_ready(y)
        n = 200
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(*(y if nin == 3 else [y]))
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / (n * REP) * 1e6
        print(f"{name}: {dt:.3f} us/iter ({nin}x({w},{NX}))", flush=True)


if __name__ == "__main__":
    main()
