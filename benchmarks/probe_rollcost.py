"""Calibrate pltpu.roll vs elementwise cost on the chip: times kernels of
N x-rolls / y-rolls / multiply-adds over a (288, 1024) f32 window."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    W, NX, REP = 288, 1024, 64

    def mk(body):
        def kernel(x_ref, o_ref):
            a = x_ref[...]
            for _ in range(REP):
                a = body(a)
            o_ref[...] = a
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W, NX), jnp.float32))

    variants = {
        "xroll": mk(lambda a: pltpu.roll(a, 1, axis=1)),
        "yroll": mk(lambda a: pltpu.roll(a, 1, axis=0)),
        "mul_add": mk(lambda a: a * 1.0000001 + 0.001),
        "select": mk(lambda a: jnp.where(a > 0.5, a, a * 1.0000001)),
        "divide": mk(lambda a: 1.0 / (a + 1.5)),
        "rsqrt": mk(lambda a: jax.lax.rsqrt(a + 1.5)),
    }
    x = jnp.asarray(np.random.rand(W, NX).astype(np.float32))
    for name, call in variants.items():
        f = jax.jit(lambda v, c=call: c(v))
        y = f(x); jax.block_until_ready(y)
        n = 200
        t0 = time.perf_counter()
        for _ in range(n):
            y = f(y)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / n / REP
        print(f"{name}: {dt*1e6:.3f} us/op over (288,1024)", flush=True)

if __name__ == "__main__":
    main()
