"""Minimal on-chip repro for the _norm_fold gather-lowering failure at
small nb (nb < nbp): isolates which expression form Mosaic rejects."""
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

nb, rows, nbp = 2, 8, 8


def make(form):
    def kernel(x_ref, g_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)
        scale = jax.lax.rsqrt(
            jnp.sum(xf * xf, axis=(0, 2), keepdims=True) / 256.0 + 1e-5)
        if form == "current":
            o_ref[...] = (xf * scale).astype(x_ref.dtype) \
                * g_ref[...][:nb, None, :].astype(x_ref.dtype)
        elif form == "slice-then-expand":
            g = g_ref[:nb, :].astype(x_ref.dtype)
            o_ref[...] = (xf * scale).astype(x_ref.dtype) * g[:, None, :]
        elif form == "reshape":
            g = g_ref[:nb, :].astype(x_ref.dtype).reshape(nb, 1, 128)
            o_ref[...] = (xf * scale).astype(x_ref.dtype) * g
        elif form == "f32-mul":
            g = g_ref[:nb, :].reshape(nb, 1, 128)
            o_ref[...] = (xf * scale * g).astype(x_ref.dtype)
        elif form == "scale2d":
            scale2 = jax.lax.rsqrt(
                jnp.sum(jnp.sum(xf * xf, axis=2), axis=0, keepdims=True)
                / 256.0 + 1e-5)                       # [1, rows]
            g = g_ref[:nb, :].reshape(nb, 1, 128)
            o_ref[...] = (xf * scale2[:, :, None] * g).astype(x_ref.dtype)

    @jax.jit
    def run(x, g):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nb, rows, 128), jnp.bfloat16),
        )(x, g)

    return run


x = jnp.ones((nb, rows, 128), jnp.bfloat16)
g = jnp.ones((nbp, 128), jnp.float32)
for form in ("current", "slice-then-expand", "reshape", "f32-mul",
             "scale2d"):
    if len(sys.argv) > 1 and sys.argv[1] != form:
        continue
    try:
        y = make(form)(x, g)
        jax.device_get(y)
        print(f"{form}: OK", flush=True)
    except Exception as e:
        print(f"{form}: FAIL {type(e).__name__}: {str(e)[:120]}",
              flush=True)
