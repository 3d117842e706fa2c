"""On-chip validation + perf of the production block-sparse GEMV.

Checks numerics vs the jnp semantics twin, then slope-times the kernel at
Llama-2-7B projection shapes for keep = 1.0 / 0.625 / 0.5 and compares
against the dense XLA GEMV.

Run: python experiments/block_perf.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from teal_tpu.ops import block_gemv
from teal_tpu.utils.bench_utils import bench_chained


def report(name, secs, nbytes):
    print(f"{name:52s} {secs*1e6:9.2f} us   {nbytes/secs/1e9:8.1f} GB/s",
          flush=True)


def check_numerics(K, N, G, keep):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (1, K), jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), jnp.bfloat16)
    y = block_gemv.block_sparse_matmul(x, w, None, G, keep)
    ref = block_gemv.block_sparse_matmul_reference(x, w, None, G, keep)
    err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
    ok = err / scale < 2e-2
    print(f"numerics K={K} N={N} G={G} keep={keep}: rel_err={err/scale:.2e} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    return ok


def bench_block(K, N, G, keep):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x0 = jax.random.normal(kx, (1, K), jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), jnp.bfloat16)

    def step(x):
        y = block_gemv.block_sparse_matmul(x, w, None, G, keep)
        feed = y[:, :K] if N >= K else jnp.pad(y, ((0, 0), (0, K - N)))
        return (x0 + 1e-20 * feed.astype(jnp.float32)).astype(jnp.bfloat16)

    t = bench_chained(step, x0, n_short=64, n_long=512)
    nb = K // G
    kk = max(1, min(nb, int(round(nb * keep))))
    report(f"block G={G} keep={keep} K={K} N={N}", t, kk * G * N * 2)
    return t


def bench_dense(K, N):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x0 = jax.random.normal(kx, (1, K), jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), jnp.bfloat16)

    def step(x):
        y = jnp.matmul(x, w, preferred_element_type=jnp.float32)
        feed = y[:, :K] if N >= K else jnp.pad(y, ((0, 0), (0, K - N)))
        return (x0 + 1e-20 * feed).astype(jnp.bfloat16)

    t = bench_chained(step, x0, n_short=64, n_long=512)
    report(f"dense xla K={K} N={N}", t, K * N * 2)
    return t


def main():
    print("device:", jax.devices()[0], flush=True)
    assert check_numerics(4096, 4096, 32, 0.5)
    assert check_numerics(4096, 11008, 32, 0.625)
    assert check_numerics(11008, 4096, 32, 0.5)

    for K, N in ((4096, 4096), (4096, 11008), (11008, 4096)):
        td = bench_dense(K, N)
        t1 = bench_block(K, N, 32, 1.0)
        for keep in (0.625, 0.5):
            tk = bench_block(K, N, 32, keep)
            print(f"    -> vs dense xla: {td/tk:.2f}x ; vs block@1.0: "
                  f"{t1/tk:.2f}x", flush=True)


if __name__ == "__main__":
    main()
