"""On-chip probes for the sparse-GEMV design space (slope-timed).

All timings use teal_tpu.utils.bench_utils.bench_chained: dependency-chained
scan bodies + slope timing, immune to runtime memoization and LICM.

Run: python experiments/kernel_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from teal_tpu.utils.bench_utils import bench_chained


def report(name, secs, nbytes=None, flops=None):
    extra = ""
    if nbytes:
        extra += f" {nbytes/secs/1e9:8.1f} GB/s"
    if flops:
        extra += f" {flops/secs/1e12:8.1f} TFLOP/s"
    print(f"{name:46s} {secs*1e6:9.2f} us{extra}", flush=True)


def probe_dense(K, N):
    w = jax.random.normal(jax.random.PRNGKey(0), (K, N), jnp.bfloat16)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.bfloat16)

    def step(x):
        y = jnp.matmul(x, w, preferred_element_type=jnp.float32)
        feed = y[:, :K] if N >= K else jnp.pad(y, ((0, 0), (0, K - N)))
        return (x0 + 1e-20 * feed).astype(jnp.bfloat16)

    t = bench_chained(step, x0, n_short=128, n_long=1024)
    report(f"dense jnp [1,{K}]@[{K},{N}]", t, nbytes=K * N * 2)
    return t


def probe_dense_mxu():
    n = 4096
    w = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    a0 = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

    def step(a):
        return jnp.matmul(a, w, preferred_element_type=jnp.bfloat16)

    t = bench_chained(step, a0, n_short=8, n_long=64, reps=3)
    report("dense 4096^3 matmul", t, flops=2 * n**3)


def probe_rowgather(K, N, frac):
    NS = N // 128
    w3 = jax.random.normal(jax.random.PRNGKey(0), (K, NS, 128), jnp.bfloat16)
    nnz = int(K * frac)
    idx = jnp.asarray(
        np.sort(np.random.default_rng(0).choice(K, nnz, replace=False)),
        jnp.int32,
    )
    xc0 = jax.random.normal(jax.random.PRNGKey(1), (nnz,), jnp.float32)

    def kernel(idx_ref, xc_ref, w_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += xc_ref[i] * w_ref[0].astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nnz,),
        in_specs=[
            pl.BlockSpec((1, NS, 128), lambda i, ir, xr: (ir[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((NS, 128), lambda i, ir, xr: (0, 0)),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NS, 128), jnp.float32),
    )

    def step(xc):
        o = call(idx, xc, w3)
        return xc0 + 1e-20 * o.reshape(-1)[:nnz]

    t = bench_chained(step, xc0, n_short=128, n_long=1024)
    report(f"rowgather K={K} N={N} nnz={nnz}", t, nbytes=nnz * N * 2)
    return t


def probe_blockgather(K, N, G, frac):
    nb = K // G
    wg = jax.random.normal(jax.random.PRNGKey(0), (nb, G, N), jnp.bfloat16)
    nkeep = max(1, int(nb * frac))
    idx = jnp.asarray(
        np.sort(np.random.default_rng(0).choice(nb, nkeep, replace=False)),
        jnp.int32,
    )
    xg0 = jax.random.normal(jax.random.PRNGKey(1), (nkeep, G), jnp.bfloat16)

    def kernel(idx_ref, xg_ref, w_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += jax.lax.dot_general(
            xg_ref[...], w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nkeep,),
        in_specs=[
            pl.BlockSpec((1, G), lambda i, ir: (i, 0)),      # xg row
            pl.BlockSpec((1, G, N), lambda i, ir: (ir[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, N), lambda i, ir: (0, 0)),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
    )

    def step(xg):
        o = call(idx, xg, wg)
        feed = o.reshape(-1)[: nkeep * G].reshape(nkeep, G)
        return (xg0 + 1e-20 * feed).astype(jnp.bfloat16)

    t = bench_chained(step, xg0, n_short=128, n_long=1024)
    report(f"blockgather G={G} keep={frac} K={K} N={N}", t,
           nbytes=nkeep * G * N * 2)
    return t


def probe_compaction(K):
    thresh = 0.67
    x0 = jax.random.normal(jax.random.PRNGKey(1), (K,), jnp.float32)
    cap = K // 2

    def mk(fn):
        def step(x):
            r = fn(x)
            return x0 + 1e-20 * r[:1].astype(jnp.float32)
        return step

    def c_argsort(x):
        return jnp.argsort(jnp.abs(x) <= thresh)[:cap]

    def c_nonzero(x):
        return jnp.nonzero(jnp.abs(x) > thresh, size=cap, fill_value=0)[0]

    def c_cumsum_scatter(x):
        mask = jnp.abs(x) > thresh
        pos = jnp.cumsum(mask) - 1
        pos = jnp.where(mask, pos, cap + K)
        return jnp.zeros(cap + K + 1, jnp.int32).at[pos].set(
            jnp.arange(K, dtype=jnp.int32), mode="drop")[:cap]

    def c_topk(x):
        return jax.lax.top_k(jnp.abs(x), cap)[1]

    def c_mask(x):
        return (jnp.abs(x) > thresh).astype(jnp.int32)

    for name, fn in [("mask only", c_mask), ("argsort", c_argsort),
                     ("nonzero(size=)", c_nonzero),
                     ("cumsum+scatter", c_cumsum_scatter),
                     (f"top_k {cap}", c_topk)]:
        try:
            t = bench_chained(mk(fn), x0, n_short=256, n_long=2048)
            report(f"compact/{name} K={K}", t)
        except Exception as e:
            print(f"compact/{name} FAILED: {type(e).__name__} {str(e)[:100]}")


def main():
    print("device:", jax.devices()[0])
    probe_dense_mxu()
    t_dense = {}
    for N in (4096, 14336):
        t_dense[N] = probe_dense(4096, N)

    for N in (4096, 14336):
        for frac in (1.0, 0.5, 0.25):
            try:
                t = probe_rowgather(4096, N, frac)
                if frac < 1.0:
                    print(f"    -> vs dense: {t_dense[N]/t:.2f}x speedup")
            except Exception as e:
                print(f"rowgather N={N} frac={frac} FAILED: {type(e).__name__} {str(e)[:120]}")

    for G in (16,):
        for frac in (1.0, 0.5):
            try:
                t = probe_blockgather(4096, 4096, G, frac)
                if frac < 1.0:
                    print(f"    -> vs dense: {t_dense[4096]/t:.2f}x speedup")
            except Exception as e:
                print(f"blockgather G={G} frac={frac} FAILED: {type(e).__name__} {str(e)[:120]}")

    probe_compaction(4096)


if __name__ == "__main__":
    main()
