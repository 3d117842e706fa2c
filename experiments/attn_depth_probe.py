#!/usr/bin/env python
"""Decode-attention depth probe: is the chunked kernel DMA-bound or
VPU-bound at deep context?

Times ONE decode_attention call (one layer of a [L,B,Hkv,T,D] stacked
cache) at several live depths, against the DMA roofline (K+V bytes of
the visible chunks at HBM peak). If measured time >> roofline, the
chunk-loop math (VPU broadcast-multiply row-reduces + [C,1] softmax
vectors) is the bottleneck, not the cache reads — the motivation for
the MXU dot_general rewrite.

Also times the XLA einsum attention over the same slab for reference
(it reads all T rows but rides the MXU).
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from teal_tpu.models import llama
from teal_tpu.ops import decode_attention as da

HBM_GBPS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, reps=30):
    fn()  # compile+warm
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    L, B, Hkv, Hq, T, D = 4, 1, 32, 32, 2048, 128
    G = Hq // Hkv
    kc = jnp.zeros((L, B, Hkv, T, D), jnp.bfloat16)
    vc = jnp.zeros((L, B, Hkv, T, D), jnp.bfloat16)
    q = jnp.ones((B, Hq, 1, D), jnp.bfloat16) * 0.02
    kn = jnp.ones((B, Hkv, 1, D), jnp.bfloat16) * 0.03
    vn = jnp.ones((B, Hkv, 1, D), jnp.bfloat16) * 0.05

    # the tunnel runtime costs ~23 ms per host dispatch — time by
    # in-program repetition (serial dependence through q) and slope
    import functools

    @functools.partial(jax.jit, static_argnums=(5,))
    def fused(q, kn, vn, kc, vc, n, pos):
        def body(i, carry):
            qq, kc_, vc_ = carry
            o, kc_, vc_ = da.decode_attention(
                qq, kn, vn, kc_, vc_, 1, jnp.full((B,), pos, jnp.int32))
            return (qq + o.astype(qq.dtype) * 1e-3, kc_, vc_)
        return jax.lax.fori_loop(0, n, body, (q, kc, vc))[0]

    @functools.partial(jax.jit, static_argnums=(3,))
    def xla(q, kc1, vc1, n, pos):
        def body(i, qq):
            o = llama._attention(qq, kc1, vc1,
                                 jnp.full((B,), pos, jnp.int32), 1, T,
                                 None)
            return qq + o.astype(qq.dtype) * 1e-3
        return jax.lax.fori_loop(0, n, body, q)

    n_lo, n_hi = 8, 40
    for pos in (64, 512, 1024, 1990):
        tf_lo = timeit(lambda: jax.device_get(
            fused(q, kn, vn, kc, vc, n_lo, pos)), reps=8)
        tf_hi = timeit(lambda: jax.device_get(
            fused(q, kn, vn, kc, vc, n_hi, pos)), reps=8)
        tf = (tf_hi - tf_lo) / (n_hi - n_lo)
        # visible chunks the kernel DMAs: ceil((pos+1)/256) chunks of K+V
        nchunks = (pos // 256) + 1
        bytes_read = 2 * Hkv * nchunks * 256 * D * 2
        roofline = bytes_read / (HBM_GBPS * 1e9)
        tx_lo = timeit(lambda: jax.device_get(
            xla(q, kc[1], vc[1], n_lo, pos)), reps=8)
        tx_hi = timeit(lambda: jax.device_get(
            xla(q, kc[1], vc[1], n_hi, pos)), reps=8)
        tx = (tx_hi - tx_lo) / (n_hi - n_lo)
        log(f"pos={pos:5d}: fused {tf*1e6:8.1f} us | DMA roofline "
            f"{roofline*1e6:6.1f} us ({tf/roofline:4.1f}x) | "
            f"XLA einsum (full T) {tx*1e6:8.1f} us")


if __name__ == "__main__":
    main()
