#!/usr/bin/env python
"""Decompose the sparse decode token time (7B, threshold mode, G=64).

Slope-times three nested variants over a 32-layer scan:
  proj-only   the 4 fused gather launches per layer, nothing else
  no-attn     projections + norms + rope + silu (attention = identity)
  full        the real layer (attention over a 256-slot cache)
plus the lm_head matmul alone. The deltas localize the glue.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from teal_tpu.config import SparsityConfig, get_model_config
from teal_tpu.models import llama
from teal_tpu.ops import block_gemv
from teal_tpu.utils.bench_utils import bench_chained
import bench


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    cfg = get_model_config("7B")
    params = bench._fast_init(cfg, jnp.bfloat16)
    jax.device_get(params["layers"]["wq"].ravel()[0])
    log("params ready")
    G = 64
    D, I, KV = cfg.dim, cfg.intermediate_size, cfg.kv_dim
    L = cfg.n_layers
    lay = params["layers"]
    thr = jnp.zeros((), jnp.float32)
    capD = (D // G) // 2          # keep half
    capI = (I // block_gemv.effective_block_size(G, I)) // 2

    def projs(x, y, inter, li):
        """The four launches of one layer (threshold mode)."""
        x3 = block_gemv.pack_x3(x, G)
        q, k, v = block_gemv.fused_select_gather_gemv(
            x3, thr.reshape(1), (lay["wq"], lay["wk"], lay["wv"]),
            G=G, cap=capD, layer=li)
        (o,) = block_gemv.fused_select_gather_gemv(
            x3, thr.reshape(1), (lay["wo"],), G=G, cap=capD, layer=li)
        y3 = block_gemv.pack_x3(y, G)
        g_, u_ = block_gemv.fused_select_gather_gemv(
            y3, thr.reshape(1), (lay["wgate"], lay["wup"]),
            G=G, cap=capD, layer=li)
        GI = block_gemv.effective_block_size(G, I)
        i3 = block_gemv.pack_x3(inter, GI)
        (d_,) = block_gemv.fused_select_gather_gemv(
            i3, thr.reshape(1), (lay["wdown"],), G=GI, cap=capI, layer=li)
        return q, k, v, o, g_, u_, d_

    x0 = jnp.ones((1, D), jnp.bfloat16) * 0.01
    y0 = jnp.ones((1, D), jnp.bfloat16) * 0.01
    i0 = jnp.ones((1, I), jnp.bfloat16) * 0.01

    def proj_only_step(c):
        def body(carry, li):
            x, y, inter = carry
            q, k, v, o, g_, u_, d_ = projs(x, y, inter, li)
            x = (x0 + 1e-12 * (q[:1, :D] + o[:1, :D]).astype(jnp.float32)
                 ).astype(jnp.bfloat16)
            y = (y0 + 1e-12 * d_[:1, :D].astype(jnp.float32)
                 ).astype(jnp.bfloat16)
            inter = (i0 + 1e-12 * jnp.pad(
                (g_[:1] + u_[:1]).astype(jnp.float32), ((0, 0), (0, 0))
            )).astype(jnp.bfloat16)
            return (x, y, inter), ()

        c, _ = jax.lax.scan(body, c, jnp.arange(L, dtype=jnp.int32))
        return c

    t = bench_chained(proj_only_step, (x0, y0, i0), n_short=4, n_long=16)
    log(f"proj-only (4 launches x {L} layers): {t*1e3:.2f} ms/token")

    # full decode step (threshold mode, via the model) for comparison
    sp = SparsityConfig(enabled=True, kernel="block", block_size=G,
                        block_keep_frac=0.5, block_thresholding=True)
    tps = bench.decode_tps(cfg, params, sp, 256, 4, 16)
    log(f"full model: {1e3/tps:.2f} ms/token ({tps:.2f} tok/s)")

    # lm_head alone
    lmh = params["lm_head"]

    def lm_step(x):
        z = jnp.matmul(x, lmh, preferred_element_type=jnp.float32)
        return (x0 + 1e-12 * z[:, :D]).astype(jnp.bfloat16)

    t2 = bench_chained(lm_step, x0, n_short=16, n_long=128)
    log(f"lm_head: {t2*1e3:.3f} ms")


if __name__ == "__main__":
    main()
