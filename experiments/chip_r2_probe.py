#!/usr/bin/env python
"""Round-2 chip probe: flash-prefill + int4 sparse decode.

Phases (select with --phase; each run holds at most one 7B param set):
  prefill  7B bf16: 2048-token prefill wall time, einsum vs flash path,
           + last-token logit agreement.
  int4     7B packed-int4: dense (XLA unpack) and block-sparse (in-kernel
           dequant) decode tok/s; int4 fused-qkv microbench GB/s.

Timing: slope/delta with jax.device_get sync (bench_utils rationale).
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fill(shape, dtype, scale=0.04, seed=1):
    n = int(np.prod(shape))
    flat = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761 + seed)
    vals = (flat >> 16).astype(jnp.float32) / 65536.0 - 0.5
    return (vals * scale).astype(dtype).reshape(shape)


def phase_prefill():
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache
    import bench

    cfg = get_model_config("7B")
    params = bench._fast_init(cfg, jnp.bfloat16)
    jax.device_get(jax.tree.map(lambda a: a.ravel()[0], params)["embed"])
    log("params ready")

    S = 2048
    tokens = (jnp.arange(S, dtype=jnp.int32) * 13 % cfg.vocab_size)[None]
    th = jnp.zeros((cfg.n_layers, 7), jnp.float32)
    from teal_tpu.config import SparsityConfig
    sp = SparsityConfig()

    def run(causal_prefill):
        @jax.jit
        def f(params, tokens):
            cache = KVCache.init(cfg, 1, S, jnp.bfloat16)
            logits, _ = llama.forward(params, tokens, cache, 0, th,
                                      cfg=cfg, sp=sp,
                                      causal_prefill=causal_prefill)
            return logits[0, -1]

        t0 = time.time()
        out = jax.device_get(f(params, tokens))
        log(f"  compile+run {time.time()-t0:.1f}s")
        times = []
        for i in range(4):
            toks = (tokens + i) % cfg.vocab_size
            t0 = time.perf_counter()
            out = jax.device_get(f(params, toks))
            times.append(time.perf_counter() - t0)
        times.sort()
        return out, times[len(times) // 2]

    out_e, t_e = run(False)
    log(f"einsum prefill @ {S}: {t_e*1e3:.1f} ms")
    out_f, t_f = run(True)
    log(f"flash  prefill @ {S}: {t_f*1e3:.1f} ms")
    rel = np.linalg.norm(out_f - out_e) / (np.linalg.norm(out_e) + 1e-30)
    log(f"last-token logit rel err flash vs einsum: {rel:.2e}")


def phase_int4():
    from teal_tpu.config import SparsityConfig, get_model_config
    from teal_tpu.models import llama
    from teal_tpu.ops import quant
    import bench

    cfg = get_model_config("7B")

    # build packed-int4 params directly (no bf16 intermediate)
    def int4_leaf(K, N, L):
        qp = (jnp.arange(L * K // 2 * N, dtype=jnp.uint32)
              * jnp.uint32(2654435761) >> 24).astype(jnp.int8)
        qp = qp.reshape(L, K // 2, N)
        G = quant.int4_gather_group(32, K)
        nb = K // G
        sz = jnp.concatenate([
            jnp.full((L, nb, 1, N), 1e-3, jnp.float32),
            jnp.full((L, nb, 1, N), -8e-3, jnp.float32),
        ], axis=2)
        return {"qp": qp, "sz": sz}

    L, D, I, KV, V = (cfg.n_layers, cfg.dim, cfg.intermediate_size,
                      cfg.kv_dim, cfg.vocab_size)
    params = {
        "embed": fill((V, D), jnp.bfloat16),
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "lm_head": fill((D, V), jnp.bfloat16),
        "layers": {
            "attn_norm": jnp.ones((L, D), jnp.bfloat16),
            "mlp_norm": jnp.ones((L, D), jnp.bfloat16),
            "wq": int4_leaf(D, D, L),
            "wk": int4_leaf(D, KV, L),
            "wv": int4_leaf(D, KV, L),
            "wo": int4_leaf(D, D, L),
            "wgate": int4_leaf(D, I, L),
            "wup": int4_leaf(D, I, L),
            "wdown": int4_leaf(I, D, L),
        },
    }
    jax.device_get(params["layers"]["wq"]["qp"].ravel()[0])
    gb = sum(a.size * a.dtype.itemsize
             for a in jax.tree.leaves(params)) / 1e9
    log(f"int4 params ready ({gb:.2f} GB)")

    dense_sp = SparsityConfig(enabled=False)
    tps_d = bench.decode_tps(cfg, params, dense_sp, 256, 4, 16)
    log(f"int4 dense decode: {tps_d:.2f} tok/s")
    sp = SparsityConfig(enabled=True, kernel="block", block_size=32,
                        block_keep_frac=0.5)
    tps_s = bench.decode_tps(cfg, params, sp, 256, 4, 16)
    log(f"int4 sparse@50 decode: {tps_s:.2f} tok/s ({tps_s/tps_d:.2f}x)")


def phase_kernel():
    """Fused-qkv gather microbench: bf16 vs int8 vs int4 at keep=0.5."""
    from teal_tpu.ops import block_gemv, quant
    from teal_tpu.utils.bench_utils import bench_chained

    K, Nq, Nkv = 4096, 4096, 4096
    G = 32
    nb = K // G
    k_keep = nb // 2

    for kind in ("bf16", "int8", "int4"):
        if kind == "int4":
            Gk = 64
            nbk = K // Gk
            kk = nbk // 2
            ws = [{"qp": fill((K // 2, N), jnp.int8, seed=i),
                   "sz": jnp.ones((nbk, 2, N), jnp.float32) * 1e-3}
                  for i, N in enumerate((Nq, Nkv, Nkv))]
            bytes_moved = kk * (Gk // 2) * (Nq + 2 * Nkv)
        else:
            Gk, kk = G, k_keep
            dt = jnp.bfloat16 if kind == "bf16" else jnp.int8
            ws = [fill((K, N), dt, seed=i)
                  for i, N in enumerate((Nq, Nkv, Nkv))]
            bytes_moved = kk * Gk * (Nq + 2 * Nkv) * ws[0].dtype.itemsize

        x0 = fill((1, K), jnp.bfloat16, seed=100)

        def step(x):
            idx, xpack = block_gemv.select_groups(x, Gk, kk)
            ys = block_gemv.block_gather_gemv_multi(
                idx, xpack, tuple(ws), G=Gk, k_keep=kk)
            feed = ys[0][:, :K].astype(jnp.float32)
            return (x0 + 1e-20 * feed).astype(jnp.bfloat16)

        t = bench_chained(step, x0, n_short=64, n_long=512)
        log(f"fused qkv {kind}: {t*1e6:.1f} us, "
            f"{bytes_moved/t/1e9:.0f} GB/s of kept bytes")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True,
                    choices=["prefill", "int4", "kernel"])
    args = ap.parse_args()
    {"prefill": phase_prefill, "int4": phase_int4,
     "kernel": phase_kernel}[args.phase]()


if __name__ == "__main__":
    main()
