#!/usr/bin/env python
"""Speculative-decoding latency decomposition (chain-3 measured 463 ms
per k=4 round on 7B where the bandwidth ceiling is ~60 ms — find where
the time goes).

The tunnel runtime costs ~23 ms per host dispatch, so every piece is
timed either by in-program repetition + slope, or (for whole rounds)
by the on-device loop's own round counter.

Pieces:
  0. dispatch floor (trivial jit)
  1. sparse draft decode step / 1b. dense decode step  (slope over n)
  2. dense verify forward over k+1 positions            (slope over n)
  3. one jitted _spec_step (single dispatch, floor-corrected)
  4. while_loop t_round: (t(many rounds) - t(1 round)) / (r2 - r1)
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, reps=10):
    fn()
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--pieces", default="01234",
                    help="pieces to run, e.g. --pieces 3 (fresh process "
                         "per piece keeps compile-time HBM accounting of "
                         "kept executables from accumulating)")
    args = ap.parse_args()

    import bench as benchmod
    from teal_tpu.config import SparsityConfig
    from teal_tpu.engine import speculative as spec
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    k = 4
    max_seq = 256
    cfg, params = benchmod.build("7B", max_seq, jnp.bfloat16)
    th = llama.zero_thresholds(cfg)
    sp_dense = SparsityConfig(enabled=False)
    sp_draft = SparsityConfig(enabled=True, kernel="block", block_size=128,
                              block_keep_frac=0.5, block_thresholding=True)

    tok = jnp.asarray([[5]], jnp.int32)
    pos0 = 32

    # 0. dispatch floor
    tiny = jnp.zeros((8, 128), jnp.float32)
    floor_fn = jax.jit(lambda x: x + 1.0)
    t0f = timeit(lambda: jax.device_get(floor_fn(tiny)))
    log(f"0. dispatch floor:           {t0f*1e3:7.2f} ms")

    # 1/1b. decode step slope
    def make_decode(sp):
        @functools.partial(jax.jit, static_argnums=(2,))
        def run_n(p, c, n):
            def body(i, carry):
                t, c = carry
                logits, c = llama.forward(p, t, c, pos0 + i, th,
                                          cfg=cfg, sp=sp)
                return (jnp.argmax(logits[:, 0:1, :], -1)
                        .astype(jnp.int32), c)
            return jax.lax.fori_loop(0, n, body, (tok, c))[0]
        return run_n

    n_lo, n_hi = 8, 40
    pieces = args.pieces
    for name, sp in ([("sparse draft decode step", sp_draft),
                      ("dense decode step       ", sp_dense)]
                     if "1" in pieces else []):
        run_n = make_decode(sp)
        cache = KVCache.init(cfg, 1, max_seq, jnp.bfloat16)
        t_lo = timeit(lambda: jax.device_get(run_n(params, cache, n_lo)))
        t_hi = timeit(lambda: jax.device_get(run_n(params, cache, n_hi)))
        t = (t_hi - t_lo) / (n_hi - n_lo)
        log(f"1. {name}: {t*1e3:7.2f} ms")

    # 2. dense verify forward over k+1 positions (slope)
    if "2" in pieces:
        seq = jnp.ones((1, k + 1), jnp.int32)

        @functools.partial(jax.jit, static_argnums=(2,))
        def verify_n(p, c, n):
            def body(i, carry):
                s, c = carry
                logits, c = llama.forward(p, s, c, pos0, th,
                                          cfg=cfg, sp=sp_dense)
                return (jnp.argmax(logits, -1).astype(jnp.int32), c)
            return jax.lax.fori_loop(0, n, body, (seq, c))[0]

        cache = KVCache.init(cfg, 1, max_seq, jnp.bfloat16)
        t_lo = timeit(lambda: jax.device_get(verify_n(params, cache, n_lo)))
        t_hi = timeit(lambda: jax.device_get(verify_n(params, cache, n_hi)))
        t2 = (t_hi - t_lo) / (n_hi - n_lo)
        log(f"2. dense verify fwd (k+1={k+1}): {t2*1e3:7.2f} ms")

    # 3. one jitted _spec_step (floor-corrected single dispatch)
    key = jax.random.PRNGKey(0)
    if "3" in pieces:
        step = spec.build_speculative_step(
            cfg, cfg, speculate_k=k, temperature=1.0,
            target_sp=sp_dense, draft_sp=sp_draft, shared_params=True)

        def run_step():
            ct = KVCache.init(cfg, 1, max_seq, jnp.bfloat16)
            cd = KVCache.init(cfg, 1, max_seq, jnp.bfloat16)
            toks, n, ct, cd, k2 = step(params, params, ct, cd,
                                       jnp.asarray([3], jnp.int32), pos0,
                                       th, th, key)
            return jax.device_get(toks)

        t3 = timeit(run_step, reps=6) - t0f
        log(f"3. one jitted _spec_step:    {t3*1e3:7.2f} ms")

    # 4. while_loop per-round slope via the round counter
    def loop_run(max_new):
        loop = spec.build_speculative_loop(
            cfg, cfg, speculate_k=k, max_new_tokens=max_new,
            max_seq=max_seq, temperature=1.0,
            target_sp=sp_dense, draft_sp=sp_draft, shared_params=True)

        def go():
            out = loop(params, params,
                       KVCache.init(cfg, 1, max_seq, jnp.bfloat16),
                       KVCache.init(cfg, 1, max_seq, jnp.bfloat16),
                       jnp.asarray([3], jnp.int32), pos0, th, th, key)
            n_out, rounds = jax.device_get((out[1], out[2]))
            return int(rounds)
        r = go()
        t = timeit(go, reps=6)
        return t, r

    if "4" in pieces:
        t_a, r_a = loop_run(k)           # ~1 round
        t_b, r_b = loop_run(8 * k)       # ~8 rounds (alpha~1 on rand wts)
        t4 = (t_b - t_a) / max(r_b - r_a, 1)
        log(f"4. while_loop t_round:       {t4*1e3:7.2f} ms "
            f"(rounds {r_a} -> {r_b})")

    # 5. kernel-dense verify (llama.block_verify) slope: the shared-cache
    # self-speculation's verify cost in isolation
    if "5" in pieces:
        @functools.partial(jax.jit, static_argnums=(2,))
        def bv_n(p, c, n):
            seq = jnp.ones((1, k + 1), jnp.int32)

            def body(i, carry):
                s, c = carry
                logits, c = llama.block_verify(p, s, c, pos0, th, cfg=cfg)
                return (jnp.argmax(logits, -1).astype(jnp.int32), c)
            return jax.lax.fori_loop(0, n, body, (seq, c))[0]

        cache = KVCache.init(cfg, 1, max_seq, jnp.bfloat16)
        t_lo = timeit(lambda: jax.device_get(bv_n(params, cache, n_lo)))
        t_hi = timeit(lambda: jax.device_get(bv_n(params, cache, n_hi)))
        t5 = (t_hi - t_lo) / (n_hi - n_lo)
        log(f"5. kernel verify (k+1={k+1}):  {t5*1e3:7.2f} ms")

    # 6. shared-cache while_loop t_round (kernel verify inside)
    if "6" in pieces:
        def loop_run_shared(max_new):
            loop = spec.build_speculative_loop(
                cfg, cfg, speculate_k=k, max_new_tokens=max_new,
                max_seq=max_seq, temperature=1.0,
                target_sp=sp_dense, draft_sp=sp_draft,
                shared_params=True, shared_cache=True)

            def go():
                out = loop(params, params,
                           KVCache.init(cfg, 1, max_seq, jnp.bfloat16),
                           None, jnp.asarray([3], jnp.int32), pos0,
                           th, th, key)
                n_out, rounds = jax.device_get((out[1], out[2]))
                return int(rounds)
            go()
            t = timeit(go, reps=6)
            return t, go()

        t_a, r_a = loop_run_shared(k)
        t_b, r_b = loop_run_shared(8 * k)
        t6 = (t_b - t_a) / max(r_b - r_a, 1)
        log(f"6. shared-cache t_round:     {t6*1e3:7.2f} ms "
            f"(rounds {r_a} -> {r_b})")


if __name__ == "__main__":
    main()
