#!/usr/bin/env python
"""On-chip bisect for the int4 @ G=128 backend error (see memory notes).

Runs progressively larger int4 pieces with flush prints between, so the
first failing stage is identifiable from the log. Usage:
    timeout 1800 python experiments/int4_bisect.py [--stage N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def say(*a):
    print(*a, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0,
                    help="run only stage N (0 = all)")
    ap.add_argument("--case", default=None,
                    help="stage-5 case to run alone (sparse-token, "
                         "dense-via-kernel, sparse-4launch, xla-dense)")
    args = ap.parse_args()

    from teal_tpu.ops import quant, block_gemv as bg

    def want(n):
        if args.case:
            return n == 5
        return args.stage in (0, n)

    if want(1):
        x = jnp.ones((512, 512), jnp.bfloat16)
        say("1. matmul:", np.asarray((x @ x)[0, 0]))

    L, D, KV, I = 4, 4096, 4096, 11008
    G = 128
    rng = np.random.default_rng(0)

    def mk_int4(K, N):
        qp = jnp.asarray(rng.integers(-128, 127, size=(L, K // 2, N)),
                         jnp.int8)
        nb = K // G
        sz = jnp.concatenate(
            [jnp.full((L, nb, 1, N), 1e-3, jnp.float32),
             jnp.full((L, nb, 1, N), -8e-3, jnp.float32)], axis=2)
        return {"qp": qp, "sz": sz}

    if want(2):
        # multi-weight int4 fused select+gather (qkv-shaped): the ramp
        # issues 6 DMAs per survivor from inside the scalar scan
        ws = (mk_int4(D, D), mk_int4(D, KV), mk_int4(D, KV))
        x = jnp.asarray(rng.normal(size=(1, D)), jnp.bfloat16)
        x3 = bg.pack_x3(x, G)
        ys = bg.fused_select_gather_gemv(
            x3, jnp.array([0.0], jnp.float32), ws, G=G, cap=20,
            layer=jnp.int32(2), out_dtype=jnp.float32)
        say("2. int4 qkv fused gather:", [np.asarray(y)[0, 0] for y in ys])

    if want(3):
        # gate/up int4 pair at the deep N (the biggest slabs) + silu
        ws = (mk_int4(D, I), mk_int4(D, I))
        x = jnp.asarray(rng.normal(size=(1, D)), jnp.bfloat16)
        x3 = bg.pack_x3(x, G)
        y = bg.fused_select_gather_packed(
            x3, jnp.array([0.0], jnp.float32), ws, G=G, cap=20,
            layer=jnp.int32(1), out_dtype=jnp.bfloat16, silu_pair=True)
        say("3. int4 gate/up packed+silu:", np.asarray(y)[0, 0, 0])

    if want(4):
        # one-launch attention block with int4 qkv (never chip-tested
        # before the failures)
        from teal_tpu.ops import attn_block as ab

        Hq = Hkv = 32
        T = 256
        ws = (mk_int4(D, D), mk_int4(D, KV), mk_int4(D, KV))
        x = jnp.asarray(rng.normal(size=(1, D)), jnp.bfloat16)
        x3 = bg.pack_x3(x, G)
        kc = jnp.zeros((L, 1, Hkv, T, 128), jnp.bfloat16)
        vc = jnp.zeros((L, 1, Hkv, T, 128), jnp.bfloat16)
        cos = jnp.ones((128,), jnp.float32)
        sin = jnp.zeros((128,), jnp.float32)
        attn, kc, vc = ab.attn_block(
            x3, jnp.array([0.0], jnp.float32), ws, cos, sin, kc, vc,
            jnp.int32(1), jnp.int32(10), G=G, cap=20, n_heads=Hq)
        say("4. int4 attn_block:", np.asarray(attn)[0, 0, 0, 0])

    if want(5) or args.case:
        # full 7B int4 model forward, one case per process (--case; a
        # failing case poisons the device state for the rest of the
        # process — round-4 run: XLA-dense died FIRST with
        # FAILED_PRECONDITION and masked whether the kernel paths work)
        from bench import build
        from teal_tpu.config import SparsityConfig
        from teal_tpu.models import llama
        from teal_tpu.models.llama import KVCache

        cases = {
            # production path first: int4 decode always routes through
            # the gather kernel (packed nibbles dequant in-kernel)
            "sparse-token": SparsityConfig(
                enabled=True, kernel="block", block_size=128,
                block_keep_frac=0.5, block_thresholding=True),
            # dense-capacity through the same kernel (the int4-dense
            # route bench.py uses — keep_frac 1.0 gathers every group)
            "dense-via-kernel": SparsityConfig(
                enabled=True, kernel="block", block_size=128,
                block_keep_frac=1.0, block_thresholding=True),
            "sparse-4launch": SparsityConfig(
                enabled=True, kernel="block", block_size=128,
                block_keep_frac=0.5, block_thresholding=True,
                token_fused=False),
            # plain XLA dequant+matmul — known to die at 7B scale on the
            # round-3/4 runtime (INTERNAL / FAILED_PRECONDITION)
            "xla-dense": SparsityConfig(enabled=False),
            # the bench's decode_tps program shape: a fori_loop of decode
            # steps with a donated cache — round-4 int4 bench died here
            # while every single-step case above passed
            "loop-token": SparsityConfig(
                enabled=True, kernel="block", block_size=128,
                block_keep_frac=0.5, block_thresholding=True),
            "loop-token-nodonate": SparsityConfig(
                enabled=True, kernel="block", block_size=128,
                block_keep_frac=0.5, block_thresholding=True),
            # bench.py's int4 "dense" baseline shape before round 4:
            # enabled=False routes the per-layer 4-launch kernels at
            # full capacity inside the decode loop
            "loop-dense": SparsityConfig(enabled=False),
        }
        names = [args.case] if args.case else list(cases)
        cfg, params = build("7B", 256, jnp.bfloat16, weights="int4",
                            block_size=128)
        say("5a. int4 params built")
        tok = jnp.asarray([[5]], jnp.int32)
        th = jnp.zeros((cfg.n_layers, 7), jnp.float32)
        import functools

        for name in names:
            cache = KVCache.init(cfg, 1, 256, jnp.bfloat16)
            sp = cases[name]
            if name.startswith("loop-"):
                donate = () if name.endswith("nodonate") else (1,)

                @functools.partial(jax.jit, donate_argnums=donate,
                                   static_argnums=())
                def run(p, c, t0):
                    def body(i, carry):
                        t, c = carry
                        lg, c = llama.forward(p, t, c, 10 + i, th,
                                              cfg=cfg, sp=sp)
                        return (jnp.argmax(lg[:, 0:1, :], -1)
                                .astype(jnp.int32), c)
                    t, c = jax.lax.fori_loop(0, 8, body, (t0, c))
                    return t, c

                t_out, _ = run(params, cache, tok)
                say(f"5. int4 forward [{name}]:", np.asarray(t_out))
                continue
            logits, _ = llama.forward(params, tok, cache, 10, th,
                                      cfg=cfg, sp=sp)
            say(f"5. int4 forward [{name}]:", np.asarray(logits)[0, 0, :2])


if __name__ == "__main__":
    main()
