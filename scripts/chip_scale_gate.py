#!/usr/bin/env python
"""Program-SCALE chip gate (VERDICT r3 weak #8): one 7B-scale
compile+run of each engine-path program class that tiny-shape smoke
cannot see — the round-3 runtime failures (int4 at scale, batch-8
XLA-dense) were all program-scale, and the spec while-loop path had no
gate at all.

Each gate runs in THIS process; run gates in separate processes when a
failure is expected to poison the device (`--gate N`):
  1 token   — 7B token-kernel sparse decode step (the headline program)
  2 spec    — one shared-cache _spec_step at 7B (draft scan + kernel
              verify + acceptance), then a short while-loop generation
  3 int8b   — batched (B=8) int8 token-kernel step
  4 int4    — int4 dense-via-kernel + sparse token step

Exit code = number of failing gates.
Usage: timeout 3600 python scripts/chip_scale_gate.py [--gate N]
"""

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def _finite(x, what):
    x = np.asarray(jax.device_get(x))
    assert np.isfinite(x).all(), f"{what}: non-finite output"
    return x


def gate_token(max_seq=256):
    import bench as benchmod
    from teal_tpu.config import SparsityConfig
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg, params = benchmod.build("7B", max_seq, jnp.bfloat16)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.5, block_thresholding=True)
    th = llama.zero_thresholds(cfg)
    cache = KVCache.init(cfg, 1, max_seq, jnp.bfloat16)
    logits, _ = llama.forward(params, jnp.asarray([[5]], jnp.int32),
                              cache, 10, th, cfg=cfg, sp=sp)
    _finite(logits[0, 0, :4], "7B token step")


def gate_spec(max_seq=256, k=4):
    import bench as benchmod
    from teal_tpu.config import SparsityConfig
    from teal_tpu.engine import speculative as spec
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg, params = benchmod.build("7B", max_seq, jnp.bfloat16)
    th = llama.zero_thresholds(cfg)
    draft_sp = SparsityConfig(enabled=True, kernel="block",
                              block_size=128, block_keep_frac=0.5,
                              block_thresholding=True)
    step = spec.build_speculative_step(
        cfg, cfg, speculate_k=k, temperature=1.0,
        target_sp=SparsityConfig(enabled=False), draft_sp=draft_sp,
        shared_params=True, shared_cache=True)
    cache = KVCache.init(cfg, 1, max_seq, jnp.bfloat16)
    toks, n, cache, _, _ = step(params, params, cache, None,
                                jnp.asarray([3], jnp.int32), 8, th, th,
                                jax.random.PRNGKey(0))
    _finite(toks, "7B spec step tokens")
    nv = int(jax.device_get(n))
    assert 1 <= nv <= k + 1, nv
    # short on-device while_loop generation through the same body
    loop = spec.build_speculative_loop(
        cfg, cfg, speculate_k=k, max_new_tokens=2 * k, max_seq=max_seq,
        temperature=1.0, target_sp=SparsityConfig(enabled=False),
        draft_sp=draft_sp, shared_params=True, shared_cache=True)
    out = loop(params, params, KVCache.init(cfg, 1, max_seq, jnp.bfloat16),
               None, jnp.asarray([3], jnp.int32), 8, th, th,
               jax.random.PRNGKey(1))
    _finite(out[0], "7B spec loop buffer")
    assert int(jax.device_get(out[2])) >= 1   # rounds


def gate_int8b(max_seq=256, B=8):
    import bench as benchmod
    from teal_tpu.config import SparsityConfig
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg, params = benchmod.build("7B", max_seq, jnp.bfloat16,
                                 weights="int8")
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.5, block_thresholding=True)
    th = llama.zero_thresholds(cfg)
    cache = KVCache.init(cfg, B, max_seq, jnp.bfloat16)
    tok = (jnp.arange(B, dtype=jnp.int32)[:, None] * 31 + 3) % 97
    pos = jnp.asarray([2, 9, 14, 5, 7, 11, 1, 12][:B], jnp.int32)
    logits, _ = llama.forward(params, tok, cache, pos, th, cfg=cfg, sp=sp)
    _finite(logits[:, 0, :2], "7B int8 batched step")


def gate_int4(max_seq=256):
    import bench as benchmod
    from teal_tpu.config import SparsityConfig
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg, params = benchmod.build("7B", max_seq, jnp.bfloat16,
                                 weights="int4", block_size=128)
    th = llama.zero_thresholds(cfg)
    for name, sp in (
        ("sparse-token", SparsityConfig(
            enabled=True, kernel="block", block_size=128,
            block_keep_frac=0.5, block_thresholding=True)),
        ("dense-via-kernel", SparsityConfig(
            enabled=True, kernel="block", block_size=128,
            block_keep_frac=1.0, block_thresholding=True)),
    ):
        cache = KVCache.init(cfg, 1, max_seq, jnp.bfloat16)
        logits, _ = llama.forward(params, jnp.asarray([[5]], jnp.int32),
                                  cache, 10, th, cfg=cfg, sp=sp)
        _finite(logits[0, 0, :2], f"7B int4 {name}")
        log(f"  int4 {name}: ok")


GATES = {1: ("token", gate_token), 2: ("spec", gate_spec),
         3: ("int8b", gate_int8b), 4: ("int4", gate_int4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=int, default=0, help="run only gate N")
    args = ap.parse_args()
    fails = 0
    for n, (name, fn) in GATES.items():
        if args.gate and n != args.gate:
            continue
        log(f"[scale-gate] {name} ...")
        t0 = time.time()
        try:
            fn()
            log(f"[scale-gate] {name} PASS ({time.time()-t0:.0f}s)")
        except Exception:
            traceback.print_exc()
            log(f"[scale-gate] {name} FAIL ({time.time()-t0:.0f}s)")
            fails += 1
    sys.exit(fails)


if __name__ == "__main__":
    main()
