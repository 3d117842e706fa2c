#!/usr/bin/env python
"""Compile the dense + fused-decode-attention step and count full-cache
copy ops in the optimized HLO (diagnosing the 54->41 tok/s regression)."""

import re
import sys
import functools

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from teal_tpu.config import SparsityConfig, get_model_config
from teal_tpu.models import llama
from teal_tpu.models.llama import KVCache


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    fused = sys.argv[1] != "off" if len(sys.argv) > 1 else True
    cfg = get_model_config("7B")
    sp = SparsityConfig(enabled=False, fused_decode_attention=fused)
    shapes = jax.eval_shape(
        lambda: llama.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    )
    params = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), shapes)
    cache = KVCache.init(cfg, 1, 256, jnp.bfloat16)
    cache = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), cache)
    tok = jax.ShapeDtypeStruct((1,), jnp.int32)
    th = jax.ShapeDtypeStruct((cfg.n_layers, 7), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, cache, token, thresholds):
        def body(carry, pos):
            token, cache = carry
            logits, cache = llama.forward(
                params, token[:, None], cache, pos, thresholds,
                cfg=cfg, sp=sp)
            t = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            return (t, cache), ()

        (token, cache), _ = jax.lax.scan(
            body, (token, cache), jnp.arange(4, dtype=jnp.int32))
        return jnp.sum(token)

    import os

    log("lowering...")
    lowered = run.lower(params, cache, tok, th)
    log("compiling...")
    copts = None
    if os.environ.get("PROBE_COPTS"):
        k, _, v = os.environ["PROBE_COPTS"].partition("=")
        copts = {k: v}
        log(f"compiler_options: {copts}")
    compiled = lowered.compile(compiler_options=copts)
    txt = compiled.as_text()
    log(f"HLO text: {len(txt)} chars")
    # find copies / dynamic-update-slices over cache-sized buffers
    pat = re.compile(r".*(copy|dynamic-update-slice|fusion).*bf16\[32,1,32,256,128\].*")
    hits = [l.strip()[:200] for l in txt.splitlines() if pat.match(l)]
    log(f"{len(hits)} cache-shaped copy/dus/fusion lines:")
    for h in hits[:40]:
        print(h)
    # overall copy count
    ncopy = sum(1 for l in txt.splitlines() if " copy(" in l)
    log(f"total copy ops: {ncopy}")


if __name__ == "__main__":
    main()
