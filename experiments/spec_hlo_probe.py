#!/usr/bin/env python
"""AOT cost/HLO decomposition of the speculative while_loop program.

The spec bench measured t_round ~400 ms for k=4 self-speculation on 7B
where the bandwidth ceiling is ~75 ms. This probe needs NO chip time:
it lowers the program from ShapeDtypeStructs, compiles through the
AOT helper (chipless), and reads cost_analysis() bytes-accessed plus
the optimized HLO — if XLA materializes weight copies inside the loop
body (layout conversions between the Pallas stacked-[L,K,N] kernels
and the dense-verify dot_generals), bytes_accessed exposes them.

Usage: python experiments/spec_hlo_probe.py [--k 4] [--dump /tmp/spec.hlo]
"""

import argparse
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--max-seq", type=int, default=256)
    ap.add_argument("--max-new", type=int, default=96)
    ap.add_argument("--model", default="7B")
    ap.add_argument("--keep", type=float, default=0.5)
    ap.add_argument("--dump", default="/tmp/spec_loop.hlo")
    ap.add_argument("--step", action="store_true",
                    help="also analyze one bare _spec_step program")
    ap.add_argument("--shared-cache", action="store_true",
                    help="analyze the one-cache self-speculation loop")
    ap.add_argument("--no-cache-out", action="store_true",
                    help="shared-cache variant that does NOT return the "
                         "final cache (donation unusable, piece-4 shape)")
    args = ap.parse_args()

    from teal_tpu.config import SparsityConfig, get_model_config
    from teal_tpu.engine import speculative as spec
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config(args.model)
    sp_dense = SparsityConfig(enabled=False)
    sp_draft = SparsityConfig(enabled=True, kernel="block", block_size=128,
                              block_keep_frac=args.keep,
                              block_thresholding=True)

    dt = jnp.bfloat16
    params = jax.eval_shape(
        lambda key: llama.init_params(cfg, key, dt),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    cache = jax.eval_shape(
        lambda: KVCache.init(cfg, 1, args.max_seq, dt))
    th = jax.eval_shape(lambda: llama.zero_thresholds(cfg))
    tok = jax.ShapeDtypeStruct((1,), jnp.int32)
    pos = jax.ShapeDtypeStruct((), jnp.int32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    k = args.k

    def run_impl(p, cache_t, cache_d, token, pos, th_a, key):
        fn = spec.build_speculative_loop(
            cfg, cfg, speculate_k=k, max_new_tokens=args.max_new,
            max_seq=args.max_seq, temperature=1.0,
            target_sp=sp_dense, draft_sp=sp_draft, shared_params=True,
            shared_cache=args.shared_cache)
        out = fn(p, p, cache_t, cache_d, token, pos, th_a, th_a, key)
        if args.no_cache_out:
            out = out[:4]
        return out

    log("lowering while_loop program "
        f"(shared_cache={args.shared_cache}, "
        f"no_cache_out={args.no_cache_out}) ...")
    lowered = jax.jit(run_impl).lower(
        params, cache, None if args.shared_cache else cache, tok, pos,
        th, key)
    log("compiling (AOT, chipless) ...")
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    ba = ca.get("bytes accessed", float("nan"))
    flops = ca.get("flops", float("nan"))
    log(f"cost_analysis: bytes accessed {ba / 1e9:.2f} GB, "
        f"flops {flops / 1e12:.3f} T")

    hlo = compiled.as_text()
    with open(args.dump, "w") as f:
        f.write(hlo)
    log(f"optimized HLO -> {args.dump} ({len(hlo) / 1e6:.1f} MB)")

    # big copies: shape with two >=4096 dims (weight-sized)
    copies = {}
    for m in re.finditer(r"copy[^=]*= [a-z0-9\[\],{}:()TS ]*copy\(", hlo):
        line_start = hlo.rfind("\n", 0, m.start()) + 1
        line = hlo[line_start:hlo.find("\n", m.start())]
        shm = re.search(r"(bf16|f32|s8|s4)\[([0-9,]+)\]", line)
        if not shm:
            continue
        dims = [int(x) for x in shm.group(2).split(",")]
        nbytes = 2
        if shm.group(1) == "f32":
            nbytes = 4
        elif shm.group(1) == "s8":
            nbytes = 1
        size = nbytes
        for d in dims:
            size *= d
        if size >= 1 << 26:  # >=64 MB
            keyname = f"{shm.group(1)}[{shm.group(2)}]"
            copies[keyname] = copies.get(keyname, 0) + 1
    log("large (>=64MB) copy instructions in optimized HLO:")
    tot = 0
    for kname, cnt in sorted(copies.items()):
        log(f"  {kname}  x{cnt}")
        tot += cnt
    log(f"  total: {tot}")

    # fusion/custom-call census inside the while body
    n_cc = len(re.findall(r"custom-call", hlo))
    n_while = len(re.findall(r"while\(", hlo))
    log(f"custom-calls: {n_cc}, while ops: {n_while}")

    print("OK")


if __name__ == "__main__":
    main()
