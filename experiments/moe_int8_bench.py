#!/usr/bin/env python
"""Mixtral-config int8 decode measured on chip (VERDICT r4 next #4).

The reference publishes Mixtral-8x7B ONLY as int8 (every row of
`gpt-fast/README.md:25-29`; `mixtral-moe/quantize.py`). Full 8x7B int8
is ~47 GB — beyond one 16 GB v5e — so this measures the Mixtral
ARCHITECTURE (8 experts, top-2 routing, GQA, the real 4096/14336 dims)
at a layer count that fits one chip: L=8 is ~11.7 GB of int8 expert +
attention stacks, the same per-layer/per-token work as the real model.

Rows (each through bench.decode_tps, slope-timed on-device scan):
  - int8 dense    : token kernel at full capacity (reads every expert
                    byte of the routed top-2 experts, in-kernel routing)
  - int8 sparse50 : group keep=0.5 on expert + attention projections
  - int8 sparse40 : conservative keep=0.6
  - xla-dense     : plain XLA dequant-in-matmul decode (moe.py) — the
                    known-poisonous program class; run LAST (a failure
                    must not kill the kernel rows) or under --isolate
                    via a child process.

Usage: python experiments/moe_int8_bench.py [--layers 8] [--max-seq 256]
       [--case kernel|xla]   (default kernel; xla intended for a child)
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--max-seq", type=int, default=256)
    ap.add_argument("--case", default="kernel", choices=["kernel", "xla"])
    ap.add_argument("--isolate", action="store_true",
                    help="run the xla-dense case in a child process")
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench as benchmod
    from teal_tpu.config import SparsityConfig, get_model_config

    cfg = get_model_config("Mixtral-8x7B", n_layers=args.layers,
                           max_seq_len=args.max_seq)
    t0 = time.time()
    params = benchmod._fast_init_int8(cfg, jnp.bfloat16)
    import jax
    gb = sum(a.size * a.dtype.itemsize
             for a in jax.tree.leaves(params)) / 1e9
    log(f"Mixtral-L{args.layers} int8 params: {gb:.2f} GB "
        f"({time.time()-t0:.1f}s)")

    # per-token HBM bytes actually read (top-2 experts + attention), for
    # the effective-bandwidth sanity line
    exp_bytes = 2 * 3 * cfg.dim * cfg.intermediate_size
    attn_bytes = (cfg.dim * cfg.dim * 2
                  + 2 * cfg.dim * cfg.dim * cfg.n_kv_heads // cfg.n_heads)
    per_tok_gb = (args.layers * (exp_bytes + attn_bytes)
                  + cfg.vocab_size * cfg.dim) / 1e9

    rows = {}
    if args.case == "xla":
        tps = benchmod.decode_tps(
            cfg, params, SparsityConfig(enabled=False), args.max_seq, 4, 16)
        print(json.dumps({"xla_dense_tok_s": round(tps, 2)}))
        return

    for name, keep in (("int8_dense", 1.0), ("int8_sparse50", 0.5),
                       ("int8_sparse40", 0.6)):
        sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                            block_keep_frac=keep, block_thresholding=True)
        tps = benchmod.decode_tps(cfg, params, sp, args.max_seq, 4, 16)
        rows[name] = round(tps, 2)
        log(f"{name}: {tps:.2f} tok/s "
            f"({per_tok_gb * keep * tps:.0f} GB/s effective on "
            f"routed bytes)")

    if args.isolate:
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--layers", str(args.layers), "--max-seq",
                 str(args.max_seq), "--case", "xla"],
                capture_output=True, text=True, timeout=1800)
            for line in reversed(p.stdout.strip().splitlines()):
                try:
                    rows.update(json.loads(line))
                    break
                except ValueError:
                    continue
            else:
                rows["xla_dense_tok_s"] = None
        except subprocess.TimeoutExpired:
            rows["xla_dense_tok_s"] = None

    out = {
        "metric": "mixtral_int8_decode",
        "config": f"Mixtral-8x7B dims, L={args.layers}, int8 "
                  f"({gb:.1f} GB)",
        "per_token_gb_dense": round(per_tok_gb, 3),
        **rows,
    }
    if rows.get("int8_dense") and rows.get("int8_sparse50"):
        out["sparse50_speedup"] = round(
            rows["int8_sparse50"] / rows["int8_dense"], 3)
        out["sparse40_speedup"] = round(
            rows["int8_sparse40"] / rows["int8_dense"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
