#!/usr/bin/env python
"""On-chip speculative-decoding benchmark (VERDICT r2 #7).

Rows:
  - self-spec: draft = the 7B target's own weights decoded block-sparse
    (lossless output — engine/speculative.py), sweep draft sparsity x k;
  - tiny-draft: stories15M-architecture draft + 7B target (the
    reference's protocol shape, gpt-fast/README.md:99 — 70B+7B there).

Weights are random (no egress), so ACCEPTANCE is a weights artifact:
near-uniform logits inflate temp-1.0 acceptance and deflate temp-0
argmax agreement. The mechanically-true numbers are the round latency
t_round and the implied tok/s curve tok/s(a) = (1 + k*a) / t_round;
measured-acceptance rows are labeled as such. Everything runs through
the on-device while_loop program (one host sync per generation).

Usage: python scripts/bench_spec.py [--cpu-tiny] [--max-new 96]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-tiny", action="store_true",
                    help="smoke the harness on CPU with the tiny config")
    ap.add_argument("--max-new", type=int, default=384)
    ap.add_argument("--max-seq", type=int, default=1024)
    ap.add_argument("--int8", action="store_true",
                    help="int8 weight-only self-speculation rows "
                         "(lossless over the int8-dense baseline: draft "
                         "int8+sparse, verify int8 dense via the token "
                         "kernel)")
    ap.add_argument("--grid", action="store_true",
                    help="full (keep, k) t_round grid for the acceptance "
                         "study's realized-throughput table "
                         "(experiments/acceptance_study.py)")
    ap.add_argument("--out", default=None,
                    help="also write the result JSON here (e.g. "
                         "docs/spec_rounds.json)")
    args = ap.parse_args()

    import jax

    if args.cpu_tiny:
        jax.config.update("jax_platforms", "cpu")

    import contextlib

    import jax.numpy as jnp
    import numpy as np

    import bench as benchmod

    if args.cpu_tiny:
        # Pallas kernels only lower for real on TPU; the CPU smoke runs
        # them in interpret mode
        from jax.experimental.pallas import tpu as pltpu

        interpret_ctx = pltpu.force_tpu_interpret_mode
    else:
        interpret_ctx = contextlib.nullcontext
    from teal_tpu.config import SparsityConfig, get_model_config
    from teal_tpu.engine.speculative import speculative_generate
    from teal_tpu.models import llama

    model = "tiny" if args.cpu_tiny else "7B"
    dtype = jnp.float32 if args.cpu_tiny else jnp.bfloat16
    weights = "int8" if args.int8 else "bf16"
    cfg, params = benchmod.build(model, args.max_seq, dtype,
                                 weights=weights)

    # dense decode baseline (same slope protocol as bench.py)
    dense = benchmod.decode_tps(
        cfg, params, SparsityConfig(enabled=False), args.max_seq, 4, 16)
    log(f"dense baseline: {dense:.2f} tok/s")

    prompt = np.arange(1, 9, dtype=np.int64) % cfg.vocab_size
    rows = []

    def run_row(name, *a, **kw_):
        # one broken row must not zero the whole bench's JSON
        try:
            _run_row(name, *a, **kw_)
        except Exception as e:
            log(f"  [{name}] FAILED: {type(e).__name__}: {str(e)[:200]}")
            rows.append({"name": name, "failed": True})

    def _run_row(name, draft_cfg, draft_params, draft_sp, k, temperature,
                 draft_th=None, shared_cache=None, keep=None):
        kw = dict(
            speculate_k=k, temperature=temperature, max_seq=args.max_seq,
            target_sp=SparsityConfig(enabled=False), draft_sp=draft_sp,
            draft_thresholds=draft_th, cache_dtype=dtype, device_loop=True,
            shared_cache=shared_cache,
        )

        def one(n_target, rep):
            t0 = time.perf_counter()
            with interpret_ctx():
                toks, stats = speculative_generate(
                    params, draft_params, cfg, draft_cfg, prompt,
                    args.max_new, n_target=n_target,
                    key=jax.random.PRNGKey(rep + 1), **kw)
            return time.perf_counter() - t0, stats

        # the ONE shared protocol (bench.spec_slope_row): interleaved
        # min-per-length over three lengths through ONE executable
        # (traced n_target bound — per-program switch costs poison any
        # cross-program slope), lstsq slope, sanity-bounded
        t0 = time.time()
        one(args.max_new - 1, -1)     # warm: ONE trace + compile
        warm = time.time() - t0
        row = benchmod.spec_slope_row(one, k, args.max_new,
                                      alphas=(0.5, 0.7, 0.85, 0.95),
                                      min_round_ms=0.6e3 / dense)
        row.update(name=name, temperature=temperature,
                   speedup_vs_dense=round(row["tok_s"] / dense, 3))
        if keep is not None:
            row["keep"] = keep
        rows.append(row)
        log(f"  [{name}] k={k} T={temperature}: {row['tok_s']:.1f} tok/s "
            f"slope ({row['speedup_vs_dense']:.2f}x; walltime "
            f"{row['walltime_tok_s']}), t_round {row['t_round_ms']:.1f} "
            f"ms, alpha {row['alpha_measured']:.2f} (warm {warm:.1f}s)")

    # --- self-speculation: sparse draft of the same weights, ONE shared
    # cache (draft writes sparse in-round kv; dense verify overwrites —
    # no draft top-up forward, half the cache HBM) ---
    if args.grid:
        # the acceptance study's realized-throughput grid: t_round(keep,
        # k) at every operating point the alpha table covers
        grid = [(keep, k)
                for keep in (0.75, 0.625, 0.5, 0.375, 0.25)
                for k in (2, 4, 6, 8)]
    else:
        grid = [(0.5, 4), (0.5, 6), (0.5, 8), (0.25, 4), (0.25, 8)]
    for keep, k in grid:
        sp_draft = SparsityConfig(
            enabled=True, kernel="block", block_size=128,
            block_keep_frac=keep, block_thresholding=True)
        run_row(f"self_spec_keep{int(keep*1000)/10:g}_k{k}", cfg, params,
                sp_draft, k, 1.0, draft_th=llama.zero_thresholds(cfg),
                keep=keep)
    if args.grid:
        out = {"metric": "speculative_decode_grid",
               "dense_tok_s": round(dense, 2), "rows": rows}
        print(json.dumps(out))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(out, f, indent=1)
        return
    # classic two-cache design for comparison (the reference's cache
    # topology, gpt-fast/generate.py:133-137)
    sp_draft = SparsityConfig(enabled=True, kernel="block", block_size=128,
                              block_keep_frac=0.5, block_thresholding=True)
    run_row("self_spec_keep50_k4_twocache", cfg, params, sp_draft, 4, 1.0,
            draft_th=llama.zero_thresholds(cfg), shared_cache=False)
    # temp-0 row: acceptance = argmax agreement (deflated on random
    # weights; exactness is what matters — tests prove output == greedy)
    sp_draft = SparsityConfig(enabled=True, kernel="block", block_size=128,
                              block_keep_frac=0.5,
                              block_thresholding=True)
    run_row("self_spec_keep50_greedy", cfg, params, sp_draft, 4, 0.0,
            draft_th=llama.zero_thresholds(cfg))

    # --- tiny independent draft (reference protocol shape) ---
    if not args.cpu_tiny:
        dcfg_name = "stories15M"
        dcfg = get_model_config(dcfg_name)
        if dcfg.vocab_size == cfg.vocab_size:
            dparams = benchmod.build(dcfg_name, args.max_seq, dtype)[1]
            run_row("tiny_draft", dcfg, dparams,
                    SparsityConfig(enabled=False), 5, 1.0)
        else:
            log(f"skip tiny_draft: vocab mismatch {dcfg.vocab_size}")

    out = {
        "metric": "speculative_decode",
        "dense_tok_s": round(dense, 2),
        "rows": rows,
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
