#!/usr/bin/env python
"""Measure the draft model's logit perturbation: dense vs group-sparse
forward on the SAME cache/position, at several keep fractions and both
selection modes (VERDICT r5 input: the acceptance study needs the
mechanical perturbation level delta(keep), not random-weight acceptance
artifacts).

delta := RMS(logits_sparse - logits_dense) / STD(logits_dense over vocab)
is scale-free: it measures how large the sparsity-induced logit error is
relative to the logit spread that determines the output distribution.
On RANDOM weights the activation channels are statistically homogeneous,
so dropping a keep-fraction of groups removes close to (1-keep) of the
activation energy — MORE than on real models, where the reference's real
histograms put group-50%'s dropped energy at ~0.28 on h1 inputs
(docs/ACCURACY.md). The measured delta is therefore a CONSERVATIVE
(pessimistic) perturbation level; experiments/acceptance_study.py scales
it by the real-statistics energy ratio for the expected case.

Selection modes:
  - topk: per-position top-k groups by max-|x| score (what calibrated
    thresholds approximate on a real model) — the representative mode;
  - firstcap: threshold-0 first-cap-by-index selection (what zero
    thresholds degenerate to; on homogeneous random stats it behaves
    like random group dropping).

Usage: timeout 3600 python experiments/logit_perturb_probe.py
       [--model 7B] [--cpu-tiny] [--out docs/logit_perturb.json]
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
    ap.add_argument("--model", default="7B")
    ap.add_argument("--cpu-tiny", action="store_true")
    ap.add_argument("--keeps", default="0.75,0.625,0.5,0.25")
    ap.add_argument("--prefill", type=int, default=64)
    ap.add_argument("--n-tokens", type=int, default=8,
                    help="decode probes per config (argmax agreement is "
                         "a per-token Bernoulli; 8 gives a coarse rate)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu_tiny:
        jax.config.update("jax_platforms", "cpu")

    import contextlib

    import jax.numpy as jnp
    import numpy as np

    import bench as benchmod
    from teal_tpu.config import SparsityConfig
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    if args.cpu_tiny:
        from jax.experimental.pallas import tpu as pltpu

        interpret_ctx = pltpu.force_tpu_interpret_mode
        model, dtype = "tiny", jnp.float32
    else:
        interpret_ctx = contextlib.nullcontext
        model, dtype = args.model, jnp.bfloat16

    max_seq = args.prefill + args.n_tokens + 8
    cfg, params = benchmod.build(model, max_seq, dtype)
    th = llama.zero_thresholds(cfg)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(
        rng.integers(1, cfg.vocab_size, (1, args.prefill)), jnp.int32)

    cache = KVCache.init(cfg, 1, max_seq, dtype)
    with interpret_ctx():
        logits_p, cache = jax.jit(
            lambda p, c: llama.forward(
                p, prompt, c, 0, th, cfg=cfg,
                sp=SparsityConfig(enabled=False), causal_prefill=True)
        )(params, cache)
    jax.device_get(logits_p[0, -1, :4])
    log(f"prefill done ({args.prefill} positions)")

    # the probe tokens: greedy continuation of the dense model, so the
    # probed states are model-typical, not arbitrary
    toks = [int(np.asarray(jnp.argmax(logits_p[0, -1])))]

    def step_fn(sp):
        @jax.jit
        def step(p, c, tok, pos):
            lg, c2 = llama.forward(p, tok, c, pos, th, cfg=cfg, sp=sp)
            return lg[0, 0], c2
        return step

    dense_step = step_fn(SparsityConfig(enabled=False))

    sparse_cfgs = {}
    for keep in [float(x) for x in args.keeps.split(",")]:
        for mode in ("topk", "firstcap"):
            sp = SparsityConfig(
                enabled=True, kernel="block", block_size=128,
                block_keep_frac=keep,
                block_thresholding=(mode == "firstcap"))
            sparse_cfgs[(keep, mode)] = step_fn(sp)

    # decode n tokens DENSE (advancing the shared history); at each
    # position, evaluate every sparse config's logits on the same state
    stats = {k: dict(se=0.0, var=0.0, agree=0, n=0)
             for k in sparse_cfgs}
    pos = args.prefill
    with interpret_ctx():
        for t in range(args.n_tokens):
            tok = jnp.asarray([[toks[-1]]], jnp.int32)
            ld, cache_next = dense_step(params, cache, tok, pos)
            ld_host = np.asarray(jax.device_get(ld), np.float32)
            for key, fn in sparse_cfgs.items():
                ls, _ = fn(params, cache, tok, pos)
                ls_host = np.asarray(jax.device_get(ls), np.float32)
                st = stats[key]
                st["se"] += float(np.mean((ls_host - ld_host) ** 2))
                st["var"] += float(np.var(ld_host))
                st["agree"] += int(np.argmax(ls_host) == np.argmax(ld_host))
                st["n"] += 1
            cache = cache_next
            toks.append(int(np.argmax(ld_host)))
            pos += 1
            log(f"pos {pos}: dense argmax {toks[-1]}")

    rows = []
    for (keep, mode), st in sorted(stats.items()):
        delta = float(np.sqrt(st["se"] / max(st["var"], 1e-12)))
        rows.append({
            "keep": keep, "mode": mode, "delta": round(delta, 4),
            "argmax_agree": round(st["agree"] / st["n"], 3),
            "n": st["n"],
        })
        log(f"keep={keep} mode={mode}: delta={delta:.3f} "
            f"agree={st['agree']}/{st['n']}")
    out = {
        "model": model, "weights": "random-init",
        "prefill": args.prefill,
        "note": ("delta is PESSIMISTIC vs real stats: homogeneous random "
                 "channels make group-drop energy ~ (1-keep) vs the real "
                 "h1 figure (docs/ACCURACY.md)"),
        "rows": rows,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
