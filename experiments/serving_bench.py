#!/usr/bin/env python
"""Measured B=8 serving row with mixed prompt lengths (VERDICT r4 next
#8): steady-state aggregate throughput of the continuous-batching engine
at 7B on one chip, plus the chunked-prefill interference measurement —
how much a long admission delays concurrent decode steps, chunked vs
one-shot.

Protocol: 7 short/medium requests fill slots and reach steady state;
a LONG prompt is then submitted mid-run. Per-engine-step wall times are
recorded; the interference metric is the max step latency in the
admission window over the steady-state median. With prefill_chunk=C the
long prompt admits one C-token chunk per step (engine/serving.py);
one-shot admission stalls every active slot for the whole prefill.

NOTE on dispatch overhead: each engine step is a host-driven program
call; on this tunnel runtime a call carries 0.1-1 s of jittery dispatch
latency that a local TPU host would not see. Aggregate tok/s is
therefore reported BOTH as raw walltime and as median-step (the
production-relevant number), with the b16 kernel row (bench.py batch16)
as the pure-device anchor.

Usage: python experiments/serving_bench.py [--slots 8] [--max-seq 512]
       [--long 384] [--chunk 128] [--max-new 48]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_engine(cfg, params, sp, args, chunk):
    import numpy as np

    from teal_tpu.engine.serving import ContinuousBatchingEngine

    rng = np.random.default_rng(0)
    eng = ContinuousBatchingEngine(
        cfg, params, slots=args.slots, max_seq=args.max_seq, sp=sp,
        temperature=0.0, prefill_chunk=chunk)

    def prompt(n):
        return rng.integers(1, cfg.vocab_size, n).tolist()

    # mixed short/medium mix fills all but two slots (so both timed
    # long admissions go straight into a free slot instead of queueing)
    lens = [8, 8, 8, 16, 32, 64, 64][: args.slots - 2]
    for n in lens:
        eng.submit(prompt(n), args.max_new)

    step_times = []
    submissions = 0
    second_at = None
    # FIRST long admission warms/compiles the prefill(-chunk) programs;
    # the SECOND is the measured one (the tunnel runtime's first
    # compile of the s>1 chunk program costs seconds and would swamp
    # the interference number)
    while eng.has_work() or submissions < 2:
        n = len(step_times)
        if submissions == 0 and n == args.warm_steps:
            eng.submit(prompt(args.long), args.max_new)
            submissions = 1
        elif submissions == 1 and n == 3 * args.warm_steps:
            eng.submit(prompt(args.long), args.max_new)
            submissions = 2
            second_at = n
        t0 = time.perf_counter()
        eng.step()
        step_times.append(time.perf_counter() - t0)
        if len(step_times) > 2000:
            break
    total_tokens = sum(len(r.out) for r in eng.finished)
    return np.asarray(step_times), second_at, total_tokens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max-seq", type=int, default=512)
    ap.add_argument("--long", type=int, default=384)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--max-new", type=int, default=48)
    ap.add_argument("--warm-steps", type=int, default=12)
    ap.add_argument("--cpu-tiny", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu_tiny:
        jax.config.update("jax_platforms", "cpu")
    import contextlib

    import jax.numpy as jnp
    import numpy as np

    import bench as benchmod
    from teal_tpu.config import SparsityConfig

    if args.cpu_tiny:
        from jax.experimental.pallas import tpu as pltpu

        ictx = pltpu.force_tpu_interpret_mode
        model, dtype = "tiny", jnp.float32
        args.max_seq, args.long, args.max_new = 128, 48, 8
        args.chunk, args.warm_steps = 16, 4
    else:
        ictx = contextlib.nullcontext
        model, dtype = "7B", jnp.bfloat16

    cfg, params = benchmod.build(model, args.max_seq, dtype)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.5, block_thresholding=True)

    out = {"metric": "serving_b8_mixed", "slots": args.slots,
           "long_prompt": args.long, "rows": {}}
    for name, chunk in (("chunked", args.chunk), ("oneshot", None)):
        with ictx():
            st, at, toks = run_engine(cfg, params, sp, args, chunk)
        # steady median: fully-warm steps between the two admissions
        steady = st[2 * args.warm_steps: 3 * args.warm_steps]
        med = float(np.median(steady)) if steady.size else float("nan")
        window = st[at: at + (args.long // (args.chunk or args.long) + 2)]
        worst = float(window.max()) if window.size else float("nan")
        row = {
            "median_step_ms": round(med * 1e3, 1),
            "aggregate_tok_s_median_step": round(args.slots / med, 1),
            "admission_worst_step_ms": round(worst * 1e3, 1),
            "admission_stall_x": round(worst / med, 2),
            "walltime_tok_s": round(toks / float(st.sum()), 1),
            "steps": int(st.size),
        }
        out["rows"][name] = row
        log(f"[{name}] median step {row['median_step_ms']} ms -> "
            f"{row['aggregate_tok_s_median_step']} aggregate tok/s; "
            f"admission worst {row['admission_worst_step_ms']} ms "
            f"({row['admission_stall_x']}x median)")
    ch, on = out["rows"]["chunked"], out["rows"]["oneshot"]
    if ch["admission_stall_x"] and on["admission_stall_x"]:
        out["chunking_stall_reduction_x"] = round(
            on["admission_stall_x"] / ch["admission_stall_x"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
