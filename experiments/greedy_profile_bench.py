#!/usr/bin/env python
"""Per-layer greedy schedules AS DATA, at full speed — on-chip demo.

The reference's greedy optimizer produces per-layer sparsity schedules
(`lookup/layer-<i>/results.csv`) but its fast engine never ran them
(README.md:109 "functionality coming soon!"). Here per-layer schedules
are just the `[L, 7]` threshold array the kernel already consumes, so a
non-uniform profile costs nothing.

This experiment runs the FULL production pipeline on one chip:
  1. calibrate group-score histograms (G=128) on the bench model's own
     activations (synthetic tokens; `calibration.grab_acts.calibrate`)
  2. build two schedules: uniform 50%, and alternating 40%/60% by layer
     parity (mean 50% — a stand-in for a greedy profile; byte total is
     the same up to selection noise)
  3. decode with each schedule through the whole-token kernel under one
     static capacity bound (keep 0.6 x 1.05 margin)

Expected: tok/s parity between the profiles (within run variance),
demonstrating greedy-as-data. Usage (chip):
    timeout 3600 python experiments/greedy_profile_bench.py [--model 7B]
CPU smoke: --model tiny --smoke (plumbing only; tiny dims fall back to
the XLA paths).
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7B")
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--max-seq", type=int, default=256)
    ap.add_argument("--calib-seq", type=int, default=128)
    ap.add_argument("--smoke", action="store_true",
                    help="CPU plumbing check (pins jax to cpu)")
    args = ap.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from bench import build, decode_tps, log
    from teal_tpu.calibration.grab_acts import calibrate
    from teal_tpu.calibration.thresholds import (
        group_thresholds_from_sparsities,
        model_group_sizes,
    )
    from teal_tpu.config import SparsityConfig

    if args.smoke:
        # block-kernel-compatible tiny config (dims on the 128 grid)
        import jax

        from teal_tpu.config import get_model_config
        from teal_tpu.models import llama

        cfg = get_model_config("tiny", n_layers=2, n_heads=2,
                               n_kv_heads=2, dim=256,
                               intermediate_size=512, vocab_size=512)
        params = llama.init_params(cfg, jax.random.PRNGKey(0),
                                   jnp.float32)
    else:
        cfg, params = build(args.model, args.max_seq, jnp.bfloat16,
                            block_size=args.block_size)

    # 1. calibrate on the model's own (random-weight) activations
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, args.calib_seq))
    gsizes = model_group_sizes(cfg, args.block_size)
    out_dir = tempfile.mkdtemp(prefix="greedy_profile_")
    log(f"calibrating group sizes {gsizes} -> {out_dir}")
    calibrate(params, cfg, tokens, out_dir, save_layer_inputs=False,
              group_sizes=gsizes, progress=True)
    hist_root = os.path.join(out_dir, "histograms")

    # 2. schedules: uniform 50% vs alternating 40/60 (mean 50%)
    L = cfg.n_layers
    uni = np.full((L, 7), 0.5)
    alt = np.where((np.arange(L) % 2 == 0)[:, None], 0.4, 0.6)
    alt = np.broadcast_to(alt, (L, 7)).copy()
    th_uni = group_thresholds_from_sparsities(
        hist_root, cfg, uni, args.block_size)
    th_alt = group_thresholds_from_sparsities(
        hist_root, cfg, alt, args.block_size)
    log(f"thresholds uniform [{th_uni.min():.3f},{th_uni.max():.3f}] "
        f"alternating [{th_alt.min():.3f},{th_alt.max():.3f}]")

    # 3. one static capacity bound covers the profile's max keep (0.6)
    sp = SparsityConfig(enabled=True, kernel="block",
                        block_size=args.block_size,
                        block_keep_frac=min(1.0, 0.6 * 1.05),
                        block_thresholding=True)
    n_short, n_long = (4, 12) if args.smoke else (8, 64)
    if args.smoke:
        import contextlib

        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        tps_uni = decode_tps(cfg, params, sp, args.max_seq, n_short,
                             n_long, thresholds=th_uni)
        log(f"uniform 50%:        {tps_uni:.2f} tok/s")
        tps_alt = decode_tps(cfg, params, sp, args.max_seq, n_short,
                             n_long, thresholds=th_alt)
        log(f"alternating 40/60%: {tps_alt:.2f} tok/s "
            f"(ratio {tps_alt / tps_uni:.3f} — expect ~1.0)")


if __name__ == "__main__":
    main()
