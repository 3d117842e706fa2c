#!/usr/bin/env python
"""Group-size frontier + row-salvage study (VERDICT r3 next #5).

Two questions, answered on the zero-correlation channel model at the σ
values estimated from the reference's REAL shipped histograms
(experiments/real_heterogeneity.py):

1. G-frontier: how much dropped activation energy does a finer group
   size buy (G in 8..128), and what does it cost in decode bandwidth?
   The bandwidth side is analytic from two MEASURED constants: the
   ~200 ns fixed cost per gather grid step and the 724 GB/s effective
   HBM stream (docs/KERNEL_NOTES.md; BENCH_r03) — halving G doubles the
   number of grid steps for the same kept bytes.

2. Row salvage: after G=128 group selection at 50%, spend a fixed
   budget of per-row gathers (measured 183 ns/row) on the largest-|x|
   channels from DROPPED groups. How much dropped energy does the
   budget recover, and what does it cost?

Usage: python experiments/g_frontier.py [--doc docs/g_frontier.md]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.real_heterogeneity import drop_curves, invert_curve

# measured kernel constants (docs/KERNEL_NOTES.md, round 2/3 probes)
T_STEP = 200e-9          # fixed cost per gather grid step
T_ROW = 183e-9           # per-row salvage gather
BW = 724e9               # effective HBM stream, bytes/s
BYTES_W = 2              # bf16

# 7B h1-side profile (q/k/v/gate/up: K=4096) at the h1 σ range measured
# from the real artifacts (0.09-0.42; we run both ends), and the h2
# down-proj profile (K=11008, σ~0.4-1.2)
PROFILES = (
    ("h1 K=4096 σ=0.15 (gauss)", 0.15, "gauss", 4096, 4096 * 3),
    ("h1 K=4096 σ=0.42 (gauss)", 0.42, "gauss", 4096, 4096 * 3),
    ("h2 K=11008 σ=0.80 (laplace)", 0.80, "laplace", 11008, 4096),
)


def bandwidth_factor(K, N, G, sparsity):
    """Per-projection decode time at group size G and 50% keep, relative
    to the ideal kept-bytes stream: (DMA + step overhead) / ideal."""
    nb = K // G
    kept = max(1, int(round(nb * (1.0 - sparsity))))
    dma = kept * G * N * BYTES_W / BW
    steps = kept * T_STEP
    ideal = K * (1.0 - sparsity) * N * BYTES_W / BW
    return (dma + steps) / ideal


def g_frontier(doc):
    rng = np.random.default_rng(0)
    s_grid = np.arange(0.05, 0.96, 0.05)
    target = 0.5
    lines = ["# Group-size frontier (energy vs bandwidth) — round 4",
             "",
             "Dropped-energy at group-50% per G, with the elementwise-"
             "equivalent sparsity (same dropped energy through the TEAL "
             "curve) and the analytic per-projection bandwidth overhead "
             "vs an ideal kept-bytes stream (200 ns/step fixed cost "
             "measured on chip).", ""]
    for name, sig, noise, K, N in PROFILES:
        lines += [f"## {name}", "",
                  "| G | dropped energy @50% | ≈ teal @ | bandwidth "
                  "overhead @50% | net speedup vs dense* |",
                  "|---|---|---|---|---|"]
        teal_c = None
        for G in (128, 64, 32, 16, 8):
            if K % G:
                continue
            teal, group = drop_curves(rng, sig, noise, K, G, s_grid,
                                      P=192)
            if teal_c is None:
                teal_c = teal
            d50 = float(np.interp(target, s_grid, group))
            equiv = invert_curve(s_grid, teal_c, d50)
            bf = bandwidth_factor(K, N, G, target)
            # net speedup vs dense for this projection if everything
            # else were free: dense time / sparse time = 1/( (1-s)*bf )
            net = 1.0 / ((1.0 - target) * bf)
            lines.append(f"| {G} | {d50:.3f} | {equiv:.2f} | "
                         f"{bf:.2f}x | {net:.2f}x |")
        lines.append("")
    return lines


def salvage(doc_lines):
    """Row salvage at G=128, 50%: recover top-|x| rows from dropped
    groups; energy recovered vs row budget."""
    rng = np.random.default_rng(1)
    lines = ["## Row salvage at G=128, group-50%", "",
             "After group selection, gather the B largest-|x| individual "
             "channels from DROPPED groups (measured 183 ns/row). "
             "Recovered fraction of the DROPPED energy:", "",
             "| profile | dropped@50% | B=8 | B=16 | B=32 | B=64 | "
             "B=128 | time cost (B=32) |",
             "|---|---|---|---|---|---|---|---|"]
    for name, sig, noise, K, N in PROFILES:
        G = 128
        P = 192
        sigma = np.exp(rng.normal(0.0, sig, K)).astype(np.float32)
        mk = (lambda: rng.standard_normal((P, K), dtype=np.float32)) \
            if noise == "gauss" else \
            (lambda: (rng.laplace(size=(P, K)) / np.sqrt(2.0))
             .astype(np.float32))
        x, x_cal = mk() * sigma, mk() * sigma
        perm = np.argsort(-np.abs(x_cal).mean(0), kind="stable")
        xp = x[:, perm]
        nb = K // G
        sc = np.abs(xp).reshape(P, nb, G).max(-1)
        k = nb // 2
        kth = np.take_along_axis(
            sc, np.argsort(sc, 1)[:, nb - k:nb - k + 1], axis=1)
        kept = np.repeat(sc >= kth, G, axis=1)
        e_tot = float((xp.astype(np.float64) ** 2).sum()) + 1e-30
        dropped_x = np.where(kept, 0.0, xp)
        e_drop = float((dropped_x.astype(np.float64) ** 2).sum())
        row = [f"| {name} | {e_drop / e_tot:.3f} "]
        a2 = dropped_x.astype(np.float64) ** 2
        order = np.argsort(-a2, axis=1)
        csum = np.cumsum(np.take_along_axis(a2, order, axis=1), axis=1)
        for B in (8, 16, 32, 64, 128):
            rec = float(csum[:, B - 1].sum()) / max(e_drop, 1e-30)
            row.append(f"| {rec:.3f} ")
        # time cost at B=32 vs the projection's sparse stream time
        t_salv = 32 * T_ROW
        t_proj = 0.5 * K * N * BYTES_W / BW
        row.append(f"| +{t_salv / t_proj * 100:.1f}% |")
        lines.append("".join(row))
    lines.append("")
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--doc", default=None)
    args = ap.parse_args()
    lines = g_frontier(args.doc)
    lines += salvage(lines)
    out = "\n".join(lines)
    print(out)
    if args.doc:
        with open(args.doc, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
