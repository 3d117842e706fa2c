#!/usr/bin/env python
"""Acceptance-rate study for lossless self-speculation (VERDICT r4
missing #1 / next #2): a defensible alpha(keep) operating point built
from MEASURED mechanics + calibrated statistics, replacing the
random-weight acceptance artifact (alpha=1.0 at T=1, 0.34 at T=0 —
both meaningless: random weights give near-uniform logits).

The question: when the draft is the target's own weights decoded through
the block-sparse kernel (keep fraction `keep`), what per-token
acceptance rate alpha does speculative sampling achieve on a REAL model?
No real weights exist in this environment, so the study decomposes alpha
into one measured and one calibrated ingredient:

1. MEASURED logit perturbation delta(keep): RMS(logits_sparse -
   logits_dense) / STD(logits_dense over vocab), from
   `experiments/logit_perturb_probe.py` on the 7B-architecture model on
   chip (dense history, both forwards on the same cache/position — the
   exact self-speculation draft regime). On random weights, channel
   statistics are homogeneous, so group selection drops ~(1-keep) of
   activation energy vs the real-statistics figure estimated from the
   reference's shipped histograms (group-50%: ~0.29-0.33 param-weighted,
   docs/accuracy_real_artifacts.md part 2/3). The EXPECTED-case delta
   scales the measured one by sqrt(E_real(s)/E_rand(s)) per keep
   (first-order error propagation: final-logit RMS proportional to
   per-layer perturbation scale); the CONSERVATIVE case uses the raw
   measured delta (strictly pessimistic on both counts: more dropped
   energy per layer AND topk-vs-firstcap selection).

2. CALIBRATED target logit family: per-token Zipf-Mandelbrot ranked
   probabilities p_i ~ (i + q0)^(-s_t) over the 32000-token vocab, with
   per-token exponent s_t lognormal so the family has (a) mean predictive
   entropy matched to Llama-2-7B's published WikiText-2 perplexity
   (ppl 5.47, TEAL paper arXiv 2408.14690 Table 1 => mean NLL = ln 5.47
   = 1.70 nats; for a trained LM, mean predictive entropy <= mean NLL,
   so anchoring entropy at the NLL is the flat-distribution-pessimistic
   choice) and (b) a right-skewed per-token entropy spread (sd ~1.0 nat
   by default; sensitivity swept). Draft logits z' = z + delta *
   std(z) * eps with eps iid N(0,1) (Laplace swept as sensitivity).

Acceptance under the reference's accept rule (min(1, q/p) with draft p,
target q, `gpt-fast/generate.py:119-139`):
    alpha_T1(delta)     = E_token[ sum_i min(p_i, q_i) ]      (T=1.0)
    alpha_greedy(delta) = P(argmax z' == argmax z)            (T=0)

VALIDATION leg: the same Monte-Carlo machinery, fed the random-weight
logit regime (iid Gaussian logits) at the probe's measured deltas, must
reproduce the probe's measured argmax-agreement rates — an end-to-end
check that the TV/agreement computation is sane before it is trusted on
the calibrated family.

Realized throughput: alpha(keep) is combined with MEASURED t_round(keep,
k) rows (scripts/bench_spec.py on chip) via the exact geometric
tokens/round formula, and the best (keep, k) operating point is
recommended. bench.py then MEASURES tok/s at the study alpha by forcing
the acceptance pattern (forced_alpha mode) — the quoted number is a
measurement, not this arithmetic.

Output: docs/acceptance_study.json (consumed by bench.py:_study_alpha
and `teal_tpu accuracy-map`).

Usage:
  python experiments/acceptance_study.py \
      [--perturb docs/logit_perturb.json] [--rounds docs/spec_rounds.json] \
      [--dense-tok-s 53.7] [--out docs/acceptance_study.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from experiments.real_heterogeneity import drop_curves  # noqa: E402
from teal_tpu.config import PROJ_GROUP, PROJS, get_model_config  # noqa: E402

V = 32000
Q0 = 2.7            # Zipf-Mandelbrot offset (standard text value)
H_TARGET = 1.70     # nats; = ln(5.47), Llama-2-7B WikiText-2 ppl
SIGMA_S = 0.35      # lognormal spread of the per-token Zipf exponent
                    # (gives a right-skewed entropy distribution,
                    # sd ~= 1.0 nat at the calibrated mean)

# 7B per-(module, hidden) channel-scale heterogeneity medians estimated
# from the reference's shipped histograms (docs/accuracy_real_artifacts.md
# part 1, Llama-2-7B rows; experiments/real_heterogeneity.py)
SIGMA_7B = {
    ("self_attn", "h1"): (0.15, "gauss"),
    ("self_attn", "h2"): (0.90, "laplace"),
    ("mlp", "h1"): (0.12, "gauss"),
    ("mlp", "h2"): (0.51, "laplace"),
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- energy
def energy_scales(keeps, G=128, seed=0):
    """sqrt(E_real(s)/E_rand(s)) per keep: param-weighted group-selection
    dropped energy on the real 7B channel statistics vs the homogeneous
    (random-weight) statistics the probe measured delta under."""
    cfg = get_model_config("7B")
    s_grid = np.array([1.0 - k for k in keeps])
    w = {p: float(np.prod(cfg.proj_shape(p))) for p in PROJS}
    wsum = sum(w.values())
    e_real = np.zeros(len(keeps))
    e_rand = np.zeros(len(keeps))
    for p in PROJS:
        K = cfg.proj_shape(p)[0]
        s_het, noise = SIGMA_7B[PROJ_GROUP[p]]
        rng = np.random.default_rng(seed)
        _, g_real = drop_curves(rng, s_het, noise, K, G, s_grid, P=512)
        rng = np.random.default_rng(seed)
        _, g_rand = drop_curves(rng, 0.02, noise, K, G, s_grid, P=512)
        e_real += (w[p] / wsum) * g_real
        e_rand += (w[p] / wsum) * g_rand
    return e_real, e_rand, np.sqrt(e_real / np.maximum(e_rand, 1e-9))


# ------------------------------------------------------------ logit MC
def zipf_logits(rng, n_tokens, s0, sigma_s=SIGMA_S, v=V, q0=Q0):
    """[n_tokens, v] target log-probs: per-token Zipf-Mandelbrot ranked
    distribution with lognormal exponent spread."""
    s_t = s0 * np.exp(sigma_s * rng.standard_normal(n_tokens))
    ranks = np.arange(1, v + 1, dtype=np.float64)
    z = -s_t[:, None] * np.log(ranks[None, :] + q0)
    z -= z.max(axis=1, keepdims=True)
    logZ = np.log(np.exp(z).sum(axis=1, keepdims=True))
    return z - logZ                                  # normalized log-probs


def mean_entropy(logp):
    p = np.exp(logp)
    return float(-(p * logp).sum(axis=1).mean()), \
        float((-(p * logp).sum(axis=1)).std())


def calibrate_s0(rng_seed, h_target, sigma_s=SIGMA_S, n=256):
    """Bisect the Zipf exponent scale so mean entropy == h_target."""
    lo, hi = 0.6, 4.0
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        rng = np.random.default_rng(rng_seed)
        h, _ = mean_entropy(zipf_logits(rng, n, mid, sigma_s))
        # entropy decreases with s
        if h > h_target:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def acceptance(logp_target, delta, rng, noise="gauss", batch=256):
    """(alpha_T1, alpha_greedy) under draft = target + delta*std*eps."""
    n = logp_target.shape[0]
    a_sum, g_sum = 0.0, 0
    for i in range(0, n, batch):
        z = logp_target[i:i + batch]
        std = z.std(axis=1, keepdims=True)
        if noise == "gauss":
            eps = rng.standard_normal(z.shape)
        else:
            eps = rng.laplace(size=z.shape) / np.sqrt(2.0)
        zp = z + delta * std * eps
        zp -= zp.max(axis=1, keepdims=True)
        p = np.exp(zp)
        p /= p.sum(axis=1, keepdims=True)
        q = np.exp(z)
        a_sum += np.minimum(p, q).sum(axis=1).sum()
        g_sum += int((zp.argmax(axis=1) == z.argmax(axis=1)).sum())
    return a_sum / n, g_sum / n


def gaussian_validation(probe_rows, n=4000, seed=7):
    """Predict the probe's own measured argmax agreement from the
    random-weight regime (iid Gaussian logits) at the measured deltas."""
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((n, V))
    z -= np.log(np.exp(z - z.max(1, keepdims=True)).sum(1, keepdims=True)) \
        + z.max(1, keepdims=True)
    out = []
    for r in probe_rows:
        a1, ag = acceptance(z, r["delta"], np.random.default_rng(seed + 1))
        out.append({
            "keep": r["keep"], "mode": r["mode"], "delta": r["delta"],
            "predicted_agree": round(ag, 3),
            "measured_agree": r["argmax_agree"],
            "predicted_alpha_t1": round(a1, 3),
            "n_measured": r["n"],
        })
    return out


def expected_tokens_per_round(alpha, k):
    if alpha >= 1.0:
        return float(k + 1)
    return (1.0 - alpha ** (k + 1)) / (1.0 - alpha)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--perturb", default="docs/logit_perturb.json")
    ap.add_argument("--rounds", default="docs/spec_rounds.json")
    ap.add_argument("--dense-tok-s", type=float, default=None)
    ap.add_argument("--out", default="docs/acceptance_study.json")
    ap.add_argument("--mc-tokens", type=int, default=4000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, args.perturb)
              if not os.path.isabs(args.perturb) else args.perturb) as f:
        perturb = json.load(f)
    probe_rows = perturb["rows"]
    keeps = sorted({r["keep"] for r in probe_rows}, reverse=True)

    # ---- energy scaling (real vs random channel statistics) ----
    e_real, e_rand, scale = energy_scales(keeps, seed=args.seed)
    log("energy: " + "  ".join(
        f"keep={k}: real {er:.3f} rand {eo:.3f} scale {s:.3f}"
        for k, er, eo, s in zip(keeps, e_real, e_rand, scale)))

    # ---- calibrated target family ----
    s0 = calibrate_s0(args.seed, H_TARGET)
    rng = np.random.default_rng(args.seed)
    logp = zipf_logits(rng, args.mc_tokens, s0)
    h_mean, h_sd = mean_entropy(logp)
    p_top = float(np.exp(logp).max(axis=1).mean())
    log(f"calibrated family: s0={s0:.3f} meanH={h_mean:.3f} nats "
        f"(target {H_TARGET}), sdH={h_sd:.2f}, mean top-1 prob {p_top:.3f}")

    # ---- alpha per keep (expected + conservative) ----
    # representative selection mode on a calibrated real model is topk
    # (group scores vs calibrated thresholds ~ per-position top-k);
    # firstcap is what zero thresholds degenerate to and is strictly
    # worse — used for the conservative case.
    delta_topk = {r["keep"]: r["delta"] for r in probe_rows
                  if r["mode"] == "topk"}
    delta_fc = {r["keep"]: r["delta"] for r in probe_rows
                if r["mode"] == "firstcap"}
    alpha_table = []
    for i, keep in enumerate(keeps):
        d_exp = delta_topk[keep] * scale[i]
        d_con = delta_fc.get(keep, delta_topk[keep])
        a_exp, g_exp = acceptance(
            logp, d_exp, np.random.default_rng(args.seed + 1))
        a_con, g_con = acceptance(
            logp, d_con, np.random.default_rng(args.seed + 1))
        alpha_table.append({
            "keep": keep, "k": None,
            "alpha": round(a_exp, 3),
            "alpha_greedy": round(g_exp, 3),
            "delta_expected": round(d_exp, 4),
            "alpha_conservative": round(a_con, 3),
            "alpha_greedy_conservative": round(g_con, 3),
            "delta_conservative": round(d_con, 4),
            "dropped_energy_real": round(float(e_real[i]), 4),
        })
        log(f"keep={keep}: delta {delta_topk[keep]:.3f} -> expected "
            f"{d_exp:.3f}: alpha_T1 {a_exp:.3f} greedy {g_exp:.3f} | "
            f"conservative {d_con:.3f}: alpha_T1 {a_con:.3f} "
            f"greedy {g_con:.3f}")

    # ---- sensitivity grid ----
    sens = []
    for h_t in (1.2, 1.7, 2.2):
        for sd_s in (0.2, 0.35, 0.5):
            s0s = calibrate_s0(args.seed, h_t, sd_s)
            lp = zipf_logits(np.random.default_rng(args.seed),
                             args.mc_tokens // 2, s0s, sd_s)
            for noise in ("gauss", "laplace"):
                row = {"H_mean": h_t, "sigma_s": sd_s, "noise": noise}
                for i, keep in enumerate(keeps):
                    d = delta_topk[keep] * scale[i]
                    a1, _ = acceptance(
                        lp, d, np.random.default_rng(args.seed + 2), noise)
                    row[f"alpha_keep{keep}"] = round(a1, 3)
                sens.append(row)
    a_vals = [r[f"alpha_keep{keeps[0]}"] for r in sens]
    log(f"sensitivity keep={keeps[0]}: alpha in "
        f"[{min(a_vals):.3f}, {max(a_vals):.3f}] over the grid")

    # ---- validation: reproduce the probe's measured agreement ----
    validation = gaussian_validation(probe_rows)
    for v in validation:
        log(f"validate keep={v['keep']} {v['mode']}: predicted agree "
            f"{v['predicted_agree']} vs measured {v['measured_agree']} "
            f"(n={v['n_measured']})")

    # ---- realized throughput at measured t_round ----
    # The chip shows multi-minute slow windows (2x device-speed swings),
    # so single grid rows can be outliers in BOTH directions. Fit the
    # physical cost model t_round(keep, k) = draft_ms(keep) * k +
    # verify_ms robustly across ALL rows (shared verify intercept,
    # per-keep draft slope; least absolute deviations via IRLS) and use
    # the fit for the realized table; raw rows stay in the artifact.
    realized, recommended, cost_fit = [], None, None
    rounds_path = (os.path.join(root, args.rounds)
                   if not os.path.isabs(args.rounds) else args.rounds)
    if os.path.exists(rounds_path):
        with open(rounds_path) as f:
            rounds = json.load(f)
        dense = args.dense_tok_s or rounds.get("dense_tok_s")
        rows = [r for r in rounds["rows"]
                if not r.get("failed") and "keep" in r]
        fit_keeps = sorted({r["keep"] for r in rows}, reverse=True)
        # the verify intercept is PHYSICALLY pinned: the dense verify
        # streams every weight byte once (one full-capacity token-kernel
        # pass ~= one dense decode step; 18.4 ms measured standalone in
        # round 4). An unconstrained fit on noisy rows drives the
        # intercept to ~0 and inflates every realized speedup, so clamp
        # it to [0.85, 1.3] dense steps and fit only the slopes.
        dense_step_ms = 1e3 / dense if dense else 19.0
        A = np.zeros((len(rows), len(fit_keeps) + 1))
        y = np.array([r["t_round_ms"] for r in rows], np.float64)
        for i, r in enumerate(rows):
            A[i, fit_keeps.index(r["keep"])] = r["k"]
            A[i, -1] = 1.0
        w = np.ones(len(rows))
        for _ in range(30):                      # IRLS ~ L1
            coef, *_ = np.linalg.lstsq(A * w[:, None], y * w, rcond=None)
            resid = np.abs(A @ coef - y)
            w = 1.0 / np.sqrt(np.maximum(resid, 1e-3))
        verify_ms = float(np.clip(coef[-1], 0.85 * dense_step_ms,
                                  1.3 * dense_step_ms))
        draft_ms = {}
        for kp in fit_keeps:
            sl = [(r["t_round_ms"] - verify_ms) / r["k"]
                  for r in rows if r["keep"] == kp]
            draft_ms[kp] = max(float(np.median(sl)), 0.5)
        pred = np.array([draft_ms[r["keep"]] * r["k"] + verify_ms
                         for r in rows])
        cost_fit = {"verify_ms": round(verify_ms, 1),
                    "verify_bound": "clamped to [0.85,1.3] dense steps",
                    "draft_ms_per_step": {str(kp): round(v, 2)
                                          for kp, v in draft_ms.items()},
                    "n_rows": len(rows),
                    "median_abs_resid_ms": round(
                        float(np.median(np.abs(pred - y))), 1)}
        log(f"cost fit: verify {verify_ms:.1f} ms, draft/step "
            + " ".join(f"keep{kp}={draft_ms[kp]:.1f}" for kp in fit_keeps)
            + f", median |resid| {cost_fit['median_abs_resid_ms']} ms")
        for keep in fit_keeps:
            arow = next((a for a in alpha_table
                         if abs(a["keep"] - keep) < 1e-6), None)
            if arow is None:
                continue
            for k in sorted({r["k"] for r in rows}):
                t_ms = draft_ms[keep] * k + verify_ms
                for aname in ("alpha", "alpha_conservative"):
                    tpr = expected_tokens_per_round(arow[aname], k)
                    tps = tpr / (t_ms / 1e3)
                    realized.append({
                        "keep": keep, "k": k,
                        "alpha_basis": aname, "alpha": arow[aname],
                        "t_round_ms": round(t_ms, 1),
                        "t_round_source": "cost_fit",
                        "tok_s": round(tps, 1),
                        "speedup_vs_dense":
                            round(tps / dense, 3) if dense else None,
                    })
        cand = [r for r in realized if r["alpha_basis"] == "alpha"]
        if cand:
            recommended = max(
                cand, key=lambda r: r["speedup_vs_dense"] or r["tok_s"])
            log(f"recommended operating point: keep={recommended['keep']} "
                f"k={recommended['k']} -> {recommended['tok_s']} tok/s "
                f"({recommended['speedup_vs_dense']}x)")
    else:
        log(f"no rounds file at {rounds_path}; alpha table only")

    out = {
        "basis": (
            "measured 7B logit perturbation delta(keep) x real-statistics "
            "energy scaling x Zipf family calibrated to Llama-2-7B "
            "WikiText-2 ppl 5.47 (meanH 1.70 nats); alpha = E[sum min(p,q)] "
            "at T=1.0; see experiments/acceptance_study.py"
        ),
        "family": {"s0": round(s0, 3), "sigma_s": SIGMA_S, "q0": Q0,
                   "V": V, "mean_entropy_nats": round(h_mean, 3),
                   "sd_entropy_nats": round(h_sd, 3),
                   "mean_top1_prob": round(p_top, 3)},
        "perturb_source": {"file": args.perturb,
                           "model": perturb.get("model"),
                           "prefill": perturb.get("prefill")},
        "alpha_table": alpha_table,
        "sensitivity": sens,
        "validation": validation,
        "cost_fit": cost_fit,
        "realized": realized,
        "recommended": recommended,
        "caveats": [
            "delta is measured on random weights and scaled to real "
            "channel statistics by a first-order energy argument; "
            "error compounding through 32 layers is assumed to scale "
            "linearly with per-layer perturbation size",
            "draft noise is modeled iid over the vocab; a real sparse "
            "draft's logit error is correlated with the target's "
            "(same weights), which can only help acceptance",
            "within-round draft positions condition on sparse-written "
            "kv of in-round predecessors (shared cache); modeled as "
            "alpha constant per position",
            "mean predictive entropy anchored at the published NLL "
            "(entropy <= NLL for trained LMs => pessimistic/flatter)",
        ],
    }
    out_path = (os.path.join(root, args.out)
                if not os.path.isabs(args.out) else args.out)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"alpha_table": alpha_table,
                      "recommended": recommended}))


if __name__ == "__main__":
    main()
