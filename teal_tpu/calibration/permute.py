"""Channel-permutation clustering for group sparsity.

Group-granular sparsity drops whole G-channel groups; its quality depends
on how COHERENT groups are (a group containing one always-hot channel and
15 cold ones can never be dropped without error). Real LLMs have strongly
heterogeneous channel magnitudes (massive-activation channels), so sorting
channels by calibrated magnitude before grouping clusters hot channels
together and makes group selection approach unstructured quality.

The crucial TPU-native property: every permutation FOLDS INTO THE WEIGHTS
offline — zero runtime cost:

  - residual-stream channels (the h1 inputs of q/k/v/gate/up): ONE global
    permutation applied to embed columns, norm weights, projection input
    rows, o/down output columns and lm_head rows — the residual stream
    simply lives permuted;
  - per-layer MLP intermediate channels (down's input): permute gate/up
    output columns and down input rows;
  - per-layer attention-output channels (o's input): permute v output
    columns within each KV head (RoPE and the attention math never see
    it) and o's input rows to match.

All three are exact re-parameterizations (tested: permuted model output ==
original up to fp reduction order); only the channel GROUPING that block
sparsity sees changes.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from teal_tpu.config import ModelConfig


def channel_stats(values: np.ndarray) -> np.ndarray:
    """Per-channel mean |x| over all positions. values: [..., D] -> [D]."""
    v = np.abs(np.asarray(values, np.float32))
    return v.reshape(-1, v.shape[-1]).mean(axis=0)


def sort_perm(stats: np.ndarray) -> np.ndarray:
    """Channels ordered by descending magnitude (hot channels first, so
    cold channels cluster into droppable groups)."""
    return np.argsort(-np.asarray(stats), kind="stable").astype(np.int32)


def compute_permutations(params, cfg: ModelConfig, tokens) -> Dict:
    """Calibrate all permutations from a token batch (uses the capture
    pipeline's per-layer hidden groups).

    Returns {"residual": [D], "inter": [L][I], "kv": [L][Hkv, Dh]}.
    """
    from teal_tpu.calibration.grab_acts import _layer_capture
    from teal_tpu.models.llama import compute_dtype

    tokens = jnp.asarray(tokens, jnp.int32)
    hidden = params["embed"][tokens].astype(compute_dtype(params))

    g = cfg.n_heads // cfg.n_kv_heads
    d = cfg.head_dim
    resid_stats = np.zeros(cfg.dim, np.float64)
    inter_perms: List[np.ndarray] = []
    kv_perms: List[np.ndarray] = []
    for l in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        hidden, caps = _layer_capture(lp, hidden, cfg)
        resid_stats += channel_stats(caps["self_attn"]["h1"])
        resid_stats += channel_stats(caps["mlp"]["h1"])
        inter_perms.append(sort_perm(channel_stats(caps["mlp"]["h2"])))
        # attn-out stats [Hq*Dh]; average q-heads sharing a KV head so the
        # per-KV-head channel perm is well defined
        st = channel_stats(caps["self_attn"]["h2"])
        st_kv = st.reshape(cfg.n_kv_heads, g, d).mean(axis=1)     # [Hkv, d]
        kv_perms.append(np.stack(
            [np.argsort(-st_kv[h], kind="stable") for h in range(cfg.n_kv_heads)]
        ).astype(np.int32))
    return {
        "residual": sort_perm(resid_stats),
        "inter": inter_perms,
        "kv": kv_perms,
    }


def _attn_out_perm(kv_perm: np.ndarray, cfg: ModelConfig) -> np.ndarray:
    """Expand per-KV-head channel perms to the [Hq*Dh] attn-out layout."""
    g = cfg.n_heads // cfg.n_kv_heads
    d = cfg.head_dim
    full = np.empty(cfg.n_heads * d, np.int32)
    for qh in range(cfg.n_heads):
        full[qh * d:(qh + 1) * d] = qh * d + kv_perm[qh // g]
    return full


def _kv_out_perm(kv_perm: np.ndarray, cfg: ModelConfig) -> np.ndarray:
    """Per-KV-head perms in the [Hkv*Dh] v-projection output layout."""
    d = cfg.head_dim
    return np.concatenate(
        [h * d + kv_perm[h] for h in range(cfg.n_kv_heads)]
    ).astype(np.int32)


def apply_permutations(params, perms: Dict, cfg: ModelConfig):
    """New params pytree with all permutations folded into the weights."""
    P = jnp.asarray(perms["residual"])
    lay = params["layers"]

    out = {
        "attn_norm": lay["attn_norm"][:, P],
        "mlp_norm": lay["mlp_norm"][:, P],
        "wq": lay["wq"][:, P, :],
        "wk": lay["wk"][:, P, :],
    }
    wv_in = lay["wv"][:, P, :]
    wg_in = lay["wgate"][:, P, :]
    wu_in = lay["wup"][:, P, :]
    wo_colP = lay["wo"][:, :, P]
    wd_colP = lay["wdown"][:, :, P]

    wv_l, wo_l, wg_l, wu_l, wd_l = [], [], [], [], []
    for l in range(cfg.n_layers):
        Q = jnp.asarray(perms["inter"][l])
        R_full = jnp.asarray(_attn_out_perm(perms["kv"][l], cfg))
        R_kv = jnp.asarray(_kv_out_perm(perms["kv"][l], cfg))
        wv_l.append(wv_in[l][:, R_kv])
        wo_l.append(wo_colP[l][R_full, :])
        wg_l.append(wg_in[l][:, Q])
        wu_l.append(wu_in[l][:, Q])
        wd_l.append(wd_colP[l][Q, :])
    out["wv"] = jnp.stack(wv_l)
    out["wo"] = jnp.stack(wo_l)
    out["wgate"] = jnp.stack(wg_l)
    out["wup"] = jnp.stack(wu_l)
    out["wdown"] = jnp.stack(wd_l)

    return {
        "embed": params["embed"][:, P],
        "layers": out,
        "final_norm": params["final_norm"][P],
        "lm_head": params["lm_head"][P, :],
    }
