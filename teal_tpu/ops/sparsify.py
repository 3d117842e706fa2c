"""Magnitude thresholding of hidden states ("the" sparsity op).

Semantics (parity with reference `utils/utils.py:32-52`):
  - keep rule: `|x| > t` (strict), output `x * keep`.
  - decode (seq == 1): always sparsified.
  - prefill (seq > 1): if `apply_prefill`, sparsify only the trailing
    `int(prefill_fraction * seq)` positions and leave the head dense
    (the reference hardcodes the fraction to 1/2 and notes 0.99 also works —
    paper §5.4.3); if not `apply_prefill`, prefill is left fully dense.

Sequence length is static under jit, so the prefill split is Python-level.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from teal_tpu.config import SparsityConfig


def sparsify(x, threshold):
    """`x * (|x| > threshold)`. threshold may be scalar or broadcastable."""
    return jnp.where(jnp.abs(x) > threshold, x, jnp.zeros_like(x))


def sparsify_groups(x, group_size: int, keep_frac: float,
                    threshold=None):
    """Group-granular sparsification (the accuracy twin of the block
    decode kernel), implementing THE unified selection rule (see
    docs/KERNEL_NOTES.md "Selection semantics"):

      - threshold mode (`threshold` given): keep groups whose max-|x|
        score is > threshold, scanned in ascending group-index order;
        the first `cap` survivors win, later survivors are dropped
        (capacity overflow). Exactly the fused kernel's scalar-core scan
        (`block_gemv._fused_select_gather_kernel`).
      - top-k mode (`threshold=None`): keep the top `cap` groups by
        score. Exactly `block_gemv.select_groups`.

    where cap = max(1, round(nb * keep_frac)). Used to measure the ppl
    cost of the TPU-structured sparsity mode with the exact selection
    rule the fast kernel applies.
    """
    *lead, d = x.shape
    nb = d // group_size
    if nb * group_size != d:
        raise ValueError(f"dim {d} not divisible by group {group_size}")
    k = max(1, min(nb, int(round(nb * keep_frac))))
    xg = x.reshape(*lead, nb, group_size)
    scores = jnp.max(jnp.abs(xg), axis=-1)              # [..., nb]
    if threshold is not None:
        surv = scores > threshold
        # capacity cap in index order: survivor rank = cumsum - 1
        mask = surv & (jnp.cumsum(surv, axis=-1) <= k)
    else:
        kth = jax.lax.top_k(scores, k)[0][..., -1:]
        mask = scores >= kth
    return (xg * mask[..., None].astype(x.dtype)).reshape(x.shape)


def apply_sparsity(x, threshold, cfg: SparsityConfig):
    """Apply the sparsity rule with the prefill policy. x: [..., seq, dim].

    cfg.mode selects the rule: "teal" is elementwise |x| > t (reference
    semantics); "group" is per-position top-k group selection (the block
    decode kernel's semantics, for accuracy evaluation).
    """
    if not cfg.enabled:
        return x

    if cfg.mode == "group":
        # same runtime-effective group size as the block kernel (deep
        # input dims double the group size; docs/KERNEL_NOTES.md)
        from teal_tpu.ops.block_gemv import effective_block_size

        G = effective_block_size(cfg.block_size, x.shape[-1])

        def rule(v):
            return sparsify_groups(
                v, G, cfg.block_keep_frac,
                threshold=threshold if cfg.block_thresholding else None,
            )
    else:
        def rule(v):
            return sparsify(v, threshold)

    seq = x.shape[-2]
    if seq > 1:
        if not cfg.apply_prefill:
            return x
        n_sparse = int(cfg.prefill_fraction * seq)
        if n_sparse == 0:
            return x
        head, tail = x[..., : seq - n_sparse, :], x[..., seq - n_sparse :, :]
        return jnp.concatenate([head, rule(tail)], axis=-2)
    return rule(x)
