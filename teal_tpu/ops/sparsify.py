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
    decode kernel): per position, keep the top `keep_frac` of
    `group_size`-channel groups by max-|x| score, zero the rest.

    Used to measure the ppl cost of the TPU-structured sparsity mode with
    the exact same selection rule the fast kernel applies.
    """
    *lead, d = x.shape
    nb = d // group_size
    if nb * group_size != d:
        raise ValueError(f"dim {d} not divisible by group {group_size}")
    k = max(1, min(nb, int(round(nb * keep_frac))))
    xg = x.reshape(*lead, nb, group_size)
    scores = jnp.max(jnp.abs(xg), axis=-1)              # [..., nb]
    if threshold is not None:
        # calibrated group-threshold rule (capacity-capped like the kernel)
        kth = jax.lax.top_k(scores, k)[0][..., -1:]
        mask = (scores >= kth) & (scores > threshold)
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
        def rule(v):
            return sparsify_groups(
                v, cfg.block_size, cfg.block_keep_frac,
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
