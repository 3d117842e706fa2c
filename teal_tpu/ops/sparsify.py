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

import jax.numpy as jnp

from teal_tpu.config import SparsityConfig


def sparsify(x, threshold):
    """`x * (|x| > threshold)`. threshold may be scalar or broadcastable."""
    return jnp.where(jnp.abs(x) > threshold, x, jnp.zeros_like(x))


def apply_sparsity(x, threshold, cfg: SparsityConfig):
    """Apply the threshold with the prefill policy. x: [..., seq, dim]."""
    if not cfg.enabled:
        return x
    seq = x.shape[-2]
    if seq > 1:
        if not cfg.apply_prefill:
            return x
        n_sparse = int(cfg.prefill_fraction * seq)
        if n_sparse == 0:
            return x
        head, tail = x[..., : seq - n_sparse, :], x[..., seq - n_sparse :, :]
        return jnp.concatenate([head, sparsify(tail, threshold)], axis=-2)
    return sparsify(x, threshold)
