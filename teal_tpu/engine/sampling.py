"""Token sampling: temperature + top-k, jit/scan-friendly.

Matches the reference sampling semantics (`gpt-fast/generate.py:49-66`):
logits scaled by `max(temperature, 1e-5)`, optional top-k cutoff (logits
below the k-th largest masked to -inf), categorical draw. temperature=0 is
additionally special-cased to argmax for deterministic greedy decode.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def logits_to_probs(logits, temperature: float = 1.0,
                    top_k: Optional[int] = None):
    logits = logits / max(temperature, 1e-5)
    if top_k is not None:
        k = min(top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.nn.softmax(logits, axis=-1)


def sample(key, logits, temperature: float = 1.0,
           top_k: Optional[int] = None):
    """logits: [..., V] fp32 -> token ids [...]. Static temperature/top_k."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / max(temperature, 1e-5)
    if top_k is not None:
        k = min(top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
