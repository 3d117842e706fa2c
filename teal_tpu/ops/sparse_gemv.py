"""Sparse GEMV kernels for single-token decode.

TPU-native replacements for the reference's Triton split-K sparse GEMV
(`kernels/sparse_gemv.py:49-142`) and fused-QKV variant (:147-237). On TPU
there are no HBM atomics and memory moves in tiles, so the design differs:

  - "gather" mode: unstructured row-granular skipping. The weight is stored
    `[K, N/128, 128]` so each input-channel row is one contiguous HBM
    region; surviving channel indices are compacted and the kernel DMAs only
    those rows (scalar-prefetch grid). Deterministic VMEM accumulation
    replaces the reference's fp16 `atomic_add` split-K (fixing its
    nondeterminism and fp16-only limitation, reference README.md:108).
  - "block" mode: channel-group-granular skipping aligned to the sublane
    tile; reads exactly (1-s) of the weight bytes at group granularity.

This module currently provides the dispatch surface and a masked-dense
reference implementation; the Pallas kernels are filled in behind
`sparse_matmul` as they land.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from teal_tpu.config import SparsityConfig
from teal_tpu.ops.sparsify import sparsify


def masked_dense_matmul(x, w, threshold):
    """Reference semantics: zero sub-threshold activations, dense matmul."""
    xs = sparsify(x, threshold)
    return jnp.matmul(xs, w, preferred_element_type=jnp.float32).astype(x.dtype)


def sparse_matmul(x, w, threshold, sp: SparsityConfig):
    """Decode-path sparse projection dispatch. x: [..., 1, K]; w: [K, N]."""
    if sp.kernel == "masked_dense":
        return masked_dense_matmul(x, w, threshold)
    if sp.kernel == "gather":
        from teal_tpu.ops import gather_gemv
        return gather_gemv.gather_sparse_matmul(
            x, w, threshold, nnz_cap_frac=sp.gather_cap_frac
        )
    if sp.kernel == "block":
        from teal_tpu.ops import block_gemv
        # top-k group selection: the calibrated elementwise threshold is
        # not applied (group scores live on a different scale); sparsity
        # level comes from the static keep fraction.
        return block_gemv.block_sparse_matmul(
            x, w, None, sp.block_size, sp.block_keep_frac
        )
    raise ValueError(f"unknown sparse kernel {sp.kernel!r}")
