"""Sparse GEMV dispatch for single-token decode.

TPU-native replacements for the reference's Triton split-K sparse GEMV
(`kernels/sparse_gemv.py:49-142`) and fused-QKV variant (:147-237). On TPU
there are no HBM atomics and memory moves in tiles, so the design differs:

  - "masked_dense": zero sub-threshold activations, dense matmul — the
    accuracy path (identical semantics to reference `utils/utils.py:51-52`)
    and the fallback for shapes the Pallas kernels don't cover.
  - "gather" (`ops/gather_gemv.py`): unstructured row-granular skipping,
    exact reference semantics; surviving channel indices are compacted and
    the kernel DMAs only those rows. Kept for validation — measured slower
    than dense on TPU (fixed ~180 ns/row grid cost, docs/KERNEL_NOTES.md).
  - "block" (`ops/block_gemv.py`): the production kernel. Channel-group-
    granular skipping aligned to the sublane tile; reads exactly the kept
    groups' weight bytes via a triple-buffered DMA gather with
    deterministic fp32 VMEM accumulation (replacing the reference's fp16
    `atomic_add` split-K and its nondeterminism, reference README.md:108).

Block-mode threshold handling: when `sp.block_thresholding` is set, the
`threshold` argument holds calibrated GROUP-SCORE thresholds (built by
`calibration.thresholds.group_thresholds_for_uniform` at the runtime-
effective group size) and selection is the unified threshold+capacity rule
(docs/KERNEL_NOTES.md "Selection semantics"). When it is not set, the
block kernel runs pure top-k selection at `block_keep_frac` and any
elementwise threshold is intentionally unused — group scores live on a
different scale than elementwise |x| values, so applying an elementwise
threshold to them would be wrong. The CLI warns when calibrated
thresholds would be dropped this way (`cli.py`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from teal_tpu.config import SparsityConfig
from teal_tpu.ops.sparsify import sparsify, sparsify_groups


def masked_dense_matmul(x, w, threshold):
    """Reference semantics: zero sub-threshold activations, dense matmul."""
    xs = sparsify(x, threshold)
    return jnp.matmul(xs, w, preferred_element_type=jnp.float32).astype(x.dtype)


def group_masked_dense_matmul(x, w, threshold, sp: SparsityConfig):
    """Block-kernel semantics on the dense path (any batch shape): the
    unified group selection rule applied per position, then a dense
    matmul. Fallback for batches beyond the kernel's B<=8 limit."""
    from teal_tpu.ops.block_gemv import effective_block_size

    G = effective_block_size(sp.block_size, x.shape[-1])
    xs = sparsify_groups(
        x, G, sp.block_keep_frac,
        threshold=threshold if sp.block_thresholding else None,
    )
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
        flat_batch = math.prod(x.shape[:-1])
        if flat_batch > 1:
            # the single-token block kernel handles one flattened row;
            # larger batches ride the batched path in `layer_forward`
            # (B <= 8) or fall back to the semantics twin here
            return group_masked_dense_matmul(x, w, threshold, sp)
        thr = threshold if sp.block_thresholding else None
        return block_gemv.block_sparse_matmul(
            x, w, thr, sp.block_size, sp.block_keep_frac
        )
    raise ValueError(f"unknown sparse kernel {sp.kernel!r}")
