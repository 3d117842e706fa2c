"""Unstructured row-gather sparse GEMV (exact TEAL semantics, experimental).

Faithful TPU translation of the reference kernel's row-skipping semantics
(`kernels/sparse_gemv.py:49-142`): individual input channels below the
threshold skip their weight row's HBM read. Weight layout `[K, N//128,
128]` makes each channel's row one contiguous HBM region; surviving channel
indices are compacted (argsort of the keep mask) and a scalar-prefetched
grid gathers one row per step with deterministic VMEM accumulation.

MEASURED DEAD END for speed on current hardware: each grid step costs a
fixed ~180 ns regardless of row size (see experiments/kernel_probe.py), so
this kernel runs at ~45-130 GB/s — slower than a dense GEMV for any useful
sparsity. It is kept as (a) the semantics-exact device kernel for
validation, and (b) the baseline that motivates the group-granular
`block_gemv`. The fast path dispatches to `block_gemv` instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def pack_weight_rows(w):
    """[K, N] -> [K, N//128, 128] so each input-channel row is contiguous."""
    K, N = w.shape
    return w.reshape(K, N // LANES, LANES)


def _kernel(idx_ref, xc_ref, w_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += xc_ref[i] * w_ref[0].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("nnz_cap", "out_dtype"))
def row_gather_gemv(idx, xc, w3, *, nnz_cap: int, out_dtype=jnp.bfloat16):
    """y[1, N] = sum_i xc[i] * w3[idx[i]].

    idx: [nnz_cap] int32 (ascending; padding entries must have xc == 0)
    xc:  [nnz_cap] float32 surviving activation values
    w3:  [K, N//128, 128]
    """
    K, NS, _ = w3.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nnz_cap,),
        in_specs=[pl.BlockSpec((1, NS, LANES), lambda i, ir, xr: (ir[i], 0, 0))],
        out_specs=pl.BlockSpec((NS, LANES), lambda i, ir, xr: (0, 0)),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NS, LANES), jnp.float32),
    )(idx, xc, w3)
    return out.reshape(1, NS * LANES).astype(out_dtype)


def compact_indices(x, threshold, nnz_cap: int):
    """Survivor compaction: indices of |x| > t, padded; padded/overflow
    entries carry zero values so they contribute nothing."""
    K = x.shape[-1]
    xf = x.reshape(K).astype(jnp.float32)
    keep = jnp.abs(xf) > threshold
    # stable partition: survivors first, in index order
    order = jnp.argsort(~keep, stable=True)
    idx = jnp.sort(order[:nnz_cap])
    vals = jnp.where(keep[idx], xf[idx], 0.0)
    return idx.astype(jnp.int32), vals


def gather_sparse_matmul(x, w, threshold, nnz_cap_frac: float = 0.625):
    """Unstructured sparse projection (exact semantics, not fast)."""
    K, N = w.shape
    nnz_cap = max(1, int(K * nnz_cap_frac))
    lead = x.shape[:-1]
    idx, vals = compact_indices(x, threshold, nnz_cap)
    y = row_gather_gemv(idx, vals, pack_weight_rows(w), nnz_cap=nnz_cap,
                        out_dtype=x.dtype)
    return y.reshape(*lead, N)
