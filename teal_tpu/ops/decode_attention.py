"""Fused decode attention over the layer-stacked KV cache.

The scan-over-layers decode step must read layer i's KV cache slab every
token. Doing that in XLA means `kc_all[i]` — a real [B, Hkv, T, D] copy
(2 MB at 7B/256) for k and v, plus the write-back of the updated slab
into the carry: ~3x the attention's unavoidable HBM traffic, every layer,
every token (the reference pays none of this — its per-layer torch
modules own their cache slices in place, `gpt-fast/model.py:79-106`).

This kernel is the TPU answer: the *stacked* cache stays in HBM
(`pl.ANY`), the scalar-prefetched layer index selects the slab, and one
DMA per (batch, k/v) streams exactly the bytes attention must read.
Scores, masking, softmax and the PV reduction all run on the VPU over
the VMEM-resident slab — the [T] score vector never round-trips to HBM.
The tiny current-token K/V write lands outside as a dynamic-update-slice
(16 KB — noise).

Semantics match `models.llama._attention` exactly: positions t with
t <= pos[b] are valid (optionally windowed), softmax in fp32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _decode_attn_kernel(layer_ref, pos_ref, q_ref, kc_ref, vc_ref, o_ref, *,
                        B: int, Hkv: int, G: int, T: int, D: int,
                        window: Optional[int], scale: float):
    """q_ref: [B*Hq, 1, D] VMEM; kc/vc: [L, B, Hkv, T, D] ANY;
    o_ref: [B*Hq, 1, D] fp32 VMEM."""

    def body(kbuf, vbuf, sem):
        li = layer_ref[0]

        def bloop(b, _):
            ck = pltpu.make_async_copy(kc_ref.at[li, b], kbuf, sem.at[0])
            cv = pltpu.make_async_copy(vc_ref.at[li, b], vbuf, sem.at[1])
            ck.start()
            cv.start()
            pos_b = pos_ref[b]
            tpos = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
            valid = tpos <= pos_b
            if window is not None:
                valid &= tpos > pos_b - window
            neg = jnp.float32(-1e30)
            ck.wait()
            cv.wait()

            def hloop(hh, _):
                k = kbuf[hh].astype(jnp.float32)          # [T, D]
                v = vbuf[hh].astype(jnp.float32)
                for g in range(G):
                    qi = b * (Hkv * G) + hh * G + g
                    qv = q_ref[qi].astype(jnp.float32)    # [1, D]
                    s = jnp.sum(k * qv, axis=1, keepdims=True) * scale
                    s = jnp.where(valid, s, neg)          # [T, 1]
                    m = jnp.max(s)
                    e = jnp.where(valid, jnp.exp(s - m), 0.0)
                    den = jnp.sum(e)
                    o_ref[qi] = jnp.sum(
                        v * (e * (1.0 / den)), axis=0, keepdims=True
                    )
                return ()

            jax.lax.fori_loop(0, Hkv, hloop, ())
            return ()

        jax.lax.fori_loop(0, B, bloop, ())

    pl.run_scoped(
        body,
        pltpu.VMEM((Hkv, T, D), kc_ref.dtype),
        pltpu.VMEM((Hkv, T, D), vc_ref.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    )


def decode_attention(q, kc_all, vc_all, layer, pos, *, window=None):
    """Single-token attention for layer `layer` of a stacked cache.

    q:       [B, Hq, 1, D] post-RoPE queries (any float dtype)
    kc_all:  [L, B, Hkv, T, D] key cache — already holding the current
             token's key at pos (update it BEFORE calling)
    vc_all:  [L, B, Hkv, T, D] value cache, likewise updated
    layer:   scalar int32 (traced)
    pos:     [B] int32 — each sequence's current position
    window:  optional sliding-window size (static)

    Returns [B, Hq, 1, D] in the cache dtype.
    """
    return _decode_attention(q, kc_all, vc_all, layer, pos, window=window)


@functools.partial(jax.jit, static_argnames=("window",))
def _decode_attention(q, kc_all, vc_all, layer, pos, *, window):
    L, B, Hkv, T, D = kc_all.shape
    Bq, Hq, S, Dq = q.shape
    assert (Bq, S, Dq) == (B, 1, D), (q.shape, kc_all.shape)
    assert Hq % Hkv == 0 and D == LANES and T % 8 == 0
    G = Hq // Hkv
    qf = q.reshape(B * Hq, 1, D)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))

    kernel = functools.partial(
        _decode_attn_kernel, B=B, Hkv=Hkv, G=G, T=T, D=D, window=window,
        scale=1.0 / (D ** 0.5),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # layer, pos
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * Hq, 1, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * T * D,
            bytes_accessed=2 * B * Hkv * T * D * kc_all.dtype.itemsize,
            transcendentals=B * Hq * T,
        ),
    )(layer, pos, qf, kc_all, vc_all)
    return out.reshape(B, Hq, 1, D).astype(kc_all.dtype)
