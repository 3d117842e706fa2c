"""Fused decode attention over the layer-stacked KV cache, in place.

The scan-over-layers decode step must read layer i's KV cache slab every
token. Doing that in XLA means `kc_all[i]` — a real [B, Hkv, T, D] copy
(2 MB at 7B/256) for k and v, plus the write-back of the updated slab
into the carry: ~3x the attention's unavoidable HBM traffic, every layer,
every token (the reference pays none of this — its per-layer torch
modules own their cache slices in place, `gpt-fast/model.py:79-106`).

This kernel is the TPU answer: the *stacked* cache stays in HBM
(`pl.ANY`) and is ALIASED input->output (`input_output_aliases`), the
scalar-prefetched layer index selects the slab, and one DMA per
(batch, k/v) streams exactly the bytes attention must read. Scores,
masking, softmax and the PV reduction all run on the VPU over the
VMEM-resident slab — the [T] score vector never round-trips to HBM.

Keeping the cache update inside the aliased kernel matters beyond
elegance: expressed as an XLA `dynamic_update_slice` feeding a custom
call, XLA's memory-space-assignment pass decides the 67 MB cache (which
fits v5e VMEM) should live in VMEM around the update, inserting
full-cache HBM<->VMEM copy-start/copy-done pairs per layer — measured
+5.8 ms/token on dense 7B decode (54.5 -> 41.4 tok/s). Aliasing pins the
buffer in HBM and restores the baseline.

The in-place write itself must respect Mosaic's DMA tiling: a length-1
slice of the T (sublane) dim is unlowerable (bf16 needs multiples of 2,
fp32 of 8), so the kernel reads the aligned 8-row tile containing `pos`,
merges the new K/V row on the VPU, and writes the tile back. Attention
is computed from the PRE-update slab plus an exact in-compute fix-up
term for the current token (whose K/V are already in VMEM), so the
tile write never serializes the big slab read.

Semantics match `models.llama._attention` exactly: positions t with
t <= pos[b] are valid (optionally windowed; the current token is always
valid), softmax in fp32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWTILE = 8  # aligned T-dim tile for the in-place current-token write


def _decode_attn_kernel(layer_ref, pos_ref, q_ref, kn_ref, vn_ref,
                        kc_in, vc_in, o_ref, kc_ref, vc_ref, *,
                        B: int, Hkv: int, G: int, T: int, D: int,
                        window: Optional[int], scale: float):
    """q: [B*Hq, 1, D] VMEM; kn/vn: [B*Hkv, 1, D] VMEM current-token K/V;
    kc/vc: [L, B, Hkv, T, D] ANY, in aliased to out; o_ref: [B*Hq, 1, D]
    fp32 VMEM."""
    del kc_in, vc_in  # aliased: kc_ref/vc_ref are the same buffers
    R = ROWTILE

    def body(kbuf, vbuf, kpb, vpb, sem, psem, wsem):
        li = layer_ref[0]

        def bloop(b, _):
            pos_b = pos_ref[b]
            eb = (pos_b // R) * R
            # big slab reads (PRE-update contents — row pos is excluded
            # from the masked scores and fixed up from VMEM instead)
            ck = pltpu.make_async_copy(kc_ref.at[li, b], kbuf, sem.at[0])
            cv = pltpu.make_async_copy(vc_ref.at[li, b], vbuf, sem.at[1])
            ck.start()
            cv.start()
            # aligned 8-row tile containing pos: read, merge, write back
            pk = pltpu.make_async_copy(
                kc_ref.at[li, b, :, pl.ds(eb, R)], kpb, psem.at[0])
            pv = pltpu.make_async_copy(
                vc_ref.at[li, b, :, pl.ds(eb, R)], vpb, psem.at[1])
            pk.start()
            pv.start()
            knb = kn_ref[pl.ds(b * Hkv, Hkv)]      # [Hkv, 1, D]
            vnb = vn_ref[pl.ds(b * Hkv, Hkv)]
            pk.wait()
            pv.wait()
            row = jax.lax.broadcasted_iota(
                jnp.int32, (Hkv, R, D), 1) == (pos_b - eb)
            kpb[...] = jnp.where(row, knb.astype(kpb.dtype), kpb[...])
            vpb[...] = jnp.where(row, vnb.astype(vpb.dtype), vpb[...])
            wk = pltpu.make_async_copy(
                kpb, kc_ref.at[li, b, :, pl.ds(eb, R)], wsem.at[0])
            wv = pltpu.make_async_copy(
                vpb, vc_ref.at[li, b, :, pl.ds(eb, R)], wsem.at[1])
            wk.start()
            wv.start()
            # (the tile write only changes row pos, which the slab reads
            # below never consume — any interleaving is harmless)

            tpos = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
            valid = tpos < pos_b            # current token handled apart
            if window is not None:
                valid &= tpos > pos_b - window
            neg = jnp.float32(-1e30)
            ck.wait()
            cv.wait()

            def hloop(hh, _):
                k = kbuf[hh].astype(jnp.float32)          # [T, D]
                v = vbuf[hh].astype(jnp.float32)
                kn = kn_ref[b * Hkv + hh].astype(jnp.float32)   # [1, D]
                vn = vn_ref[b * Hkv + hh].astype(jnp.float32)
                for g in range(G):
                    qi = b * (Hkv * G) + hh * G + g
                    qv = q_ref[qi].astype(jnp.float32)    # [1, D]
                    s = jnp.sum(k * qv, axis=1, keepdims=True) * scale
                    s = jnp.where(valid, s, neg)          # [T, 1]
                    sc = jnp.sum(kn * qv) * scale         # current token
                    m = jnp.maximum(jnp.max(s), sc)
                    e = jnp.where(valid, jnp.exp(s - m), 0.0)
                    ec = jnp.exp(sc - m)
                    den = jnp.sum(e) + ec
                    o_ref[qi] = (
                        jnp.sum(v * e, axis=0, keepdims=True) + ec * vn
                    ) * (1.0 / den)
                return ()

            jax.lax.fori_loop(0, Hkv, hloop, ())
            wk.wait()
            wv.wait()
            return ()

        jax.lax.fori_loop(0, B, bloop, ())

    pl.run_scoped(
        body,
        pltpu.VMEM((Hkv, T, D), kc_ref.dtype),
        pltpu.VMEM((Hkv, T, D), vc_ref.dtype),
        pltpu.VMEM((Hkv, ROWTILE, D), kc_ref.dtype),
        pltpu.VMEM((Hkv, ROWTILE, D), vc_ref.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    )


def decode_attention(q, k_new, v_new, kc_all, vc_all, layer, pos, *,
                     window=None):
    """Single-token attention for layer `layer` of a stacked cache.

    q:       [B, Hq, 1, D] post-RoPE queries (any float dtype)
    k_new:   [B, Hkv, 1, D] post-RoPE current-token keys — written into
             the cache at (layer, b, :, pos[b], :) inside the kernel
    v_new:   [B, Hkv, 1, D] current-token values, likewise
    kc_all:  [L, B, Hkv, T, D] key cache (aliased: updated in place)
    vc_all:  [L, B, Hkv, T, D] value cache, likewise
    layer:   scalar int32 (traced)
    pos:     [B] int32 — each sequence's current position
    window:  optional sliding-window size (static)

    Returns (attn [B, Hq, 1, D] in the cache dtype, kc_all, vc_all).
    """
    return _decode_attention(q, k_new, v_new, kc_all, vc_all, layer, pos,
                             window=window)


@functools.partial(jax.jit, static_argnames=("window",))
def _decode_attention(q, k_new, v_new, kc_all, vc_all, layer, pos, *,
                      window):
    L, B, Hkv, T, D = kc_all.shape
    Bq, Hq, S, Dq = q.shape
    assert (Bq, S, Dq) == (B, 1, D), (q.shape, kc_all.shape)
    assert k_new.shape == v_new.shape == (B, Hkv, 1, D), k_new.shape
    assert Hq % Hkv == 0 and D == LANES and T % ROWTILE == 0
    G = Hq // Hkv
    qf = q.reshape(B * Hq, 1, D)
    kn = k_new.astype(kc_all.dtype).reshape(B * Hkv, 1, D)
    vn = v_new.astype(vc_all.dtype).reshape(B * Hkv, 1, D)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),   # q
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v_new
            pl.BlockSpec(memory_space=pl.ANY),       # kc
            pl.BlockSpec(memory_space=pl.ANY),       # vc
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
    )
    out, kc_all, vc_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * Hq, 1, D), jnp.float32),
            jax.ShapeDtypeStruct(kc_all.shape, kc_all.dtype),
            jax.ShapeDtypeStruct(vc_all.shape, vc_all.dtype),
        ],
        # flattened input indices incl. the 2 scalar-prefetch operands:
        # (layer, pos, q, k_new, v_new, kc, vc) -> kc=5, vc=6
        input_output_aliases={5: 1, 6: 2},
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * T * D,
            bytes_accessed=2 * B * Hkv * T * D * kc_all.dtype.itemsize,
            transcendentals=B * Hq * T,
        ),
    )(layer, pos, qf, kn, vn, kc_all, vc_all)
    return out.reshape(B, Hq, 1, D).astype(kc_all.dtype), kc_all, vc_all
