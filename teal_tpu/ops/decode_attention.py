"""Fused decode attention over the layer-stacked KV cache, in place.

The scan-over-layers decode step must read layer i's KV cache slab every
token. Doing that in XLA means `kc_all[i]` — a real [B, Hkv, T, D] copy
(2 MB at 7B/256) for k and v, plus the write-back of the updated slab
into the carry: ~3x the attention's unavoidable HBM traffic, every layer,
every token (the reference pays none of this — its per-layer torch
modules own their cache slices in place, `gpt-fast/model.py:79-106`).

This kernel is the TPU answer: the *stacked* cache stays in HBM
(`pl.ANY`) and is ALIASED input->output (`input_output_aliases`), the
scalar-prefetched layer index selects the slab, and double-buffered
chunk DMAs stream ONLY the rows attention can see: the chunk loop runs
from the window start to the chunk containing `pos`, so decode attention
cost is proportional to the actual context, not to max_seq (XLA's
einsum attention — and the reference's sdpa — always reads the full
static cache). Scores, online-softmax accumulation and the PV reduction
run on the VPU; the [T] score vector never round-trips to HBM. When one
chunk covers the whole cache (T <= 256), a statically selected one-shot
body skips the online-accumulation state and its fix-up loop entirely —
short-cache decode pays zero chunking overhead.

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
is computed from the PRE-update slab plus an exact online fix-up term
for the current token (whose K/V are already in VMEM), so the tile
write never serializes the chunk reads, and any read/write interleaving
on that tile is harmless (the only differing row, `pos`, is masked out
of the slab scores).

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
ROWTILE = 8    # aligned T-dim tile for the in-place current-token write
CHUNK = 256    # T-dim rows per attention DMA (double-buffered)

def _mxu_dot(a, b, dims):
    """dot_general with fp32-exactness preserved: f32 operands force
    Precision.HIGHEST (bf16x3 passes, ~exact f32) so fp32-cache configs
    match the VPU reference; bf16 operands take the native MXU path.

    bf16-cache numerics note (ADVICE r4): for bf16 caches the callers
    downcast the fp32 post-RoPE q and the fp32 softmax weights to bf16
    before these dots, where the pre-MXU VPU path accumulated scores
    and PV fully in fp32 — one extra bf16 rounding of q and of e per
    dot. The score/PV ACCUMULATION itself still happens in fp32 (MXU
    accumulator, preferred_element_type). Bounded by
    tests/test_kernels.py::test_decode_attention_bf16_cache_tolerance
    against an all-fp32 XLA reference; greedy prefix exactness vs the
    s=1 decode path is preserved because verify and decode share THIS
    kernel (same rounding on both sides)."""
    prec = (jax.lax.Precision.HIGHEST if b.dtype == jnp.float32 else None)
    return jax.lax.dot_general(a, b, dims, precision=prec,
                               preferred_element_type=jnp.float32)



def _decode_attn_kernel(layer_ref, pos_ref, q_ref, kn_ref, vn_ref,
                        kc_in, vc_in, o_ref, kc_ref, vc_ref, *,
                        B: int, Hkv: int, G: int, T: int, D: int, C: int,
                        window: Optional[int], scale: float):
    """q: [B*Hq, 1, D] VMEM; kn/vn: [B*Hkv, 1, D] VMEM current-token K/V;
    kc/vc: [L, B, Hkv, T, D] ANY, in aliased to out; o_ref: [B*Hq, 1, D]
    fp32 VMEM. C divides T."""
    del kc_in, vc_in  # aliased: kc_ref/vc_ref are the same buffers
    R = ROWTILE
    Hq = Hkv * G
    neg = jnp.float32(-1e30)

    def oneshot_body(kb, vb, kpb, vpb, qh_s, sem, psem, wsem):
        """Static single-chunk case (C == T): one slab DMA + one-pass
        softmax — MXU dots over heads (batched for MHA, per-kv-head
        [G, T] for GQA), no online-accumulation state."""
        li = layer_ref[0]

        def bloop(b, _):
            pos_b = pos_ref[b]
            eb = (pos_b // R) * R
            ck = pltpu.make_async_copy(kc_ref.at[li, b], kb, sem.at[0, 0])
            cv = pltpu.make_async_copy(vc_ref.at[li, b], vb, sem.at[0, 1])
            ck.start()
            cv.start()
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
            # (the tile write only changes row pos, which the slab scores
            # below mask out — any interleaving is harmless)

            # stage sequence b's q heads (scale folded) for MXU dots
            for hh in range(Hkv):
                for g in range(G):
                    qh_s[hh, g:g + 1, :] = (
                        q_ref[b * Hq + hh * G + g].astype(jnp.float32)
                        * scale)
            ck.wait()
            cv.wait()

            if G == 1:
                tpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
                valid = tpos < pos_b        # current token handled apart
                if window is not None:
                    valid &= tpos > pos_b - window
                k3, v3 = kb[...], vb[...]              # [Hkv, T, D]
                s = _mxu_dot(
                    qh_s[...].astype(k3.dtype), k3,
                    (((2,), (2,)), ((0,), (0,))))  # [Hkv, G, T]
                s = jnp.where(valid, s, neg)
                m = jnp.max(s, axis=2, keepdims=True)
                e = jnp.where(valid, jnp.exp(s - m), 0.0)
                d_ = jnp.sum(e, axis=2, keepdims=True)
                pvv = _mxu_dot(
                    e.astype(v3.dtype), v3,
                    (((2,), (1,)), ((0,), (0,))))  # [Hkv, G, D]
                for hh in range(Hkv):
                    kn = kn_ref[b * Hkv + hh].astype(jnp.float32)
                    vn = vn_ref[b * Hkv + hh].astype(jnp.float32)
                    q_ = qh_s[hh]                        # [G, D]
                    sc = jnp.sum(q_ * kn, axis=1, keepdims=True)
                    m_f = jnp.maximum(m[hh], sc)
                    corr = jnp.exp(m[hh] - m_f)
                    ec = jnp.exp(sc - m_f)
                    den = d_[hh] * corr + ec
                    out = (pvv[hh] * corr + ec * vn) * (1.0 / den)
                    for g in range(G):
                        o_ref[b * Hq + hh * G + g] = out[g:g + 1, :]
            else:
                tpos = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
                valid = tpos < pos_b
                if window is not None:
                    valid &= tpos > pos_b - window
                for hh in range(Hkv):
                    k_, v_ = kb[hh], vb[hh]              # [T, D]
                    q_ = qh_s[hh]                        # [G, D]
                    s = _mxu_dot(
                        q_.astype(k_.dtype), k_,
                        (((1,), (1,)), ((), ())))  # [G, T]
                    s = jnp.where(valid, s, neg)
                    kn = kn_ref[b * Hkv + hh].astype(jnp.float32)
                    vn = vn_ref[b * Hkv + hh].astype(jnp.float32)
                    sc = jnp.sum(q_ * kn, axis=1, keepdims=True)
                    m = jnp.maximum(
                        jnp.max(s, axis=1, keepdims=True), sc)
                    e = jnp.where(valid, jnp.exp(s - m), 0.0)
                    ec = jnp.exp(sc - m)
                    den = jnp.sum(e, axis=1, keepdims=True) + ec
                    pvv = _mxu_dot(
                        e.astype(v_.dtype), v_,
                        (((1,), (0,)), ((), ())))  # [G, D]
                    out = (pvv + ec * vn) * (1.0 / den)
                    for g in range(G):
                        o_ref[b * Hq + hh * G + g] = out[g:g + 1, :]
            wk.wait()
            wv.wait()
            return ()

        jax.lax.fori_loop(0, B, bloop, ())

    def body(kb, vb, kpb, vpb, m_ref, d_ref, a_ref, qh_s, sem, psem, wsem):
        li = layer_ref[0]

        def start_chunk(b, ci, slot):
            # slot buffers are flattened to [2*Hkv, C, D] so every
            # dynamic index in the kernel is on a single leading dim
            ck = pltpu.make_async_copy(
                kc_ref.at[li, b, :, pl.ds(ci * C, C)],
                kb.at[pl.ds(slot * Hkv, Hkv)], sem.at[slot, 0])
            cv = pltpu.make_async_copy(
                vc_ref.at[li, b, :, pl.ds(ci * C, C)],
                vb.at[pl.ds(slot * Hkv, Hkv)], sem.at[slot, 1])
            ck.start()
            cv.start()

        def wait_chunk(slot):
            buf = pl.ds(slot * Hkv, Hkv)
            pltpu.make_async_copy(kb.at[buf], kb.at[buf],
                                  sem.at[slot, 0]).wait()
            pltpu.make_async_copy(vb.at[buf], vb.at[buf],
                                  sem.at[slot, 1]).wait()

        def bloop(b, _):
            pos_b = pos_ref[b]
            # --- in-place current-token write: aligned 8-row tile ---
            eb = (pos_b // R) * R
            pk = pltpu.make_async_copy(
                kc_ref.at[li, b, :, pl.ds(eb, R)], kpb, psem.at[0])
            pv = pltpu.make_async_copy(
                vc_ref.at[li, b, :, pl.ds(eb, R)], vpb, psem.at[1])
            pk.start()
            pv.start()
            # --- chunk range: [lo, hi) covers the visible window ---
            if window is None:
                lo = jnp.int32(0)
            else:
                lo = jnp.maximum(pos_b - window + 1, 0) // C
            hi = pos_b // C + 1
            start_chunk(b, lo, lo % 2)
            # online-softmax state for this b's heads
            m_ref[...] = jnp.full_like(m_ref, neg)
            d_ref[...] = jnp.zeros_like(d_ref)
            a_ref[...] = jnp.zeros_like(a_ref)

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

            # stage sequence b's q heads as [Hkv, G, D] fp32 (scale
            # folded) so the chunk loop runs batched MXU dots instead of
            # per-head VPU reduces (experiments/attn_variant_probe.py:
            # fori 107.9 -> bdot 61.5 us/layer at 7B/2048)
            for hh in range(Hkv):
                for g in range(G):
                    qh_s[hh, g:g + 1, :] = (
                        q_ref[b * Hq + hh * G + g].astype(jnp.float32)
                        * scale)

            def cloop(ci, _):
                slot = jax.lax.rem(ci, 2)
                wait_chunk(slot)

                @pl.when(ci + 1 < hi)
                def _():
                    start_chunk(b, ci + 1, jax.lax.rem(ci + 1, 2))

                if G == 1:
                    # MHA: one batched dot over all Hkv heads
                    tpos = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, 1, C), 2) + ci * C)
                    valid = tpos < pos_b    # current token handled apart
                    if window is not None:
                        valid &= tpos > pos_b - window
                    k3 = kb[pl.ds(slot * Hkv, Hkv)]         # [Hkv, C, D]
                    v3 = vb[pl.ds(slot * Hkv, Hkv)]
                    s = _mxu_dot(
                        qh_s[...].astype(k3.dtype), k3,
                        (((2,), (2,)), ((0,), (0,))))  # [Hkv,G,C]
                    s = jnp.where(valid, s, neg)
                    m_old = m_ref[...].reshape(Hkv, G, 1)
                    m_new = jnp.maximum(
                        m_old, jnp.max(s, axis=2, keepdims=True))
                    e = jnp.where(valid, jnp.exp(s - m_new), 0.0)
                    corr = jnp.exp(m_old - m_new)
                    d_new = (d_ref[...].reshape(Hkv, G, 1) * corr
                             + jnp.sum(e, axis=2, keepdims=True))
                    pv = _mxu_dot(
                        e.astype(v3.dtype), v3,
                        (((2,), (1,)), ((0,), (0,))))  # [Hkv,G,D]
                    a_old = a_ref[...].reshape(Hkv, G, D)
                    a_ref[...] = (a_old * corr + pv).reshape(Hq, D)
                    m_ref[...] = m_new.reshape(Hq, 1)
                    d_ref[...] = d_new.reshape(Hq, 1)
                else:
                    # GQA: per-kv-head [G, C] / [G, D] MXU dots
                    tpos = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, C), 1) + ci * C)
                    valid = tpos < pos_b
                    if window is not None:
                        valid &= tpos > pos_b - window
                    for hh in range(Hkv):
                        h0 = hh * G
                        k_ = kb[slot * Hkv + hh]              # [C, D]
                        v_ = vb[slot * Hkv + hh]
                        q_ = qh_s[hh]                         # [G, D]
                        s = _mxu_dot(
                            q_.astype(k_.dtype), k_,
                            (((1,), (1,)), ((), ())))  # [G,C]
                        s = jnp.where(valid, s, neg)
                        m_old = m_ref[h0:h0 + G, :]           # [G, 1]
                        m_new = jnp.maximum(
                            m_old, jnp.max(s, axis=1, keepdims=True))
                        e = jnp.where(valid, jnp.exp(s - m_new), 0.0)
                        corr = jnp.exp(m_old - m_new)
                        d_ref[h0:h0 + G, :] = (
                            d_ref[h0:h0 + G, :] * corr
                            + jnp.sum(e, axis=1, keepdims=True))
                        pv = _mxu_dot(
                            e.astype(v_.dtype), v_,
                            (((1,), (0,)), ((), ())))  # [G,D]
                        a_ref[h0:h0 + G, :] = (
                            a_ref[h0:h0 + G, :] * corr + pv)
                        m_ref[h0:h0 + G, :] = m_new
                return ()

            jax.lax.fori_loop(lo, hi, cloop, ())

            # --- exact current-token fix-up + final normalization ---
            for hh in range(Hkv):
                h0 = hh * G
                kn = kn_ref[b * Hkv + hh].astype(jnp.float32)   # [1, D]
                vn = vn_ref[b * Hkv + hh].astype(jnp.float32)
                q_ = qh_s[hh]                                   # [G, D]
                sc = jnp.sum(q_ * kn, axis=1, keepdims=True)    # [G, 1]
                m_old = m_ref[h0:h0 + G, :]
                m_fin = jnp.maximum(m_old, sc)
                corr = jnp.exp(m_old - m_fin)
                ec = jnp.exp(sc - m_fin)
                den = d_ref[h0:h0 + G, :] * corr + ec           # [G, 1]
                out = ((a_ref[h0:h0 + G, :] * corr + ec * vn)
                       * (1.0 / den))                           # [G, D]
                for g in range(G):
                    o_ref[b * Hq + h0 + g] = out[g:g + 1, :]

            wk.wait()
            wv.wait()
            return ()

        jax.lax.fori_loop(0, B, bloop, ())

    if C == T:
        pl.run_scoped(
            oneshot_body,
            pltpu.VMEM((Hkv, T, D), kc_ref.dtype),
            pltpu.VMEM((Hkv, T, D), vc_ref.dtype),
            pltpu.VMEM((Hkv, ROWTILE, D), kc_ref.dtype),
            pltpu.VMEM((Hkv, ROWTILE, D), vc_ref.dtype),
            pltpu.VMEM((Hkv, G, D), jnp.float32),      # staged scaled q
            pltpu.SemaphoreType.DMA((1, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        )
    else:
        pl.run_scoped(
            body,
            pltpu.VMEM((2 * Hkv, C, D), kc_ref.dtype),
            pltpu.VMEM((2 * Hkv, C, D), vc_ref.dtype),
            pltpu.VMEM((Hkv, ROWTILE, D), kc_ref.dtype),
            pltpu.VMEM((Hkv, ROWTILE, D), vc_ref.dtype),
            pltpu.VMEM((Hq, 1), jnp.float32),          # running max
            pltpu.VMEM((Hq, 1), jnp.float32),          # running denominator
            pltpu.VMEM((Hq, D), jnp.float32),          # running PV acc
            pltpu.VMEM((Hkv, G, D), jnp.float32),      # staged scaled q
            pltpu.SemaphoreType.DMA((2, 2)),
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
    C = CHUNK if T % CHUNK == 0 else T
    qf = q.reshape(B * Hq, 1, D)
    kn = k_new.astype(kc_all.dtype).reshape(B * Hkv, 1, D)
    vn = v_new.astype(vc_all.dtype).reshape(B * Hkv, 1, D)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (B,))

    kernel = functools.partial(
        _decode_attn_kernel, B=B, Hkv=Hkv, G=G, T=T, D=D, C=C,
        window=window, scale=1.0 / (D ** 0.5),
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
