"""Fused attention block: one Pallas launch from the raw residual stream
to the attention output.

The production decode path previously ran TWO kernels per attention
block (threshold-select+QKV gather, then fused decode attention) with
XLA glue between them: head reshape/transposes, fp32 RoPE, and the
current-token K/V repack. Each XLA fusion between two Pallas calls is a
serialization point — at 7B that glue is a measurable slice of the
~1 ms/token launch-gap budget (docs/KERNEL_NOTES.md "End-to-end").

This kernel runs the whole block in one launch:

  1. in-kernel rms_norm of the raw residual stream (gain DMA overlapped
     with the sum-of-squares reduction)
  2. group-score threshold selection on the scalar core (the gather
     ramp's weight DMAs issue from inside the scan)
  3. pipelined gather of kept [G, N] slabs of wq/wk/wv (bf16, int8 with
     the per-channel scale folded, or packed int4) with MXU accumulation
     — one shared selection, one launch
  4. RoPE on the q/k heads, straight out of the fp32 accumulator
     (static per-head lane slices of the [8, (Hq+2*Hkv)*D] accumulator —
     head_dim == 128 == one lane tile, so every slice is tile-aligned)
  5. the in-place current-token cache write + chunked online-softmax
     attention of ops/decode_attention.py (the stacked cache stays in
     HBM, aliased input->output); the cache READS start at stage entry,
     overlapped under the norm/selection/gather

Nothing round-trips to HBM between those steps: q/k/v never exist as
XLA values at decode time. The reference has no analog — its fused
Triton kernel covers only the QKV GEMVs (`kernels/sparse_gemv.py:
147-237`) and attention runs separately in sdpa (`gpt-fast/model.py:
249`).

`attn_stage` is batch-generic (static B <= 16; 8 < B <= 16 rides a
two-sublane-tile lhs): batch rows ride the MXU
lhs sublanes through one shared gather (pooled-score selection), then
each sequence's RoPE / cache write / attention runs at its own position
(continuous batching decodes slots at different depths). B == 1 emits
exactly the single-sequence program.

Semantics match the two-kernel path exactly, except q/k stay fp32 from
the accumulator through RoPE into the scores (the split path rounds
projections to bf16 between kernels) — strictly tighter numerics.

Restrictions (the dispatcher in models/llama.py falls back to the split
path otherwise): head_dim == 128, threshold selection mode, equal q/k/v
capacities, bf16/fp32 or packed-int4 weights via `attn_block` (the
whole-token kernel additionally feeds int8 with `scale_ref`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from teal_tpu.ops import decode_attention as _da
from teal_tpu.ops.block_gemv import (LANES, SUBLANES, _gather_loop,
                                     _norm_fold,
                                     _norm_rows, _plan_weights,
                                     _scoped_buffers, _select_scan,
                                     _slab_copy, _start_dmas)
from teal_tpu.ops.decode_attention import ROWTILE, _mxu_dot


def _attn_block_kernel(thr_ref, layer_ref, pos_ref, x3_ref, cs_ref, *refs,
                       G: int, plans, nb: int, cap: int, depth: int,
                       norm: bool, norm_eps: float, Hq: int, Hkv: int,
                       T: int, D: int, C: int, window: Optional[int],
                       scale: float, fixed_sel: bool = False):
    """cs_ref: [1, 2, D] f32 (cos row / sin row at the current position);
    o_ref: [Hq, 1, D] f32 attention output; caches aliased in->out."""
    if norm:
        norm_ref, refs = refs[0], refs[1:]
    else:
        norm_ref = None
    w_ref_groups, k = [], 0
    for p in plans:
        w_ref_groups.append(refs[k:k + p.n_dma])
        k += p.n_dma
    kc_in, vc_in, o_ref, kc_ref, vc_ref = refs[k:]
    del kc_in, vc_in  # aliased: kc_ref/vc_ref are the same buffers
    attn_stage(thr_ref[0], layer_ref, (pos_ref[0],), x3_ref, cs_ref,
               norm_ref, w_ref_groups, kc_ref, vc_ref, o_ref, G=G,
               plans=plans, nb=nb, cap=cap, depth=depth,
               norm_eps=norm_eps, Hq=Hq, Hkv=Hkv, T=T, D=D, C=C,
               window=window, scale=scale, fixed_sel=fixed_sel)


def attn_stage(thr, layer_ref, pos_bs, x3_ref, cs_ref, norm_ref,
               w_ref_groups, kc_ref, vc_ref, o_ref, *, G: int, plans,
               nb: int, cap: int, depth: int, norm_eps: float, Hq: int,
               Hkv: int, T: int, D: int, C: int, window: Optional[int],
               scale: float, fixed_sel: bool = False, scale_ref=None,
               cache_rows=None):
    """The whole attention block as an in-kernel stage: (folded norm +)
    pooled selection + QKV gather + per-sequence RoPE / in-place cache
    write / attention. Called by `_attn_block_kernel` (one launch per
    layer) and by the whole-token kernel (`ops/token_block.py`, grid
    over layers), for B = len(pos_bs) sequences (static, <= 8).

    thr: scalar; pos_bs: tuple of B per-sequence position scalars;
    x3_ref: [nb, rows, 128] packed stream (rows >= B; row b is batch b);
    cs_ref: [B, 2, D] per-sequence RoPE rows; kc/vc: [L, B', Hkv, T, D]
    stacked caches with B' >= B; o_ref: [Hq, rows_o, D] output buffer
    (row b is batch b; o_ref's dtype decides the output cast); norm_ref
    None disables the folded rms_norm.

    `scale_ref` (int8 weight-only mode): packed per-out-channel q/k/v
    scales aligned with the accumulator's 128-lane column tiles
    (stacked [L*nbp, 128] f32); applied to the fp32 accumulator BEFORE
    RoPE — equivalent to dequantizing the weights.

    `cache_rows` (static, default range(B)): which cache batch row each
    slot reads/writes. `(0,)*B` turns the batch into B CONSECUTIVE
    positions of ONE sequence (the speculative-verify block / chunked
    prefill shape): slots run in order, each slot's cache write lands
    before the next slot's reads start (the per-slot read DMAs only
    begin after the previous slot's write-back completes), so slot i
    attends to slots < i through the cache plus itself via the
    current-token fix-up."""
    B = len(pos_bs)
    cbs = tuple(range(B)) if cache_rows is None else tuple(cache_rows)
    norm = norm_ref is not None
    offs = [0]
    for p in plans:
        offs.append(offs[-1] + p.N)
    nbs = _norm_rows(offs[-1] // LANES)
    R = ROWTILE
    GH = Hq // Hkv
    half = D // 2
    neg = jnp.float32(-1e30)

    def outer(qbuf, knbuf, vnbuf, scores_v, scores_s, idx_s, ssem, *rest):
        if norm:
            xn_ref, g_ref, gsem = rest[:3]
            rest = rest[3:]
        if scale_ref is not None:
            sbuf, s2sem = rest[:2]
            rest = rest[2:]
            _slab_copy(scale_ref, sbuf, s2sem, layer_ref, nbs).start()
        li = layer_ref[0]
        ebs = [(p // R) * R for p in pos_bs]
        if C == T:
            kb, vb, kpb, vpb, qh_s, sem, psem, wsem = rest
        else:
            (kb, vb, kpb, vpb, m_ref, d_ref, a_ref, qh_s, sem, psem,
             wsem) = rest

        def start_chunk(b, ci, slot):
            pltpu.make_async_copy(
                kc_ref.at[li, cbs[b], :, pl.ds(ci * C, C)],
                kb.at[pl.ds(slot * Hkv, Hkv)], sem.at[slot, 0]).start()
            pltpu.make_async_copy(
                vc_ref.at[li, cbs[b], :, pl.ds(ci * C, C)],
                vb.at[pl.ds(slot * Hkv, Hkv)], sem.at[slot, 1]).start()

        def lo_of(pos_b):
            if window is None:
                return jnp.int32(0)
            return jnp.maximum(pos_b - window + 1, 0) // C

        def start_reads(b):
            """Sequence b's cache reads: the full-cache (C == T) or
            first-chunk DMA plus the write-tile pre-read. b == 0 starts
            at stage entry so the read runs UNDER the norm/selection/
            QKV gather; b > 0 starts once b-1 releases the buffers."""
            if C == T:
                pltpu.make_async_copy(kc_ref.at[li, cbs[b]], kb,
                                      sem.at[0, 0]).start()
                pltpu.make_async_copy(vc_ref.at[li, cbs[b]], vb,
                                      sem.at[0, 1]).start()
            else:
                lo = lo_of(pos_bs[b])
                start_chunk(b, lo, jax.lax.rem(lo, 2))
            pltpu.make_async_copy(
                kc_ref.at[li, cbs[b], :, pl.ds(ebs[b], R)], kpb,
                psem.at[0]).start()
            pltpu.make_async_copy(
                vc_ref.at[li, cbs[b], :, pl.ds(ebs[b], R)], vpb,
                psem.at[1]).start()

        start_reads(0)

        # --- 1: optional folded norm ---
        if norm:
            _norm_fold(x3_ref, norm_ref, xn_ref, g_ref, gsem, layer_ref,
                       nb=nb, G=G, norm_eps=norm_eps)
            x_ref = xn_ref
        else:
            x_ref = x3_ref

        # --- 2-4: selection (ramp DMAs issued from inside the scan),
        # one shared gather, then per-sequence RoPE out of the
        # accumulator (batch b is accumulator row b) ---
        def gather(*scoped):
            bufs, sems, acc = _unpack(scoped)

            def ramp(slot, gidx):
                for wi, p in enumerate(plans):
                    _start_dmas(p, w_ref_groups[wi], bufs[wi], sems[wi],
                                layer_ref, slot, gidx, G)

            count = _select_scan(thr, x_ref, scores_v, scores_s, idx_s,
                                 ssem, nb=nb, cap=cap, fixed=fixed_sel,
                                 ramp_start=ramp, ramp_depth=depth)
            _gather_loop(plans, w_ref_groups, bufs, sems, layer_ref,
                         x_ref, idx_s, count, acc, offs,
                         G=G, cap=cap, depth=depth, skip_ramp=True)
            if scale_ref is not None:
                assert D == LANES  # scale rows map 1:1 to head columns
                _slab_copy(scale_ref, sbuf, s2sem, layer_ref, nbs).wait()

            def col(b, off, h):       # [1, D] f32 accumulator column
                c = acc[b:b + 1, off + h * D:off + (h + 1) * D]
                if scale_ref is not None:   # int8 dequant scale pre-RoPE
                    j = (off + h * D) // LANES
                    c = c * sbuf[j:j + 1, :]
                return c

            for b in range(B):
                cos = cs_ref[b, 0:1, :]                    # [1, D]
                sin = cs_ref[b, 1:2, :]

                def rope(row):                             # [1, D] f32
                    rot = jnp.concatenate([-row[:, half:], row[:, :half]],
                                          axis=1)
                    return row * cos + rot * sin

                for h in range(Hq):   # static slices: D == one lane tile
                    qbuf[h, b:b + 1, :] = rope(col(b, offs[0], h)) * scale
                for h in range(Hkv):
                    knbuf[h, b:b + 1, :] = rope(col(b, offs[1], h))
                    vnbuf[h, b:b + 1, :] = col(b, offs[2], h)

        scope_args, _unpack = _scoped_buffers(plans, G, depth, offs[-1],
                                              rows=max(x3_ref.shape[1],
                                                       SUBLANES))
        pl.run_scoped(gather, *scope_args)

        # --- 5: per-sequence in-place cache write + attention ---

        def write_tile(b):
            """Merge sequence b's new K/V row into the pre-read aligned
            8-row tile containing its pos (read started in start_reads)
            and write it back (returns the write copies to wait on).
            Chunk reads use PRE-update rows; row pos is masked out of
            the slab scores and fixed up from VMEM."""
            pos_b, eb = pos_bs[b], ebs[b]
            pltpu.make_async_copy(
                kc_ref.at[li, cbs[b], :, pl.ds(eb, R)], kpb,
                psem.at[0]).wait()
            pltpu.make_async_copy(
                vc_ref.at[li, cbs[b], :, pl.ds(eb, R)], vpb,
                psem.at[1]).wait()
            row = jax.lax.broadcasted_iota(
                jnp.int32, (Hkv, R, D), 1) == (pos_b - eb)
            kpb[...] = jnp.where(row, knbuf[:, b:b + 1, :].astype(kpb.dtype),
                                 kpb[...])
            vpb[...] = jnp.where(row, vnbuf[:, b:b + 1, :].astype(vpb.dtype),
                                 vpb[...])
            wk = pltpu.make_async_copy(
                kpb, kc_ref.at[li, cbs[b], :, pl.ds(eb, R)], wsem.at[0])
            wv = pltpu.make_async_copy(
                vpb, vc_ref.at[li, cbs[b], :, pl.ds(eb, R)], wsem.at[1])
            wk.start()
            wv.start()
            return wk, wv

        def stage_q(b):
            # sequence b's q heads as [Hkv, GH, D] fp32: the attention
            # bodies run MXU dots over heads instead of per-head VPU
            # reduces (experiments/attn_variant_probe.py, round 4)
            for hh in range(Hkv):
                for g in range(GH):
                    qh_s[hh, g:g + 1, :] = qbuf[hh * GH + g, b:b + 1, :]

        def oneshot(b):
            pos_b = pos_bs[b]
            wk, wv = write_tile(b)
            stage_q(b)
            # full-cache read started in start_reads(b)
            pltpu.make_async_copy(kc_ref.at[li, cbs[b]], kb,
                                  sem.at[0, 0]).wait()
            pltpu.make_async_copy(vc_ref.at[li, cbs[b]], vb,
                                  sem.at[0, 1]).wait()

            if GH == 1:
                tpos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2)
                valid = tpos < pos_b        # current token handled apart
                if window is not None:
                    valid &= tpos > pos_b - window
                k3, v3 = kb[...], vb[...]              # [Hkv, T, D]
                s = _mxu_dot(
                    qh_s[...].astype(k3.dtype), k3,
                    (((2,), (2,)), ((0,), (0,))))  # [Hkv, GH, T]
                s = jnp.where(valid, s, neg)
                m = jnp.max(s, axis=2, keepdims=True)
                e = jnp.where(valid, jnp.exp(s - m), 0.0)
                d_ = jnp.sum(e, axis=2, keepdims=True)
                pv = _mxu_dot(
                    e.astype(v3.dtype), v3,
                    (((2,), (1,)), ((0,), (0,))))  # [Hkv, GH, D]
                for hh in range(Hkv):
                    kn = knbuf[hh, b:b + 1, :]
                    vn = vnbuf[hh, b:b + 1, :]
                    q_ = qh_s[hh]                        # [GH, D]
                    sc = jnp.sum(q_ * kn, axis=1, keepdims=True)
                    m_f = jnp.maximum(m[hh], sc)         # [GH, 1]
                    corr = jnp.exp(m[hh] - m_f)
                    ec = jnp.exp(sc - m_f)
                    den = d_[hh] * corr + ec
                    out = ((pv[hh] * corr + ec * vn) * (1.0 / den))
                    for g in range(GH):
                        o_ref[hh * GH + g, b:b + 1, :] = \
                            out[g:g + 1, :].astype(o_ref.dtype)
            else:
                tpos = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
                valid = tpos < pos_b
                if window is not None:
                    valid &= tpos > pos_b - window
                for hh in range(Hkv):
                    h0 = hh * GH
                    k_, v_ = kb[hh], vb[hh]              # [T, D]
                    q_ = qh_s[hh]                        # [GH, D]
                    s = _mxu_dot(
                        q_.astype(k_.dtype), k_,
                        (((1,), (1,)), ((), ())))  # [GH, T]
                    s = jnp.where(valid, s, neg)
                    kn = knbuf[hh, b:b + 1, :]
                    vn = vnbuf[hh, b:b + 1, :]
                    sc = jnp.sum(q_ * kn, axis=1, keepdims=True)
                    m = jnp.maximum(
                        jnp.max(s, axis=1, keepdims=True), sc)
                    e = jnp.where(valid, jnp.exp(s - m), 0.0)
                    ec = jnp.exp(sc - m)
                    den = jnp.sum(e, axis=1, keepdims=True) + ec
                    pv = _mxu_dot(
                        e.astype(v_.dtype), v_,
                        (((1,), (0,)), ((), ())))  # [GH, D]
                    out = (pv + ec * vn) * (1.0 / den)
                    for g in range(GH):
                        o_ref[h0 + g, b:b + 1, :] = \
                            out[g:g + 1, :].astype(o_ref.dtype)
            wk.wait()
            wv.wait()

        def chunked(b):
            pos_b = pos_bs[b]

            def wait_chunk(slot):
                buf = pl.ds(slot * Hkv, Hkv)
                pltpu.make_async_copy(kb.at[buf], kb.at[buf],
                                      sem.at[slot, 0]).wait()
                pltpu.make_async_copy(vb.at[buf], vb.at[buf],
                                      sem.at[slot, 1]).wait()

            lo = lo_of(pos_b)
            hi = pos_b // C + 1
            # first chunk's read started in start_reads(b)
            m_ref[...] = jnp.full_like(m_ref, neg)
            d_ref[...] = jnp.zeros_like(d_ref)
            a_ref[...] = jnp.zeros_like(a_ref)
            wk, wv = write_tile(b)

            # batched-dot bodies: per-head VPU form measured 2.6x the
            # DMA roofline at 7B/2048 where the batched dot runs 1.5x
            stage_q(b)

            def cloop(ci, _):
                slot = jax.lax.rem(ci, 2)
                wait_chunk(slot)

                @pl.when(ci + 1 < hi)
                def _():
                    start_chunk(b, ci + 1, jax.lax.rem(ci + 1, 2))

                if GH == 1:
                    # MHA: one batched dot over all Hkv heads
                    # (probe variant "bdot": 61.5 us/layer vs fori 107.9
                    # at Hkv=32, T=2048, C=256)
                    tpos = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, 1, C), 2) + ci * C)
                    valid = tpos < pos_b    # current token handled apart
                    if window is not None:
                        valid &= tpos > pos_b - window
                    k3 = kb[pl.ds(slot * Hkv, Hkv)]        # [Hkv, C, D]
                    v3 = vb[pl.ds(slot * Hkv, Hkv)]
                    s = _mxu_dot(
                        qh_s[...].astype(k3.dtype), k3,
                        (((2,), (2,)), ((0,), (0,))))  # [Hkv,GH,C]
                    s = jnp.where(valid, s, neg)
                    m_old = m_ref[...].reshape(Hkv, GH, 1)
                    m_new = jnp.maximum(
                        m_old, jnp.max(s, axis=2, keepdims=True))
                    e = jnp.where(valid, jnp.exp(s - m_new), 0.0)
                    corr = jnp.exp(m_old - m_new)
                    d_new = (d_ref[...].reshape(Hkv, GH, 1) * corr
                             + jnp.sum(e, axis=2, keepdims=True))
                    pv = _mxu_dot(
                        e.astype(v3.dtype), v3,
                        (((2,), (1,)), ((0,), (0,))))  # [Hkv,GH,D]
                    a_old = a_ref[...].reshape(Hkv, GH, D)
                    a_ref[...] = (a_old * corr + pv).reshape(Hq, D)
                    m_ref[...] = m_new.reshape(Hq, 1)
                    d_ref[...] = d_new.reshape(Hq, 1)
                else:
                    # GQA: per-kv-head [GH, C] / [GH, D] MXU dots,
                    # python-unrolled (probe variant "unroll": 31.2
                    # us/layer at Hkv=8/GH=4 vs bdot 57.4)
                    tpos = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, C), 1) + ci * C)
                    valid = tpos < pos_b
                    if window is not None:
                        valid &= tpos > pos_b - window
                    for hh in range(Hkv):
                        h0 = hh * GH
                        k_ = kb[slot * Hkv + hh]              # [C, D]
                        v_ = vb[slot * Hkv + hh]
                        q_ = qh_s[hh]                         # [GH, D]
                        s = _mxu_dot(
                            q_.astype(k_.dtype), k_,
                            (((1,), (1,)), ((), ())))  # [GH,C]
                        s = jnp.where(valid, s, neg)
                        m_old = m_ref[h0:h0 + GH, :]          # [GH, 1]
                        m_new = jnp.maximum(
                            m_old, jnp.max(s, axis=1, keepdims=True))
                        e = jnp.where(valid, jnp.exp(s - m_new), 0.0)
                        corr = jnp.exp(m_old - m_new)
                        d_ref[h0:h0 + GH, :] = (
                            d_ref[h0:h0 + GH, :] * corr
                            + jnp.sum(e, axis=1, keepdims=True))
                        pv = _mxu_dot(
                            e.astype(v_.dtype), v_,
                            (((1,), (0,)), ((), ())))  # [GH,D]
                        a_ref[h0:h0 + GH, :] = (
                            a_ref[h0:h0 + GH, :] * corr + pv)
                        m_ref[h0:h0 + GH, :] = m_new
                return ()

            jax.lax.fori_loop(lo, hi, cloop, ())

            # final merge: the current token's k/v live in VMEM (knbuf/
            # vnbuf), scored on the VPU in fp32
            for hh in range(Hkv):
                h0 = hh * GH
                kn = knbuf[hh, b:b + 1, :]                    # [1, D]
                vn = vnbuf[hh, b:b + 1, :]
                q_ = qh_s[hh]                                 # [GH, D]
                sc = jnp.sum(q_ * kn, axis=1, keepdims=True)  # [GH, 1]
                m_old = m_ref[h0:h0 + GH, :]
                m_fin = jnp.maximum(m_old, sc)
                corr = jnp.exp(m_old - m_fin)
                ec = jnp.exp(sc - m_fin)
                den = d_ref[h0:h0 + GH, :] * corr + ec        # [GH, 1]
                out = ((a_ref[h0:h0 + GH, :] * corr + ec * vn)
                       * (1.0 / den))                         # [GH, D]
                for g in range(GH):
                    o_ref[h0 + g, b:b + 1, :] = \
                        out[g:g + 1, :].astype(o_ref.dtype)

            wk.wait()
            wv.wait()

        for b in range(B):
            if b > 0:
                # b-1's attention released the K/V buffers; start b's
                # reads (the write-tile pre-read semaphores are also
                # free again — write_tile(b-1) waited them)
                start_reads(b)
            if C == T:
                oneshot(b)
            else:
                chunked(b)

    extra = []
    if norm:
        extra += [pltpu.VMEM(x3_ref.shape, x3_ref.dtype),
                  pltpu.VMEM((_norm_rows(nb), LANES), norm_ref.dtype),
                  pltpu.SemaphoreType.DMA(())]
    if scale_ref is not None:
        extra += [pltpu.VMEM((nbs, LANES), jnp.float32),
                  pltpu.SemaphoreType.DMA(())]
    if C == T:
        attn_bufs = [
            pltpu.VMEM((Hkv, T, D), kc_ref.dtype),
            pltpu.VMEM((Hkv, T, D), vc_ref.dtype),
            pltpu.VMEM((Hkv, ROWTILE, D), kc_ref.dtype),
            pltpu.VMEM((Hkv, ROWTILE, D), vc_ref.dtype),
            pltpu.VMEM((Hkv, GH, D), jnp.float32),     # staged q heads
            pltpu.SemaphoreType.DMA((1, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        attn_bufs = [
            pltpu.VMEM((2 * Hkv, C, D), kc_ref.dtype),
            pltpu.VMEM((2 * Hkv, C, D), vc_ref.dtype),
            pltpu.VMEM((Hkv, ROWTILE, D), kc_ref.dtype),
            pltpu.VMEM((Hkv, ROWTILE, D), vc_ref.dtype),
            pltpu.VMEM((Hq, 1), jnp.float32),          # running max
            pltpu.VMEM((Hq, 1), jnp.float32),          # running denom
            pltpu.VMEM((Hq, D), jnp.float32),          # running PV acc
            pltpu.VMEM((Hkv, GH, D), jnp.float32),     # staged q heads
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    pl.run_scoped(
        outer,
        pltpu.VMEM((Hq, B, D), jnp.float32),     # post-RoPE scaled q
        pltpu.VMEM((Hkv, B, D), jnp.float32),    # post-RoPE current k
        pltpu.VMEM((Hkv, B, D), jnp.float32),    # current v
        pltpu.VMEM((nb, 1), jnp.float32),
        pltpu.SMEM((nb, 1), jnp.float32),
        pltpu.SMEM((cap,), jnp.int32),
        pltpu.SemaphoreType.DMA(()),
        *extra,
        *attn_bufs,
    )


@functools.partial(jax.jit, static_argnames=("G", "cap", "depth",
                                             "norm_eps", "window",
                                             "n_heads", "fixed_sel"))
def attn_block(x3, thr, ws, cos, sin, kc_all, vc_all, layer, pos, *,
               G: int, cap: int, n_heads: int, depth: Optional[int] = None,
               norm3=None, norm_eps: float = 1e-5,
               window: Optional[int] = None, fixed_sel: bool = False):
    """One-launch attention block for single-token decode (batch 1).

    x3:   [nb, 1, 128] packed residual stream (RAW when norm3 is given,
          else already rms-normalized)
    thr:  [1] f32 group-score threshold
    ws:   (wq, wk, wv), each 2D [K, N] or layer-stacked 3D (+ `layer`);
          bf16/fp32 arrays or packed-int4 dicts
    cos/sin: [D] f32 RoPE rows at the current position
    kc_all/vc_all: [L, 1, Hkv, T, D] stacked caches (updated in place)
    layer, pos: traced int32 scalars

    Returns (attn [1, n_heads, 1, D] in the cache dtype, kc_all, vc_all).
    """
    L, B, Hkv, T, D = kc_all.shape
    assert B == 1 and D == LANES and T % ROWTILE == 0, kc_all.shape
    plans = _plan_weights(tuple(ws))
    if depth is None:
        from teal_tpu.ops.block_gemv import _pick_depth

        # the attention slabs share VMEM with the gather buffers here
        depth = _pick_depth(plans, G, budget=7 << 20)
    Ns = [p.N for p in plans]
    assert Ns == [n_heads * D, Hkv * D, Hkv * D], (Ns, n_heads, Hkv)
    flat = [a for p in plans for a in p.arrays]
    nb = x3.shape[0]
    C = _da.CHUNK if T % _da.CHUNK == 0 else T
    if C != T:
        # chunk buffers share VMEM with the gather slot buffers here:
        # halve the chunk until both double-buffered K/V slots fit ~4 MB
        # (many-KV-head models; e.g. 7B MHA Hkv=32 -> C=128)
        while (4 * Hkv * C * D * kc_all.dtype.itemsize > (4 << 20)
               and C % 2 == 0 and C > 128 and T % (C // 2) == 0):
            C //= 2
    if norm3 is not None and norm3.ndim == 3:
        # flatten the layer axis into the sublane dim (see _norm_fold)
        norm3 = norm3.reshape(-1, norm3.shape[-1])
    norm_ops = () if norm3 is None else (norm3,)
    cs = jnp.stack([jnp.asarray(cos, jnp.float32).reshape(D),
                    jnp.asarray(sin, jnp.float32).reshape(D)])[None]
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    pos = jnp.asarray(pos, jnp.int32).reshape(-1)[:1]

    kernel = functools.partial(
        _attn_block_kernel, G=G, plans=plans, nb=nb, cap=cap, depth=depth,
        norm=norm3 is not None, norm_eps=norm_eps, Hq=n_heads, Hkv=Hkv,
        T=T, D=D, C=C, window=window, scale=1.0 / (D ** 0.5),
        fixed_sel=fixed_sel,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,   # thr, layer, pos
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # x3
                  pl.BlockSpec(memory_space=pltpu.VMEM)]   # cos/sin
        + [pl.BlockSpec(memory_space=pl.ANY)
           for _ in (*norm_ops, *flat)]
        + [pl.BlockSpec(memory_space=pl.ANY),              # kc
           pl.BlockSpec(memory_space=pl.ANY)],             # vc
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
    )
    # flattened operand indices: thr 0, layer 1, pos 2, x3 3, cs 4,
    # [norm], *flat, kc, vc
    kc_idx = 5 + len(norm_ops) + len(flat)
    weight_bytes = cap * sum(
        (G // 2 if p.kind == "int4" else G) * p.N
        * p.arrays[0].dtype.itemsize
        for p in plans
    )
    out, kc_all, vc_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_heads, 1, D), jnp.float32),
            jax.ShapeDtypeStruct(kc_all.shape, kc_all.dtype),
            jax.ShapeDtypeStruct(vc_all.shape, vc_all.dtype),
        ],
        input_output_aliases={kc_idx: 1, kc_idx + 1: 2},
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * cap * G * sum(Ns) + 4 * n_heads * T * D,
            bytes_accessed=weight_bytes
            + 2 * Hkv * T * D * kc_all.dtype.itemsize,
            transcendentals=n_heads * T,
        ),
    )(jnp.asarray(thr, jnp.float32).reshape(1), layer, pos, x3, cs,
      *norm_ops, *flat, kc_all, vc_all)
    return (out.reshape(1, n_heads, 1, D).astype(kc_all.dtype),
            kc_all, vc_all)
