"""Whole-token decode kernel: every transformer layer in ONE Pallas launch.

The packed pipeline (models/llama.py:_packed_layer) already chains a
layer through 4 Pallas launches with zero XLA ops between them — but
each launch still pays a ~3.7 us head (measured, docs/KERNEL_NOTES.md
"Folded norms"), the in-kernel selection head (~1.9 us, measured with
`bench.py --fixed-selection`), and lands its packed activation rows in
HBM for the next launch to re-load. At 7B that is 4 launches x 32
layers = 128 heads ~= 0.5 ms of a ~10 ms token.

This kernel runs the WHOLE layer stack as one `pallas_call` with
`grid=(n_layers,)`: TPU grid steps execute sequentially on the core, so
the packed residual stream lives in a persistent VMEM scratch across
steps and each grid step is one transformer layer —

  1. fused attention block (`attn_block.attn_stage`: folded rms_norm,
     scalar-core threshold selection, pipelined QKV gather, RoPE,
     in-place stacked-cache write, chunked online-softmax attention)
  2. o-projection (+ residual add into the VMEM stream)
  3. gate/up pair (+ folded mlp rms_norm, silu*mul)
  4. down-projection (+ residual add)

One launch per token for the entire layer stack; activations never
leave VMEM; the layer index is `pl.program_id(0)` so all weights stay
layer-stacked `[L, K, N]` in HBM and each stage's gather DMAs slice
layer `i` directly (no XLA slicing anywhere).

Semantics are identical to the 4-launch packed pipeline (same unified
selection rule, same cast points; pinned by
tests/test_kernels.py::test_token_kernel_model_equivalence). The
reference has no analog — its decode step is ~450 separate CUDA
launches per token (gpt-fast eager mode) or a CUDA-graph replay of the
same; here the whole stack is one fused program.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from teal_tpu.ops import decode_attention as _da
from teal_tpu.ops.attn_block import attn_stage
from teal_tpu.ops.block_gemv import (LANES, SUBLANES, _gather_loop,
                                     _norm_fold, _norm_rows, _pick_depth,
                                     _plan_weights, _scoped_buffers,
                                     _select_scan, _slab_copy, _start_dmas)
from teal_tpu.ops.decode_attention import ROWTILE


def _proj_stage(thr, layer_ref, x_buf, out_write, plans, w_ref_groups, *,
                G: int, nb: int, cap: int, depth: int, norm_ref=None,
                norm_eps: float = 0.0, fixed_sel: bool = False,
                scale_ref=None):
    """One packed projection stage inside the token kernel: optional
    folded rms_norm -> threshold selection -> pipelined gather + MXU
    accumulate -> `out_write(acc, sbuf)` consumes the [8, n_tot] fp32
    accumulator (residual add / silu*mul / int8 per-channel scale /
    cast happen in the writer). x_buf is a VMEM buffer in the
    packed-row layout [nb, 1, 128].

    `scale_ref` (int8 weight-only mode): packed per-out-channel scales
    aligned with the accumulator's 128-lane column tiles (row j scales
    acc[:, j*128:(j+1)*128]); stacked [L*nbp, 128] f32. Its slab DMA
    starts before selection and is waited only in the writer."""
    offs = [0]
    for p in plans:
        offs.append(offs[-1] + p.N)
    nbs = _norm_rows(offs[-1] // LANES)

    def body(*scoped):
        if scale_ref is not None:
            sbuf, s2sem = scoped[-2:]
            scoped = scoped[:-2]
            _slab_copy(scale_ref, sbuf, s2sem, layer_ref, nbs).start()
        else:
            sbuf = None
        if norm_ref is not None:
            xn_ref, g_ref, gsem = scoped[-3:]
            scoped = scoped[:-3]
        scores_v, scores_s, idx_s, ssem = scoped[-4:]
        bufs, sems, acc = _unpack(scoped[:-4])
        if norm_ref is not None:
            _norm_fold(x_buf, norm_ref, xn_ref, g_ref, gsem, layer_ref,
                       nb=nb, G=G, norm_eps=norm_eps)
            x_ref = xn_ref
        else:
            x_ref = x_buf

        def ramp(slot, gidx):
            for wi, p in enumerate(plans):
                _start_dmas(p, w_ref_groups[wi], bufs[wi], sems[wi],
                            layer_ref, slot, gidx, G)

        count = _select_scan(thr, x_ref, scores_v, scores_s, idx_s, ssem,
                             nb=nb, cap=cap, fixed=fixed_sel,
                             ramp_start=ramp, ramp_depth=depth)
        _gather_loop(plans, w_ref_groups, bufs, sems, layer_ref, x_ref,
                     idx_s, count, acc, offs, G=G, cap=cap, depth=depth,
                     skip_ramp=True)
        if scale_ref is not None:
            _slab_copy(scale_ref, sbuf, s2sem, layer_ref, nbs).wait()
        out_write(acc, sbuf)

    scope_args, _unpack = _scoped_buffers(plans, G, depth, offs[-1],
                                          rows=max(x_buf.shape[1],
                                                   SUBLANES))
    extra = []
    if norm_ref is not None:
        extra += [pltpu.VMEM(x_buf.shape, x_buf.dtype),
                  pltpu.VMEM((_norm_rows(nb), LANES), norm_ref.dtype),
                  pltpu.SemaphoreType.DMA(())]
    if scale_ref is not None:
        extra += [pltpu.VMEM((nbs, LANES), jnp.float32),
                  pltpu.SemaphoreType.DMA(())]
    pl.run_scoped(
        body,
        *scope_args,
        pltpu.VMEM((nb, 1), jnp.float32),
        pltpu.SMEM((nb, 1), jnp.float32),
        pltpu.SMEM((cap,), jnp.int32),
        pltpu.SemaphoreType.DMA(()),
        *extra,
    )


def _moe_route(li_s, xn3_s, router_ref, wbuf, eidx_s, *, E: int,
               K_EXP: int, nbD: int):
    """In-kernel Mixtral routing: DMA layer li's packed router rows
    ([E*nbD, 128] f32, row e*nbD+g is expert e's weights for group g),
    score each expert on the VPU against the normalized stream, pick
    the top K_EXP (lowest-index tiebreak, matching jax.lax.top_k),
    softmax their logits into `wbuf` [K_EXP, 1], and land the expert
    ids in SMEM (`eidx_s`) for the expert-stack gather DMAs."""
    nbr = _norm_rows(E * nbD)
    neg = jnp.float32(-1e30)

    def body(rbuf, rsem, idxv, isem):
        _slab_copy(router_ref, rbuf, rsem, li_s, nbr).wait()
        xn = xn3_s[...][:, 0, :].astype(jnp.float32)       # [nbD, 128]
        logits = [
            jnp.sum(xn * rbuf[e * nbD:(e + 1) * nbD, :])
            for e in range(E)
        ]
        r = jnp.concatenate(
            [v.reshape(1, 1) for v in logits], axis=0)     # [E, 1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)
        taken = jnp.zeros((E, 1), jnp.bool_)
        vals, idxs = [], []
        for t in range(K_EXP):
            masked = jnp.where(taken, neg, r)
            m = jnp.max(masked)
            sel = (masked == m) & ~taken
            idx_t = jnp.min(jnp.where(sel, iota, E))
            taken = taken | (iota == idx_t)
            vals.append(m)
            idxs.append(idx_t)
        mx = vals[0]                       # vals descend: softmax anchor
        exps = [jnp.exp(v - mx) for v in vals]
        den = sum(exps)
        for t in range(K_EXP):
            wbuf[t:t + 1, :] = (exps[t] / den).reshape(1, 1)
        idxv[...] = jnp.concatenate(
            [i.reshape(1, 1) for i in idxs], axis=0)       # [K_EXP, 1]
        cp = pltpu.make_async_copy(idxv, eidx_s, isem)
        cp.start()
        cp.wait()

    def start_and_run(rbuf, rsem, idxv, isem):
        _slab_copy(router_ref, rbuf, rsem, li_s, nbr).start()
        body(rbuf, rsem, idxv, isem)

    pl.run_scoped(
        start_and_run,
        pltpu.VMEM((nbr, LANES), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
        pltpu.VMEM((K_EXP, 1), jnp.int32),
        pltpu.SemaphoreType.DMA(()),
    )


def _token_kernel(thr_ref, pos_ref, x3_ref, cs_ref, *refs, L: int, D: int,
                  I: int, Hq: int, Hkv: int, T: int, C: int,
                  window: Optional[int], norm_eps: float, caps, depths,
                  plan_groups, scale: float, fixed_sel: bool,
                  int8: bool = False, B: int = 1, rows: int = 1,
                  E: int = 0, K_EXP: int = 0, seq_block: bool = False):
    na_ref, nm_ref = refs[0], refs[1]
    k = 2
    if int8:
        s_refs = refs[k:k + 4]
        k += 4
    else:
        s_refs = (None,) * 4
    moe = E > 0
    if moe:
        router_ref = refs[k]
        k += 1
    w_groups = []   # per stage: one refs-tuple per weight operand
    for plans in plan_groups:
        grp = []
        for p in plans:
            grp.append(tuple(refs[k:k + p.n_dma]))
            k += p.n_dma
        w_groups.append(grp)
    kc_in, vc_in = refs[k], refs[k + 1]
    h3_out, kc_ref, vc_ref = refs[k + 2:k + 5]
    h3_s, attn3_s, inter3_s, li_s = refs[k + 5:k + 9]
    if moe:
        xn3_s, wbuf, eidx_s, le_s = refs[k + 9:k + 13]
    del kc_in, vc_in      # aliased: kc_ref/vc_ref are the same buffers

    li = pl.program_id(0)
    li_s[0] = li

    @pl.when(li == 0)
    def _():
        h3_s[...] = x3_ref[...]
        if rows > B:
            # batched: sublane rows >= B of the persistent packed
            # scratches are never written by the stages — zero them
            # once so pooled selection/MXU rows see zeros, not garbage
            attn3_s[...] = jnp.zeros_like(attn3_s)
            inter3_s[...] = jnp.zeros_like(inter3_s)

    nbD, nbI = D // LANES, I // LANES

    # --- stage 1: fused attention block -> attn3_s (cache dtype) ---
    attn_stage(thr_ref[li, 0], li_s,
               tuple(pos_ref[b] for b in range(B)),
               h3_s, cs_ref, na_ref,
               w_groups[0], kc_ref, vc_ref, attn3_s,
               G=LANES, plans=plan_groups[0], nb=nbD, cap=caps[0],
               depth=depths[0], norm_eps=norm_eps, Hq=Hq, Hkv=Hkv,
               T=T, D=LANES, C=C, window=window, scale=scale,
               fixed_sel=fixed_sel, scale_ref=s_refs[0],
               cache_rows=((0,) * B if seq_block else tuple(range(B))))

    def write_residual(acc, sb):
        """o/down writer: (scaled) accumulator rows + residual stream,
        cast back into the packed VMEM stream (same op order as
        `fused_select_gather_packed`'s out_packed+res path). Rows are
        batch elements; rows >= B carry zeros through (zero x -> zero
        acc -> zero residual)."""
        for j in range(nbD):
            row = acc[0:rows, j * LANES:(j + 1) * LANES]
            if sb is not None:
                row = row * sb[j:j + 1, :]
            h3_s[j] = (row + h3_s[j].astype(jnp.float32)) \
                .astype(h3_s.dtype)

    # --- stage 2: o-proj, residual add into the stream ---
    _proj_stage(thr_ref[li, 3], li_s, attn3_s, write_residual,
                plan_groups[1],
                w_groups[1], G=LANES, nb=nbD, cap=caps[1],
                depth=depths[1], fixed_sel=fixed_sel,
                scale_ref=s_refs[1])

    # --- stage 3: gate/up pair (folded mlp norm), silu*mul ---
    def write_gu(acc, sb):
        for j in range(nbI):
            g_ = acc[0:rows, j * LANES:(j + 1) * LANES]
            u_ = acc[0:rows, I + j * LANES:I + (j + 1) * LANES]
            if sb is not None:
                g_ = g_ * sb[j:j + 1, :]
                u_ = u_ * sb[nbI + j:nbI + j + 1, :]
            inter3_s[j] = (g_ * (1.0 / (1.0 + jnp.exp(-g_))) * u_) \
                .astype(inter3_s.dtype)

    if moe:
        # --- MoE MLP (Mixtral): fold the mlp norm once, route on the
        # VPU, then run each of the K_EXP routed experts through the
        # same capped-gather stage machinery, combining with the
        # softmax routing weights. The expert stacks are [L*E, K, N];
        # expert e of layer li is pseudo-layer li*E + e.
        #
        # Round 5: the expert FFNs are TEAL-SPARSE — BEYOND the
        # reference, whose mixtral-moe engine has no TEAL hooks
        # (SURVEY §2.3). gate/up select on the shared normalized
        # stream with the mlp-h1 threshold (identical kept set for
        # every routed expert — one rule, per-expert gathers); down
        # selects per expert on its own intermediate with the h2
        # threshold. caps==full + zero thresholds degenerate to the
        # previous dense-expert behavior (the XLA twin is
        # models/moe.py::moe_ffn with the same sparsify_groups rule).
        def fold(g_ref, gsem):
            _norm_fold(h3_s, nm_ref, xn3_s, g_ref, gsem, li_s,
                       nb=nbD, G=LANES, norm_eps=norm_eps)

        pl.run_scoped(fold,
                      pltpu.VMEM((_norm_rows(nbD), LANES), nm_ref.dtype),
                      pltpu.SemaphoreType.DMA(()))
        _moe_route(li_s, xn3_s, router_ref, wbuf, eidx_s,
                   E=E, K_EXP=K_EXP, nbD=nbD)
        for t in range(K_EXP):
            le_s[0] = li * E + eidx_s[t, 0]

            def write_down_weighted(acc, sb, t=t):
                for j in range(nbD):
                    row = acc[0:rows, j * LANES:(j + 1) * LANES]
                    if sb is not None:   # int8 per-out-channel scale
                        row = row * sb[j:j + 1, :]
                    h3_s[j] = (row * wbuf[t:t + 1, :]
                               + h3_s[j].astype(jnp.float32)) \
                        .astype(h3_s.dtype)

            # int8 MoE: the expert scale stacks are per-PSEUDO-layer
            # [(L*E)*nbs, 128] slabs, so le_s indexes weight gather and
            # scale slab consistently
            _proj_stage(thr_ref[li, 4], le_s, xn3_s, write_gu,
                        plan_groups[2],
                        w_groups[2], G=LANES, nb=nbD, cap=caps[2],
                        depth=depths[2], fixed_sel=fixed_sel,
                        scale_ref=s_refs[2])
            _proj_stage(thr_ref[li, 6], le_s, inter3_s,
                        write_down_weighted,
                        plan_groups[3], w_groups[3], G=LANES, nb=nbI,
                        cap=caps[3], depth=depths[3],
                        fixed_sel=fixed_sel,
                        scale_ref=s_refs[3])
    else:
        _proj_stage(thr_ref[li, 4], li_s, h3_s, write_gu, plan_groups[2],
                    w_groups[2], G=LANES, nb=nbD, cap=caps[2],
                    depth=depths[2], norm_ref=nm_ref, norm_eps=norm_eps,
                    fixed_sel=fixed_sel, scale_ref=s_refs[2])

        # --- stage 4: down-proj, residual add ---
        _proj_stage(thr_ref[li, 6], li_s, inter3_s, write_residual,
                    plan_groups[3],
                    w_groups[3], G=LANES, nb=nbI, cap=caps[3],
                    depth=depths[3], fixed_sel=fixed_sel,
                    scale_ref=s_refs[3])

    @pl.when(li == L - 1)
    def _():
        h3_out[...] = h3_s[...]


@functools.partial(jax.jit, static_argnames=("caps", "n_heads", "norm_eps",
                                             "window", "fixed_sel",
                                             "batch", "n_experts_per_tok",
                                             "seq_block"))
def token_decode(x3, thresholds, ws, norm_attn3, norm_mlp3, cos, sin,
                 kc_all, vc_all, pos, *, caps, n_heads: int,
                 norm_eps: float = 1e-5, window: Optional[int] = None,
                 fixed_sel: bool = False, batch: int = 1,
                 router=None, n_experts_per_tok: int = 0,
                 seq_block: bool = False):
    """One-launch decode of the whole layer stack (batch <= 8, G == 128).

    x3:  packed RAW residual stream: [dim/128, 1, 128] (batch 1) or
         [dim/128, 8, 128] with batch b in sublane row b (`pack_x3_rows`)
    thresholds: [L, 7] f32 per-layer calibrated group thresholds
    ws:  (wq, wk, wv, wo, wgate, wup, wdown), each layer-stacked
         [L, K, N] (bf16/fp32 arrays, int8 {"q","scale"} dicts, or
         packed-int4 dicts)
    norm_attn3/norm_mlp3: packed stacked rms_norm gains (`pack_norm3`)
    cos/sin: [D_head] (batch 1) or [B, D_head] f32 RoPE rows at each
         sequence's position
    kc_all/vc_all: [L, B, Hkv, T, 128] stacked caches, updated in place
    pos: traced int32 positions, scalar or [B] (continuous batching:
         each sequence decodes at its own depth)
    caps: static per-stage gather capacities (qkv, o, gate/up, down) —
         batched selection pools the group score over the batch
         (`select_groups_batched` semantics), one shared kept set

    seq_block: the `batch` rows are CONSECUTIVE POSITIONS pos..pos+B-1
    of ONE sequence (cache batch dim must be 1) — the speculative-verify
    / chunked-prefill shape. Slots run in order, so row i attends to
    rows < i through the cache (attn_block.attn_stage cache_rows).

    Returns (h3' in x3's layout, kc_all, vc_all).
    """
    L, Bc, Hkv, T, Dh = kc_all.shape
    assert (Bc == 1 if seq_block else Bc >= batch) \
        and Dh == LANES and T % ROWTILE == 0, kc_all.shape
    rows = x3.shape[1]
    # 16 rows = the single-launch B <= 16 decode: the MXU lhs spans two
    # sublane tiles, weights stream ONCE for all 16 sequences
    assert rows == (1 if batch == 1 else
                    SUBLANES if batch <= SUBLANES else 2 * SUBLANES), \
        (x3.shape, batch)
    nbD = x3.shape[0]
    D = nbD * LANES
    assert n_heads * Dh == D, (n_heads, D)

    def _is_int8(w):
        # {"q","scale"} per-out-channel int8 — NOT packed int4 ("qp")
        # and NOT unpacked int4 ("zero": groupwise affine, XLA path)
        return (isinstance(w, dict) and "q" in w and "qp" not in w
                and "zero" not in w)

    moe = router is not None
    if moe:
        # Mixtral: expert stacks [L, E, K, N] flatten to [L*E, K, N] —
        # expert e of layer li is pseudo-layer li*E + e for the gather
        # DMAs; the packed router rides as one extra ANY operand. int8
        # expert dicts flatten q the same way and their per-out-channel
        # scales become per-PSEUDO-layer slabs (the stage writers index
        # the scale stack by the same layer_ref as the weight gather)
        assert batch == 1 and n_experts_per_tok > 0
        w4q = ws[4]["q"] if isinstance(ws[4], dict) else ws[4]
        E = w4q.shape[1]

        def _flat_e(w):
            if isinstance(w, dict):
                return {"q": w["q"].reshape(L * E, *w["q"].shape[2:]),
                        "scale": w["scale"].reshape(
                            L * E, w["scale"].shape[-1])}
            return w.reshape(L * E, *w.shape[2:])

        ws = (*ws[:4], *(_flat_e(w) for w in ws[4:7]))
        nbr = E * nbD
        rp = jnp.swapaxes(jnp.asarray(router, jnp.float32), 1, 2)
        rp = rp.reshape(L, nbr, LANES)                 # [L, E*nbD, 128]
        padr = _norm_rows(nbr) - nbr
        if padr:
            rp = jnp.pad(rp, ((0, 0), (0, padr), (0, 0)))
        rp_ops = (rp.reshape(-1, LANES),)
    else:
        E = 0
        rp_ops = ()

    int8 = any(_is_int8(w) for w in ws)
    if int8:
        assert all(_is_int8(w) for w in ws), \
            "int8 token kernel needs all seven projections int8"
        from teal_tpu.ops.block_gemv import pack_norm3

        def pack_s(*scales):
            # per-out-channel scales, concatenated along the stage's
            # accumulator columns and packed so row j scales the
            # accumulator's j-th 128-lane column tile
            cat = jnp.concatenate(
                [jnp.asarray(s, jnp.float32) for s in scales], axis=-1)
            return pack_norm3(cat, LANES).reshape(-1, LANES)

        s_ops = (pack_s(ws[0]["scale"], ws[1]["scale"], ws[2]["scale"]),
                 pack_s(ws[3]["scale"]),
                 pack_s(ws[4]["scale"], ws[5]["scale"]),
                 pack_s(ws[6]["scale"]))
        ws = tuple(w["q"] for w in ws)
    else:
        s_ops = ()
    plan_groups = (
        _plan_weights(tuple(ws[0:3])),     # q, k, v
        _plan_weights((ws[3],)),           # o
        _plan_weights(tuple(ws[4:6])),     # gate, up
        _plan_weights((ws[6],)),           # down
    )
    I = plan_groups[2][0].N
    nbI = I // LANES
    depths = tuple(
        _pick_depth(plans, LANES, budget=(7 << 20) if gi == 0 else 9 << 20)
        for gi, plans in enumerate(plan_groups)
    )
    flat = [a for plans in plan_groups for p in plans for a in p.arrays]

    C = _da.CHUNK if T % _da.CHUNK == 0 else T
    if C != T:
        while (4 * Hkv * C * Dh * kc_all.dtype.itemsize > (4 << 20)
               and C % 2 == 0 and C > 128 and T % (C // 2) == 0):
            C //= 2

    na = norm_attn3.reshape(-1, norm_attn3.shape[-1])
    nm = norm_mlp3.reshape(-1, norm_mlp3.shape[-1])
    cs = jnp.stack([jnp.asarray(cos, jnp.float32).reshape(batch, Dh),
                    jnp.asarray(sin, jnp.float32).reshape(batch, Dh)],
                   axis=1)                              # [B, 2, Dh]
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1),
                           (batch,))

    kernel = functools.partial(
        _token_kernel, L=L, D=D, I=I, Hq=n_heads, Hkv=Hkv, T=T, C=C,
        window=window, norm_eps=norm_eps, caps=tuple(caps), depths=depths,
        plan_groups=plan_groups, scale=1.0 / (Dh ** 0.5),
        fixed_sel=fixed_sel, int8=int8, B=batch, rows=rows,
        E=E, K_EXP=n_experts_per_tok, seq_block=seq_block,
    )
    moe_scratch = [] if not moe else [
        pltpu.VMEM((nbD, rows, LANES), x3.dtype),         # normalized xn
        pltpu.VMEM((n_experts_per_tok, 1), jnp.float32),  # routing w
        pltpu.SMEM((n_experts_per_tok, 1), jnp.int32),    # expert ids
        pltpu.SMEM((1,), jnp.int32),                      # pseudo-layer
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # thresholds [L, 7], pos [1]
        grid=(L,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),     # x3
                  pl.BlockSpec(memory_space=pltpu.VMEM)]     # cos/sin
        + [pl.BlockSpec(memory_space=pl.ANY)]
        * (2 + len(s_ops) + len(rp_ops) + len(flat) + 2),
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),           # h3'
            pl.BlockSpec(memory_space=pl.ANY),               # kc
            pl.BlockSpec(memory_space=pl.ANY),               # vc
        ],
        scratch_shapes=[
            pltpu.VMEM((nbD, rows, LANES), x3.dtype),         # h3 stream
            pltpu.VMEM((n_heads, rows, LANES), kc_all.dtype),  # attn rows
            pltpu.VMEM((nbI, rows, LANES), x3.dtype),         # mlp inter
            pltpu.SMEM((1,), jnp.int32),                      # layer idx
        ] + moe_scratch,
    )
    # flattened operand indices: thr 0, pos 1, x3 2, cs 3, norms 4-5,
    # [int8 scales], [moe router], *flat, kc, vc
    kc_idx = 6 + len(s_ops) + len(rp_ops) + len(flat)
    weight_bytes = sum(
        cap * sum((LANES // 2 if p.kind == "int4" else LANES) * p.N
                  * p.arrays[0].dtype.itemsize for p in plans)
        for cap, plans in zip(
            (caps[0], caps[1], caps[2], caps[3]), plan_groups)
    )
    h3_out, kc_all, vc_all = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nbD, rows, LANES), x3.dtype),
            jax.ShapeDtypeStruct(kc_all.shape, kc_all.dtype),
            jax.ShapeDtypeStruct(vc_all.shape, vc_all.dtype),
        ],
        input_output_aliases={kc_idx: 1, kc_idx + 1: 2},
        cost_estimate=pl.CostEstimate(
            flops=L * (2 * SUBLANES * LANES
                       * (caps[0] * (D + 2 * Hkv * Dh) + caps[1] * D
                          + caps[2] * 2 * I + caps[3] * D)
                       + 4 * n_heads * T * Dh),
            bytes_accessed=L * (weight_bytes
                                + 2 * Hkv * T * Dh
                                * kc_all.dtype.itemsize),
            transcendentals=L * (n_heads * T + I),
        ),
    )(thresholds.astype(jnp.float32), pos, x3, cs, na, nm, *s_ops,
      *rp_ops, *flat, kc_all, vc_all)
    return h3_out, kc_all, vc_all
