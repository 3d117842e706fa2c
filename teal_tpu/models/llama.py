"""Functional Llama/Mistral transformer for activation-sparse inference.

One model serves calibration, accuracy eval, and fast decode (the reference
splits these across an HF-monkeypatch stack (`teal/model.py`) and a vendored
gpt-fast fork (`gpt-fast/model.py`); here they are the same forward under
different jit entry points).

Design notes (TPU-first):
  - Parameters are a pytree of *stacked* per-layer arrays (`[L, ...]`) and
    the layer loop is a `lax.scan`, keeping compile time flat in depth.
  - The KV cache is part of the scan carry and updated in place with
    `dynamic_update_slice`; callers donate it for buffer reuse.
  - Sparsity enters functionally: a `[L, 7]` threshold array (order
    `config.PROJS`) and a static `SparsityConfig`. Thresholds are data, so
    uniform vs. greedy (per-layer, per-projection) schedules need no
    retracing.
  - Norms, RoPE and softmax run in fp32; matmuls in the param dtype
    (bf16 by default) with fp32 accumulation via `preferred_element_type`.
  - RoPE uses the HF rotate-half convention so HF safetensors load without
    the reference's un-permutation step
    (`gpt-fast/scripts/convert_hf_checkpoint.py:75-81`).

Capture mode returns the four TEAL hidden-state groups per layer
(attn h1/h2, mlp h1/h2; reference `teal/self_attn.py:70-84,146-151`,
`teal/mlp.py:43-48`) for histogram calibration.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from teal_tpu.config import ModelConfig, PROJS, SparsityConfig
from teal_tpu.ops.sparsify import apply_sparsity
from teal_tpu.ops import sparse_gemv


class KVCache(NamedTuple):
    """Static-shape decode cache. k/v: [L, B, n_kv_heads, max_seq, head_dim]."""

    k: jax.Array
    v: jax.Array

    @classmethod
    def init(cls, cfg: ModelConfig, batch: int, max_seq: int,
             dtype=jnp.bfloat16, n_kv_heads: Optional[int] = None):
        hkv = cfg.n_kv_heads if n_kv_heads is None else n_kv_heads
        shape = (cfg.n_layers, batch, hkv, max_seq, cfg.head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]


def rms_norm(x, weight, eps: float):
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale).astype(x.dtype) * weight.astype(x.dtype)


def precompute_rope(cfg: ModelConfig, max_seq: int):
    """cos/sin tables [max_seq, head_dim] (fp32), HF half-split convention."""
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (
        cfg.rope_base ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    t = jnp.arange(max_seq, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                  # [S, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [S, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x, cos, sin):
    """x: [B, H, S, D]; cos/sin: [B, S, D] (gathered at each sequence's
    positions — per-sequence positions support continuous batching)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    xf = x.astype(jnp.float32)
    rf = rotated.astype(jnp.float32)
    c = cos[:, None]  # [B, 1, S, D] broadcasts over heads
    sn = sin[:, None]
    return (xf * c + rf * sn).astype(x.dtype)


def _proj(x, w, thresh, sp: SparsityConfig, *, proj: str):
    """One of the seven sparsifiable projections: sparsify then matmul.

    Dispatch: the Pallas sparse-GEMV kernels take over for single-token
    decode when `sp.kernel` selects them; otherwise (prefill, accuracy path)
    this is a masked-dense matmul, matching reference semantics where
    prefill is dense in the fast engine (`kernels/sparse_gemv.py:271`).
    `w` may be a raw array or an int8 weight-only dict {"q", "scale"}.
    """
    import math

    quantized = isinstance(w, dict)
    is_int4 = quantized and "zero" in w          # unpacked {"q","scale","zero"}
    is_int4_packed = quantized and "qp" in w     # kernel layout {"qp","sz"}
    if (is_int4_packed and x.shape[-2] == 1
            and math.prod(x.shape[:-1]) == 1):
        # packed int4 decode always rides the gather kernel (see
        # layer_forward: the XLA unpack path rematerializes bf16 weights)
        from teal_tpu.ops import quant
        sparse = sp.enabled and sp.kernel == "block"
        return quant.int4_block_sparse_matmul(
            x, w, sp.block_size,
            sp.block_keep_frac if sparse else 1.0,
            threshold=thresh if (sparse and sp.block_thresholding) else None,
        )
    if sp.enabled and x.shape[-2] == 1 and sp.kernel != "masked_dense":
        if quantized and not is_int4 and not is_int4_packed \
                and sp.kernel == "block":
            from teal_tpu.ops import quant
            return quant.int8_block_sparse_matmul(
                x, quant.Int8Weight(w["q"], w["scale"]),
                sp.block_size, sp.block_keep_frac,
            )
        if not quantized:
            return sparse_gemv.sparse_matmul(x, w, thresh, sp)
    xs = apply_sparsity(x, thresh, sp)
    if is_int4_packed:
        from teal_tpu.ops import quant
        return quant.int4_packed_matmul(xs, w)
    if is_int4:
        from teal_tpu.ops import quant
        return quant.int4_dict_matmul(xs, w)
    if quantized:
        from teal_tpu.ops import quant
        return quant.int8_matmul(xs, quant.Int8Weight(w["q"], w["scale"]))
    return jnp.matmul(xs, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _flash_prefill_attention(q, k_new, v_new):
    """Fused causal prefill attention (Pallas TPU flash kernel) for the
    pos==0 full-prompt case: q/k/v cover positions 0..S, so plain causal
    masking is exact and the [S, T] fp32 score matrix (537 MB at 7B/2k)
    is never materialized. q: [B, Hq, S, D]; k/v: [B, Hkv, S, D]."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    g = q.shape[1] // k_new.shape[1]
    k = jnp.repeat(k_new, g, axis=1)
    v = jnp.repeat(v_new, g, axis=1)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    return fa.flash_attention(q, k, v, causal=True, sm_scale=scale)


def _can_flash_prefill(s: int, head_dim: int, sliding_window) -> bool:
    """Static gate for the flash prefill path: TPU backend, no sliding
    window (Mistral keeps the einsum path), and flash-tileable shapes."""
    return (
        sliding_window is None
        and s >= 256 and s % 128 == 0
        and head_dim % 128 == 0
        and jax.default_backend() not in ("cpu",)
    )


def _can_fused_decode(s: int, b: int, cfg: ModelConfig, max_seq: int,
                      sp: SparsityConfig, block_path: bool) -> bool:
    """Static gate for the fused decode-attention kernel
    (ops/decode_attention.py): single-token decode, kernel-tileable
    shapes. Auto mode (None) additionally requires a single non-CPU
    device — under GSPMD/TP the cache is head-sharded and the Pallas call
    must not be introduced silently — AND the block-kernel projection
    path (sparse or packed-int4): in the dense-XLA program, XLA's MSA
    pass promotes the whole KV cache to VMEM around the attention custom
    call and round-trips it per layer (measured 53.6 -> 40.7 tok/s on
    7B); the block-kernel programs don't hit the pathology and the fused
    path is their best measured config (95.05 vs 94.66 tok/s at 50%)."""
    if sp.fused_decode_attention is False:
        return False
    ok = (s == 1 and b <= 16 and cfg.head_dim == 128 and max_seq % 8 == 0
          and cfg.n_heads % cfg.n_kv_heads == 0)
    if not ok:
        return False
    if sp.fused_decode_attention:
        return True
    return (block_path and jax.default_backend() != "cpu"
            and jax.device_count() == 1)


def _attention(q, k, v, pos, q_len: int, max_seq: int,
               sliding_window: Optional[int]):
    """Grouped-query attention over the full static cache.

    q: [B, Hq, S, D]; k/v: [B, Hkv, T, D] (T = max_seq cache length).
    `pos` [B] is each sequence's first query position. Invalid (future or
    beyond-window) cache slots are masked out; GQA is computed by reshaping
    q to [B, Hkv, G, S, D] so KV heads are never materialized G times
    (unlike the reference's `repeat_interleave`, `gpt-fast/model.py:247-248`).
    """
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    q = q.reshape(b, hkv, g, s, d)
    scale = 1.0 / (d ** 0.5)

    scores = jnp.einsum(
        "bkgsd,bktd->bkgst", q, k, preferred_element_type=jnp.float32
    ) * scale

    q_pos = pos[:, None] + jnp.arange(s)[None, :]   # [B, S]
    t_pos = jnp.arange(max_seq)[None, None, :]      # [1, 1, T]
    valid = t_pos <= q_pos[:, :, None]              # [B, S, T]
    if sliding_window is not None:
        valid &= t_pos > (q_pos[:, :, None] - sliding_window)
    scores = jnp.where(valid[:, None, None], scores, -jnp.inf)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgst,bktd->bkgsd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, hq, s, d).astype(v.dtype)


def layer_forward(h, lp: Dict[str, jax.Array], kc, vc, pos, cos, sin,
                  cfg: ModelConfig, sp: SparsityConfig, thresholds,
                  capture: bool = False, stacked=None, layer_idx=None,
                  causal_prefill: bool = False, stacked_cache: bool = False,
                  seq_axis: Optional[str] = None, packed_norms=None):
    """One transformer block. h: [B, S, D]; kc/vc: [B, Hkv, T, Dh] — or,
    with `stacked_cache=True` (fused decode attention), the full
    [L, B, Hkv, T, Dh] stacked caches (requires `layer_idx`).

    `seq_axis`: sequence-parallel prefill (parallel/sp.py) — h holds this
    device's contiguous chunk of the prompt and `pos` its global chunk
    start; K/V chunks are all-gathered over the axis and the full block
    written to the (replicated) cache, while local queries attend
    causally against it.

    thresholds: [7] per-projection scalars (order `config.PROJS`).
    `stacked`/`layer_idx`: the UN-sliced layer-stacked weight dict plus
    this layer's index — required for the block kernel inside a
    scan-over-layers (the kernel gathers [layer, group] slabs directly;
    slicing stacked weights outside a Pallas call would materialize a full
    per-layer weight copy every step).
    Returns (h_out, kc, vc, captures|None).
    """
    b, s, d = h.shape
    pos = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(pos, jnp.int32)), (b,))
    if cos.ndim == 2:  # shared positions: broadcast over batch
        cos = jnp.broadcast_to(cos[None], (b,) + cos.shape)
        sin = jnp.broadcast_to(sin[None], (b,) + sin.shape)
    t = {p: thresholds[i] for i, p in enumerate(PROJS)}
    # block-kernel fast path: single-token decode, batch <= 8 (batch > 1
    # rides the MXU lhs rows for free with a batch-pooled shared group
    # selection — beyond the reference's batch-1-only engine).
    # Packed-int4 weights ALWAYS decode through the gather kernel (at
    # full capacity when sparsity is off): the XLA dense path would
    # rematerialize the unpacked [K, N] bf16 weights every token
    # (measured 9 tok/s vs 168 through the kernel on 7B).
    is_int4_packed = isinstance(lp["wq"], dict) and "qp" in lp["wq"]
    sparse_block = sp.enabled and sp.kernel == "block"
    use_block = (s == 1 and b <= 8
                 and (sparse_block or is_int4_packed))

    def stacked_w(name):
        """Weight for the block kernel: stacked 3D when available."""
        if stacked is None:
            return lp[name]
        w = stacked[name]
        if isinstance(w, dict) and "qp" in w:
            return {"qp": w["qp"], "sz": w["sz"]}   # kernel handles layer
        if isinstance(w, dict):
            return {"q": w["q"], "scale": lp[name]["scale"]}
        return w

    li = layer_idx if stacked is not None else None

    # rms_norm fold: in threshold mode the norm runs inside the fused
    # select+gather kernel (packed gains built once per forward call) —
    # the two per-layer XLA norm dispatches disappear from the scan body
    fold = (use_block and b == 1 and sparse_block and sp.block_thresholding
            and not capture and packed_norms is not None)

    # --- attention ---
    # attn h1 (normalized in-kernel when folded; capture never folds)
    x = None if fold else rms_norm(h, lp["attn_norm"], cfg.norm_eps)
    if sparse_block:
        kf = sp.block_keep_fracs or (sp.block_keep_frac,) * 7
    else:
        kf = (1.0,) * 7   # int4-dense-via-kernel: read every group

    def bt(name):
        """Group-score threshold for a projection (threshold mode only;
        batched decode applies it to the batch-pooled group score)."""
        return t[name] if (sparse_block and sp.block_thresholding) else None

    def blockproj(inp, names, frac, thr, norm3=None):
        """Block-sparse projections for 1 <= b <= 8 single-token inputs."""
        from teal_tpu.ops import block_gemv

        ws = [stacked_w(n) for n in names]
        if b == 1:
            return block_gemv.project_many(
                inp, ws, sp.block_size, frac, layer=li, threshold=thr,
                norm3=norm3, norm_eps=cfg.norm_eps,
            )
        outs = block_gemv.project_many_batched(
            inp.reshape(b, inp.shape[-1]), ws, sp.block_size, frac,
            layer=li, threshold=thr,
        )
        return [o.reshape(b, 1, -1) for o in outs]

    # fused attention block (ops/attn_block.py): norm + select + QKV
    # gather + RoPE + cache write + attention in ONE launch — q/k/v never
    # exist as XLA values. Falls back to the two-kernel path otherwise.
    mega = (fold and stacked_cache and kf[0] == kf[1] == kf[2]
            and cfg.head_dim == 128
            and not (isinstance(lp["wq"], dict) and "q" in lp["wq"])
            and sp.fused_attn_block is not False)
    if mega:
        from teal_tpu.ops import attn_block as _ab
        from teal_tpu.ops import block_gemv as _bg

        ws = [stacked_w(n) for n in ("wq", "wk", "wv")]
        K = h.shape[-1]
        Gq = _bg._shared_group_size(ws, sp.block_size, K)
        nbq = K // Gq
        capq = max(1, min(nbq, int(round(nbq * kf[0]))))
        attn, kc, vc = _ab.attn_block(
            _bg.pack_x3(h.reshape(1, K), Gq), bt("q"), ws,
            cos[0, 0], sin[0, 0], kc, vc, li, pos,
            G=Gq, cap=capq, n_heads=cfg.n_heads,
            norm3=packed_norms["attn"], norm_eps=cfg.norm_eps,
            window=cfg.sliding_window,
        )
    elif fold:
        n3 = packed_norms["attn"]
        if kf[0] == kf[1] == kf[2]:
            q, k, v = blockproj(h, ["wq", "wk", "wv"], kf[0], bt("q"), n3)
        else:
            (q,) = blockproj(h, ["wq"], kf[0], bt("q"), n3)
            (k,) = blockproj(h, ["wk"], kf[1], bt("k"), n3)
            (v,) = blockproj(h, ["wv"], kf[2], bt("v"), n3)
    elif use_block:
        if kf[0] == kf[1] == kf[2]:
            q, k, v = blockproj(x, ["wq", "wk", "wv"], kf[0], bt("q"))
        else:
            # per-projection greedy profile: separate capacities
            (q,) = blockproj(x, ["wq"], kf[0], bt("q"))
            (k,) = blockproj(x, ["wk"], kf[1], bt("k"))
            (v,) = blockproj(x, ["wv"], kf[2], bt("v"))
    else:
        q = _proj(x, lp["wq"], t["q"], sp, proj="q")
        k = _proj(x, lp["wk"], t["k"], sp, proj="k")
        v = _proj(x, lp["wv"], t["v"], sp, proj="v")

    if not mega:   # mega computed attn/kc/vc inside the fused block kernel
        q = q.reshape(b, s, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        hkv_local = kc.shape[2] if stacked_cache else kc.shape[1]
        k = k.reshape(b, s, hkv_local, cfg.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, hkv_local, cfg.head_dim).transpose(0, 2, 1, 3)

        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        if stacked_cache:
            # fused decode attention: kc/vc are the FULL [L, B, H, T, D]
            # stacked caches — the kernel writes the current token in place
            # (aliased input->output) and streams layer `layer_idx`'s slab
            # straight from HBM. No XLA update/copy ever touches the cache:
            # a host-side dynamic_update_slice here makes XLA's memory-space
            # assignment round-trip the whole cache through VMEM per layer
            # (see ops/decode_attention.py module docstring).
            from teal_tpu.ops.decode_attention import decode_attention

            attn, kc, vc = decode_attention(q, k, v, kc, vc, layer_idx, pos,
                                            window=cfg.sliding_window)
        else:
            upd = jax.vmap(
                lambda c, new, p: jax.lax.dynamic_update_slice(
                    c, new, (0, p, 0))
            )
            if seq_axis is not None:
                # sequence-parallel prefill: gather every device's K/V chunk
                # (S-dim concat over the mesh axis) and write the full block
                # at the prompt base position — the cache stays replicated
                # while activations/queries remain S-sharded
                base = pos - jax.lax.axis_index(seq_axis) * s
                kc = upd(kc, jax.lax.all_gather(
                    k, seq_axis, axis=2, tiled=True).astype(kc.dtype), base)
                vc = upd(vc, jax.lax.all_gather(
                    v, seq_axis, axis=2, tiled=True).astype(vc.dtype), base)
            else:
                kc = upd(kc, k.astype(kc.dtype), pos)
                vc = upd(vc, v.astype(vc.dtype), pos)

            if (causal_prefill and s > 1 and seq_axis is None
                    and _can_flash_prefill(s, cfg.head_dim,
                                           cfg.sliding_window)):
                # pos==0 full-prompt prefill: fused flash kernel over the
                # fresh k/v (identical to masked attention over the
                # zero-initialized cache — invalid slots past S are masked
                # out either way)
                attn = _flash_prefill_attention(q, k.astype(kc.dtype),
                                                v.astype(vc.dtype))
            else:
                attn = _attention(q, kc, vc, pos, s, kc.shape[2],
                                  cfg.sliding_window)
    # attn h2 — cast back to the stream dtype (a cache dtype wider than
    # the compute dtype, e.g. fp32 cache + int8/bf16 weights, would
    # otherwise promote the residual stream and break the scan carry)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, -1).astype(h.dtype)
    if use_block:
        (o_out,) = blockproj(attn, ["wo"], kf[3], bt("o"))
        h = h + o_out
    else:
        h = h + _proj(attn, lp["wo"], t["o"], sp, proj="o")

    # --- mlp ---
    # mlp h1 (MoE routing always needs the normalized tensor explicitly)
    y = (None if (fold and cfg.n_experts == 0)
         else rms_norm(h, lp["mlp_norm"], cfg.norm_eps))
    if cfg.n_experts > 0:
        # Mixtral MoE FFN — round 5: TEAL-sparse expert gathers on the
        # decode path (beyond the reference, whose mixtral-moe engine
        # has no TEAL hooks; SURVEY §2.3). Prefill stays dense.
        from teal_tpu.models import moe

        h = h + moe.moe_ffn(y, lp, cfg, sp=sp, th_gu=t["gate"],
                            th_down=t["down"])
        caps = None
        if capture:
            # attention groups + the shared MoE FFN input (mlp h1).
            # Per-expert intermediates (the dense model's mlp h2) have no
            # single shared tensor; calibration skips that histogram
            # (beyond-reference: upstream has zero MoE-TEAL integration).
            caps = {"self_attn": {"h1": x, "h2": attn},
                    "mlp": {"h1": y}}
        return h, kc, vc, caps
    if fold:
        n3m = packed_norms["mlp"]
        if kf[4] == kf[5]:
            gate, up = blockproj(h, ["wgate", "wup"], kf[4], bt("gate"), n3m)
        else:
            (gate,) = blockproj(h, ["wgate"], kf[4], bt("gate"), n3m)
            (up,) = blockproj(h, ["wup"], kf[5], bt("up"), n3m)
    elif use_block:
        if kf[4] == kf[5]:
            gate, up = blockproj(y, ["wgate", "wup"], kf[4], bt("gate"))
        else:
            (gate,) = blockproj(y, ["wgate"], kf[4], bt("gate"))
            (up,) = blockproj(y, ["wup"], kf[5], bt("up"))
    else:
        gate = _proj(y, lp["wgate"], t["gate"], sp, proj="gate")
        up = _proj(y, lp["wup"], t["up"], sp, proj="up")
    inter = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
    # `inter` is mlp h2
    if use_block:
        (d_out,) = blockproj(inter, ["wdown"], kf[6], bt("down"))
        h = h + d_out
    else:
        h = h + _proj(inter, lp["wdown"], t["down"], sp, proj="down")

    caps = None
    if capture:
        caps = {"self_attn": {"h1": x, "h2": attn},
                "mlp": {"h1": y, "h2": inter}}
    return h, kc, vc, caps


def _block_capacity(K: int, frac: float, G: int = 128) -> int:
    """Static gather capacity for a keep fraction at group size G (the
    ONE capacity formula shared by the packed pipeline and the token
    kernel — it must match `block_gemv.project_many`'s k_keep rule)."""
    nb = K // G
    return max(1, min(nb, int(round(nb * frac))))


def _packed_layer(h3, stacked, kc, vc, pos, cos1, sin1, cfg: ModelConfig,
                  sp: SparsityConfig, thresholds, packed_norms, layer_idx,
                  kf):
    """One transformer layer in the packed pipeline (G=128, batch-1
    threshold-mode decode): FOUR Pallas launches — fused attention block,
    o-proj(+residual), gate/up(+silu·mul), down(+residual) — chained
    through the packed-row activation layout with ZERO XLA ops between
    them. h3: [dim/128, 1, 128] packed residual stream (raw, norms are
    folded into the kernels). Returns (h3', kc, vc)."""
    from teal_tpu.ops import attn_block as _ab
    from teal_tpu.ops import block_gemv as _bg

    t = {p: thresholds[i] for i, p in enumerate(PROJS)}
    D, I = cfg.dim, cfg.intermediate_size
    cap = _block_capacity

    fx = sp.debug_fixed_selection
    attn, kc, vc = _ab.attn_block(
        h3, t["q"], [stacked[n] for n in ("wq", "wk", "wv")],
        cos1, sin1, kc, vc, layer_idx, pos,
        G=128, cap=cap(D, kf[0]), n_heads=cfg.n_heads,
        norm3=packed_norms["attn"], norm_eps=cfg.norm_eps,
        window=cfg.sliding_window, fixed_sel=fx,
    )
    dt = h3.dtype
    attn3 = attn.reshape(cfg.n_heads, 1, cfg.head_dim)  # packed rows
    h3 = _bg.fused_select_gather_packed(
        attn3, t["o"], [stacked["wo"]], G=128, cap=cap(D, kf[3]),
        layer=layer_idx, res3=h3, out_dtype=dt, fixed_sel=fx,
    )
    inter3 = _bg.fused_select_gather_packed(
        h3, t["gate"], [stacked["wgate"], stacked["wup"]], G=128,
        cap=cap(D, kf[4]), layer=layer_idx, out_dtype=dt,
        norm3=packed_norms["mlp"], norm_eps=cfg.norm_eps, silu_pair=True,
        fixed_sel=fx,
    )
    h3 = _bg.fused_select_gather_packed(
        inter3, t["down"], [stacked["wdown"]], G=128, cap=cap(I, kf[6]),
        layer=layer_idx, res3=h3, out_dtype=dt, fixed_sel=fx,
    )
    return h3, kc, vc


def _can_packed_pipeline(params, cfg: ModelConfig, sp: SparsityConfig,
                         s: int, b: int, fused_attn: bool,
                         packed_norms) -> bool:
    """Static gate for the packed pipeline: G must be 128 for every
    projection, capacities shared within the fused launches, weights
    bf16/fp32, packed int4, or (token kernel only) int8 weight-only —
    the token kernel folds the int8 per-out-channel scale into its
    stage writers; the 4-launch pipeline has no scale fold."""
    if sp.packed_pipeline is False or not fused_attn:
        return False
    # b > 1 is served ONLY by the whole-token kernel (batched
    # attn_stage): b <= 8 rides one MXU sublane tile, 8 < b <= 16 a
    # [16, G] two-tile lhs — one launch, one weight stream either way;
    # the 4-launch pipeline is batch-1
    ok_b = b == 1 or (b <= 16 and sp.token_fused is not False)
    if not (s == 1 and ok_b and packed_norms is not None
            and cfg.head_dim == 128
            and cfg.dim % 128 == 0 and cfg.intermediate_size % 128 == 0):
        return False
    lay = params["layers"]
    if cfg.n_experts > 0:
        # Mixtral: served ONLY by the token kernel (in-kernel routing +
        # dense expert gather; ops/token_block._moe_route), batch 1,
        # bf16/fp32 arrays OR int8 weight-only dicts (expert scales ride
        # per-pseudo-layer slabs; reference parity: every published
        # Mixtral baseline is int8, gpt-fast/README.md:25-29), expert
        # dims on the G=128 grid. int4 MoE is not wired.
        from teal_tpu.ops.block_gemv import effective_block_size

        def _ok_leaf(w):
            return (not isinstance(w, dict)
                    or ("q" in w and "qp" not in w and "zero" not in w))

        if not (b == 1 and sp.token_fused is not False
                and _ok_leaf(lay["wq"]) and _ok_leaf(lay["wgate"])
                and effective_block_size(sp.block_size, cfg.dim) == 128
                and effective_block_size(
                    sp.block_size, cfg.intermediate_size) == 128):
            return False
    if isinstance(lay["wq"], dict) and "zero" in lay["wq"]:
        return False   # unpacked int4 {"q","scale","zero"}: XLA dequant
    if isinstance(lay["wq"], dict) and "q" in lay["wq"]:
        # int8 weight-only: the whole-token kernel applies the
        # per-out-channel scale to the fp32 accumulator in its stage
        # writers; the 4-launch packed pipeline has no scale fold, so
        # int8 runs the packed path ONLY via the token kernel
        if sp.token_fused is False or not all(
                isinstance(lay[n], dict) and "q" in lay[n]
                and "zero" not in lay[n]
                for n in ("wk", "wv", "wo", "wgate", "wup", "wdown")):
            return False
    kf = sp.block_keep_fracs or (sp.block_keep_frac,) * 7
    if not (kf[0] == kf[1] == kf[2] and kf[4] == kf[5]):
        return False
    from teal_tpu.ops import block_gemv as bg

    gs = (
        bg._shared_group_size([lay["wq"], lay["wk"], lay["wv"]],
                              sp.block_size, cfg.dim),
        bg._shared_group_size([lay["wo"]], sp.block_size, cfg.dim),
        bg._shared_group_size([lay["wgate"], lay["wup"]],
                              sp.block_size, cfg.dim),
        bg._shared_group_size([lay["wdown"]], sp.block_size,
                              cfg.intermediate_size),
    )
    return all(g == 128 for g in gs)


def compute_dtype(params):
    """Activation dtype: the projection dtype, or bf16 when projections are
    int8 weight-only dicts."""
    w = params["layers"]["wq"]
    if isinstance(w, dict):
        return jnp.bfloat16
    return w.dtype


def _layer_params_at(params, i):
    return {k: params["layers"][k][i] for k in params["layers"]}


def forward(params, tokens, cache: KVCache, pos, thresholds, *,
            cfg: ModelConfig, sp: SparsityConfig,
            return_hidden: bool = False, causal_prefill: bool = False,
            seq_axis: Optional[str] = None):
    """Full forward. tokens: [B, S] int32; pos: scalar start position
    shared by the batch, or [B] per-sequence positions (continuous
    batching: each slot decodes at its own depth).

    causal_prefill (static): caller guarantees pos == 0 and an empty
    cache (full-prompt prefill / ppl windows), enabling the fused flash
    attention path for large aligned sequences.

    Returns (logits [B, S, V] fp32, new_cache).
    """
    h = params["embed"][tokens].astype(compute_dtype(params))
    b, s = tokens.shape
    pos = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(pos, jnp.int32)), (b,))
    cos_full, sin_full = precompute_rope(cfg, cache.max_seq)
    positions = pos[:, None] + jnp.arange(s)[None, :]     # [B, S]
    cos = cos_full[positions]
    sin = sin_full[positions]

    block_path = (sp.enabled and sp.kernel == "block") or (
        isinstance(params["layers"]["wq"], dict)
        and "qp" in params["layers"]["wq"])
    fused_attn = _can_fused_decode(s, b, cfg, cache.max_seq, sp, block_path)

    # packed rms_norm gains for the in-kernel norm fold (threshold-mode
    # block decode): built ONCE here, outside the layer scan
    packed_norms = None
    if (s == 1 and b <= 16 and sp.enabled and sp.kernel == "block"
            and sp.block_thresholding and cfg.dim % 128 == 0):
        from teal_tpu.ops import block_gemv

        lay = params["layers"]
        g_attn = block_gemv._shared_group_size(
            [lay["wq"], lay["wk"], lay["wv"]], sp.block_size, cfg.dim)
        packed_norms = {
            "attn": block_gemv.pack_norm3(lay["attn_norm"], g_attn)}
        if cfg.n_experts == 0:
            g_mlp = block_gemv._shared_group_size(
                [lay["wgate"], lay["wup"]], sp.block_size, cfg.dim)
        else:
            # MoE token path: experts gather at G=128 (the gate
            # enforces it); the folded norm feeds the in-kernel router
            g_mlp = block_gemv.effective_block_size(
                sp.block_size, cfg.dim)
        packed_norms["mlp"] = block_gemv.pack_norm3(
            lay["mlp_norm"], g_mlp)

    if _can_packed_pipeline(params, cfg, sp, s, b, fused_attn,
                            packed_norms):
        # packed pipeline: the residual stream stays in the kernels'
        # packed-row layout for the whole scan — 4 Pallas launches per
        # layer, zero XLA ops between them (norms/residuals/silu folded)
        from teal_tpu.ops import block_gemv as _bg

        kf = sp.block_keep_fracs or (sp.block_keep_frac,) * 7

        if sp.token_fused is not False:
            # whole-token kernel: ONE Pallas launch for the entire
            # layer stack (grid over layers; ops/token_block.py);
            # batch rows ride the MXU lhs sublanes (one tile for
            # b <= 8, two for b <= 16) through one pooled selection
            from teal_tpu.ops import token_block

            cap_ = _block_capacity
            lay = params["layers"]
            moe_kw = {}
            gu_cap, dn_cap = (cap_(cfg.dim, kf[4]),
                              cap_(cfg.intermediate_size, kf[6]))
            if cfg.n_experts > 0:
                # Mixtral: in-kernel routing + TEAL-SPARSE expert
                # gathers (round 5; beyond the reference, whose
                # mixtral-moe engine has no TEAL hooks): gate/up keep
                # kf[4] of the shared stream's groups, down kf[6] of
                # each routed expert's intermediate — same caps as the
                # dense-model path above; keep 1.0 degenerates to the
                # old dense-expert behavior
                moe_kw = dict(router=lay["router"],
                              n_experts_per_tok=cfg.n_experts_per_tok)
            td_kw = dict(
                caps=(cap_(cfg.dim, kf[0]), cap_(cfg.dim, kf[3]),
                      gu_cap, dn_cap),
                n_heads=cfg.n_heads, norm_eps=cfg.norm_eps,
                window=cfg.sliding_window,
                fixed_sel=sp.debug_fixed_selection,
                **moe_kw,
            )
            ws7 = (lay["wq"], lay["wk"], lay["wv"], lay["wo"],
                   lay["wgate"], lay["wup"], lay["wdown"])
            if b == 1:
                h3 = _bg.pack_x3(h.reshape(1, cfg.dim), 128)
                h3, kc, vc = token_block.token_decode(
                    h3, thresholds, ws7,
                    packed_norms["attn"], packed_norms["mlp"],
                    cos[0, 0], sin[0, 0], cache.k, cache.v, pos,
                    batch=1, **td_kw)
                h = h3.reshape(1, 1, cfg.dim)
            else:
                # b <= 8 rides one sublane tile; 8 < b <= 16 rides TWO
                # (a [16, G] MXU lhs) — still ONE launch, weights
                # streamed once for the whole batch
                h2 = h.reshape(b, cfg.dim)
                h3 = _bg.pack_x3_rows(
                    h2, 128, rows=(8 if b <= 8 else 16))
                h3, kc, vc = token_block.token_decode(
                    h3, thresholds, ws7,
                    packed_norms["attn"], packed_norms["mlp"],
                    cos[:, 0], sin[:, 0], cache.k, cache.v, pos,
                    batch=b, **td_kw)
                h = jnp.swapaxes(h3[:, :b, :], 0, 1) \
                    .reshape(b, 1, cfg.dim)
            h = rms_norm(h, params["final_norm"], cfg.norm_eps)
            if return_hidden:
                return h, KVCache(kc, vc)
            return _lm_head(params, h), KVCache(kc, vc)

        h3 = _bg.pack_x3(h.reshape(1, cfg.dim), 128)

        def packed_body(carry, xs):
            h3, kc_all, vc_all = carry
            i, thresh_l = xs
            h3, kc_all, vc_all = _packed_layer(
                h3, params["layers"], kc_all, vc_all, pos,
                cos[0, 0], sin[0, 0], cfg, sp, thresh_l, packed_norms,
                i, kf,
            )
            return (h3, kc_all, vc_all), None

        idx = jnp.arange(cfg.n_layers)
        (h3, kc, vc), _ = jax.lax.scan(
            packed_body, (h3, cache.k, cache.v), (idx, thresholds)
        )
        h = h3.reshape(1, 1, cfg.dim)
        h = rms_norm(h, params["final_norm"], cfg.norm_eps)
        if return_hidden:
            return h, KVCache(kc, vc)
        return _lm_head(params, h), KVCache(kc, vc)

    def body(carry, xs):
        h, kc_all, vc_all = carry
        i, thresh_l = xs
        # lazy per-layer slices: XLA fuses them into dense consumers and
        # DCEs the ones the block path replaces with stacked access
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        if fused_attn:
            # stacked-cache decode: the fused attention kernel reads
            # layer i's slab in place — no slice-out/write-back copies
            h, kc_all, vc_all, _ = layer_forward(
                h, lp, kc_all, vc_all, pos, cos, sin, cfg, sp, thresh_l,
                stacked=params["layers"], layer_idx=i, stacked_cache=True,
                packed_norms=packed_norms,
            )
            return (h, kc_all, vc_all), None
        kc = kc_all[i]
        vc = vc_all[i]
        h, kc, vc, _ = layer_forward(
            h, lp, kc, vc, pos, cos, sin, cfg, sp, thresh_l,
            stacked=params["layers"], layer_idx=i,
            causal_prefill=causal_prefill, seq_axis=seq_axis,
            packed_norms=packed_norms,
        )
        kc_all = jax.lax.dynamic_update_slice_in_dim(
            kc_all, kc[None], i, axis=0
        )
        vc_all = jax.lax.dynamic_update_slice_in_dim(
            vc_all, vc[None], i, axis=0
        )
        return (h, kc_all, vc_all), None

    idx = jnp.arange(cfg.n_layers)
    (h, kc, vc), _ = jax.lax.scan(
        body, (h, cache.k, cache.v), (idx, thresholds)
    )

    h = rms_norm(h, params["final_norm"], cfg.norm_eps)
    if return_hidden:
        return h, KVCache(kc, vc)
    return _lm_head(params, h), KVCache(kc, vc)


def can_block_verify(params, cfg: ModelConfig, s: int) -> bool:
    """Static gate for `block_verify` (shapes/dtypes only). s > 8 runs
    ceil(s/8) sequential row-chunk launches (each reads all weights, so
    the practical bound is a few chunks)."""
    lay = params["layers"]
    if not (1 < s <= 32 and cfg.n_experts == 0 and cfg.head_dim == 128
            and cfg.dim % 128 == 0 and cfg.intermediate_size % 128 == 0):
        return False
    if isinstance(lay["wq"], dict) and "zero" in lay["wq"]:
        return False   # unpacked int4: XLA dequant path only
    if isinstance(lay["wq"], dict) and "q" in lay["wq"]:
        if not all(isinstance(lay[n], dict) and "q" in lay[n]
                   and "zero" not in lay[n]
                   for n in ("wk", "wv", "wo", "wgate", "wup", "wdown")):
            return False
    from teal_tpu.ops import block_gemv as bg

    gs = (
        bg._shared_group_size([lay["wq"], lay["wk"], lay["wv"]],
                              128, cfg.dim),
        bg._shared_group_size([lay["wo"]], 128, cfg.dim),
        bg._shared_group_size([lay["wgate"], lay["wup"]], 128, cfg.dim),
        bg._shared_group_size([lay["wdown"]], 128,
                              cfg.intermediate_size),
    )
    return all(g == 128 for g in gs)


def block_verify(params, tokens, cache: KVCache, pos, thresholds, *,
                 cfg: ModelConfig):
    """DENSE forward over S (2..8) consecutive positions of ONE sequence
    through the batched whole-token kernel: the S positions ride the MXU
    sublane rows (`ops/token_block.token_decode(seq_block=True)`),
    weights stream ONCE at full capacity through the gather pipeline
    (identity selection), and the cache receives the exact dense kv at
    pos..pos+S-1 — the whole layer stack in one Pallas launch.

    Built for shared-cache self-speculation (`engine/speculative.py`):
    an XLA-dense s=k+1 forward inside the speculative while_loop makes
    layout assignment pre-transpose the stacked q/k/v weights ({1,2,0}
    copies, +3 GB at 7B — OOM on one 16 GB chip, see
    experiments/spec_hlo_probe.py --shared-cache). Routing the verify
    through the token kernel pins the natural weight layout everywhere
    and reads weights at gather-kernel speed. The same rows mechanism
    serves chunk-of-8 prefill.

    tokens: [1, S] int32; pos: scalar int32. S > 8 runs ceil(S/8)
    sequential row-chunk launches: chunk j's rows attend to chunk < j's
    kv through the cache (written densely by the earlier launch), so
    causality holds exactly as inside one launch. Gate with
    `can_block_verify`. Returns (logits [1, S, V] fp32, new KVCache).
    """
    from teal_tpu.ops import block_gemv as _bg
    from teal_tpu.ops import token_block

    b, s = tokens.shape
    assert b == 1 and 1 < s, (b, s)
    lay = params["layers"]
    dt = compute_dtype(params)
    cos_full, sin_full = precompute_rope(cfg, cache.max_seq)
    pos = jnp.asarray(pos, jnp.int32).reshape(())
    g_attn = _bg._shared_group_size([lay["wq"], lay["wk"], lay["wv"]],
                                    128, cfg.dim)
    g_mlp = _bg._shared_group_size([lay["wgate"], lay["wup"]],
                                   128, cfg.dim)
    packed_norms = {"attn": _bg.pack_norm3(lay["attn_norm"], g_attn),
                    "mlp": _bg.pack_norm3(lay["mlp_norm"], g_mlp)}
    kc, vc = cache.k, cache.v
    hs = []
    n_chunks = -(-s // 8)
    base, rem = divmod(s, n_chunks)
    sizes = [base + (1 if j < rem else 0) for j in range(n_chunks)]
    offs = [sum(sizes[:j]) for j in range(n_chunks)]
    for off, ss in zip(offs, sizes):
        h = params["embed"][tokens[0, off:off + ss]].astype(dt)
        h3 = _bg.pack_x3_rows(h, 128)
        positions = pos + off + jnp.arange(ss)
        h3, kc, vc = token_block.token_decode(
            h3, thresholds,
            (lay["wq"], lay["wk"], lay["wv"], lay["wo"],
             lay["wgate"], lay["wup"], lay["wdown"]),
            packed_norms["attn"], packed_norms["mlp"],
            cos_full[positions], sin_full[positions],
            kc, vc, positions,
            caps=(cfg.dim // 128, cfg.dim // 128, cfg.dim // 128,
                  cfg.intermediate_size // 128),
            n_heads=cfg.n_heads, norm_eps=cfg.norm_eps,
            window=cfg.sliding_window,
            fixed_sel=True, batch=ss, seq_block=True,
        )
        hs.append(jnp.swapaxes(h3[:, :ss, :], 0, 1)
                  .reshape(1, ss, cfg.dim))
    h = jnp.concatenate(hs, 1) if len(hs) > 1 else hs[0]
    h = rms_norm(h, params["final_norm"], cfg.norm_eps)
    return _lm_head(params, h), KVCache(kc, vc)


def _lm_head(params, h):
    lmh = params["lm_head"]
    if isinstance(lmh, dict):
        # quantized output head (reference quantizes every nn.Linear
        # incl. self.output, quantize.py:312-317); XLA fuses the dequant
        # into the matmul's operand read
        from teal_tpu.ops import quant

        if "zero" in lmh:        # int4 groupwise affine
            w = quant.dequantize_int4_dict(lmh, h.dtype)
            return jnp.matmul(h, w, preferred_element_type=jnp.float32)
        # int8 per-channel
        return jnp.matmul(
            h, lmh["q"].astype(h.dtype),
            preferred_element_type=jnp.float32,
        ) * lmh["scale"]
    return jnp.matmul(h, lmh, preferred_element_type=jnp.float32)


def zero_thresholds(cfg: ModelConfig):
    return jnp.zeros((cfg.n_layers, len(PROJS)), dtype=jnp.float32)


def init_params(cfg: ModelConfig, key, dtype=jnp.bfloat16):
    """Random-init parameters (benchmarks/tests; real weights come from
    `teal_tpu.utils.checkpoint`)."""
    keys = jax.random.split(key, 4)

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    L, D, I, KV, V = (cfg.n_layers, cfg.dim, cfg.intermediate_size,
                      cfg.kv_dim, cfg.vocab_size)
    lk = jax.random.split(keys[0], 7)
    layers = {
        "attn_norm": jnp.ones((L, D), dtype),
        "mlp_norm": jnp.ones((L, D), dtype),
        "wq": w(lk[0], (L, D, D)),
        "wk": w(lk[1], (L, D, KV)),
        "wv": w(lk[2], (L, D, KV)),
        "wo": w(lk[3], (L, D, D)),
    }
    if cfg.n_experts > 0:
        from teal_tpu.models import moe

        layers.update(moe.init_moe_ffn_params(cfg, lk[4], dtype))
    else:
        layers.update({
            "wgate": w(lk[4], (L, D, I)),
            "wup": w(lk[5], (L, D, I)),
            "wdown": w(lk[6], (L, I, D)),
        })
    return {
        "embed": w(keys[1], (V, D)),
        "layers": layers,
        "final_norm": jnp.ones((D,), dtype),
        "lm_head": w(keys[2], (D, V)),
    }


def param_bytes(params) -> int:
    return sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(params))
