"""Tensor-parallel decode through the Pallas block kernels (shard_map).

The GSPMD TP path (`parallel/tp.py`) shards the XLA program; Pallas
calls cannot be auto-partitioned by GSPMD, so under plain NamedSharding
TP the block gather kernels never engage and sharded decode runs the
XLA fallback ops. This module runs the SAME per-stage kernels on each
shard's local weights inside one `shard_map` — multi-chip decode at the
single-chip kernels' speed:

  - colwise shards (q/k/v, gate/up): the residual stream is replicated,
    ONE shared group selection per stage (the selection is deterministic
    in its inputs, so every shard derives the identical kept set with no
    communication), each shard gathers its local `[G, N/tp]` slabs;
  - rowwise shards (o, down): each shard selects over its LOCAL input
    groups with the layer's threshold (TEAL TP semantics: the magnitude
    criterion is group-local, so per-shard application equals sharding
    the globally-sparsified tensor — the reference relies on the same
    property, `tp_run.sh`; exact while the static capacity bound does
    not bind — under overflow the first-cap-by-index cut applies per
    shard instead of globally, the TP analog of the documented overflow
    tie-break) and contributes a partial `[1, D]` output; one `psum`
    per stage rides ICI. Global TOP-K mode is rejected under TP: each
    shard would top-k its local quota, a different rule;
  - attention runs on the shard's local heads over the head-sharded
    stacked cache via the fused decode-attention kernel (in-place
    current-token write).

Two collectives per layer (after o and down) plus one logits
all-gather — exactly the reference's NCCL schedule
(`gpt-fast/tp.py:120-140`). Group sizes adapt per shard: the rowwise
inputs' local dims (D/tp, I/tp) pick the largest power-of-two divisor
<= the configured block size (`block_gemv.effective_block_size`), so
any tp degree that divides the head count works for bf16/int8 weights.
Packed int4 additionally needs each rowwise local dim to be a multiple
of its 128-channel quant group (quant group == gather group), e.g.
Llama-2-7B's I=11008 supports tp=2 (5504 = 43x128) but not tp=4.

Prefill stays on the GSPMD path (`parallel/tp.py`) — it is MXU-bound
and XLA's partitioner handles it well; this module covers the
bandwidth-bound decode step where the gather kernels matter.

CPU-validation caveat: under `force_tpu_interpret_mode` on the virtual
device mesh, dispatching a second shard_map step while the previous
step's interpret-mode io_callbacks are still in flight can deadlock
JAX's callback machinery — `jax.device_get` (or any non-shard_map
computation) between steps drains it. Real-TPU lowering has no
callbacks and is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from teal_tpu.config import ModelConfig, SparsityConfig
from teal_tpu.models import llama
from teal_tpu.models.llama import KVCache
from teal_tpu.ops import block_gemv
from teal_tpu.ops.decode_attention import decode_attention
from teal_tpu.parallel import tp as _tp
from teal_tpu.parallel.tp import param_specs


def make_tp_mesh(tp: int | None = None, devices=None,
                 dp: int = 1) -> Mesh:
    """1-D tp mesh, or a 2-D dp x tp mesh when dp > 1 (batch over dp,
    heads over tp — the full decode topology)."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    tp = tp or len(devices) // dp
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f"dp*tp={n} > {len(devices)} devices")
    if dp == 1:
        return Mesh(np.asarray(devices[:n]).reshape(tp),
                    axis_names=("tp",))
    return Mesh(np.asarray(devices[:n]).reshape(dp, tp),
                axis_names=("dp", "tp"))


def _dp(mesh: Mesh):
    return "dp" if "dp" in mesh.axis_names else None


def cache_specs(mesh: Mesh = None):
    """KV cache specs for this module's meshes (heads over tp; batch
    over dp when present) — `tp.cache_specs` with the dp axis optional."""
    return _tp.cache_specs(_dp(mesh) if mesh is not None else None)


def shard_params(params, mesh: Mesh, cfg: ModelConfig):
    """`tp.shard_params` (same colwise/rowwise layout, quantized-dict
    aware); the kernels consume the local shards directly inside
    `tp_kernel_decode`."""
    return _tp.shard_params(params, mesh, cfg)


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    s = cache_specs(mesh)
    return KVCache(
        k=jax.device_put(cache.k, NamedSharding(mesh, s.k)),
        v=jax.device_put(cache.v, NamedSharding(mesh, s.v)),
    )


def tp_prefill(params, tokens, cache: KVCache, thresholds, *,
               cfg: ModelConfig, sp: SparsityConfig, mesh: Mesh):
    """Prompt prefill on the same 1-D tp mesh, via GSPMD (prefill is
    MXU-bound; XLA's partitioner shards the matmuls and places the
    all-reduces — the gather kernels only pay off in the
    bandwidth-bound decode step). Writes the head-sharded stacked cache
    that `tp_kernel_decode` continues on. tokens: [1, S]."""
    prefill_sp = sp.replace(kernel="masked_dense", token_fused=False,
                            fused_attn_block=False, packed_pipeline=False,
                            fused_decode_attention=False)

    @functools.partial(jax.jit, static_argnames=())
    def run(params, tokens, cache, thresholds):
        return llama.forward(params, tokens, cache, 0, thresholds,
                             cfg=cfg, sp=prefill_sp, causal_prefill=True)

    with jax.set_mesh(mesh):
        return run(params, tokens, cache, thresholds)


def tp_kernel_decode(params, tokens, cache: KVCache, pos, thresholds, *,
                     cfg: ModelConfig, sp: SparsityConfig, mesh: Mesh):
    """One TP decode step (single token, batch <= 8) through the block
    kernels. tokens: [B, 1] int32; cache: head-sharded stacked KVCache
    (B on dim 1); pos: scalar or [B] int32 (continuous batching: each
    slot at its own depth); thresholds: [L, 7]. Batch > 1 rides the MXU
    lhs rows with one batch-pooled shared selection per stage (the
    single-device batched semantics, `block_gemv.project_many_batched`).
    Returns (logits [B, 1, V] fp32, replicated; updated cache).
    Jit-compatible (static cfg/sp/mesh).
    """
    moe = cfg.n_experts > 0
    wq = params["layers"]["wq"]
    if moe:
        assert tokens.shape[0] == 1, "MoE TP kernel decode: batch 1"
        assert not isinstance(params["layers"]["wgate"], dict), \
            "quantized MoE experts: use parallel/tp.py"
    is_int4_packed = isinstance(wq, dict) and "qp" in wq
    if isinstance(wq, dict) and "zero" in wq:
        raise NotImplementedError(
            "unpacked int4 decodes through XLA dequant — repack with "
            "quant.pack_int4_params for the kernel TP path")
    thresholding = sp.block_thresholding
    if not sp.enabled:
        # packed int4 always decodes through the gather kernel (the XLA
        # unpack path rematerializes bf16 weights, llama._proj) — dense
        # = full capacity, where per-shard selection is trivially exact
        if not is_int4_packed:
            raise ValueError(
                "tp_kernel_decode with sparsity off: dense TP decode "
                "runs on the GSPMD path (parallel/tp.py)")
        kf = (1.0,) * 7
        thresholding = False
    else:
        assert sp.kernel == "block", "block kernel path only"
        kf = sp.block_keep_fracs or (sp.block_keep_frac,) * 7
        if not thresholding and any(f < 1.0 for f in kf):
            raise NotImplementedError(
                "top-k mode under TP: each shard would top-k its LOCAL "
                "groups, diverging from the single-device global top-k "
                "— use threshold mode (block_thresholding=True), whose "
                "group-local rule is exact per shard")
    tp = mesh.shape["tp"]
    hq_l, hkv_l = cfg.n_heads // tp, cfg.n_kv_heads // tp
    bs = sp.block_size
    Dh = cfg.head_dim

    def bt(th_l, j):
        return th_l[j] if thresholding else None

    dp_ax = _dp(mesh)
    dp = mesh.shape.get("dp", 1)
    B = tokens.shape[0] // dp          # per-device batch
    assert B <= 8, "block kernels batch <= 8 per dp shard"

    def proj(x2d, ws, frac, i, thr):
        """[B, K] -> list of [B, N_local] through the gather kernels."""
        if x2d.shape[0] == 1:
            return block_gemv.project_many(x2d, ws, bs, frac, layer=i,
                                           threshold=thr)
        return block_gemv.project_many_batched(x2d, ws, bs, frac,
                                               layer=i, threshold=thr)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_specs(cfg, params), P(dp_ax), cache_specs(mesh),
                  P(dp_ax), P()),
        out_specs=(P(dp_ax), cache_specs(mesh)),
        check_vma=False,
    )
    def run(prm, tokens, cache, pos, th):
        layers = prm["layers"]
        if moe:
            # local expert stacks [L, E, D, I/tp] -> pseudo-layer
            # [L*E, D, I/tp] for the gather kernels' layer indexing
            # (row-major reshape: a bitcast, no data movement)
            wg_flat, wu_flat, wd_flat = (
                layers[n].reshape((-1,) + layers[n].shape[2:])
                for n in ("wgate", "wup", "wdown"))

        def wsel(name, i):
            """Kernel operand for layer i: stacked array / packed-int4
            dict straight through (the kernel indexes the layer); int8
            scale sliced per layer (applied post-matmul in XLA)."""
            w = layers[name]
            if isinstance(w, dict) and "qp" not in w:
                return {"q": w["q"], "scale": w["scale"][i]}
            return w
        kc, vc = cache.k, cache.v
        dtype = llama.compute_dtype(prm)
        h = prm["embed"][tokens].astype(dtype)          # [B, 1, D]
        pos_b = jnp.broadcast_to(
            jnp.atleast_1d(jnp.asarray(pos, jnp.int32)), (B,))
        cos_full, sin_full = llama.precompute_rope(cfg, kc.shape[3])
        cos = cos_full[pos_b][:, None]                   # [B, 1, Dh]
        sin = sin_full[pos_b][:, None]

        def body(carry, xs):
            h, kc, vc = carry
            i, th_l = xs
            x = llama.rms_norm(
                h, layers["attn_norm"][i], cfg.norm_eps).reshape(B, -1)
            if kf[0] == kf[1] == kf[2]:
                q, k, v = proj(
                    x, [wsel("wq", i), wsel("wk", i), wsel("wv", i)],
                    kf[0], i, bt(th_l, 0))
            else:   # per-projection greedy profile: separate capacities
                (q,) = proj(x, [wsel("wq", i)], kf[0], i, bt(th_l, 0))
                (k,) = proj(x, [wsel("wk", i)], kf[1], i, bt(th_l, 1))
                (v,) = proj(x, [wsel("wv", i)], kf[2], i, bt(th_l, 2))
            q = llama.apply_rope(q.reshape(B, 1, hq_l, Dh)
                                 .transpose(0, 2, 1, 3)
                                 .astype(jnp.float32), cos, sin)
            k = llama.apply_rope(k.reshape(B, 1, hkv_l, Dh)
                                 .transpose(0, 2, 1, 3)
                                 .astype(jnp.float32), cos, sin)
            v = v.reshape(B, 1, hkv_l, Dh).transpose(0, 2, 1, 3)
            attn, kc, vc = decode_attention(
                q.astype(kc.dtype), k.astype(kc.dtype), v.astype(vc.dtype),
                kc, vc, i, pos_b, window=cfg.sliding_window)
            (o_part,) = proj(
                attn.transpose(0, 2, 1, 3).reshape(B, hq_l * Dh)
                .astype(dtype), [wsel("wo", i)], kf[3], i, bt(th_l, 3))
            h = h + jax.lax.psum(o_part, "tp").reshape(h.shape)

            x2 = llama.rms_norm(
                h, layers["mlp_norm"][i], cfg.norm_eps).reshape(B, -1)
            if moe:
                # Mixtral: router replicated -> identical routing on
                # every shard; each routed expert's gate/up shard
                # colwise and down rowwise (pseudo-layer i*E+e into the
                # flattened expert stacks), dense (the reference's MoE
                # engine is not sparsity-integrated either); ONE psum
                # combines the weighted expert partials
                rlog = jnp.matmul(x2, layers["router"][i],
                                  preferred_element_type=jnp.float32)
                tv, ti = jax.lax.top_k(rlog, cfg.n_experts_per_tok)
                wts = jax.nn.softmax(tv, axis=-1)            # [1, K]
                d_sum = jnp.zeros((1, cfg.dim), jnp.float32)
                for t in range(cfg.n_experts_per_tok):
                    le = i * cfg.n_experts + ti[0, t]
                    (g,) = proj(x2, [wg_flat], 1.0, le, None)
                    (u,) = proj(x2, [wu_flat], 1.0, le, None)
                    gf = g.astype(jnp.float32)
                    inter = (gf * (1.0 / (1.0 + jnp.exp(-gf)))
                             * u.astype(jnp.float32)).astype(dtype)
                    (d_e,) = proj(inter, [wd_flat], 1.0, le, None)
                    d_sum = d_sum + wts[0, t] * d_e.astype(jnp.float32)
                h = h + jax.lax.psum(d_sum, "tp").astype(h.dtype) \
                    .reshape(h.shape)
                return (h, kc, vc), None
            if kf[4] == kf[5]:
                g, u = proj(x2, [wsel("wgate", i), wsel("wup", i)],
                            kf[4], i, bt(th_l, 4))
            else:
                (g,) = proj(x2, [wsel("wgate", i)], kf[4], i,
                            bt(th_l, 4))
                (u,) = proj(x2, [wsel("wup", i)], kf[5], i, bt(th_l, 5))
            gf = g.astype(jnp.float32)
            inter = (gf * (1.0 / (1.0 + jnp.exp(-gf)))
                     * u.astype(jnp.float32)).astype(dtype)
            (d_part,) = proj(inter, [wsel("wdown", i)], kf[6], i,
                             bt(th_l, 6))
            h = h + jax.lax.psum(d_part, "tp").reshape(h.shape)
            return (h, kc, vc), None

        (h, kc, vc), _ = jax.lax.scan(
            body, (h, kc, vc), (jnp.arange(cfg.n_layers), th))
        h = llama.rms_norm(h, prm["final_norm"], cfg.norm_eps)
        logits_l = llama._lm_head(prm, h)   # bf16 / int8 / int4 heads
        logits = jax.lax.all_gather(logits_l, "tp", axis=2, tiled=True)
        return logits, KVCache(kc, vc)

    pos = jnp.broadcast_to(
        jnp.atleast_1d(jnp.asarray(pos, jnp.int32)), (tokens.shape[0],))
    return run(params, tokens, cache, pos, thresholds)
