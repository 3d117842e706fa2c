"""TP decode through the Pallas block kernels (shard_map) vs the
single-device block path, on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from teal_tpu.config import SparsityConfig, get_model_config
from teal_tpu.models import llama
from teal_tpu.models.llama import KVCache
from teal_tpu.parallel import tp_kernel

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
]


@pytest.fixture(scope="module")
def tiny():
    cfg = get_model_config("tiny", n_layers=2, n_heads=8, n_kv_heads=4,
                           dim=1024, intermediate_size=512, vocab_size=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(7), jnp.float32)
    return cfg, params


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_kernel_decode_matches_single_device(tiny, tp):
    """Per-shard kernel decode == the single-device block path.
    Threshold mode with non-binding capacity: the rowwise stages'
    per-shard group selection keeps exactly the global kept set (groups
    never straddle shard boundaries), so logits match to psum-reorder
    tolerance."""
    cfg, params = tiny
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=1.0, block_thresholding=True,
                        token_fused=False, fused_attn_block=False,
                        packed_pipeline=False)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    mesh = tp_kernel.make_tp_mesh(tp)
    sharded = tp_kernel.shard_params(params, mesh, cfg)
    for p in (0, 5):
        cache = KVCache.init(cfg, 1, 16, jnp.float32)
        cache = KVCache(
            k=jax.random.normal(jax.random.PRNGKey(p), cache.k.shape,
                                jnp.float32) * 0.1,
            v=jax.random.normal(jax.random.PRNGKey(p + 1), cache.v.shape,
                                jnp.float32) * 0.1)
        tok = jnp.asarray([[3 + p]], jnp.int32)
        with pltpu.force_tpu_interpret_mode():
            ref, cr = llama.forward(params, tok, cache, p, th,
                                    cfg=cfg, sp=sp)
            got, cg = tp_kernel.tp_kernel_decode(
                sharded, tok, tp_kernel.shard_cache(cache, mesh), p, th,
                cfg=cfg, sp=sp, mesh=mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"tp={tp} pos={p}")
        # current-token k/v are computed in-kernel (gather GEMV + RoPE)
        # vs in XLA for the ref — fp32 FMA/fusion ordering differs by
        # ~1 ulp (observed 1.2e-6 on single elements)
        np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cr.k),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cg.v), np.asarray(cr.v),
                                   rtol=1e-4, atol=1e-5)


def test_tp_kernel_multi_step_consistency(tiny):
    """Greedy-decode three steps: TP-kernel and single-device paths
    produce the same token trajectory (cache threading included)."""
    cfg, params = tiny
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=1.0, block_thresholding=True,
                        token_fused=False, fused_attn_block=False,
                        packed_pipeline=False)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    mesh = tp_kernel.make_tp_mesh(2)
    sharded = tp_kernel.shard_params(params, mesh, cfg)
    c_ref = KVCache.init(cfg, 1, 16, jnp.float32)
    c_tp = tp_kernel.shard_cache(c_ref, mesh)
    tok_r = tok_t = jnp.asarray([[5]], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        for p in range(3):
            lr, c_ref = llama.forward(params, tok_r, c_ref, p, th,
                                      cfg=cfg, sp=sp)
            lt, c_tp = tp_kernel.tp_kernel_decode(
                sharded, tok_t, c_tp, p, th, cfg=cfg, sp=sp, mesh=mesh)
            tok_r = jnp.argmax(lr[:, -1:], axis=-1).astype(jnp.int32)
            tok_t = jnp.argmax(lt[:, -1:], axis=-1).astype(jnp.int32)
            assert int(tok_r[0, 0]) == int(tok_t[0, 0]), f"step {p}"


def test_tp_prefill_then_kernel_decode(tiny):
    """The full TP serving flow: GSPMD prompt prefill writes the
    head-sharded cache, tp_kernel_decode continues decoding on it —
    token trajectory matches the single-device flow."""
    cfg, params = tiny
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=1.0, block_thresholding=True,
                        token_fused=False, fused_attn_block=False,
                        packed_pipeline=False)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    mesh = tp_kernel.make_tp_mesh(2)
    sharded = tp_kernel.shard_params(params, mesh, cfg)
    prompt = jnp.asarray([[3, 17, 42, 9]], jnp.int32)
    S = prompt.shape[1]

    # single-device reference: dense prefill + block decode
    c_ref = KVCache.init(cfg, 1, 16, jnp.float32)
    lr, c_ref = llama.forward(params, prompt, c_ref, 0, th, cfg=cfg,
                              sp=sp.replace(kernel="masked_dense"),
                              causal_prefill=True)
    tok_r = jnp.argmax(lr[:, -1:], axis=-1).astype(jnp.int32)

    c_tp = tp_kernel.shard_cache(KVCache.init(cfg, 1, 16, jnp.float32),
                                 mesh)
    lt, c_tp = tp_kernel.tp_prefill(sharded, prompt, c_tp, th,
                                    cfg=cfg, sp=sp, mesh=mesh)
    tok_t = jnp.argmax(lt[:, -1:], axis=-1).astype(jnp.int32)
    assert int(tok_r[0, 0]) == int(tok_t[0, 0])

    with pltpu.force_tpu_interpret_mode():
        for p in range(S, S + 3):
            lr, c_ref = llama.forward(params, tok_r, c_ref, p, th,
                                      cfg=cfg, sp=sp)
            lt, c_tp = tp_kernel.tp_kernel_decode(
                sharded, tok_t, c_tp, p, th, cfg=cfg, sp=sp, mesh=mesh)
            tok_r = jnp.argmax(lr[:, -1:], axis=-1).astype(jnp.int32)
            tok_t = jnp.argmax(lt[:, -1:], axis=-1).astype(jnp.int32)
            assert int(tok_r[0, 0]) == int(tok_t[0, 0]), f"step {p}"


def _int8_params(params):
    from teal_tpu.ops.quant import quantize_int8

    def q8(stack):
        wf = stack.astype(jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=1)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(wf / scale[:, None, :]),
                     -128, 127).astype(jnp.int8)
        return {"q": q, "scale": scale}

    layers = {k: (q8(v) if k.startswith("w") else v)
              for k, v in params["layers"].items()}
    head = quantize_int8(params["lm_head"])
    return dict(params, layers=layers,
                lm_head={"q": head.q, "scale": head.scale})


def test_tp_kernel_decode_int8(tiny):
    """int8 weight-only under the kernel TP path (the reference ships
    TP+int8 rows, gpt-fast/README.md:121): quantized dict leaves shard
    with matching per-field specs, per-layer scales apply post-psum
    consistently with the single-device int8 block path."""
    cfg, params = tiny
    qparams = _int8_params(params)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=1.0, block_thresholding=True,
                        token_fused=False, fused_attn_block=False,
                        packed_pipeline=False)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    mesh = tp_kernel.make_tp_mesh(2)
    sharded = tp_kernel.shard_params(qparams, mesh, cfg)
    cache = KVCache.init(cfg, 1, 16, jnp.bfloat16)
    tok = jnp.asarray([[7]], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        ref, _ = llama.forward(qparams, tok, cache, 3, th, cfg=cfg, sp=sp)
        got, _ = tp_kernel.tp_kernel_decode(
            sharded, tok, tp_kernel.shard_cache(cache, mesh), 3, th,
            cfg=cfg, sp=sp, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_tp_gspmd_forward_int8(tiny):
    """GSPMD TP (parallel/tp.py) with a quantized checkpoint: the
    params-aware specs shard dict leaves; sharded forward == single
    device."""
    from teal_tpu.parallel import tp

    cfg, params = tiny
    qparams = _int8_params(params)
    from teal_tpu.parallel import make_mesh

    mesh = make_mesh(tp=2, dp=1, devices=jax.devices()[:2])
    sharded = tp.shard_params(qparams, mesh, cfg)
    cache = KVCache.init(cfg, 1, 16, jnp.float32)
    tok = jnp.asarray([[3, 9, 27]], jnp.int32)
    th = llama.zero_thresholds(cfg)
    sp = SparsityConfig()
    ref, _ = llama.forward(qparams, tok, cache, 0, th, cfg=cfg, sp=sp)
    with jax.set_mesh(mesh):
        got, _ = jax.jit(
            lambda p, c: llama.forward(p, tok, c, 0, th, cfg=cfg, sp=sp)
        )(sharded, tp.shard_cache(cache, mesh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_tp_kernel_decode_int4(tiny):
    """Packed-int4 under the kernel TP path (reference ships TP+int4
    rows, gpt-fast/README.md:122): qp/sz shards slice along the same
    dims as the weights; in-kernel dequant per shard."""
    from teal_tpu.ops import quant

    cfg, params = tiny
    q4p = dict(params, layers=quant.pack_int4_params(
        quant.quantize_params_int4(dict(params), group=128),
        block_size=128)["layers"])
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=1.0, block_thresholding=True,
                        token_fused=False, fused_attn_block=False,
                        packed_pipeline=False)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    mesh = tp_kernel.make_tp_mesh(2)
    sharded = tp_kernel.shard_params(q4p, mesh, cfg)
    cache = KVCache.init(cfg, 1, 16, jnp.bfloat16)
    tok = jnp.asarray([[7]], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        ref, _ = llama.forward(q4p, tok, cache, 3, th, cfg=cfg, sp=sp)
        got, _ = tp_kernel.tp_kernel_decode(
            sharded, tok, tp_kernel.shard_cache(cache, mesh), 3, th,
            cfg=cfg, sp=sp, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_tp_kernel_decode_batched(tiny):
    """Batched (B <= 8) TP decode: batch rows ride the MXU lhs through
    one batch-pooled shared selection per stage on every shard; each
    sequence decodes at its own depth — == the single-device batched
    block path."""
    cfg, params = tiny
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=1.0, block_thresholding=True,
                        token_fused=False, fused_attn_block=False,
                        packed_pipeline=False)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    mesh = tp_kernel.make_tp_mesh(2)
    sharded = tp_kernel.shard_params(params, mesh, cfg)
    B = 3
    pos = jnp.asarray([2, 9, 14], jnp.int32)
    cache = KVCache.init(cfg, B, 16, jnp.float32)
    cache = KVCache(
        k=jax.random.normal(jax.random.PRNGKey(51), cache.k.shape,
                            jnp.float32) * 0.1,
        v=jax.random.normal(jax.random.PRNGKey(52), cache.v.shape,
                            jnp.float32) * 0.1)
    tok = jnp.asarray([[3], [7], [11]], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        ref, cr = llama.forward(params, tok, cache, pos, th, cfg=cfg,
                                sp=sp.replace(fused_decode_attention=False))
        got, cg = tp_kernel.tp_kernel_decode(
            sharded, tok, tp_kernel.shard_cache(cache, mesh), pos, th,
            cfg=cfg, sp=sp, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cr.k),
                               rtol=1e-5, atol=1e-6)


def test_tp_kernel_decode_dp_tp(tiny):
    """2-D dp x tp decode: batch rows shard over dp, heads over tp —
    every dp replica runs its own pooled selection; == the single-device
    batched block path on the full batch."""
    cfg, params = tiny
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=1.0, block_thresholding=True,
                        token_fused=False, fused_attn_block=False,
                        packed_pipeline=False)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    mesh = tp_kernel.make_tp_mesh(tp=2, dp=2)
    sharded = tp_kernel.shard_params(params, mesh, cfg)
    B = 4
    pos = jnp.asarray([2, 9, 14, 5], jnp.int32)
    cache = KVCache.init(cfg, B, 16, jnp.float32)
    cache = KVCache(
        k=jax.random.normal(jax.random.PRNGKey(61), cache.k.shape,
                            jnp.float32) * 0.1,
        v=jax.random.normal(jax.random.PRNGKey(62), cache.v.shape,
                            jnp.float32) * 0.1)
    tok = jnp.asarray([[3], [7], [11], [2]], jnp.int32)
    # reference: per-dp-group batched single-device decode (selection
    # pools over each dp group's rows, not the global batch)
    refs = []
    with pltpu.force_tpu_interpret_mode():
        for lo in (0, 2):
            sub = KVCache(k=cache.k[:, lo:lo + 2], v=cache.v[:, lo:lo + 2])
            r, _ = llama.forward(params, tok[lo:lo + 2], sub,
                                 pos[lo:lo + 2], th, cfg=cfg,
                                 sp=sp.replace(fused_decode_attention=False))
            refs.append(r)
        got, cg = tp_kernel.tp_kernel_decode(
            sharded, tok, tp_kernel.shard_cache(cache, mesh), pos, th,
            cfg=cfg, sp=sp, mesh=mesh)
    ref = jnp.concatenate(refs, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_tp_shard_unpacked_int4_and_real_packed_flow(tiny):
    """The production quantized flows shard: (a) unpacked int4
    ({"q","scale","zero"}, group dim sharding like K), (b) the packed
    flow from pack_int4_params whose lm_head stays int8/unpacked."""
    from teal_tpu.ops import quant
    from teal_tpu.parallel import tp

    cfg, params = tiny
    q4 = quant.quantize_params_int4(dict(params), group=128)
    mesh = tp_kernel.make_tp_mesh(2)
    s1 = tp.shard_params(q4, mesh, cfg)            # (a) unpacked
    assert isinstance(s1["layers"]["wq"], dict)
    q4p = quant.pack_int4_params(q4, block_size=128)
    s2 = tp_kernel.shard_params(q4p, mesh, cfg)    # (b) packed + head
    assert "qp" in s2["layers"]["wq"]


def test_tp_kernel_rejects_global_topk_and_perproj_fracs(tiny):
    """Top-k mode under TP would silently change the selection rule
    (per-shard quota vs global top-k) — rejected loudly; per-projection
    keep fractions take the separate-capacity branches and match the
    single-device path."""
    cfg, params = tiny
    mesh = tp_kernel.make_tp_mesh(2)
    sharded = tp_kernel.shard_params(params, mesh, cfg)
    cache = KVCache.init(cfg, 1, 16, jnp.float32)
    tok = jnp.asarray([[7]], jnp.int32)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    with pytest.raises(NotImplementedError):
        tp_kernel.tp_kernel_decode(
            sharded, tok, tp_kernel.shard_cache(cache, mesh), 3, th,
            cfg=cfg, sp=SparsityConfig(enabled=True, kernel="block",
                                       block_size=128,
                                       block_keep_frac=0.75,
                                       block_thresholding=False),
            mesh=mesh)
    # per-projection fracs (non-binding caps) == single device
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_fracs=(1.0, 0.9, 0.9, 1.0, 1.0, 0.9,
                                          1.0),
                        block_thresholding=True, token_fused=False,
                        fused_attn_block=False, packed_pipeline=False)
    with pltpu.force_tpu_interpret_mode():
        ref, _ = llama.forward(params, tok, cache, 3, th, cfg=cfg, sp=sp)
        got, _ = tp_kernel.tp_kernel_decode(
            sharded, tok, tp_kernel.shard_cache(cache, mesh), 3, th,
            cfg=cfg, sp=sp, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_tp_kernel_decode_moe(tiny):
    """Mixtral under the kernel TP path: replicated router -> identical
    per-shard routing, expert gate/up colwise + down rowwise via
    pseudo-layer indices into the flattened expert stacks, one psum for
    the weighted expert partials — == the single-device MoE block path."""
    from teal_tpu.config import get_model_config

    cfg = get_model_config("tiny", n_layers=2, n_heads=4, n_kv_heads=2,
                           dim=512, intermediate_size=512, vocab_size=128,
                           n_experts=4, n_experts_per_tok=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(19), jnp.float32)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=1.0, block_thresholding=True,
                        token_fused=False, fused_attn_block=False,
                        packed_pipeline=False)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    mesh = tp_kernel.make_tp_mesh(2)
    sharded = tp_kernel.shard_params(params, mesh, cfg)
    cache = KVCache.init(cfg, 1, 16, jnp.float32)
    tok = jnp.asarray([[7]], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        ref, cr = llama.forward(
            params, tok, cache, 3, th, cfg=cfg,
            sp=sp.replace(fused_decode_attention=False))
        got, cg = tp_kernel.tp_kernel_decode(
            sharded, tok, tp_kernel.shard_cache(cache, mesh), 3, th,
            cfg=cfg, sp=sp, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cr.k),
                               rtol=1e-5, atol=1e-6)
