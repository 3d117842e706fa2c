"""Mixtral-style MoE: routing, decode-vs-prefill consistency, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from teal_tpu.config import SparsityConfig, get_model_config
from teal_tpu.engine.generate import Generator
from teal_tpu.models import llama
from teal_tpu.models.llama import KVCache


@pytest.fixture(scope="module")
def moe_tiny():
    cfg = get_model_config("tiny", n_experts=4, n_experts_per_tok=2)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params


def test_moe_params_shapes(moe_tiny):
    cfg, params = moe_tiny
    L, E, D, I = cfg.n_layers, cfg.n_experts, cfg.dim, cfg.intermediate_size
    assert params["layers"]["router"].shape == (L, D, E)
    assert params["layers"]["wgate"].shape == (L, E, D, I)
    assert params["layers"]["wdown"].shape == (L, E, I, D)


def test_moe_decode_matches_prefill(moe_tiny):
    """The gather-k decode path must agree with the all-experts prefill
    path position by position."""
    cfg, params = moe_tiny
    T = 6
    tokens = (jnp.arange(T, dtype=jnp.int32) * 11 % cfg.vocab_size)[None]
    sp = SparsityConfig()
    th = llama.zero_thresholds(cfg)

    cache = KVCache.init(cfg, 1, 8, jnp.float32)
    full, _ = llama.forward(params, tokens, cache, 0, th, cfg=cfg, sp=sp)

    cache = KVCache.init(cfg, 1, 8, jnp.float32)
    steps = []
    for i in range(T):
        lg, cache = llama.forward(params, tokens[:, i : i + 1], cache, i,
                                  th, cfg=cfg, sp=sp)
        steps.append(lg[:, 0])
    steps = jnp.stack(steps, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(steps),
                               atol=5e-4, rtol=1e-3)


def test_moe_generation(moe_tiny):
    cfg, params = moe_tiny
    gen = Generator(cfg, params, max_seq=32, temperature=0.0)
    out, _ = gen.generate(np.array([1, 2, 3]), 6)
    assert out.shape == (1, 9)
    assert np.all(out < cfg.vocab_size)


def test_mixtral_registry_config():
    cfg = get_model_config("Mixtral-8x7B-v0.1")
    assert cfg.n_experts == 8 and cfg.n_experts_per_tok == 2
    assert cfg.n_kv_heads == 8


def test_moe_routing_uses_different_experts(moe_tiny):
    """Different hidden states should route to different experts (sanity
    that routing isn't constant)."""
    from teal_tpu.models import moe

    cfg, params = moe_tiny
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    rng = jax.random.PRNGKey(5)
    ys = jax.random.normal(rng, (8, 1, cfg.dim), jnp.float32)
    idxs = []
    for i in range(8):
        logits = ys[i : i + 1] @ lp["router"]
        idxs.append(tuple(np.asarray(jax.lax.top_k(logits, 2)[1]).ravel()))
    assert len(set(idxs)) > 1
