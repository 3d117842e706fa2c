"""Speculative decoding: self-draft exactness, acceptance accounting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from teal_tpu.config import get_model_config
from teal_tpu.engine.speculative import speculative_generate
from teal_tpu.engine.generate import Generator
from teal_tpu.models import llama


@pytest.fixture(scope="module")
def tiny():
    cfg = get_model_config("tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params


def test_self_draft_accepts_everything(tiny):
    """draft == target => q/p == 1 => every draft token accepted."""
    cfg, params = tiny
    prompt = [1, 2, 3]
    toks, stats = speculative_generate(
        params, params, cfg, cfg, prompt, 12,
        speculate_k=4, temperature=0.0, max_seq=64,
        cache_dtype=jnp.float32, key=jax.random.PRNGKey(3),
    )
    assert stats["mean_accepted"] == 4.0
    assert stats["new_tokens"] >= 12


def test_self_draft_matches_greedy_decode(tiny):
    """With temperature ~0 and draft == target, speculative output must
    equal plain greedy decoding."""
    cfg, params = tiny
    prompt = np.array([5, 2, 7])
    gen = Generator(cfg, params, max_seq=64, temperature=0.0)
    ref, _ = gen.generate(prompt, 10)

    toks, _ = speculative_generate(
        params, params, cfg, cfg, prompt, 10,
        speculate_k=3, temperature=0.0, max_seq=64,
        cache_dtype=jnp.float32, key=jax.random.PRNGKey(9),
    )
    np.testing.assert_array_equal(ref[0][:3 + 10], toks[: 3 + 10])


def test_different_draft_partial_acceptance(tiny):
    cfg, params = tiny
    draft_params = llama.init_params(cfg, jax.random.PRNGKey(42), jnp.float32)
    toks, stats = speculative_generate(
        params, draft_params, cfg, cfg, [1, 2, 3], 16,
        speculate_k=4, temperature=1.0, top_k=50, max_seq=64,
        cache_dtype=jnp.float32, key=jax.random.PRNGKey(0),
    )
    assert 0.0 <= stats["mean_accepted"] <= 4.0
    assert stats["new_tokens"] >= 16
    assert np.all(toks >= 0) and np.all(toks < cfg.vocab_size)


def test_speculative_with_sparse_target(tiny):
    """Speculative decoding composes with activation sparsity on the
    target model (masked-dense accuracy path)."""
    from teal_tpu.config import SparsityConfig

    cfg, params = tiny
    sp = SparsityConfig(enabled=True, apply_prefill=True)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    toks, stats = speculative_generate(
        params, params, cfg, cfg, [1, 2, 3], 10,
        speculate_k=3, temperature=0.0, max_seq=64,
        cache_dtype=jnp.float32,
        target_sp=sp, draft_sp=sp,
        target_thresholds=th, draft_thresholds=th,
        key=jax.random.PRNGKey(1),
    )
    # identical (sparse) target and draft still accept everything
    assert stats["mean_accepted"] == 3.0
    assert stats["new_tokens"] >= 10
