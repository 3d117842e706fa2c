"""End-to-end generation engine tests on the tiny model (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from teal_tpu.config import SparsityConfig, get_model_config
from teal_tpu.engine.generate import Generator
from teal_tpu.engine import sampling
from teal_tpu.models import llama


@pytest.fixture(scope="module")
def tiny_gen():
    cfg = get_model_config("tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def test_generate_shapes_and_determinism(tiny_gen):
    cfg, params = tiny_gen
    gen = Generator(cfg, params, max_seq=64, temperature=0.0)
    prompt = np.array([1, 2, 3, 4, 5])
    out1, stats = gen.generate(prompt, 10, key=jax.random.PRNGKey(7))
    out2, _ = gen.generate(prompt, 10, key=jax.random.PRNGKey(9))
    assert out1.shape == (1, 15)
    assert stats.new_tokens == 10
    # greedy decode: same prompt => same tokens regardless of key
    np.testing.assert_array_equal(out1, out2)
    assert np.all(out1 < cfg.vocab_size) and np.all(out1 >= 0)


def test_host_loop_matches_device_loop(tiny_gen):
    cfg, params = tiny_gen
    gen = Generator(cfg, params, max_seq=64, temperature=0.0)
    prompt = np.array([5, 4, 3])
    a, _ = gen.generate(prompt, 8, on_device_loop=True)
    b, _ = gen.generate(prompt, 8, on_device_loop=False)
    np.testing.assert_array_equal(a, b)


def test_generate_with_sparsity(tiny_gen):
    cfg, params = tiny_gen
    sp = SparsityConfig(enabled=True)  # dense prefill, sparse decode
    gen = Generator(cfg, params, sp=sp, max_seq=64, temperature=0.0)
    th = jnp.full((cfg.n_layers, 7), 0.02, dtype=jnp.float32)
    out, _ = gen.generate(np.array([1, 2, 3]), 6, thresholds=th)
    assert out.shape == (1, 9)

    dense_gen = Generator(cfg, params, max_seq=64, temperature=0.0)
    dense_out, _ = dense_gen.generate(np.array([1, 2, 3]), 6)
    # sanity: a large threshold perturbs generation vs dense
    th_big = jnp.full((cfg.n_layers, 7), 10.0, dtype=jnp.float32)
    pert, _ = gen.generate(np.array([1, 2, 3]), 6, thresholds=th_big)
    assert out.shape == pert.shape == dense_out.shape


def test_sampling_top_k_restricts_support():
    logits = jnp.array([10.0, 9.0, 1.0, -5.0])
    probs = sampling.logits_to_probs(logits, temperature=1.0, top_k=2)
    assert float(probs[2]) == 0.0 and float(probs[3]) == 0.0
    assert float(probs[:2].sum()) == pytest.approx(1.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 50)
    draws = np.array([int(sampling.sample(k, logits, 1.0, 2)) for k in keys])
    assert set(draws.tolist()) <= {0, 1}


def test_batched_generation(tiny_gen):
    cfg, params = tiny_gen
    gen = Generator(cfg, params, max_seq=64, batch=2, temperature=0.0)
    prompt = np.array([[1, 2, 3], [4, 5, 6]])
    out, _ = gen.generate(prompt, 5)
    assert out.shape == (2, 8)
