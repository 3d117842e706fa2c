"""Eval-harness adapter + profiling utility tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from teal_tpu.config import get_model_config
from teal_tpu.eval.harness import ScoreModel
from teal_tpu.models import llama
from teal_tpu.utils.profiling import trace, write_metrics


@pytest.fixture(scope="module")
def sm():
    cfg = get_model_config("tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    return cfg, params, ScoreModel(params, cfg, max_seq=64)


def test_loglikelihood_consistency(sm):
    """Sum of continuation token logprobs must match a manual forward."""
    cfg, params, model = sm
    ctx, cont = [1, 2, 3], [4, 5]
    total, _ = model.loglikelihood(ctx, cont)
    assert total < 0

    # manual check
    from teal_tpu.models.llama import KVCache
    from teal_tpu.config import SparsityConfig

    ids = jnp.asarray([ctx + cont], jnp.int32)
    cache = KVCache.init(cfg, 1, 8, jnp.float32)
    logits, _ = llama.forward(params, ids, cache, 0,
                              llama.zero_thresholds(cfg), cfg=cfg,
                              sp=SparsityConfig())
    logp = jax.nn.log_softmax(logits[0, :-1], axis=-1)
    manual = sum(float(logp[i, ids[0, i + 1]]) for i in (2, 3))
    assert total == pytest.approx(manual, rel=1e-4)


def test_longer_continuation_lower_likelihood(sm):
    _, _, model = sm
    l1, _ = model.loglikelihood([1, 2], [3])
    l2, _ = model.loglikelihood([1, 2], [3, 4, 5, 6])
    assert l2 < l1


def test_score_choices_picks_argmax(sm):
    _, _, model = sm
    choices = [[4], [5], [6]]
    best = model.score_choices([1, 2, 3], choices)
    scores = [model.loglikelihood([1, 2, 3], c)[0] for c in choices]
    assert best == int(np.argmax(scores))


def test_write_metrics_and_trace(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    write_metrics(path, {"metric": "x", "value": 1})
    write_metrics(path, {"metric": "y", "value": 2})
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2 and lines[0]["metric"] == "x"
    assert "ts" in lines[0]

    with trace(None):
        pass  # no-op path
    with trace(str(tmp_path / "tr")):
        jnp.ones((4,)).sum().block_until_ready()
    assert os.path.isdir(tmp_path / "tr")


def test_is_greedy_argmax_semantics(sm):
    """is_greedy must be exact argmax-match, not a probability proxy
    (ADVICE r1: all(cont_lp > log(0.5)) under-reported it)."""
    cfg, params, model = sm
    ctx = [1, 2, 3]
    # the model's actual greedy continuation IS greedy by construction
    _, greedy_ids = model._token_logprobs(np.asarray(ctx + [0]))
    next_tok = int(greedy_ids[len(ctx) - 1])
    _, is_greedy = model.loglikelihood(ctx, [next_tok])
    assert is_greedy
    # any other token is not
    other = (next_tok + 1) % cfg.vocab_size
    _, is_greedy2 = model.loglikelihood(ctx, [other])
    assert not is_greedy2


def test_lm_eval_shim_multiple_choice_end_to_end(sm):
    """A multiple-choice task runs through TealTPULM + the vendored
    evaluator (VERDICT missing #3: lm-eval actually running tasks)."""
    from teal_tpu.eval.harness import make_lm_eval_model
    from teal_tpu.eval.lm_eval_shim import (
        MultipleChoiceTask, simple_evaluate,
    )
    from teal_tpu.utils.tokenizer import ByteTokenizer

    cfg, params, model = sm
    tok = ByteTokenizer()
    lm = make_lm_eval_model(model, tok)
    task = MultipleChoiceTask(name="toy_mc", docs=[
        {"query": "ab", "choices": ["cd", "ef", "gh"], "gold": 1},
        {"query": "xy", "choices": ["z", "w"], "gold": 0},
    ])
    results = simple_evaluate(lm, [task])
    assert "toy_mc" in results
    assert 0.0 <= results["toy_mc"]["acc"] <= 1.0
    assert 0.0 <= results["toy_mc"]["acc_norm"] <= 1.0


def test_lm_eval_shim_generate_until(sm):
    """generate_until produces text through the Generator (greedy) and
    honors stop strings."""
    from teal_tpu.eval.harness import make_lm_eval_model
    from teal_tpu.eval.lm_eval_shim import GenerateTask, simple_evaluate
    from teal_tpu.utils.tokenizer import ByteTokenizer

    cfg, params, model = sm
    tok = ByteTokenizer()
    lm = make_lm_eval_model(model, tok, max_gen_toks=8)
    task = GenerateTask(name="toy_gen",
                        docs=[{"query": "hello", "target": "anything"}],
                        until=(), max_gen_toks=8)
    results = simple_evaluate(lm, [task])
    assert "toy_gen" in results
    assert 0.0 <= results["toy_gen"]["exact_match"] <= 1.0


def test_loglikelihood_truncates_context_not_continuation(sm):
    """context+continuation > max_seq: the context truncates from the
    left (lm_eval convention) and indexing stays consistent — no crash,
    and the result equals scoring the pre-truncated sequence."""
    cfg, params, model = sm
    rng = np.random.default_rng(0)
    ctx = rng.integers(1, cfg.vocab_size, size=70).tolist()   # > max_seq 64
    cont = rng.integers(1, cfg.vocab_size, size=4).tolist()
    total, is_greedy = model.loglikelihood(ctx, cont)
    assert np.isfinite(total) and isinstance(is_greedy, bool)
    # equivalent manual pre-truncation
    keep = model.max_seq - len(cont)
    total2, g2 = model.loglikelihood(ctx[-keep:], cont)
    assert total == pytest.approx(total2, rel=1e-5)
    assert is_greedy == g2
    # a continuation that cannot fit raises instead of mis-scoring
    with pytest.raises(ValueError):
        model.loglikelihood(ctx[:2], rng.integers(
            1, cfg.vocab_size, size=model.max_seq + 1).tolist())
