"""lm-evaluation-harness adapter (capability parity with
`gpt-fast/eval.py:85-151`).

Wraps the teal_tpu model as an `lm_eval` model so downstream tasks
(hellaswag etc.) run against dense or sparse configurations. `lm_eval` is
an optional dependency; when absent, `loglikelihood_rolling`/`score_choices`
still work standalone (they only need the model), so basic multiple-choice
accuracy can be computed without the harness.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from teal_tpu.config import ModelConfig, SparsityConfig
from teal_tpu.models import llama
from teal_tpu.models.llama import KVCache


class ScoreModel:
    """Minimal scoring interface: total log-likelihood of a continuation
    given a context (the primitive lm-eval tasks are built on)."""

    def __init__(self, params, cfg: ModelConfig, *,
                 sp: SparsityConfig = SparsityConfig(), thresholds=None,
                 max_seq: int = 2048):
        self.params = params
        self.cfg = cfg
        self.sp = sp
        self.thresholds = (thresholds if thresholds is not None
                           else llama.zero_thresholds(cfg))
        self.max_seq = max_seq
        self._logp = None

    def _token_logprobs(self, ids: np.ndarray) -> np.ndarray:
        """log P(ids[i] | ids[:i]) for i >= 1. ids: [T]."""
        import functools

        if self._logp is None:
            @functools.partial(jax.jit, static_argnames=())
            def f(params, tokens, n_valid, thresholds):
                t = tokens.shape[1]
                cache = KVCache.init(self.cfg, 1, t,
                                     llama.compute_dtype(params))
                logits, _ = llama.forward(
                    params, tokens, cache, 0, thresholds,
                    cfg=self.cfg, sp=self.sp,
                )
                logp = jax.nn.log_softmax(
                    logits[:, :-1].astype(jnp.float32), axis=-1
                )
                lp = jnp.take_along_axis(
                    logp, tokens[:, 1:, None], axis=-1
                )[0, :, 0]
                pos = jnp.arange(1, t)
                return jnp.where(pos < n_valid, lp, 0.0)

            self._logp = f

        t = len(ids)
        pad = 1 << max(3, (t - 1).bit_length())   # pad to power of two
        pad = min(pad, self.max_seq)
        if t > pad:
            ids = ids[-pad:]
            t = pad
        padded = np.zeros(pad, np.int64)
        padded[:t] = ids
        lp = self._logp(self.params, jnp.asarray(padded[None], jnp.int32),
                        jnp.asarray(t), self.thresholds)
        return np.asarray(lp)[: t - 1]

    def loglikelihood(self, context_ids: Sequence[int],
                      continuation_ids: Sequence[int]) -> Tuple[float, bool]:
        """(sum logprob of continuation, is_greedy)."""
        ids = np.asarray(list(context_ids) + list(continuation_ids))
        lp = self._token_logprobs(ids)
        n_ctx = len(context_ids)
        cont_lp = lp[n_ctx - 1:]
        return float(cont_lp.sum()), bool(np.all(cont_lp > np.log(0.5)))

    def score_choices(self, context_ids: Sequence[int],
                      choices: Sequence[Sequence[int]]) -> int:
        """Index of the highest-likelihood continuation (multiple choice)."""
        scores = [self.loglikelihood(context_ids, c)[0] for c in choices]
        return int(np.argmax(scores))


def make_lm_eval_model(score_model: ScoreModel, tokenizer):
    """Build an lm_eval.api.model.LM if lm_eval is installed."""
    try:
        from lm_eval.api.model import LM
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "lm_eval is not installed; use ScoreModel directly or install "
            "the 'eval' extra"
        ) from e

    class TealTPULM(LM):
        def loglikelihood(self, requests):
            out = []
            for req in requests:
                ctx, cont = req.args
                ctx_ids = tokenizer.encode(ctx, bos=True)
                cont_ids = tokenizer.encode(cont)
                out.append(score_model.loglikelihood(ctx_ids, cont_ids))
            return out

        def loglikelihood_rolling(self, requests):
            out = []
            for req in requests:
                (text,) = req.args
                ids = tokenizer.encode(text, bos=True)
                lp = score_model._token_logprobs(np.asarray(ids))
                out.append(float(lp.sum()))
            return out

        def generate_until(self, requests):  # pragma: no cover
            raise NotImplementedError(
                "use teal_tpu.engine.Generator for generation tasks"
            )

    return TealTPULM()
