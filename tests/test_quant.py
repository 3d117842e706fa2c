"""Weight-only quantization: roundtrip accuracy, matmul paths, fused
dequant+sparse kernel, whole-model quantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from teal_tpu.config import SparsityConfig, get_model_config
from teal_tpu.models import llama
from teal_tpu.models.llama import KVCache
from teal_tpu.ops import quant


@pytest.fixture(scope="module")
def w():
    return jax.random.normal(jax.random.PRNGKey(0), (128, 256), jnp.float32)


def test_int8_roundtrip_error(w):
    wq = quant.quantize_int8(w)
    assert wq.q.dtype == jnp.int8
    wd = quant.dequantize_int8(wq, jnp.float32)
    err = np.abs(np.asarray(wd) - np.asarray(w))
    # per-channel symmetric int8: error bounded by scale/2 per channel
    bound = np.asarray(wq.scale) / 2 + 1e-6
    assert np.all(err <= bound[None, :])


def test_int8_matmul_close_to_dense(w):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128), jnp.float32)
    wq = quant.quantize_int8(w)
    y = quant.int8_matmul(x, wq)
    ref = jnp.matmul(x, w)
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02


def test_int4_roundtrip_and_matmul(w):
    wq = quant.quantize_int4(w, group=32)
    wd = quant.dequantize_int4(wq, jnp.float32)
    # groupwise affine int4: max error ~ scale/2 within each group
    err = np.abs(np.asarray(wd) - np.asarray(w)).max()
    assert err <= float(wq.scale.max()) / 2 + 1e-5

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128), jnp.float32)
    y = quant.int4_matmul(x, wq)
    ref = jnp.matmul(x, w)
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 0.1


def test_int8_values_use_full_range(w):
    wq = quant.quantize_int8(w)
    q = np.asarray(wq.q)
    assert q.max() == 127 or q.min() == -128 or np.abs(q).max() > 100


def test_fused_int8_block_sparse_matmul(w):
    """Fused dequant+gather kernel vs dequantize-then-reference-twin."""
    from teal_tpu.ops import block_gemv

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 128), jnp.float32)
    wq = quant.quantize_int8(w)
    with pltpu.force_tpu_interpret_mode():
        y = quant.int8_block_sparse_matmul(x, wq, block_size=16,
                                           keep_frac=0.5)
    wd = quant.dequantize_int8(wq, jnp.float32)
    ref = block_gemv.block_sparse_matmul_reference(x, wd, None, 16, 0.5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_quantized_model_forward_and_ppl():
    cfg = get_model_config("tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qparams = quant.quantize_params_int8(params)
    assert quant.param_is_quantized(qparams["layers"]["wq"])
    assert qparams["layers"]["attn_norm"].dtype == jnp.float32

    tokens = jnp.array([[1, 2, 3, 4]], jnp.int32)
    sp = SparsityConfig()
    cache = KVCache.init(cfg, 1, 8, jnp.float32)
    ref, _ = llama.forward(params, tokens, cache, 0,
                           llama.zero_thresholds(cfg), cfg=cfg, sp=sp)
    cache = KVCache.init(cfg, 1, 8, jnp.bfloat16)
    got, _ = llama.forward(qparams, tokens, cache, 0,
                           llama.zero_thresholds(cfg), cfg=cfg, sp=sp)
    # int8 + bf16 activations: loose but meaningful agreement
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.1


def test_quantized_sparse_masked_dense_path():
    cfg = get_model_config("tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qparams = quant.quantize_params_int8(params)
    sp = SparsityConfig(enabled=True, apply_prefill=True)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    tokens = jnp.array([[1, 2, 3, 4]], jnp.int32)
    cache = KVCache.init(cfg, 1, 8, jnp.bfloat16)
    logits, _ = llama.forward(qparams, tokens, cache, 0, th, cfg=cfg, sp=sp)
    assert np.isfinite(np.asarray(logits)).all()


def test_quantize_params_int4_model_forward():
    cfg = get_model_config("tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qparams = quant.quantize_params_int4(params, group=32)
    for name in ("wq", "wdown"):
        leaf = qparams["layers"][name]
        assert set(leaf) == {"q", "scale", "zero"}
        assert leaf["q"].dtype == jnp.int8
    tokens = jnp.array([[1, 2, 3, 4]], jnp.int32)
    cache = KVCache.init(cfg, 1, 8, jnp.bfloat16)
    logits, _ = llama.forward(qparams, tokens, cache, 0,
                              llama.zero_thresholds(cfg), cfg=cfg,
                              sp=SparsityConfig())
    assert np.isfinite(np.asarray(logits)).all()
    # int4 dequant model tracks the fp32 model's top prediction on a
    # majority of positions (sanity: quantization is lossy but close)
    cache = KVCache.init(cfg, 1, 8, jnp.float32)
    ref, _ = llama.forward(params, tokens, cache, 0,
                           llama.zero_thresholds(cfg), cfg=cfg,
                           sp=SparsityConfig())
    agree = np.mean(
        np.argmax(np.asarray(logits), -1) == np.argmax(np.asarray(ref), -1)
    )
    assert agree >= 0.5


def test_quantize_cli_roundtrip(tmp_path):
    """quantize -> native store -> generate loads it transparently
    (VERDICT missing #2: the reference's model_int8.pth workflow,
    quantize.py:528-605 + generate.py:230-242)."""
    from teal_tpu import cli
    from teal_tpu.utils import checkpoint

    cfg = get_model_config("tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    src = str(tmp_path / "native")
    checkpoint.save_params(params, src)

    for mode in ("int8", "int4"):
        out = str(tmp_path / f"model_{mode}")
        cli.main(["quantize", "--model", "tiny", "--checkpoint", src,
                  "--mode", mode, "--output-path", out,
                  "--group-size", "32"])
        loaded = checkpoint.load_params(out)
        keys = set(loaded["layers"]["wq"])
        assert keys == ({"q", "scale"} if mode == "int8"
                        else {"q", "scale", "zero"})
        tokens = jnp.array([[1, 2, 3]], jnp.int32)
        cache = KVCache.init(cfg, 1, 8, jnp.bfloat16)
        logits, _ = llama.forward(loaded, tokens, cache, 0,
                                  llama.zero_thresholds(cfg), cfg=cfg,
                                  sp=SparsityConfig())
        assert np.isfinite(np.asarray(logits)).all()


def test_quantized_lm_head():
    """quantize_params_int8/int4 quantize the output head like every
    other linear (reference replace walks self.output too,
    quantize.py:312-317) and forward dispatches on the dict."""
    cfg = get_model_config("tiny")
    params = llama.init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    tokens = jnp.array([[5, 1, 7]], jnp.int32)
    sp = SparsityConfig()
    ref, _ = llama.forward(params, tokens,
                           KVCache.init(cfg, 1, 8, jnp.float32), 0,
                           llama.zero_thresholds(cfg), cfg=cfg, sp=sp)
    for quantize, bound in ((quant.quantize_params_int8, 0.1),
                            (quant.quantize_params_int4, 0.3)):
        qparams = quantize(params)
        assert isinstance(qparams["lm_head"], dict), quantize.__name__
        assert qparams["lm_head"]["q"].dtype == jnp.int8
        got, _ = llama.forward(qparams, tokens,
                               KVCache.init(cfg, 1, 8, jnp.bfloat16), 0,
                               llama.zero_thresholds(cfg), cfg=cfg, sp=sp)
        assert got.dtype == jnp.float32
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < bound, (quantize.__name__, rel)
