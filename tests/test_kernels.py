"""Pallas kernel correctness vs jnp references (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from teal_tpu.config import SparsityConfig
from teal_tpu.ops import block_gemv, gather_gemv, sparse_gemv
from teal_tpu.ops.sparsify import sparsify

# interpret-mode kernel equivalence dominates suite runtime (VERDICT r2
# weak #7); fast dev lane: pytest -m "not slow" (< ~2 min)
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.fixture(scope="module")
def xw():
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (1, 256), jnp.float32)
    w = jax.random.normal(kw, (256, 256), jnp.float32)
    return x, w


def test_block_gemv_dense_degeneracy(xw):
    """keep_frac=1.0 must reproduce the dense matmul."""
    x, w = xw
    y = block_gemv.block_sparse_matmul(x, w, None, block_size=32,
                                       keep_frac=1.0)
    ref = jnp.matmul(x, w, preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_block_gemv_matches_semantics_twin(xw):
    x, w = xw
    for keep in (0.25, 0.5, 0.75):
        y = block_gemv.block_sparse_matmul(x, w, None, block_size=16,
                                           keep_frac=keep)
        ref = block_gemv.block_sparse_matmul_reference(
            x, w, None, block_size=16, keep_frac=keep
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_block_gemv_with_threshold(xw):
    x, w = xw
    t = jnp.float32(1.0)
    y = block_gemv.block_sparse_matmul(x, w, t, block_size=16, keep_frac=0.5)
    ref = block_gemv.block_sparse_matmul_reference(
        x, w, t, block_size=16, keep_frac=0.5
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_block_selection_drops_lowest_scores(xw):
    """The kept groups must be exactly the top-k by group max-|x|."""
    x, w = xw
    G, keep = 16, 0.5
    nb = x.shape[1] // G
    k = int(round(nb * keep))
    s = np.asarray(block_gemv.group_scores(x, G))
    idx, xpack = block_gemv.select_groups(x, G, k)
    expected = np.sort(np.argsort(-s, kind="stable")[:k])
    np.testing.assert_array_equal(np.sort(np.asarray(idx)), expected)
    # xpack lanes [:G] carry the group's x values (single-row layout)
    xg = np.asarray(x).reshape(nb, G)
    np.testing.assert_allclose(np.asarray(xpack)[:, 0, :G],
                               xg[np.asarray(idx)])


def test_row_gather_exact_semantics(xw):
    """Unstructured gather kernel == sparsify-then-matmul, any threshold."""
    x, w = xw
    for t in (0.0, 0.5, 1.0, 2.0):
        y = gather_gemv.gather_sparse_matmul(x, w, jnp.float32(t),
                                             nnz_cap_frac=1.0)
        ref = jnp.matmul(sparsify(x, t), w,
                         preferred_element_type=jnp.float32)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_row_gather_capacity_padding(xw):
    """With nnz < capacity, padding contributes exactly zero."""
    x, w = xw
    t = jnp.float32(2.0)  # very sparse: few survivors
    nnz = int(np.sum(np.abs(np.asarray(x)) > 2.0))
    assert nnz < 64
    y = gather_gemv.gather_sparse_matmul(x, w, t, nnz_cap_frac=0.25)
    ref = jnp.matmul(sparsify(x, t), w, preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_compact_indices():
    x = jnp.asarray([[0.1, -3.0, 0.2, 2.0, -0.05, 1.5, 0.0, -2.5]])
    idx, vals = gather_gemv.compact_indices(x, 1.0, 4)
    # survivors: positions 1, 3, 5, 7
    np.testing.assert_array_equal(np.asarray(idx), [1, 3, 5, 7])
    np.testing.assert_allclose(np.asarray(vals), [-3.0, 2.0, 1.5, -2.5])


def test_dispatch_modes(xw):
    x, w = xw
    t = jnp.float32(0.5)
    ref = sparse_gemv.masked_dense_matmul(x, w, t)
    sp = SparsityConfig(enabled=True, kernel="gather", gather_cap_frac=1.0)
    y = sparse_gemv.sparse_matmul(x, w, t, sp)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=16,
                        block_keep_frac=1.0)
    y = sparse_gemv.sparse_matmul(x, w, t, sp)
    dense = jnp.matmul(x, w, preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(dense),
                               rtol=1e-5, atol=1e-4)


def test_project_many_fused_matches_single():
    key = jax.random.PRNGKey(3)
    kx, k1, k2, k3 = jax.random.split(key, 4)
    x = jax.random.normal(kx, (1, 1, 256), jnp.float32)
    ws = [jax.random.normal(k, (256, 128 * m), jnp.float32)
          for k, m in ((k1, 1), (k2, 2), (k3, 1))]
    outs = block_gemv.project_many(x, ws, block_size=16, keep_frac=0.5)
    for w, y in zip(ws, outs):
        ref = block_gemv.block_sparse_matmul(x, w, None, 16, 0.5)
        assert y.shape == (1, 1, w.shape[1])
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)


def test_decode_with_block_kernel_matches_masked_reference():
    """Full tiny-but-block-compatible model decode through the fused path."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", dim=256, intermediate_size=512,
                           n_heads=4, n_kv_heads=2, vocab_size=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    tok = jnp.array([[7]], jnp.int32)
    sp_block = SparsityConfig(enabled=True, kernel="block", block_size=16,
                              block_keep_frac=1.0)
    cache = KVCache.init(cfg, 1, 8, jnp.float32)
    got, _ = llama.forward(params, tok, cache, 0,
                           llama.zero_thresholds(cfg), cfg=cfg, sp=sp_block)
    cache = KVCache.init(cfg, 1, 8, jnp.float32)
    ref, _ = llama.forward(params, tok, cache, 0,
                           llama.zero_thresholds(cfg), cfg=cfg,
                           sp=SparsityConfig())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_per_projection_keep_fracs_decode():
    """block_keep_fracs: differing per-projection capacities still produce
    finite, shape-correct decode; equal fracs match the uniform path."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", dim=256, intermediate_size=512,
                           n_heads=4, n_kv_heads=2, vocab_size=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    tok = jnp.array([[7]], jnp.int32)
    th = llama.zero_thresholds(cfg)

    sp_uniform = SparsityConfig(enabled=True, kernel="block", block_size=16,
                                block_keep_frac=0.5)
    sp_tuple = sp_uniform.replace(block_keep_fracs=(0.5,) * 7)
    outs = []
    for sp in (sp_uniform, sp_tuple):
        cache = KVCache.init(cfg, 1, 8, jnp.float32)
        lg, _ = llama.forward(params, tok, cache, 0, th, cfg=cfg, sp=sp)
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)

    sp_greedy = sp_uniform.replace(
        block_keep_fracs=(0.75, 0.5, 0.5, 0.75, 0.25, 0.5, 0.75))
    cache = KVCache.init(cfg, 1, 8, jnp.float32)
    lg, _ = llama.forward(params, tok, cache, 0, th, cfg=cfg, sp=sp_greedy)
    assert np.isfinite(np.asarray(lg)).all()
    assert not np.allclose(np.asarray(lg), outs[0])


def test_keep_fracs_from_greedy(tmp_path):
    import csv
    from teal_tpu.config import get_model_config
    from teal_tpu.calibration.thresholds import keep_fracs_from_greedy

    cfg = get_model_config("tiny", n_layers=2)
    for l, rows in enumerate([[(0.3, [0.2, 0.1, 0.1, 0.3, 0.4, 0.4, 0.3])],
                              [(0.3, [0.4, 0.3, 0.3, 0.1, 0.2, 0.2, 0.5])]]):
        d = tmp_path / f"layer-{l}"
        d.mkdir(parents=True)
        with open(d / "results.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["Effective Sparsity", "Activation Error",
                        "Baseline Error", "q", "k", "v", "o", "gate", "up",
                        "down"])
            for eff, s in rows:
                w.writerow([eff, 0.1, 0.2] + s)
    kf = keep_fracs_from_greedy(str(tmp_path), cfg, 0.3)
    assert len(kf) == 7
    assert kf[0] == pytest.approx(1 - (0.2 + 0.4) / 2)
    assert kf[6] == pytest.approx(1 - (0.3 + 0.5) / 2)


def test_fused_threshold_selection_matches_twin():
    """project_many with a threshold routes through the in-kernel
    selection; result must match the accuracy twin (threshold + capacity
    semantics)."""
    key = jax.random.PRNGKey(5)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (1, 1, 256), jnp.float32)
    w = jax.random.normal(kw, (256, 256), jnp.float32)
    G, keep = 16, 0.75
    s = np.asarray(block_gemv.group_scores(x.reshape(1, -1), G))
    thr = float(np.median(s))

    (y,) = block_gemv.project_many(x, [w], G, keep,
                                   threshold=jnp.float32(thr))
    nb = 256 // G
    cap = int(round(nb * keep))
    keep_idx = [i for i in range(nb) if s[i] > thr][:cap]
    mask = np.zeros(nb, bool)
    mask[keep_idx] = True
    xm = (np.asarray(x).reshape(nb, G) * mask[:, None]).reshape(1, 1, 256)
    ref = xm @ np.asarray(w)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-4)


def test_block_thresholding_model_decode():
    """Full tiny model decode with block_thresholding: threshold 0 keeps
    first-capacity groups; must be finite and differ from dense."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", dim=256, intermediate_size=512,
                           n_heads=4, n_kv_heads=2, vocab_size=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    tok = jnp.array([[7]], jnp.int32)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=16,
                        block_keep_frac=0.5, block_thresholding=True)
    cache = KVCache.init(cfg, 1, 8, jnp.float32)
    got, _ = llama.forward(params, tok, cache, 0,
                           llama.zero_thresholds(cfg), cfg=cfg, sp=sp)
    assert np.isfinite(np.asarray(got)).all()
    cache = KVCache.init(cfg, 1, 8, jnp.float32)
    dense, _ = llama.forward(params, tok, cache, 0,
                             llama.zero_thresholds(cfg), cfg=cfg,
                             sp=SparsityConfig())
    assert not np.allclose(np.asarray(got), np.asarray(dense))


def test_batched_block_decode_matches_twin():
    """Batched (B<=8) sparse GEMV: per-row outputs equal the masked-dense
    twin under the pooled-score shared mask."""
    key = jax.random.PRNGKey(8)
    kx, kw1, kw2 = jax.random.split(key, 3)
    B, K = 3, 256
    x = jax.random.normal(kx, (B, K), jnp.float32)
    ws = [jax.random.normal(kw1, (K, 128), jnp.float32),
          jax.random.normal(kw2, (K, 256), jnp.float32)]
    G, keep = 16, 0.5
    ys = block_gemv.project_many_batched(x, ws, G, keep)
    nb = K // G
    mask = np.asarray(block_gemv.batched_group_mask(x, G, int(nb * keep)))
    xm = np.asarray(x) * mask
    for w, y in zip(ws, ys):
        ref = xm @ np.asarray(w)
        assert y.shape == (B, w.shape[1])
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-4)


def test_batched_model_block_decode():
    """Model-level batched (B=4) block decode: finite and per-slot
    independent from the batch-1 path at keep=1.0 (dense degeneracy)."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", dim=256, intermediate_size=512,
                           n_heads=4, n_kv_heads=2, vocab_size=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    th = llama.zero_thresholds(cfg)
    toks = jnp.array([[7], [9], [2], [5]], jnp.int32)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=16,
                        block_keep_frac=1.0)
    cache = KVCache.init(cfg, 4, 8, jnp.float32)
    got, _ = llama.forward(params, toks, cache, 0, th, cfg=cfg, sp=sp)

    cache = KVCache.init(cfg, 4, 8, jnp.float32)
    dense, _ = llama.forward(params, toks, cache, 0, th, cfg=cfg,
                             sp=SparsityConfig())
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                               rtol=1e-4, atol=1e-3)

    # sparse batched: finite, differs from dense
    sp2 = sp.replace(block_keep_frac=0.5)
    cache = KVCache.init(cfg, 4, 8, jnp.float32)
    got2, _ = llama.forward(params, toks, cache, 0, th, cfg=cfg, sp=sp2)
    assert np.isfinite(np.asarray(got2)).all()
    assert not np.allclose(np.asarray(got2), np.asarray(dense))


def test_unified_threshold_semantics_overflow_regime():
    """THE selection rule (docs/KERNEL_NOTES.md "Selection semantics"):
    threshold mode = survivors in ascending index order, first cap kept.
    All four implementations must agree bit-wise on the kept set, across
    under-, exactly-, and over-subscribed capacities."""
    from teal_tpu.ops.sparsify import sparsify_groups

    key = jax.random.PRNGKey(11)
    G, K, N = 16, 256, 128
    nb = K // G
    for trial in range(4):
        key, kx, kw = jax.random.split(key, 3)
        x = jax.random.normal(kx, (1, K), jnp.float32)
        w = jax.random.normal(kw, (K, N), jnp.float32)
        s = np.asarray(block_gemv.group_scores(x, G))
        for q in (0.1, 0.5, 0.9):   # survivor fraction ~ (1 - q)
            thr = float(np.quantile(s, q))
            for keep in (0.25, 0.5, 0.75, 1.0):
                cap = max(1, min(nb, int(round(nb * keep))))
                # ground truth: first `cap` survivors by index
                surv = [i for i in range(nb) if s[i] > thr]
                kept = set(surv[:cap])
                mask = np.repeat(
                    np.array([i in kept for i in range(nb)]), G
                )
                xm = np.where(mask[None, :], np.asarray(x), 0.0)
                want = xm @ np.asarray(w)

                t = jnp.float32(thr)
                # 1. select_groups + gather kernel
                y1 = block_gemv.block_sparse_matmul(
                    x, w, t, block_size=G, keep_frac=keep)
                # 2. pure-jnp twin
                y2 = block_gemv.block_sparse_matmul_reference(
                    x, w, t, block_size=G, keep_frac=keep)
                # 3. sparsify_groups (accuracy path)
                y3 = jnp.matmul(sparsify_groups(x, G, keep, threshold=t), w)
                # 4. fused in-kernel selection
                (y4,) = block_gemv.project_many(
                    x[:, None, :], [w], G, keep, threshold=t)
                for i, y in enumerate((y1, y2, y3, y4)):
                    np.testing.assert_allclose(
                        np.asarray(y).reshape(1, N), want,
                        rtol=1e-5, atol=1e-4,
                        err_msg=f"impl {i+1} trial={trial} q={q} keep={keep}",
                    )


def test_int4_pack_unpack_roundtrip():
    from teal_tpu.ops import quant

    w = jax.random.normal(jax.random.PRNGKey(2), (128, 256), jnp.float32)
    wq = quant.quantize_int4(w, group=64)
    packed = quant.pack_int4(wq)
    assert packed["qp"].shape == (64, 256)
    assert packed["sz"].shape == (2, 2, 256)
    wd_ref = quant.dequantize_int4(wq, jnp.float32)
    wd = quant.unpack_int4(packed["qp"], packed["sz"], jnp.float32)
    np.testing.assert_allclose(np.asarray(wd), np.asarray(wd_ref),
                               rtol=1e-5, atol=1e-5)


def test_int4_block_sparse_matmul_matches_dequant_twin():
    """Fused int4 gather kernel == select-mask + dequantized dense matmul
    (exact: factored affine is algebraically identical)."""
    from teal_tpu.ops import quant
    from teal_tpu.ops.sparsify import sparsify_groups

    key = jax.random.PRNGKey(7)
    kx, kw = jax.random.split(key)
    K, N = 256, 256
    x = jax.random.normal(kx, (1, K), jnp.float32)
    w = jax.random.normal(kw, (K, N), jnp.float32)
    wq = quant.quantize_int4(w, group=64)
    packed = quant.pack_int4(wq)
    wd = np.asarray(quant.dequantize_int4(wq, jnp.float32))

    for keep in (0.5, 1.0):
        y = quant.int4_block_sparse_matmul(x, packed, block_size=64,
                                           keep_frac=keep)
        xs = np.asarray(sparsify_groups(x, 64, keep))
        ref = xs @ wd
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3,
                                   atol=1e-2,
                                   err_msg=f"keep={keep}")


def test_int4_model_block_decode():
    """Packed-int4 model through the block kernel decode path (stacked
    weights + in-kernel dequant) vs the dense packed path at keep=1."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache
    from teal_tpu.ops import quant

    cfg = get_model_config("tiny", dim=256, intermediate_size=512,
                           n_heads=4, n_kv_heads=2, vocab_size=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    q4 = quant.quantize_params_int4(params, group=64)
    q4p = quant.pack_int4_params(q4, block_size=64)
    assert set(q4p["layers"]["wq"]) == {"qp", "sz"}
    tok = jnp.array([[7]], jnp.int32)
    th = llama.zero_thresholds(cfg)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=64,
                        block_keep_frac=1.0)
    cache = KVCache.init(cfg, 1, 8, jnp.bfloat16)
    got, _ = llama.forward(q4p, tok, cache, 0, th, cfg=cfg, sp=sp)

    cache = KVCache.init(cfg, 1, 8, jnp.bfloat16)
    ref, _ = llama.forward(q4p, tok, cache, 0, th, cfg=cfg,
                           sp=SparsityConfig())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=5e-2)

    # sparse: runs and differs
    sp2 = sp.replace(block_keep_frac=0.5)
    cache = KVCache.init(cfg, 1, 8, jnp.bfloat16)
    got2, _ = llama.forward(q4p, tok, cache, 0, th, cfg=cfg, sp=sp2)
    assert np.isfinite(np.asarray(got2)).all()
    assert not np.allclose(np.asarray(got2), np.asarray(ref))


def test_batched_threshold_selection_matches_twin():
    """Batched (B<=8) threshold-mode selection: unified rule on the
    batch-pooled score; kernel output == masked-dense twin."""
    key = jax.random.PRNGKey(21)
    kx, kw = jax.random.split(key)
    B, K, N, G = 3, 256, 128, 16
    x = jax.random.normal(kx, (B, K), jnp.float32)
    w = jax.random.normal(kw, (K, N), jnp.float32)
    nb = K // G
    pooled = np.asarray(
        jnp.max(jnp.abs(x).reshape(B, nb, G), axis=-1).max(axis=0))
    for q, keep in ((0.3, 0.5), (0.7, 0.25), (0.5, 1.0)):
        thr = float(np.quantile(pooled, q))
        cap = max(1, min(nb, int(round(nb * keep))))
        ys = block_gemv.project_many_batched(
            x, [w], G, keep, threshold=jnp.float32(thr))
        mask = np.asarray(block_gemv.batched_group_mask(
            x, G, cap, threshold=jnp.float32(thr)))
        ref = (np.asarray(x) * mask) @ np.asarray(w)
        # ground truth: first cap pooled-survivors by index
        surv = [i for i in range(nb) if pooled[i] > thr][:cap]
        gt_mask = np.repeat(
            np.array([i in set(surv) for i in range(nb)]), G)
        np.testing.assert_array_equal(mask[0], gt_mask)
        np.testing.assert_allclose(np.asarray(ys[0]), ref, rtol=1e-5,
                                   atol=1e-4, err_msg=f"q={q} keep={keep}")


def test_decode_attention_matches_reference():
    """Fused decode-attention kernel (in-place aliased cache write +
    attention) == dynamic_update_slice + _attention on the sliced cache,
    across MHA/GQA, batch sizes, positions, and sliding window."""
    from teal_tpu.models import llama
    from teal_tpu.ops.decode_attention import decode_attention

    key = jax.random.PRNGKey(3)
    L, T, D = 3, 64, 128
    for B, Hq, Hkv, window in ((1, 4, 4, None), (3, 8, 2, None),
                               (2, 4, 4, 16)):
        key, kq, kk, kv, kp, kn = jax.random.split(key, 6)
        q = jax.random.normal(kq, (B, Hq, 1, D), jnp.float32)
        kc = jax.random.normal(kk, (L, B, Hkv, T, D), jnp.float32)
        vc = jax.random.normal(kv, (L, B, Hkv, T, D), jnp.float32)
        k_new = jax.random.normal(kn, (B, Hkv, 1, D), jnp.float32)
        v_new = k_new * 0.7 + 0.1
        pos = jax.random.randint(kp, (B,), 0, T)
        for li in (0, L - 1):
            # reference: write current token, then masked attention
            upd = jax.vmap(lambda c, n, p: jax.lax.dynamic_update_slice(
                c, n, (0, p, 0)))
            kc_ref = kc.at[li].set(upd(kc[li], k_new, pos))
            vc_ref = vc.at[li].set(upd(vc[li], v_new, pos))
            got, kc_out, vc_out = decode_attention(
                q, k_new, v_new, kc, vc, li, pos, window=window)
            ref = llama._attention(q, kc_ref[li], vc_ref[li], pos, 1, T,
                                   window)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"B={B} Hkv={Hkv} li={li}")
            np.testing.assert_array_equal(np.asarray(kc_out),
                                          np.asarray(kc_ref))
            np.testing.assert_array_equal(np.asarray(vc_out),
                                          np.asarray(vc_ref))


def test_decode_attention_bf16_cache_tolerance():
    """bf16-cache numerics bound (ADVICE r4): the MXU path rounds the
    fp32 post-RoPE q and the fp32 softmax weights to bf16 before the
    dots; this pins the kernel against an ALL-fp32 XLA reference
    (cache contents upcast) within a bf16-rounding tolerance, so the
    production bf16 decode/verify path has an explicit numerics test
    (the exactness tests above use fp32 caches)."""
    from teal_tpu.models import llama
    from teal_tpu.ops.decode_attention import decode_attention

    key = jax.random.PRNGKey(11)
    L, T, D = 2, 64, 128
    for B, Hq, Hkv, window in ((1, 4, 4, None), (2, 8, 2, 16)):
        key, kq, kk, kn, kp = jax.random.split(key, 5)
        q = jax.random.normal(kq, (B, Hq, 1, D), jnp.float32)
        kc = jax.random.normal(kk, (L, B, Hkv, T, D)).astype(jnp.bfloat16)
        vc = (kc * 0.7 + 0.1).astype(jnp.bfloat16)
        k_new = jax.random.normal(kn, (B, Hkv, 1, D), jnp.float32)
        v_new = k_new * 0.5 - 0.2
        pos = jax.random.randint(kp, (B,), 0, T)
        got, kc_out, vc_out = decode_attention(
            q, k_new.astype(jnp.bfloat16), v_new.astype(jnp.bfloat16),
            kc, vc, 0, pos, window=window)
        # fp32 reference on the SAME bf16 cache contents (incl. the
        # bf16-rounded current-token write)
        ref = llama._attention(
            q, kc_out[0].astype(jnp.float32), vc_out[0].astype(jnp.float32),
            pos, 1, T, window)
        g = np.asarray(got, np.float32)
        r = np.asarray(ref, np.float32)
        # bound vs the output SCALE: bf16-rounded softmax weights give
        # each element ~0.4% rounding but small elements see larger
        # relative noise — the claim is that no error is material at
        # the activation's scale
        scale = np.abs(r).max()
        assert np.abs(g - r).max() < 0.02 * scale, \
            (np.abs(g - r).max() / scale, B, Hkv, window)


def test_fused_decode_model_equivalence():
    """forward() with fused_decode_attention on == off (dense decode)."""
    from teal_tpu.config import ModelConfig
    from teal_tpu.models import llama

    cfg = ModelConfig(name="hd128", vocab_size=64, n_layers=2, n_heads=2,
                      n_kv_heads=1, dim=256, intermediate_size=288,
                      max_seq_len=32)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    th = llama.zero_thresholds(cfg)
    tok = jnp.array([[5], [9]], jnp.int32)
    pos = jnp.array([3, 7], jnp.int32)
    cache = llama.KVCache.init(cfg, 2, 32, jnp.float32)
    k0 = jax.random.normal(jax.random.PRNGKey(1), cache.k.shape, jnp.float32)
    cache = llama.KVCache(k=k0, v=k0 * 0.5)

    sp_off = SparsityConfig(fused_decode_attention=False)
    sp_on = SparsityConfig(fused_decode_attention=True)
    ref, cref = llama.forward(params, tok, cache, pos, th, cfg=cfg, sp=sp_off)
    got, cgot = llama.forward(params, tok, cache, pos, th, cfg=cfg, sp=sp_on)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cgot.k), np.asarray(cref.k),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cgot.v), np.asarray(cref.v),
                               rtol=1e-5, atol=1e-6)


def test_decode_attention_multi_chunk():
    """Chunked online-softmax path: several chunks, positions on and off
    chunk boundaries, sliding window skipping leading chunks."""
    from teal_tpu.models import llama
    from teal_tpu.ops import decode_attention as da

    old = da.CHUNK
    da.CHUNK = 16
    try:
        key = jax.random.PRNGKey(11)
        L, T, D = 2, 48, 128   # 3 chunks of 16
        for B, Hq, Hkv, window, positions in (
                (1, 2, 2, None, (0, 15, 16, 17, 31, 47)),
                (2, 4, 2, 20, (19, 40)),
        ):
            for p in positions:
                key, kq, kk, kv, kn = jax.random.split(key, 5)
                q = jax.random.normal(kq, (B, Hq, 1, D), jnp.float32)
                kc = jax.random.normal(kk, (L, B, Hkv, T, D), jnp.float32)
                vc = jax.random.normal(kv, (L, B, Hkv, T, D), jnp.float32)
                k_new = jax.random.normal(kn, (B, Hkv, 1, D), jnp.float32)
                v_new = k_new * 0.3 - 0.2
                pos = jnp.full((B,), p, jnp.int32)
                upd = jax.vmap(lambda c, n, pp: jax.lax.dynamic_update_slice(
                    c, n, (0, pp, 0)))
                kc_ref = kc.at[0].set(upd(kc[0], k_new, pos))
                vc_ref = vc.at[0].set(upd(vc[0], v_new, pos))
                got, kc_out, vc_out = da.decode_attention(
                    q, k_new, v_new, kc, vc, 0, pos, window=window)
                ref = llama._attention(q, kc_ref[0], vc_ref[0], pos, 1, T,
                                       window)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5,
                    err_msg=f"B={B} Hkv={Hkv} pos={p} window={window}")
                np.testing.assert_array_equal(np.asarray(kc_out),
                                              np.asarray(kc_ref))
    finally:
        da.CHUNK = old


def test_fused_norm_fold_matches_unfolded():
    """In-kernel rms_norm (norm3) == XLA rms_norm + threshold-mode kernel,
    for 2D and layer-stacked gains, fp32 and bf16 inputs."""
    from teal_tpu.models.llama import rms_norm

    key = jax.random.PRNGKey(3)
    K, N, G, eps = 256, 384, 32, 1e-5
    for dtype, stacked in ((jnp.float32, False), (jnp.bfloat16, True)):
        key, kh, kw, kg = jax.random.split(key, 4)
        h = (jax.random.normal(kh, (1, K), jnp.float32) * 2).astype(dtype)
        w = jax.random.normal(kw, (K, N), jnp.float32).astype(dtype)
        L = 3
        gains = (1.0 + 0.3 * jax.random.normal(kg, (L, K), jnp.float32)
                 ).astype(dtype)
        thr = jnp.asarray([0.9], jnp.float32)
        cap = (K // G) // 2
        for li in range(L) if stacked else (0,):
            gain = gains[li]
            xn = rms_norm(h, gain, eps)
            (ref,) = block_gemv.fused_select_gather_gemv(
                block_gemv.pack_x3(xn, G), thr, (w,), G=G, cap=cap,
                out_dtype=jnp.float32)
            norm3 = block_gemv.pack_norm3(gains if stacked else gain, G)
            (got,) = block_gemv.fused_select_gather_gemv(
                block_gemv.pack_x3(h.reshape(1, K), G), thr, (w,), G=G,
                cap=cap, out_dtype=jnp.float32,
                layer=jnp.int32(li) if stacked else None,
                norm3=norm3, norm_eps=eps)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-2, atol=2e-2)


def test_norm_fold_model_equivalence():
    """Full-model decode: folded-norm threshold path == no-fold path
    (packed_norms=None) on a tiny config."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", n_layers=2, n_heads=4, n_kv_heads=4,
                           dim=256, intermediate_size=384, vocab_size=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=32,
                        block_keep_frac=0.625, block_thresholding=True,
                        fused_decode_attention=False)
    cache = KVCache.init(cfg, 1, 16, jnp.float32)
    tok = jnp.asarray([[7]], jnp.int32)
    th = jnp.full((cfg.n_layers, 7), 0.05, jnp.float32)

    logits_fold, _ = llama.forward(params, tok, cache, 3, th, cfg=cfg, sp=sp)

    # no-fold reference: same forward with packed_norms suppressed
    import unittest.mock as mock
    orig = llama.layer_forward

    def no_fold_layer(*a, **kw):
        kw["packed_norms"] = None
        return orig(*a, **kw)

    with mock.patch.object(llama, "layer_forward", no_fold_layer):
        logits_ref, _ = llama.forward(params, tok, cache, 3, th,
                                      cfg=cfg, sp=sp)
    np.testing.assert_allclose(np.asarray(logits_fold),
                               np.asarray(logits_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_attn_block_model_equivalence():
    """One-launch attention block (norm+select+QKV+RoPE+cache+attention)
    == the two-kernel path, across MHA/GQA, chunk boundaries, sliding
    window, and multi-chunk caches."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache
    from teal_tpu.ops import decode_attention as da

    old_chunk = da.CHUNK
    da.CHUNK = 16
    try:
        for n_heads, n_kv, window in ((2, 2, None), (4, 2, None),
                                      (2, 2, 20)):
            cfg = get_model_config(
                "tiny", n_layers=2, n_heads=n_heads, n_kv_heads=n_kv,
                dim=256 * (n_heads // 2), intermediate_size=384,
                vocab_size=128, sliding_window=window)
            assert cfg.head_dim == 128
            params = llama.init_params(cfg, jax.random.PRNGKey(1),
                                       jnp.float32)
            base = SparsityConfig(
                enabled=True, kernel="block", block_size=32,
                block_keep_frac=0.75, block_thresholding=True,
                fused_decode_attention=True)
            th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
            T = 48   # 3 chunks of 16
            for p in (0, 15, 16, 40):
                cache = KVCache.init(cfg, 1, T, jnp.float32)
                cache = KVCache(
                    k=jax.random.normal(jax.random.PRNGKey(p), cache.k.shape,
                                        jnp.float32) * 0.1,
                    v=jax.random.normal(jax.random.PRNGKey(p + 1),
                                        cache.v.shape, jnp.float32) * 0.1)
                tok = jnp.asarray([[p % 97]], jnp.int32)
                got, cg = llama.forward(params, tok, cache, p, th,
                                        cfg=cfg, sp=base)
                ref, cr = llama.forward(
                    params, tok, cache, p, th, cfg=cfg,
                    sp=base.replace(fused_attn_block=False))
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4,
                    err_msg=f"H={n_heads}/{n_kv} pos={p} window={window}")
                np.testing.assert_allclose(np.asarray(cg.k),
                                           np.asarray(cr.k),
                                           rtol=1e-5, atol=1e-6)
                np.testing.assert_allclose(np.asarray(cg.v),
                                           np.asarray(cr.v),
                                           rtol=1e-5, atol=1e-6)
    finally:
        da.CHUNK = old_chunk


def test_packed_pipeline_model_equivalence():
    """Packed pipeline (G=128, zero XLA between launches: packed-row
    chaining + in-kernel residual/silu) == the per-kernel fallback."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", n_layers=2, n_heads=2, n_kv_heads=2,
                           dim=256, intermediate_size=384, vocab_size=128)
    assert cfg.head_dim == 128
    params = llama.init_params(cfg, jax.random.PRNGKey(2), jnp.float32)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.75, block_thresholding=True,
                        fused_decode_attention=True)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    for p in (0, 5):
        cache = KVCache.init(cfg, 1, 16, jnp.float32)
        tok = jnp.asarray([[3 + p]], jnp.int32)
        got, cg = llama.forward(params, tok, cache, p, th, cfg=cfg, sp=sp)
        ref, cr = llama.forward(params, tok, cache, p, th, cfg=cfg,
                                sp=sp.replace(packed_pipeline=False))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"pos={p}")
        np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cr.k),
                                   rtol=1e-5, atol=1e-6)


def test_token_kernel_model_equivalence():
    """Whole-token kernel (ONE launch, grid over layers, residual stream
    in persistent VMEM) == the 4-launch packed pipeline == the
    per-kernel fallback; per-layer thresholds exercised via the
    scalar-prefetched [L, 7] table, GQA via n_kv_heads < n_heads."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", n_layers=3, n_heads=2, n_kv_heads=1,
                           dim=256, intermediate_size=384, vocab_size=128)
    assert cfg.head_dim == 128
    params = llama.init_params(cfg, jax.random.PRNGKey(7), jnp.float32)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.75, block_thresholding=True,
                        fused_decode_attention=True)
    # distinct per-layer, per-projection thresholds
    th = (0.01 + 0.02 * jnp.arange(cfg.n_layers * 7, dtype=jnp.float32)
          .reshape(cfg.n_layers, 7) / (cfg.n_layers * 7))
    for p in (0, 5, 15):
        cache = KVCache.init(cfg, 1, 16, jnp.float32)
        cache = KVCache(
            k=jax.random.normal(jax.random.PRNGKey(p), cache.k.shape,
                                jnp.float32) * 0.1,
            v=jax.random.normal(jax.random.PRNGKey(p + 1), cache.v.shape,
                                jnp.float32) * 0.1)
        tok = jnp.asarray([[3 + p]], jnp.int32)
        got, cg = llama.forward(params, tok, cache, p, th, cfg=cfg, sp=sp)
        mid, cm = llama.forward(params, tok, cache, p, th, cfg=cfg,
                                sp=sp.replace(token_fused=False))
        ref, cr = llama.forward(
            params, tok, cache, p, th, cfg=cfg,
            sp=sp.replace(token_fused=False, packed_pipeline=False))
        np.testing.assert_allclose(np.asarray(got), np.asarray(mid),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"token-vs-packed pos={p}")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"token-vs-perkernel pos={p}")
        np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cm.k),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(cg.v), np.asarray(cm.v),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cr.k),
                                   rtol=1e-5, atol=1e-6)


def test_token_kernel_int8_equivalence():
    """int8 weight-only through the whole-token kernel (per-out-channel
    scale applied to the fp32 accumulator in the stage writers, pre-RoPE
    for q/k/v) == the per-kernel int8 path (XLA post-scale). Activations
    are bf16 in both paths (int8 compute dtype), so tolerances are
    bf16-scale."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", n_layers=2, n_heads=2, n_kv_heads=1,
                           dim=256, intermediate_size=384, vocab_size=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(3), jnp.float32)

    def q8(stack):   # per-layer, per-out-channel symmetric int8
        wf = stack.astype(jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=1)                  # [L, N]
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(wf / scale[:, None, :]),
                     -128, 127).astype(jnp.int8)
        return {"q": q, "scale": scale}

    for n in ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown"):
        params["layers"][n] = q8(params["layers"][n])
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.75, block_thresholding=True,
                        fused_decode_attention=True)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    for p in (0, 5):
        # bf16 cache: int8's compute dtype (the production pairing —
        # an f32 cache would make the XLA attention emit f32 and the
        # reference path's residual dtype drift)
        cache = KVCache.init(cfg, 1, 16, jnp.bfloat16)
        tok = jnp.asarray([[3 + p]], jnp.int32)
        got, cg = llama.forward(params, tok, cache, p, th, cfg=cfg, sp=sp)
        ref, cr = llama.forward(params, tok, cache, p, th, cfg=cfg,
                                sp=sp.replace(token_fused=False))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-2, atol=5e-2,
                                   err_msg=f"int8 token pos={p}")
        np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cr.k),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(cg.v), np.asarray(cr.v),
                                   rtol=2e-2, atol=2e-2)


def test_token_kernel_int4_equivalence():
    """Packed-int4 through the whole-token kernel (in-kernel factored
    affine dequant inside each stage's gather) == the 4-launch packed
    pipeline == the per-kernel int4 path."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache
    from teal_tpu.ops import quant

    cfg = get_model_config("tiny", n_layers=2, n_heads=2, n_kv_heads=2,
                           dim=256, intermediate_size=384, vocab_size=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(11), jnp.float32)
    q4 = quant.quantize_params_int4(params, group=128)
    q4p = quant.pack_int4_params(q4, block_size=128)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.75, block_thresholding=True,
                        fused_decode_attention=True)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    for p in (0, 5):
        cache = KVCache.init(cfg, 1, 16, jnp.bfloat16)
        tok = jnp.asarray([[3 + p]], jnp.int32)
        got, cg = llama.forward(q4p, tok, cache, p, th, cfg=cfg, sp=sp)
        mid, _ = llama.forward(q4p, tok, cache, p, th, cfg=cfg,
                               sp=sp.replace(token_fused=False))
        ref, cr = llama.forward(
            q4p, tok, cache, p, th, cfg=cfg,
            sp=sp.replace(token_fused=False, packed_pipeline=False))
        np.testing.assert_allclose(np.asarray(got), np.asarray(mid),
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"int4 token-vs-packed pos={p}")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-2, atol=5e-2,
                                   err_msg=f"int4 token-vs-perkernel pos={p}")
        np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cr.k),
                                   rtol=2e-2, atol=2e-2)


def test_token_kernel_sliding_window():
    """Whole-token kernel with a Mistral-style sliding window == the
    per-kernel fallback (XLA einsum attention with window mask),
    positions straddling the window boundary."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", n_layers=2, n_heads=2, n_kv_heads=2,
                           dim=256, intermediate_size=384, vocab_size=128,
                           sliding_window=8)
    params = llama.init_params(cfg, jax.random.PRNGKey(5), jnp.float32)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.75, block_thresholding=True,
                        fused_decode_attention=True)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    for p in (3, 9, 14):   # inside / straddling / deep past the window
        cache = KVCache.init(cfg, 1, 16, jnp.float32)
        cache = KVCache(
            k=jax.random.normal(jax.random.PRNGKey(p), cache.k.shape,
                                jnp.float32) * 0.1,
            v=jax.random.normal(jax.random.PRNGKey(p + 1), cache.v.shape,
                                jnp.float32) * 0.1)
        tok = jnp.asarray([[3 + p]], jnp.int32)
        got, _ = llama.forward(params, tok, cache, p, th, cfg=cfg, sp=sp)
        ref, _ = llama.forward(
            params, tok, cache, p, th, cfg=cfg,
            sp=sp.replace(token_fused=False, packed_pipeline=False,
                          fused_attn_block=False))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"window pos={p}")


def test_token_kernel_chunked_attention():
    """Whole-token kernel with the CHUNKED attention branch (C < T:
    double-buffered chunk DMAs, online softmax, first chunk hoisted to
    the stage head) == the per-kernel fallback — the production branch
    for max_seq >= 2*CHUNK (the 2.22x max_seq-2048 configuration)."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache
    from teal_tpu.ops import decode_attention as da

    old_chunk = da.CHUNK
    da.CHUNK = 16
    try:
        cfg = get_model_config("tiny", n_layers=2, n_heads=2,
                               n_kv_heads=2, dim=256,
                               intermediate_size=384, vocab_size=128)
        params = llama.init_params(cfg, jax.random.PRNGKey(9),
                                   jnp.float32)
        sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                            block_keep_frac=0.75, block_thresholding=True,
                            fused_decode_attention=True)
        th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
        T = 48   # 3 chunks of 16
        for p in (0, 15, 16, 40):   # chunk boundaries + deep position
            cache = KVCache.init(cfg, 1, T, jnp.float32)
            cache = KVCache(
                k=jax.random.normal(jax.random.PRNGKey(p), cache.k.shape,
                                    jnp.float32) * 0.1,
                v=jax.random.normal(jax.random.PRNGKey(p + 1),
                                    cache.v.shape, jnp.float32) * 0.1)
            tok = jnp.asarray([[p % 97]], jnp.int32)
            got, cg = llama.forward(params, tok, cache, p, th,
                                    cfg=cfg, sp=sp)
            ref, cr = llama.forward(
                params, tok, cache, p, th, cfg=cfg,
                sp=sp.replace(token_fused=False, packed_pipeline=False,
                              fused_attn_block=False))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"chunked pos={p}")
            np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cr.k),
                                       rtol=1e-5, atol=1e-6)
    finally:
        da.CHUNK = old_chunk


def test_token_kernel_batched_equivalence():
    """Batched (B <= 8) whole-token kernel — pooled-score shared
    selection, per-sequence RoPE/cache-write/attention at each slot's
    own position — == the batched per-kernel path
    (select_groups_batched + XLA attention)."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", n_layers=2, n_heads=2, n_kv_heads=2,
                           dim=256, intermediate_size=384, vocab_size=128)
    B = 3
    params = llama.init_params(cfg, jax.random.PRNGKey(21), jnp.float32)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.75, block_thresholding=True,
                        fused_decode_attention=True)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    # continuous batching: each slot decodes at its own depth
    pos = jnp.asarray([2, 9, 14], jnp.int32)
    cache = KVCache.init(cfg, B, 16, jnp.float32)
    cache = KVCache(
        k=jax.random.normal(jax.random.PRNGKey(33), cache.k.shape,
                            jnp.float32) * 0.1,
        v=jax.random.normal(jax.random.PRNGKey(34), cache.v.shape,
                            jnp.float32) * 0.1)
    tok = jnp.asarray([[3], [7], [11]], jnp.int32)
    got, cg = llama.forward(params, tok, cache, pos, th, cfg=cfg, sp=sp)
    ref, cr = llama.forward(
        params, tok, cache, pos, th, cfg=cfg,
        sp=sp.replace(token_fused=False, fused_decode_attention=False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cr.k),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cg.v), np.asarray(cr.v),
                               rtol=1e-5, atol=1e-6)


def test_token_kernel_b16_single_launch_equivalence():
    """8 < B <= 16 decode runs ONE token-kernel launch with a [16, G]
    MXU lhs (two sublane tiles) — weights stream once for the whole
    batch. Reference: threshold-0 capacity selection keeps the first
    `cap` groups by index for ANY score pooling, so per-sequence B=1
    forwards with the same config are an exact reference for the
    16-row mechanics (packing, dots, accumulator, RoPE, cache writes,
    per-slot attention)."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", n_layers=2, n_heads=2, n_kv_heads=2,
                           dim=256, intermediate_size=384, vocab_size=128)
    B = 12
    params = llama.init_params(cfg, jax.random.PRNGKey(22), jnp.float32)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.75, block_thresholding=True,
                        fused_decode_attention=True)
    th = jnp.zeros((cfg.n_layers, 7), jnp.float32)
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.integers(1, 15, B), jnp.int32)
    cache = KVCache.init(cfg, B, 16, jnp.float32)
    cache = KVCache(
        k=jax.random.normal(jax.random.PRNGKey(43), cache.k.shape,
                            jnp.float32) * 0.1,
        v=jax.random.normal(jax.random.PRNGKey(44), cache.v.shape,
                            jnp.float32) * 0.1)
    tok = jnp.asarray(rng.integers(1, 120, (B, 1)), jnp.int32)
    got, cg = llama.forward(params, tok, cache, pos, th, cfg=cfg, sp=sp)
    for b in range(B):
        sub = KVCache(k=cache.k[:, b:b + 1], v=cache.v[:, b:b + 1])
        r, cr = llama.forward(params, tok[b:b + 1], sub, pos[b:b + 1],
                              th, cfg=cfg, sp=sp)
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(r[0]), rtol=3e-4, atol=3e-4,
            err_msg=f"slot {b}")
        np.testing.assert_allclose(
            np.asarray(cg.k[:, b]), np.asarray(cr.k[:, 0]),
            rtol=1e-5, atol=1e-6)


def test_token_kernel_moe_equivalence():
    """Mixtral MoE through the whole-token kernel (in-kernel routing:
    packed router rows -> VPU expert scores -> top-k + softmax ->
    dense expert gather via the pseudo-layer li*E+e stack) == the
    fallback path (block-sparse attention + XLA moe_ffn decode)."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", n_layers=2, n_heads=2, n_kv_heads=2,
                           dim=256, intermediate_size=384, vocab_size=128,
                           n_experts=4, n_experts_per_tok=2)
    assert cfg.head_dim == 128
    params = llama.init_params(cfg, jax.random.PRNGKey(17), jnp.float32)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.75, block_thresholding=True,
                        fused_decode_attention=True)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    for p in (0, 5):
        cache = KVCache.init(cfg, 1, 16, jnp.float32)
        cache = KVCache(
            k=jax.random.normal(jax.random.PRNGKey(p), cache.k.shape,
                                jnp.float32) * 0.1,
            v=jax.random.normal(jax.random.PRNGKey(p + 1), cache.v.shape,
                                jnp.float32) * 0.1)
        tok = jnp.asarray([[3 + p]], jnp.int32)
        got, cg = llama.forward(params, tok, cache, p, th, cfg=cfg, sp=sp)
        ref, cr = llama.forward(params, tok, cache, p, th, cfg=cfg,
                                sp=sp.replace(token_fused=False))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"moe pos={p}")
        np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cr.k),
                                   rtol=1e-5, atol=1e-6)


def test_token_kernel_int8_batched_equivalence():
    """int8 weight-only + batched (B <= 8) whole-token kernel: the
    per-out-channel scale rows broadcast over the batch sublane rows in
    each stage writer — == the batched per-kernel int8 path."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache

    cfg = get_model_config("tiny", n_layers=2, n_heads=2, n_kv_heads=1,
                           dim=256, intermediate_size=384, vocab_size=128)
    B = 3
    params = llama.init_params(cfg, jax.random.PRNGKey(41), jnp.float32)

    def q8(stack):
        wf = stack.astype(jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=1)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(wf / scale[:, None, :]),
                     -128, 127).astype(jnp.int8)
        return {"q": q, "scale": scale}

    for n in ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown"):
        params["layers"][n] = q8(params["layers"][n])
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.75, block_thresholding=True,
                        fused_decode_attention=True)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    pos = jnp.asarray([1, 6, 12], jnp.int32)
    cache = KVCache.init(cfg, B, 16, jnp.bfloat16)
    tok = jnp.asarray([[3], [7], [11]], jnp.int32)
    got, cg = llama.forward(params, tok, cache, pos, th, cfg=cfg, sp=sp)
    ref, cr = llama.forward(
        params, tok, cache, pos, th, cfg=cfg,
        sp=sp.replace(token_fused=False, fused_decode_attention=False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cr.k),
                               rtol=2e-2, atol=2e-2)


def test_token_kernel_int4_batched_equivalence():
    """Packed-int4 + batched (B <= 8) whole-token kernel: the factored
    affine dequant runs per batch row through the shared gather — == the
    batched per-kernel int4 path."""
    from teal_tpu.config import get_model_config
    from teal_tpu.models import llama
    from teal_tpu.models.llama import KVCache
    from teal_tpu.ops import quant

    cfg = get_model_config("tiny", n_layers=2, n_heads=2, n_kv_heads=2,
                           dim=256, intermediate_size=384, vocab_size=128)
    params = llama.init_params(cfg, jax.random.PRNGKey(11), jnp.float32)
    q4p = quant.pack_int4_params(
        quant.quantize_params_int4(params, group=128), block_size=128)
    sp = SparsityConfig(enabled=True, kernel="block", block_size=128,
                        block_keep_frac=0.75, block_thresholding=True,
                        fused_decode_attention=True)
    th = jnp.full((cfg.n_layers, 7), 0.02, jnp.float32)
    B = 3
    pos = jnp.asarray([2, 9, 14], jnp.int32)
    cache = KVCache.init(cfg, B, 16, jnp.bfloat16)
    tok = jnp.asarray([[3], [7], [11]], jnp.int32)
    got, cg = llama.forward(q4p, tok, cache, pos, th, cfg=cfg, sp=sp)
    ref, cr = llama.forward(q4p, tok, cache, pos, th, cfg=cfg,
                            sp=sp.replace(token_fused=False,
                                          fused_decode_attention=False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(cg.k), np.asarray(cr.k),
                               rtol=2e-2, atol=2e-2)
