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
    # xpack lanes [:G] carry the group's x values
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
