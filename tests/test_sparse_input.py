"""PaddedFeatures layout + embedding weighted-mean parity."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from grandtpu.nn.sparse_input import (PaddedFeatures, embed_nodes,
                                      init_embedding)


def _rand_csr(n=50, f=30, density=0.2, seed=0):
    rs = np.random.RandomState(seed)
    m = (rs.rand(n, f) < density) * rs.rand(n, f)
    return sp.csr_matrix(m.astype(np.float32))


def test_padded_layout_roundtrip():
    feats = _rand_csr()
    p = PaddedFeatures.from_csr(feats)
    dense = np.zeros(feats.shape, np.float32)
    for i in range(feats.shape[0]):
        for c, v in zip(p.attr_cols[i], p.attr_vals[i]):
            if v != 0:
                dense[i, c] += v
    np.testing.assert_allclose(dense, feats.toarray(), atol=1e-6)


def test_cap_keeps_largest():
    feats = _rand_csr(density=0.5)
    cap = 5
    p = PaddedFeatures.from_csr(feats, cap=cap)
    assert p.attr_cols.shape[1] == cap
    arr = feats.toarray()
    for i in range(feats.shape[0]):
        kept = np.sort(p.attr_vals[i][p.attr_vals[i] != 0])[::-1]
        want = np.sort(np.abs(arr[i][arr[i] != 0]))[::-1][: kept.shape[0]]
        np.testing.assert_allclose(kept, want, atol=1e-6)


def test_empty_rows_ok():
    m = sp.csr_matrix((5, 10), dtype=np.float32)
    m[1, 3] = 2.0
    p = PaddedFeatures.from_csr(m.tocsr())
    assert p.attr_vals.sum() == pytest.approx(2.0)
    assert (p.attr_vals[0] == 0).all()


def test_embed_nodes_weighted_mean():
    feats = _rand_csr(n=20, f=16)
    p = PaddedFeatures.from_csr(feats)
    emb = init_embedding(jax.random.PRNGKey(0), 16, 8)
    out = embed_nodes(emb, jnp.asarray(p.attr_cols),
                      jnp.asarray(p.attr_vals), training=False)
    table = np.asarray(emb["table"])
    arr = feats.toarray()
    want = arr @ table / (arr.sum(1, keepdims=True) + 1e-10)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-4)
