"""Inference path robustness: chunked classification, Propagator reuse,
sparse predict parity with the dense math."""

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from grandtpu.infer import Propagator, exact_propagate
from grandtpu.infer.classify import (  # noqa: F401
    predict_logits, predict_logits_sparse)
from grandtpu.infer.classify import test_accuracy as compute_accuracy
from grandtpu.nn.mlp import MLPConfig, init_mlp, apply_mlp


def test_predict_logits_chunking_consistent():
    cfg = MLPConfig(num_features=12, num_classes=3, hidden=8, nlayers=2)
    params, state = init_mlp(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(105, 12), jnp.float32)
    whole = predict_logits(params, state, cfg, x, batch_size=1000)
    chunked = predict_logits(params, state, cfg, x, batch_size=40)
    np.testing.assert_allclose(whole, chunked, atol=1e-5)
    want, _ = apply_mlp(params, state, cfg, x, training=False)
    np.testing.assert_allclose(whole, np.asarray(want), atol=1e-5)


def test_propagator_reuse_matches_oneshot(small_graph):
    adj, feats, _ = small_graph
    prop = Propagator(adj)
    a = np.asarray(prop(feats, mode="ppr", order=4, alpha=0.3))
    b = np.asarray(prop(feats, mode="ppr", order=4, alpha=0.3))
    c = np.asarray(exact_propagate(adj, feats, mode="ppr", order=4,
                                   alpha=0.3))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(a, c, atol=1e-6)


def test_test_accuracy_end_to_end(small_graph):
    adj, feats, labels = small_graph
    cfg = MLPConfig(num_features=feats.shape[1],
                    num_classes=labels.shape[1], hidden=8, nlayers=2)
    params, state = init_mlp(jax.random.PRNGKey(1), cfg)
    prop = exact_propagate(adj, feats, mode="avg", order=3)
    idx_test = np.arange(40)
    acc = compute_accuracy(params, state, cfg, prop, idx_test,
                        labels.argmax(-1))
    assert 0.0 <= acc <= 1.0


def test_sparse_predict_matches_dense_math():
    """MAG-style predict (embedding-space propagation) equals doing the
    same ops with dense numpy."""
    from grandtpu.nn.mag_mlp import init_mag_mlp
    from grandtpu.nn.sparse_input import PaddedFeatures
    from grandtpu.data import synthetic_graph

    adj, feats, labels = synthetic_graph(
        num_nodes=60, num_classes=3, num_features=20, sparse_features=True,
        feature_nnz=6, seed=2)
    adj_sl = (adj + sp.eye(60, format="csr")).tocsr()
    cfg = MLPConfig(num_features=20, num_classes=3, hidden=8, nlayers=2)
    params, state = init_mag_mlp(jax.random.PRNGKey(0), cfg)
    padded = PaddedFeatures.from_csr(feats)

    logits = predict_logits_sparse(
        params, state, cfg, jnp.asarray(padded.attr_cols),
        jnp.asarray(padded.attr_vals), adj_sl, mode="avg", order=3,
        batch_size=16)

    # dense oracle
    table = np.asarray(params["emb"]["table"])
    arr = feats.toarray()
    embs = arr @ table / (arr.sum(1, keepdims=True) + 1e-10)
    deg = np.asarray(adj_sl.sum(1)).flatten()
    dinv = 1 / np.maximum(deg, 1e-12)
    cur, acc = embs.copy(), embs.copy()
    for _ in range(3):
        cur = dinv[:, None] * adj_sl.dot(cur)
        acc += cur
    prop = acc / 4
    h = np.maximum(prop, 0)
    w1 = np.asarray(params["fcs"][0]["w"])
    b1 = np.asarray(params["fcs"][0]["b"])
    want = h @ w1 + b1
    np.testing.assert_allclose(logits, want, atol=1e-3)
