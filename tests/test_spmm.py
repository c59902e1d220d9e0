"""SpMM backend parity: dense MXU, padded-edge segment, BlockCSR one-hot."""

import numpy as np
import pytest

import jax.numpy as jnp

from grandtpu.sparse.spmm import (BlockCSR, PaddedCSR, spmm_block,
                                  spmm_segment)


@pytest.fixture(scope="module")
def adj_x():
    from grandtpu.data import synthetic_graph
    import scipy.sparse as sp
    adj, _, _ = synthetic_graph(num_nodes=500, num_classes=4,
                                num_features=8, avg_degree=12, seed=2)
    adj = (adj + sp.eye(500, format="csr")).tocsr()
    x = np.random.RandomState(0).randn(500, 32).astype(np.float32)
    return adj, x


def test_segment_matches_scipy(adj_x):
    adj, x = adj_x
    want = adj.dot(x)
    got = spmm_segment(PaddedCSR.from_scipy(adj), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_block_matches_scipy_f32(adj_x):
    adj, x = adj_x
    want = adj.dot(x)
    bcsr = BlockCSR.from_scipy(adj, rows_per_block=64, pad_multiple=128)
    got = spmm_block(bcsr, jnp.asarray(x), fast=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_block_fast_within_bf16_tolerance(adj_x):
    adj, x = adj_x
    want = adj.dot(x)
    bcsr = BlockCSR.from_scipy(adj, rows_per_block=64, pad_multiple=128)
    got = np.asarray(spmm_block(bcsr, jnp.asarray(x), fast=True))
    scale = np.abs(want).max()
    assert np.max(np.abs(got - want)) / scale < 5e-3


def test_block_build_vectorized_layout(adj_x):
    """Every nonzero lands in its block with the right local row."""
    adj, _ = adj_x
    r = 64
    bcsr = BlockCSR.from_scipy(adj, rows_per_block=r, pad_multiple=128)
    cols = np.asarray(bcsr.cols)
    vals = np.asarray(bcsr.vals)
    lrow = np.asarray(bcsr.lrow)
    assert vals.sum() == pytest.approx(adj.data.sum())
    coo = adj.tocoo()
    got_entries = set()
    for b in range(cols.shape[0]):
        m = lrow[b] < r
        for lr, c, v in zip(lrow[b][m], cols[b][m], vals[b][m]):
            got_entries.add((b * r + int(lr), int(c), float(np.float32(v))))
    want_entries = {(int(i), int(j), float(np.float32(v)))
                    for i, j, v in zip(coo.row, coo.col, coo.data)}
    assert got_entries == want_entries


def test_block_handles_empty_rows():
    import scipy.sparse as sp
    # graph with several all-zero rows
    adj = sp.csr_matrix((np.ones(3, np.float32),
                         (np.array([0, 5, 9]), np.array([1, 2, 3]))),
                        shape=(10, 10))
    x = np.random.RandomState(1).randn(10, 4).astype(np.float32)
    bcsr = BlockCSR.from_scipy(adj, rows_per_block=4, pad_multiple=8)
    got = spmm_block(bcsr, jnp.asarray(x), fast=False)
    np.testing.assert_allclose(np.asarray(got), adj.dot(x), atol=1e-5)
