"""Disk-format loader tests: synthesize each dataset family's on-disk layout
in a tmp dir and load through the registry (the real large datasets are not
bundled; the formats are what we must honor — reference
``utils/data_loader.py:21-83``)."""

import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from grandtpu.data import load_data, synthetic_graph
from grandtpu.data.sparsegraph import (SparseGraph,
                                       load_npz_to_sparse_graph,
                                       save_sparse_graph_to_npz)


@pytest.fixture()
def data_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("GRANDTPU_DATA_DIR", str(tmp_path))
    return tmp_path


def _graph(n=400, c=4, f=10, seed=1):
    adj, feats, onehot = synthetic_graph(num_nodes=n, num_classes=c,
                                         num_features=f, seed=seed)
    return adj, np.asarray(feats, np.float32), onehot


def test_reddit_family(data_dir):
    adj, feats, onehot = _graph()
    sp.save_npz(data_dir / "reddit_adj.npz", adj)
    np.save(data_dir / "reddit_feat.npy", feats)
    np.save(data_dir / "reddit_labels.npy", onehot)
    d = load_data("reddit", split_seed=0)
    assert d.num_nodes == 400 and d.num_classes == 4
    assert len(d.idx_train) == 80  # 20 per class


def test_amazon2m_family(data_dir):
    adj, feats, onehot = _graph()
    sp.save_npz(data_dir / "Amazon2M_adj.npz", adj)
    np.save(data_dir / "Amazon2M_feat.npy", feats)
    np.save(data_dir / "Amazon2M_labels.npy", onehot)
    d = load_data("Amazon2M", split_seed=0)
    # size-based split: 20*C train, 30*C val
    assert len(d.idx_train) == 80 and len(d.idx_val) == 120


def test_aminer_family(data_dir):
    adj, feats, onehot = _graph()
    labels_int = onehot.argmax(-1)
    with open(data_dir / "aminer.adj.sp.pkl", "wb") as f:
        pickle.dump(adj, f)
    with open(data_dir / "aminer.features.pkl", "wb") as f:
        pickle.dump(feats, f)
    with open(data_dir / "aminer.labels.pkl", "wb") as f:
        pickle.dump(onehot, f)
    d = load_data("aminer", split_seed=0)
    assert d.num_classes == 4
    # col-standardized features: near-zero column means
    assert np.abs(np.asarray(d.features).mean(0)).max() < 1e-5
    del labels_int


def test_mag_family(data_dir):
    adj, feats, onehot = _graph()
    feats_sp = sp.csr_matrix(feats)
    np.savez(
        data_dir / "mag_scholar_c.npz",
        **{"adj_matrix.data": adj.data, "adj_matrix.indices": adj.indices,
           "adj_matrix.indptr": adj.indptr,
           "adj_matrix.shape": np.array(adj.shape),
           "attr_matrix.data": feats_sp.data,
           "attr_matrix.indices": feats_sp.indices,
           "attr_matrix.indptr": feats_sp.indptr,
           "attr_matrix.shape": np.array(feats_sp.shape),
           "labels": onehot.argmax(-1)})
    d = load_data("mag_scholar_c", split_seed=0)
    assert d.has_sparse_features
    assert d.num_classes == 4


def test_npz_sparsegraph_family(data_dir):
    adj, feats, onehot = _graph(n=400)
    g = SparseGraph(adj, sp.csr_matrix((np.asarray(feats) > 0.5)
                                       .astype(np.float32)),
                    onehot.argmax(-1))
    save_sparse_graph_to_npz(str(data_dir / "ms_academic_cs.npz"), g)
    d = load_data("ms_academic_cs", split_seed=0)
    # standardize() keeps the largest connected component only
    assert d.num_nodes <= 400
    assert (d.adj != d.adj.T).nnz == 0
    # binary bag-of-words densified
    vals = np.unique(np.asarray(d.features))
    assert set(vals.tolist()) <= {0.0, 1.0}


def test_sparsegraph_roundtrip(tmp_path):
    adj, feats, onehot = _graph()
    g = SparseGraph(adj, sp.csr_matrix(feats), onehot.argmax(-1))
    p = str(tmp_path / "g.npz")
    save_sparse_graph_to_npz(p, g)
    g2 = load_npz_to_sparse_graph(p)
    assert (g2.adj_matrix != g.adj_matrix).nnz == 0
    assert (g2.attr_matrix != g.attr_matrix).nnz == 0
    np.testing.assert_array_equal(g2.labels, g.labels)
    assert g2.num_edges() == g.num_edges()


def test_sparsegraph_standardize():
    # two components: triangle 0-1-2 + edge 3-4; plus a self loop and weights
    rows = [0, 1, 1, 2, 2, 0, 3, 0]
    cols = [1, 0, 2, 1, 0, 2, 4, 0]
    vals = [2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 5.0, 7.0]
    adj = sp.csr_matrix((vals, (rows, cols)), shape=(5, 5))
    g = SparseGraph(adj, np.eye(5, dtype=np.float32),
                    np.array([0, 1, 0, 1, 0]))
    g = g.standardize()
    assert g.num_nodes() == 3                      # triangle LCC
    assert g.adj_matrix.diagonal().sum() == 0      # self loops gone
    assert set(np.unique(g.adj_matrix.data).tolist()) == {1.0}  # unweighted
    assert not g.is_directed()
