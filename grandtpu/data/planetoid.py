"""Planetoid (cora/citeseer/pubmed) pickle-protocol loader.

Re-implements reference ``utils/data_loader.py:85-129`` without networkx:
the adjacency is assembled directly from the pickled dict-of-lists into a
symmetric binary CSR indexed by node id (the pickles enumerate nodes
0..n-1, so node id == row id, same ordering networkx produces there).
Includes the citeseer isolated-test-node fix and row-normalized dense
features.
"""

from __future__ import annotations

import os
import pickle
import sys

import numpy as np
import scipy.sparse as sp

from grandtpu.data.preprocess import row_normalize


def parse_index_file(filename: str) -> list[int]:
    with open(filename) as f:
        return [int(line.strip()) for line in f]


def _load_pickle(path: str):
    with open(path, "rb") as f:
        if sys.version_info > (3, 0):
            return pickle.load(f, encoding="latin1")
        return pickle.load(f)


def graph_dict_to_adj(graph: dict, num_nodes: int) -> sp.csr_matrix:
    """dict {u: [v, ...]} -> symmetric binary CSR with no duplicate entries.

    Matches ``nx.adjacency_matrix(nx.from_dict_of_lists(graph))`` followed by
    the reference's symmetrization (``utils/data_loader.py:118-120``) when the
    dict keys enumerate 0..n-1 (true for all Planetoid pickles).
    """
    rows, cols = [], []
    for u, nbrs in graph.items():
        for v in nbrs:
            rows.append(u)
            cols.append(v)
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    data = np.ones(rows.shape[0], dtype=np.float32)
    adj = sp.coo_matrix((data, (rows, cols)),
                        shape=(num_nodes, num_nodes)).tocsr()
    adj.sum_duplicates()
    adj.data[:] = 1.0            # simple-graph semantics: edge weight 1
    adj = adj.maximum(adj.T)     # symmetric
    return adj.tocsr()


def load_planetoid(dataset_str: str, path: str):
    """Return (adj, features_dense, labels_onehot, idx_train, idx_val,
    idx_test, idx_unlabel) with reference semantics."""
    names = ["x", "y", "tx", "ty", "allx", "ally", "graph"]
    objects = [_load_pickle(os.path.join(path, f"ind.{dataset_str}.{n}"))
               for n in names]
    x, y, tx, ty, allx, ally, graph = objects
    test_idx_reorder = parse_index_file(
        os.path.join(path, f"ind.{dataset_str}.test.index"))
    test_idx_range = np.sort(test_idx_reorder)

    if dataset_str == "citeseer":
        # isolated test nodes exist only in the graph: widen tx/ty with
        # zero rows so indexing by test id works (reference :102-110)
        full = range(min(test_idx_reorder), max(test_idx_reorder) + 1)
        tx_ext = sp.lil_matrix((len(full), x.shape[1]))
        tx_ext[test_idx_range - min(test_idx_range), :] = tx
        tx = tx_ext
        ty_ext = np.zeros((len(full), y.shape[1]))
        ty_ext[test_idx_range - min(test_idx_range), :] = ty
        ty = ty_ext

    features = sp.vstack((allx, tx)).tolil()
    features[test_idx_reorder, :] = features[test_idx_range, :]
    features = row_normalize(features)
    features = np.asarray(features.todense(), dtype=np.float32)

    num_nodes = features.shape[0]
    adj = graph_dict_to_adj(graph, num_nodes)

    labels = np.vstack((ally, ty))
    labels[test_idx_reorder, :] = labels[test_idx_range, :]
    labels = labels.astype(np.float32)

    idx_train = np.arange(len(y))
    idx_val = np.arange(len(y), len(y) + 500)
    idx_test = np.asarray(sorted(test_idx_reorder))
    idx_unlabel = np.arange(len(y), labels.shape[0])
    return adj, features, labels, idx_train, idx_val, idx_test, idx_unlabel
