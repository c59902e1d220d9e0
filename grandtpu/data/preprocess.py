"""Graph/feature preprocessing utilities.

Covers the reference's ``utils/preprocess.py`` (binary BoW, adjacency
normalizations, self loops, largest connected component, label binarization)
plus the row/column feature normalizers from ``utils/data_loader.py:167-183``
— all in scipy/numpy, no sklearn/networkx.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


# ---------------------------------------------------------------- features

def row_normalize(mx: sp.spmatrix) -> sp.spmatrix:
    """Row-normalize a sparse matrix: X <- diag(1/rowsum) X, with 0 rows kept
    at 0 (reference ``utils/data_loader.py:167-174``)."""
    rowsum = np.asarray(mx.sum(1)).flatten()
    r_inv = np.divide(1.0, rowsum, out=np.zeros_like(rowsum, dtype=np.float64),
                      where=rowsum != 0)
    return sp.diags(r_inv).dot(mx)


def col_standardize(mx: np.ndarray) -> np.ndarray:
    """Column-wise standardization (zero mean, unit variance), matching
    sklearn StandardScaler as used at reference ``utils/data_loader.py:177-183``
    for aminer. Constant columns map to 0."""
    mx = np.asarray(mx, dtype=np.float64)
    mean = mx.mean(axis=0)
    std = mx.std(axis=0)
    std = np.where(std == 0.0, 1.0, std)
    return (mx - mean) / std


def to_binary_bag_of_words(features: sp.spmatrix) -> sp.csr_matrix:
    """Clamp all nonzero feature entries to 1.0
    (reference ``utils/preprocess.py:9-13``)."""
    out = features.tocsr(copy=True)
    out.data[:] = 1.0
    return out


def is_binary_bag_of_words(features: sp.spmatrix) -> bool:
    coo = features.tocoo()
    return bool(np.all(coo.data == 1.0))


# ---------------------------------------------------------------- adjacency

def eliminate_self_loops_adj(adj: sp.spmatrix) -> sp.csr_matrix:
    """Remove diagonal entries (reference ``utils/preprocess.py:42-50``)."""
    adj = adj.tocoo()
    keep = adj.row != adj.col
    return sp.csr_matrix(
        (adj.data[keep], (adj.row[keep], adj.col[keep])), shape=adj.shape)


def add_self_loops_adj(adj: sp.spmatrix, value: float = 1.0) -> sp.csr_matrix:
    """adj + value*I (reference driver does ``adj + sp.eye(n)`` at
    ``model.py:243``)."""
    return (adj + value * sp.eye(adj.shape[0], format="csr")).tocsr()


def to_undirected(adj: sp.spmatrix) -> sp.csr_matrix:
    """Symmetrize keeping the max weight: A <- max(A, A^T), same result as the
    planetoid symmetrization ``adj + adj.T.multiply(adj.T > adj) -
    adj.multiply(adj.T > adj)`` (reference ``utils/data_loader.py:120``)."""
    adj = adj.tocsr()
    return adj.maximum(adj.T).tocsr()


def to_unweighted(adj: sp.spmatrix) -> sp.csr_matrix:
    adj = adj.tocsr(copy=True)
    adj.data[:] = 1.0
    return adj


def sym_renormalize(adj: sp.spmatrix) -> sp.csr_matrix:
    """D^-1/2 (A+I) D^-1/2 (reference ``utils/data_loader.py:133-142``,
    off by default there and here)."""
    adj = add_self_loops_adj(adj)
    deg = np.asarray(adj.sum(1)).flatten()
    dinv = np.power(deg, -0.5, out=np.zeros_like(deg), where=deg > 0)
    d = sp.diags(dinv)
    return d.dot(adj).dot(d).tocsr()


def largest_connected_component(adj: sp.spmatrix, n_components: int = 1):
    """Node indices of the `n_components` largest connected components
    (reference ``utils/preprocess.py:61-124``), via scipy instead of a
    hand-rolled BFS."""
    _, labels = sp.csgraph.connected_components(adj, directed=False)
    sizes = np.bincount(labels)
    keep = np.argsort(sizes)[::-1][:n_components]
    return np.nonzero(np.isin(labels, keep))[0]


# ---------------------------------------------------------------- labels

def binarize_labels(labels: np.ndarray) -> np.ndarray:
    """Int class ids -> one-hot float matrix (reference
    ``utils/preprocess.py:127-156``; we require non-multilabel input)."""
    labels = np.asarray(labels)
    if labels.ndim == 2:
        return labels.astype(np.float32)
    classes = np.unique(labels)
    class_to_col = {c: i for i, c in enumerate(classes.tolist())}
    out = np.zeros((labels.shape[0], classes.size), dtype=np.float32)
    for i, c in enumerate(labels.tolist()):
        out[i, class_to_col[c]] = 1.0
    return out


def remove_underrepresented_classes(labels: np.ndarray,
                                    train_examples_per_class: int,
                                    val_examples_per_class: int):
    """Indices of nodes whose class has enough members for a stratified split
    (reference ``utils/preprocess.py:159-168``)."""
    onehot = binarize_labels(labels)
    counts = onehot.sum(axis=0)
    min_needed = train_examples_per_class + val_examples_per_class + 1
    ok_classes = np.nonzero(counts >= min_needed)[0]
    keep = np.nonzero(onehot[:, ok_classes].sum(axis=1) > 0)[0]
    return keep
