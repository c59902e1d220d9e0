"""Synthetic attributed-graph generator.

No reference equivalent — used to exercise every engine path (dense features,
sparse features, multi-host sharding) at arbitrary scale without the large
datasets the reference downloads (reddit/Amazon2M/MAG are not bundled).

Generates a stochastic block model whose communities define the labels and
class-correlated features, so a GRAND+ model actually learns something and
end-to-end accuracy tests are meaningful.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def synthetic_graph(num_nodes: int = 400,
                    num_classes: int = 4,
                    num_features: int = 32,
                    avg_degree: float = 8.0,
                    p_in_over_p_out: float = 8.0,
                    feature_noise: float = 0.6,
                    sparse_features: bool = False,
                    feature_density: float = 0.2,
                    seed: int = 0):
    """Return (adj csr, features, labels_onehot) for an SBM graph.

    features: dense float32 [n, f] or CSR (sparse_features=True) with
    class-dependent support, mimicking the MAG bag-of-words regime.
    """
    rng = np.random.RandomState(seed)
    # balanced classes so 20/30-per-class stratified splits always succeed
    labels = np.arange(num_nodes) % num_classes
    rng.shuffle(labels)

    # --- edges: sample endpoints biased to same-class pairs
    num_edges = int(num_nodes * avg_degree / 2)
    ratio = p_in_over_p_out
    src = rng.randint(0, num_nodes, size=3 * num_edges)
    dst = rng.randint(0, num_nodes, size=3 * num_edges)
    same = labels[src] == labels[dst]
    keep_prob = np.where(same, 1.0, 1.0 / ratio)
    keep = rng.rand(src.shape[0]) < keep_prob
    src, dst = src[keep][:num_edges], dst[keep][:num_edges]
    ok = src != dst
    src, dst = src[ok], dst[ok]
    data = np.ones(src.shape[0], dtype=np.float32)
    adj = sp.coo_matrix((data, (src, dst)),
                        shape=(num_nodes, num_nodes)).tocsr()
    adj.sum_duplicates()
    adj.data[:] = 1.0
    adj = adj.maximum(adj.T).tocsr()

    # --- features: class prototype + noise
    proto = rng.randn(num_classes, num_features).astype(np.float32)
    feats = proto[labels] + feature_noise * rng.randn(
        num_nodes, num_features).astype(np.float32)
    if sparse_features:
        # class-dependent support pattern: each class activates a subset of
        # feature columns; values binary (bag-of-words style)
        mask = rng.rand(num_nodes, num_features) < feature_density
        class_cols = rng.rand(num_classes, num_features) < 0.5
        mask &= class_cols[labels]
        feats = sp.csr_matrix(mask.astype(np.float32))
    onehot = np.zeros((num_nodes, num_classes), dtype=np.float32)
    onehot[np.arange(num_nodes), labels] = 1.0
    return adj, feats, onehot
