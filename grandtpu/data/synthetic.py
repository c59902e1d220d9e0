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
                    feature_nnz: int = 24,
                    bow_uniform_frac: float = 0.2,
                    token_skew: float = 0.0,
                    nonneg_features: bool = False,
                    label_noise: float = 0.0,
                    seed: int = 0):
    """Return (adj csr, features, labels_onehot) for an SBM graph.

    features: dense float32 [n, f] or CSR (sparse_features=True) with
    class-dependent support, mimicking the MAG bag-of-words regime.
    Difficulty knobs (used by ``tools/make_synth_ref_data.py`` to land
    reference accuracy in a non-trivial 0.7-0.9 band): ``feature_noise``
    (dense), ``bow_uniform_frac`` (sparse: fraction of tokens drawn
    uniformly instead of from the class band), ``p_in_over_p_out``
    (graph class mixing). ``nonneg_features`` clips dense features at 0
    (planetoid fixtures are row-normalized by the loader, which needs
    non-negative rows with positive sums). ``label_noise`` flips that
    fraction of OBSERVED labels to a uniformly random other class after
    edges/features are generated from the true labels — a smooth,
    deterministic accuracy ceiling of ~(1 - label_noise), unlike feature
    hardness whose difficulty cliff interacts bimodally with the
    reference's early stopping.
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

    if not sparse_features:
        # --- features: class prototype + noise (dense)
        proto = rng.randn(num_classes, num_features).astype(np.float32)
        feats = proto[labels] + feature_noise * rng.randn(
            num_nodes, num_features).astype(np.float32)
        if nonneg_features:
            np.maximum(feats, 0.0, out=feats)
            # guarantee positive row sums so row-normalization is defined
            feats[:, 0] += 0.01
    else:
        # bag-of-words CSR built directly in sparse form (scales to MAG-size
        # vocabularies): each class owns a band of the vocabulary; 80% of a
        # node's tokens come from its band, the rest uniform
        nnz_per = max(min(feature_nnz, num_features), 1)
        band = max(num_features // num_classes, 1)
        if token_skew > 0.0:
            # Zipf-like in-band ranks (p concentrates on low ranks as
            # skew grows): real bag-of-words vocabularies are heavy-
            # tailed, and at MAG scale (2.78M words / 160 labels) a
            # UNIFORM band leaves every word seen ~once in training, so
            # no embedding can learn — measured chance accuracy at 12.4M
            # nodes with skew 0 vs learnable with skew on (RESULTS.md
            # MAG-scale section). Default 0.0 preserves the exact RNG
            # stream the committed parity fixtures were generated with.
            u = rng.rand(num_nodes, nnz_per)
            ranks = np.minimum((band * u ** (1.0 + token_skew)).astype(
                np.int64), band - 1).astype(np.int64)
        else:
            ranks = rng.randint(0, band, size=(num_nodes, nnz_per))
        in_band = ranks + labels[:, None] * band
        uniform = rng.randint(0, num_features, size=(num_nodes, nnz_per))
        cols = np.where(rng.rand(num_nodes, nnz_per) < bow_uniform_frac,
                        uniform, np.minimum(in_band, num_features - 1))
        rows = np.repeat(np.arange(num_nodes), nnz_per)
        feats = sp.coo_matrix(
            (np.ones(rows.shape[0], np.float32), (rows, cols.ravel())),
            shape=(num_nodes, num_features)).tocsr()
        feats.sum_duplicates()
        feats.data[:] = 1.0
    if label_noise > 0.0:
        flip = rng.rand(num_nodes) < label_noise
        offs = rng.randint(1, num_classes, size=num_nodes)
        labels = np.where(flip, (labels + offs) % num_classes, labels)
    onehot = np.zeros((num_nodes, num_classes), dtype=np.float32)
    onehot[np.arange(num_nodes), labels] = 1.0
    return adj, feats, onehot
