"""Sparse-feature input path (MAG-style): embedding table + weighted mean.

Reference ``model_mag.py:21-34,48-55``: instead of a dense input Linear, each
node's representation is the attr-value-weighted mean of embedding rows for
its nonzero feature ids, with input dropout applied to the gathered
embeddings (and, unlike DropNode, the 1/(1-p) train scaling does NOT cancel
— the denominator uses undropped attr values — so this is standard inverted
dropout on the numerator).

TPU formulation: feature CSR rows are padded to a static [N, P] block
(attr ids + values, pad value 0), so a batch of nodes is a static gather and
the weighted mean is a reduction over P — no scatter, fully jittable. P is
the max row nnz (optionally a cap; rows are never truncated by default).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass
class PaddedFeatures:
    """CSR features in padded-row layout. attr_cols/attr_vals: [N, P]."""
    attr_cols: np.ndarray
    attr_vals: np.ndarray
    num_features: int

    @staticmethod
    def from_csr(feats: sp.csr_matrix, cap: int | None = None
                 ) -> "PaddedFeatures":
        """Vectorized padded-row build (no per-row Python loop — MAG has
        10M+ rows). With `cap`, rows keep their `cap` largest-|value|
        entries."""
        feats = feats.tocsr()
        n = feats.shape[0]
        indptr = feats.indptr.astype(np.int64)
        nnz = np.diff(indptr)
        p_full = max(int(nnz.max()) if n else 1, 1)
        p = p_full if cap is None else max(min(p_full, int(cap)), 1)

        indices, data = feats.indices, feats.data
        if p < p_full:
            # rank entries within each row by |value| descending and keep
            # the first p: stable sort on (row, -|v|)
            rows_of = np.repeat(np.arange(n, dtype=np.int64), nnz)
            order = np.lexsort((-np.abs(data), rows_of))
            indices, data, rows_of = (indices[order], data[order],
                                      rows_of[order])
            slot = np.arange(indices.shape[0]) - np.repeat(indptr[:-1], nnz)
            keep = slot < p
            indices, data, rows_of = (indices[keep], data[keep],
                                      rows_of[keep])
            new_nnz = np.minimum(nnz, p)
            new_indptr = np.zeros(n + 1, np.int64)
            np.cumsum(new_nnz, out=new_indptr[1:])
            indptr, nnz = new_indptr, new_nnz

        slot = np.arange(indices.shape[0]) - np.repeat(indptr[:-1], nnz)
        rows_of = np.repeat(np.arange(n, dtype=np.int64), nnz)
        flat = rows_of * p + slot
        cols = np.zeros(n * p, dtype=np.int32)
        vals = np.zeros(n * p, dtype=np.float32)
        cols[flat] = indices
        vals[flat] = data
        return PaddedFeatures(cols.reshape(n, p), vals.reshape(n, p),
                              feats.shape[1])


def init_embedding(key, num_features: int, dim: int):
    """torch nn.Embedding default init: N(0, 1)."""
    return {"table": jax.random.normal(key, (num_features, dim),
                                       jnp.float32)}


def embed_nodes(emb_params, attr_cols, attr_vals, *, key=None,
                droprate: float = 0.0, training: bool = False):
    """Weighted-mean embedding of nodes given padded attr rows.

    attr_cols/attr_vals: [..., P] -> returns [..., H].
    """
    table = emb_params["table"]
    e = jnp.take(table, attr_cols, axis=0)          # [..., P, H]
    if training and droprate > 0.0:
        keep = jax.random.bernoulli(key, 1.0 - droprate, e.shape)
        e = jnp.where(keep, e / (1.0 - droprate), 0.0)
    num = jnp.einsum("...p,...ph->...h", attr_vals, e)
    den = jnp.sum(attr_vals, axis=-1, keepdims=True)
    return num / (den + 1e-10)
