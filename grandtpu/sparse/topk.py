"""Padded top-k propagation rows: the training-side sparse Pi on TPU.

The reference assembles GFPush output into a scipy CSR and re-slices it every
batch on the host (``model.py:270-272,310-313``), producing *dynamic*-length
COO triplets. On TPU we instead keep the natural padded layout the kernel
already produces — each source row owns exactly K slots (cols, vals, pad
val=0) — so a minibatch of B sources is a static [B, K] gather and the whole
training step stays inside one jitted program. Padding slots carry value 0
and therefore contribute nothing to the weighted mean (same trick the
reference relies on when explicit zeros collapse in its COO->CSR assembly).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass
class TopKProp:
    """Top-k rows of Pi for a set of source nodes.

    sources : int32 [n_src]  global node id of each row
    cols    : int32 [n_src, K] global neighbor ids (0 where padded)
    vals    : float32 [n_src, K] propagation weights (0 where padded)
    num_nodes : global node count
    """

    sources: np.ndarray
    cols: np.ndarray
    vals: np.ndarray
    num_nodes: int

    def __post_init__(self):
        self.sources = np.asarray(self.sources, dtype=np.int32)
        self.cols = np.asarray(self.cols, dtype=np.int32)
        self.vals = np.asarray(self.vals, dtype=np.float32)
        # position of each global node id among the rows (-1 = absent)
        pos = np.full(self.num_nodes, -1, dtype=np.int32)
        pos[self.sources] = np.arange(self.sources.shape[0], dtype=np.int32)
        self._pos_of_node = pos

    @property
    def k(self) -> int:
        return self.cols.shape[1]

    @property
    def n_src(self) -> int:
        return self.sources.shape[0]

    def row_positions(self, node_ids: np.ndarray) -> np.ndarray:
        """Map global node ids -> row positions (asserts all present)."""
        pos = self._pos_of_node[np.asarray(node_ids, dtype=np.int64)]
        if np.any(pos < 0):
            missing = np.asarray(node_ids)[pos < 0][:5]
            raise KeyError(f"nodes without precomputed rows, e.g. {missing}")
        return pos

    def gather(self, node_ids: np.ndarray):
        """(cols [B,K], vals [B,K]) for a batch of global node ids."""
        pos = self.row_positions(node_ids)
        return self.cols[pos], self.vals[pos]

    def to_csr(self) -> sp.csr_matrix:
        """Assemble the [n, n] CSR the reference builds (``model.py:270-272``)
        — padding (val 0) entries are dropped, duplicates cannot occur."""
        keep = self.vals > 0
        rows = np.repeat(self.sources.astype(np.int64), self.k)
        rows = rows.reshape(self.cols.shape)[keep]
        return sp.csr_matrix(
            (self.vals[keep].astype(np.float64),
             (rows, self.cols[keep].astype(np.int64))),
            shape=(self.num_nodes, self.num_nodes))

    @staticmethod
    def from_csr(mat: sp.csr_matrix, sources: np.ndarray,
                 k: int) -> "TopKProp":
        """Inverse of to_csr for interop/tests: take rows of a CSR, keep the
        k largest entries per row, pad to k."""
        sources = np.asarray(sources, dtype=np.int64)
        cols = np.zeros((sources.shape[0], k), dtype=np.int32)
        vals = np.zeros((sources.shape[0], k), dtype=np.float32)
        sub = mat[sources]
        for i in range(sources.shape[0]):
            row = sub[i]
            c, v = row.indices, row.data
            if c.shape[0] > k:
                top = np.argpartition(-v, k - 1)[:k]
                c, v = c[top], v[top]
            order = np.argsort(-v, kind="stable")
            c, v = c[order], v[order]
            cols[i, : c.shape[0]] = c
            vals[i, : v.shape[0]] = v
        return TopKProp(sources, cols, vals, mat.shape[0])
