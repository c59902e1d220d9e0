"""Full-graph SpMM (sparse adjacency @ dense features) for TPU.

Two XLA-friendly formulations, both with fully static shapes:

- dense path: materialize the (row-normalized) adjacency as a dense matrix
  and ride the MXU. On TPU this is by far the fastest option whenever n^2
  fits in HBM — the adjacency of Cora/Citeseer/Pubmed class graphs is tiny
  by MXU standards.
- padded-edge path: edges as (row, col, val) arrays padded to a static
  multiple of a chunk size; a lax.scan over chunks gathers source-feature
  rows and scatter-adds them into the output. Memory is O(chunk * F) on top
  of the [n, F] accumulator, so it scales to hundreds of millions of edges.

The reference's counterpart is scipy ``adj.dot`` on the host inside the
``predict`` power iteration (``model.py:186-210``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass(frozen=True)
class PaddedCSR:
    """COO edges sorted by row, padded to a multiple of `chunk`.

    Padding rows point at row index n (one past the end) with val 0, so a
    segment/scatter-sum with num_segments=n+1 collects all padding into a
    discard slot.
    """

    rows: jnp.ndarray   # int32 [E_pad]
    cols: jnp.ndarray   # int32 [E_pad]
    vals: jnp.ndarray   # float32 [E_pad]
    num_nodes: int
    chunk: int

    @property
    def num_edges_padded(self) -> int:
        return self.rows.shape[0]

    @staticmethod
    def from_scipy(adj: sp.spmatrix, chunk: int = 1 << 18) -> "PaddedCSR":
        coo = adj.tocoo()
        order = np.argsort(coo.row, kind="stable")
        rows = coo.row[order].astype(np.int32)
        cols = coo.col[order].astype(np.int32)
        vals = coo.data[order].astype(np.float32)
        n = adj.shape[0]
        e = rows.shape[0]
        chunk = min(chunk, max(256, 1 << (max(e - 1, 1)).bit_length()))
        e_pad = -(-max(e, 1) // chunk) * chunk
        pad = e_pad - e
        rows = np.concatenate([rows, np.full(pad, n, dtype=np.int32)])
        cols = np.concatenate([cols, np.zeros(pad, dtype=np.int32)])
        vals = np.concatenate([vals, np.zeros(pad, dtype=np.float32)])
        return PaddedCSR(jnp.asarray(rows), jnp.asarray(cols),
                         jnp.asarray(vals), n, chunk)


jax.tree_util.register_pytree_node(
    PaddedCSR,
    lambda p: ((p.rows, p.cols, p.vals), (p.num_nodes, p.chunk)),
    lambda aux, ch: PaddedCSR(*ch, num_nodes=aux[0], chunk=aux[1]),
)


@functools.partial(jax.jit, static_argnames=())
def spmm_segment(padded: PaddedCSR, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x with A given as padded sorted COO; x is [n, F] float.

    Chunked scan: each step gathers a [chunk, F] slab of source rows,
    scales by edge values and scatter-adds into the accumulator. The extra
    discard row swallows padding.
    """
    n, f = padded.num_nodes, x.shape[1]
    e_pad, chunk = padded.num_edges_padded, padded.chunk
    n_chunks = e_pad // chunk
    rows = padded.rows.reshape(n_chunks, chunk)
    cols = padded.cols.reshape(n_chunks, chunk)
    vals = padded.vals.reshape(n_chunks, chunk)

    def step(acc, inputs):
        r, c, v = inputs
        contrib = jnp.take(x, c, axis=0) * v[:, None]
        acc = acc.at[r].add(contrib, indices_are_sorted=True,
                            unique_indices=False)
        return acc, None

    acc = jnp.zeros((n + 1, f), dtype=x.dtype)
    acc, _ = jax.lax.scan(step, acc, (rows, cols, vals))
    return acc[:n]


def normalized_dense_adj(adj: sp.spmatrix, dtype=jnp.float32) -> jnp.ndarray:
    """D^-1 A as a dense device array (MXU path; D = row sums of A)."""
    deg = np.asarray(adj.sum(1)).flatten()
    dinv = 1.0 / np.maximum(deg, 1e-12)
    a = sp.diags(dinv).dot(adj)
    return jnp.asarray(np.asarray(a.todense()), dtype=dtype)


def dense_fits(n: int, budget_bytes: int = 4 << 30, bytes_per=4) -> bool:
    return n * n * bytes_per <= budget_bytes
