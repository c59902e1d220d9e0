"""Batched GFPush on TPU: dense-residue formulation.

The native/oracle push is irregular (hash maps, data-dependent frontiers) and
cannot map to XLA. The TPU formulation trades sparsity for regularity
(SURVEY.md §7.3 item 1): a block of B sources carries dense residue/reserve
matrices [B, n]; each hop is

    reserve += coef[i] * residue
    teleport = sum of residues on dangling nodes        (rows of zeros deg)
    pushed   = where(residue >= rmax*deg, residue/deg, 0)
    residue  = pushed @ A  (+ teleport back into the source column)

which is a masked elementwise pass plus one [B,n] x [n,n] matmul — exactly
what the MXU wants. rmax pruning is the same *arithmetic* as the sequential
push (a residue below threshold contributes its reserve and vanishes), so
results match the oracle to float tolerance. Final per-row top-k via
``jax.lax.top_k``.

Memory is O(B*n): block the source set. For graphs too large to hold [B, n]
residues, use the native kernel (precompute is embarrassingly parallel and
runs once; the reference does it on 40 CPU threads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from grandtpu.sparse.spmm import BlockCSR, spmm_block


@functools.partial(jax.jit, static_argnames=("k", "n_hops", "use_dense"))
def _push_block(adj_op, deg, dangling, sources, coef, rmax, *, k: int,
                n_hops: int, use_dense: bool):
    """One block of sources. adj_op: dense [n,n] A or PaddedCSR of A^T."""
    b = sources.shape[0]
    n = deg.shape[0]
    residue = jnp.zeros((b, n), jnp.float32).at[
        jnp.arange(b), sources].set(1.0)
    # derive from residue so the varying-manual-axis type matches inside
    # shard_map (a plain zeros literal is unvarying and breaks the scan)
    reserve = residue * 0.0
    threshold = rmax * deg          # [n]; dangling nodes get threshold 0
    safe_deg = jnp.where(dangling, 1.0, deg)

    def hop(i, carry):
        residue, reserve = carry
        reserve = reserve + coef[i] * residue
        teleport = jnp.sum(jnp.where(dangling[None, :], residue, 0.0),
                           axis=-1)
        mask = (residue >= threshold) & (residue > 0) & ~dangling[None, :]
        pushed = jnp.where(mask, residue / safe_deg[None, :], 0.0)
        if use_dense:
            residue = jnp.dot(pushed, adj_op,
                              preferred_element_type=jnp.float32)
        else:
            # pushed @ A == (A^T @ pushed^T)^T with the blocked SpMM over
            # A^T; f32 path for prune-threshold fidelity
            residue = spmm_block(adj_op, pushed.T, fast=False).T
        residue = residue.at[jnp.arange(b), sources].add(teleport)
        return residue, reserve

    residue, reserve = jax.lax.fori_loop(0, n_hops, hop, (residue, reserve))
    reserve = reserve + coef[n_hops] * residue

    vals, cols = jax.lax.top_k(reserve, k)
    keep = vals > 0.0
    return (jnp.where(keep, cols, 0).astype(jnp.int32),
            jnp.where(keep, vals, 0.0))


def gfpush_jax(indptr: np.ndarray, indices: np.ndarray, sources: np.ndarray,
               coef: np.ndarray, rmax: float, k: int,
               block: int = 512, dense_threshold: int = 8192):
    """Run batched push over all sources in blocks. Returns numpy
    (cols int32 [n_src,k], vals float32 [n_src,k]), rows sorted descending."""
    n = indptr.shape[0] - 1
    deg_np = (indptr[1:] - indptr[:-1]).astype(np.float32)
    deg = jnp.asarray(deg_np)
    dangling = jnp.asarray(deg_np == 0)
    use_dense = n <= dense_threshold
    if use_dense:
        a = np.zeros((n, n), dtype=np.float32)
        rows = np.repeat(np.arange(n), (indptr[1:] - indptr[:-1]))
        a[rows, indices] = 1.0   # binary structure, matching the oracle
        adj_op = jnp.asarray(a)
    else:
        import scipy.sparse as sp
        a_t = sp.csr_matrix(
            (np.ones(indices.shape[0], np.float32), indices, indptr),
            shape=(n, n)).T.tocsr()
        adj_op = BlockCSR.from_scipy(a_t)

    coef_j = jnp.asarray(coef, jnp.float32)
    n_hops = int(coef.shape[0]) - 1
    sources = np.asarray(sources, dtype=np.int32)
    n_src = sources.shape[0]
    out_cols = np.zeros((n_src, k), dtype=np.int32)
    out_vals = np.zeros((n_src, k), dtype=np.float32)
    for start in range(0, n_src, block):
        sl = slice(start, min(start + block, n_src))
        src_block = jnp.asarray(sources[sl])
        c, v = _push_block(adj_op, deg, dangling, src_block, coef_j,
                           jnp.float32(rmax), k=k, n_hops=n_hops,
                           use_dense=use_dense)
        out_cols[sl] = np.asarray(c)
        out_vals[sl] = np.asarray(v)
    return out_cols, out_vals
