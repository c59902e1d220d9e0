"""Distributed GFPush: sources sharded across the mesh.

The precompute is embarrassingly parallel over source nodes (the reference
exploits this with OpenMP dynamic scheduling, ``graph.h:73``); on a TPU mesh
the same decomposition is a ``shard_map`` with the graph replicated and the
source set sharded — each device runs the batched dense-residue push on its
shard, no communication at all until results are gathered.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from grandtpu.ppr.jax_push import _push_block
from grandtpu.sparse.spmm import BlockCSR


def sharded_gfpush(mesh: Mesh, indptr: np.ndarray, indices: np.ndarray,
                   sources: np.ndarray, coef: np.ndarray, rmax: float,
                   k: int, *, axis: str = "data",
                   dense_threshold: int = 8192):
    """Run GFPush with sources sharded over mesh axis `axis`.

    Returns numpy (cols int32 [n_src, k], vals float32 [n_src, k]).
    """
    n = indptr.shape[0] - 1
    n_dev = mesh.shape[axis]
    deg_np = (indptr[1:] - indptr[:-1]).astype(np.float32)
    deg = jnp.asarray(deg_np)
    dangling = jnp.asarray(deg_np == 0)
    use_dense = n <= dense_threshold
    if use_dense:
        a = np.zeros((n, n), dtype=np.float32)
        rows = np.repeat(np.arange(n), (indptr[1:] - indptr[:-1]))
        a[rows, indices] = 1.0
        adj_op = jnp.asarray(a)
    else:
        import scipy.sparse as sp
        a_t = sp.csr_matrix(
            (np.ones(indices.shape[0], np.float32), indices, indptr),
            shape=(n, n)).T.tocsr()
        adj_op = BlockCSR.from_scipy(a_t)

    n_src = sources.shape[0]
    per = -(-n_src // n_dev)
    pad = per * n_dev - n_src
    src_pad = np.concatenate(
        [sources.astype(np.int32),
         np.zeros(pad, np.int32)])           # pad runs push on node 0; sliced off
    coef_j = jnp.asarray(coef, jnp.float32)
    n_hops = int(coef.shape[0]) - 1

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P()),
        out_specs=(P(axis), P(axis)))
    def run(adj_op, deg, dangling, src_local, coef_j):
        return _push_block(adj_op, deg, dangling, src_local, coef_j,
                           jnp.float32(rmax), k=k, n_hops=n_hops,
                           use_dense=use_dense)

    src_dev = jax.device_put(jnp.asarray(src_pad),
                             NamedSharding(mesh, P(axis)))
    cols, vals = run(adj_op, deg, dangling, src_dev, coef_j)
    return (np.asarray(cols)[:n_src], np.asarray(vals)[:n_src])
