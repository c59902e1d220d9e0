"""Distributed GFPush: sources sharded across the mesh / across hosts.

The precompute is embarrassingly parallel over source nodes (the reference
exploits this with OpenMP dynamic scheduling, ``graph.h:73``). Two
decompositions here:

- ``sharded_gfpush``: the batched JAX push over a device mesh — graph
  replicated, source set sharded, zero communication until the gather.
- ``multihost_native_gfpush``: the production multi-HOST path — each host
  runs the native C++/OpenMP kernel over its contiguous source shard
  (OpenMP inside the host, process-parallel across hosts), then one
  ``process_allgather`` over DCN assembles the [n_src, k] tables. The
  graph CSR is host-replicated, which is the same assumption the
  reference makes for its single machine (SURVEY §2.3).
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


def push_source_shard(adj, sources: np.ndarray, rank: int, world: int, *,
                      prop_mode: str = "ppr", order: int = 10,
                      alpha: float = 0.2, rmax: float = 1e-7, k: int = 32,
                      backend: str = "native", num_threads: int = 0):
    """Run GFPush on rank's contiguous shard of `sources`.

    Pure per-rank unit of ``multihost_native_gfpush`` — callable directly
    to emulate any world size in one process (used by the tests, and by
    external schedulers that shard precompute jobs themselves). Returns
    (lo, hi, cols [hi-lo, k], vals [hi-lo, k]).
    """
    from grandtpu.ppr import gfpush

    n_src = sources.shape[0]
    per = -(-n_src // world)
    lo, hi = rank * per, min((rank + 1) * per, n_src)
    if lo >= hi:
        return lo, lo, np.zeros((0, k), np.int32), np.zeros((0, k),
                                                            np.float32)
    tk = gfpush(adj, sources[lo:hi], prop_mode=prop_mode, order=order,
                alpha=alpha, rmax=rmax, k=k, backend=backend,
                num_threads=num_threads)
    return lo, hi, tk.cols, tk.vals


def multihost_native_gfpush(adj, sources: np.ndarray, *,
                            prop_mode: str = "ppr", order: int = 10,
                            alpha: float = 0.2, rmax: float = 1e-7,
                            k: int = 32, num_threads: int = 0,
                            backend: str = "native"):
    """GFPush sharded over JAX processes; per-host kernel selectable.

    Single-process (this environment) degenerates to the plain per-host
    call. Multi-process: every host pushes its shard, one
    ``process_allgather`` moves the padded [per, k] tables over DCN —
    comm volume n_src*k*(4+4) bytes total, independent of graph size.
    backend: the per-host kernel — 'native' (C++/OpenMP, default),
    'bucket' (each host drives its own chip with the TPU bucket push),
    or 'auto' (the measured-throughput dispatch policy in ppr/api.py).
    """
    from grandtpu.sparse.topk import TopKProp

    sources = np.asarray(sources)
    world = jax.process_count()
    rank = jax.process_index()
    lo, hi, cols, vals = push_source_shard(
        adj, sources, rank, world, prop_mode=prop_mode, order=order,
        alpha=alpha, rmax=rmax, k=k, num_threads=num_threads,
        backend=backend)
    if world == 1:
        return TopKProp(sources, cols, vals, adj.shape[0])

    from jax.experimental import multihost_utils

    per = -(-sources.shape[0] // world)
    cols_p = np.zeros((per, k), np.int32)
    vals_p = np.zeros((per, k), np.float32)
    cols_p[: hi - lo], vals_p[: hi - lo] = cols, vals
    cols_all = np.asarray(multihost_utils.process_allgather(cols_p))
    vals_all = np.asarray(multihost_utils.process_allgather(vals_p))
    cols_full = cols_all.reshape(world * per, k)[: sources.shape[0]]
    vals_full = vals_all.reshape(world * per, k)[: sources.shape[0]]
    return TopKProp(sources, cols_full, vals_full, adj.shape[0])
