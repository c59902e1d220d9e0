"""Row-partitioned full-graph propagation with explicit collectives.

The scale-out analogue of the reference's host scipy SpMM loop
(``model.py:186-210``) and the structural sibling of ring-attention's KV
blocking (SURVEY.md §5 long-context entry): the adjacency is split into
contiguous row blocks, one per device; each power-iteration step all-gathers
the feature shard over ICI, then every device computes its row block with a
local gather + scatter-add. XLA overlaps the all-gather with the local
compute where profitable.

Used for multi-chip exact inference (Amazon2M/MAG scale) and by the
multichip dry run.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from grandtpu.dist.mesh import fetch_replicated
from grandtpu.sparse.spmm import _block_step_q8mxu
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class ShardedGraph:
    """Adjacency split into S contiguous row blocks of equal (padded) size.

    edges are stored stacked per shard, padded to the max per-shard edge
    count with rows pointing at the local discard slot.
    """

    rows_local: jnp.ndarray   # int32 [S, E_max]  local row idx (pad: rows_per)
    cols: jnp.ndarray         # int32 [S, E_max]  global col idx (pad: 0)
    vals: jnp.ndarray         # float32 [S, E_max] (pad: 0)
    dinv: jnp.ndarray         # float32 [S, rows_per]  1/max(deg, 1e-12)
    num_nodes: int            # true n (before row padding)
    rows_per_shard: int

    @property
    def num_shards(self) -> int:
        return self.rows_local.shape[0]

    @staticmethod
    def build(adj: sp.spmatrix, num_shards: int) -> "ShardedGraph":
        adj = adj.tocsr()
        n = adj.shape[0]
        rows_per = -(-n // num_shards)
        deg = np.asarray(adj.sum(1)).flatten()
        dinv_full = (1.0 / np.maximum(deg, 1e-12)).astype(np.float32)
        dinv_full = np.concatenate(
            [dinv_full, np.zeros(rows_per * num_shards - n, np.float32)])

        coo = adj.tocoo()
        shard_of = coo.row // rows_per
        per_shard = []
        for s in range(num_shards):
            m = shard_of == s
            per_shard.append((coo.row[m] - s * rows_per, coo.col[m],
                              coo.data[m].astype(np.float32)))
        e_max = max(max(r.shape[0] for r, _, _ in per_shard), 1)
        # round up for nicer layouts
        e_max = -(-e_max // 128) * 128
        rows_l = np.full((num_shards, e_max), rows_per, np.int32)
        cols = np.zeros((num_shards, e_max), np.int32)
        vals = np.zeros((num_shards, e_max), np.float32)
        for s, (r, c, v) in enumerate(per_shard):
            rows_l[s, : r.shape[0]] = r
            cols[s, : c.shape[0]] = c
            vals[s, : v.shape[0]] = v
        dinv = dinv_full.reshape(num_shards, rows_per)
        return ShardedGraph(jnp.asarray(rows_l), jnp.asarray(cols),
                            jnp.asarray(vals), jnp.asarray(dinv), n,
                            rows_per)


class ShardedPropagator:
    """Device-resident row-partitioned propagation operator: the graph is
    uploaded and sharded once at construction; each call moves only the
    feature block (or none, if x is already placed)."""

    def __init__(self, mesh: Mesh, g: ShardedGraph, axis: str = "data"):
        self.mesh, self.g, self.axis = mesh, g, axis
        data_sharding = NamedSharding(mesh, P(axis))
        self.rows_l = jax.device_put(g.rows_local, data_sharding)
        self.cols = jax.device_put(g.cols, data_sharding)
        self.vals = jax.device_put(g.vals, data_sharding)
        self.dinv = jax.device_put(g.dinv, data_sharding)

    def place(self, x: np.ndarray):
        """Pad + shard a [n, F] feature array over the mesh."""
        n, f = self.g.num_nodes, x.shape[1]
        n_pad = self.g.rows_per_shard * self.g.num_shards
        x_pad = np.zeros((n_pad, f), np.float32)
        x_pad[:n] = np.asarray(x, np.float32)
        return jax.device_put(jnp.asarray(x_pad),
                              NamedSharding(self.mesh, P(self.axis, None)))

    def __call__(self, x, *, mode: str = "ppr", order: int = 10,
                 alpha: float = 0.2) -> np.ndarray:
        if not isinstance(x, jax.Array) or x.shape[0] != \
                self.g.rows_per_shard * self.g.num_shards:
            x = self.place(x)
        out = _sharded_prop(self.mesh, self.axis, mode, order, alpha,
                            self.rows_l, self.cols, self.vals, self.dinv, x)
        return fetch_replicated(self.mesh, out)[: self.g.num_nodes]


def sharded_propagate(mesh: Mesh, g: ShardedGraph, x: np.ndarray, *,
                      mode: str = "ppr", order: int = 10,
                      alpha: float = 0.2, axis: str = "data") -> np.ndarray:
    """One-shot convenience wrapper over ShardedPropagator."""
    return ShardedPropagator(mesh, g, axis)(x, mode=mode, order=order,
                                            alpha=alpha)


def _sharded_prop(mesh, axis, mode, order, alpha, rows_l_in, cols_in,
                  vals_in, dinv_in, x_sharded):
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None), P(axis, None)),
        out_specs=P(axis, None))
    def prop(rows_l, cols, vals, dinv, x_local):
        # locals arrive with a leading length-1 shard dim
        rows_l, cols, vals, dinv = (rows_l[0], cols[0], vals[0], dinv[0])
        rows_per = dinv.shape[0]

        def apply_p(x_loc):
            x_full = jax.lax.all_gather(
                x_loc, axis, axis=0, tiled=True)          # [n_pad, F]
            contrib = jnp.take(x_full, cols, axis=0) * vals[:, None]
            acc = jnp.zeros((rows_per + 1, x_loc.shape[1]), x_loc.dtype)
            acc = acc.at[rows_l].add(contrib, indices_are_sorted=True)
            return dinv[:, None] * acc[:rows_per]

        if mode == "ppr":
            cur = alpha * x_local
            acc = cur

            def body(_, carry):
                cur, acc = carry
                cur = (1.0 - alpha) * apply_p(cur)
                return cur, acc + cur

            _, acc = jax.lax.fori_loop(0, order, body, (cur, acc))
            out = acc
        elif mode == "avg":
            def body(_, carry):
                cur, acc = carry
                cur = apply_p(cur)
                return cur, acc + cur

            _, acc = jax.lax.fori_loop(0, order, body, (x_local, x_local))
            out = acc / (order + 1)
        elif mode == "single":
            out = jax.lax.fori_loop(0, order, lambda _, v: apply_p(v),
                                    x_local)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        return out

    return prop(rows_l_in, cols_in, vals_in, dinv_in, x_sharded)


_DIST_PRECISIONS = ("f32", "bf16", "int8", "int8cast")


def _check_dist_precision(precision: str) -> str:
    """Validate a sharded-propagator precision string. 'int8mxu' (the
    single-chip Propagator spelling) maps to 'int8' — the sharded int8
    path already auto-upgrades to the MXU kernel on row-constant
    operators; anything outside the allowed set raises instead of
    silently falling through to the bf16-cast non-quantized branch."""
    if precision == "int8mxu":
        return "int8"
    if precision not in _DIST_PRECISIONS:
        raise ValueError(
            f"unknown precision {precision!r}; sharded propagators accept "
            f"{_DIST_PRECISIONS} (or 'int8mxu' as an alias for 'int8')")
    return precision


@dataclasses.dataclass(frozen=True)
class BlockShardedGraph:
    """Row-partitioned D^-1 A in the scatter-free BlockCSR layout.

    The r1/r2 ShardedGraph applied each shard's rows with a scatter-add —
    the formulation the single-chip path retired at 21M edges/s. This
    layout gives every shard the same one-hot-matmul kernel the
    single-chip SplitCSR runs at 175M edges/s: rows_per_shard is rounded
    to a multiple of rows_per_block so row blocks never straddle shards,
    and all shards share one (nb, eb) shape so the stacked [S, nb, eb]
    arrays shard evenly over the mesh axis.
    """

    cols: jnp.ndarray   # int32 [S, nb, eb] global col ids (pad 0)
    vals: jnp.ndarray   # float32 [S, nb, eb] D^-1-folded (pad 0)
    lrow: jnp.ndarray   # int32 [S, nb, eb] local row in [0, R] (pad R)
    num_nodes: int
    rows_per_shard: int
    rows_per_block: int
    # per-row operator value when every row's nonzeros share one (D^-1 A
    # does: 1/deg) — lets the int8 path run the one-hot matmul as exact
    # int8 x int8 -> int32 on the MXU with the value applied after, the
    # same upgrade the single-chip path measured at +19.5% AND 2.4x less
    # quantization error (sparse/spmm.py q8mxu note, bench/q8mxu_probe.py)
    row_val: jnp.ndarray | None = None   # float32 [S, rows_per] or None

    @property
    def num_shards(self) -> int:
        return self.cols.shape[0]

    @staticmethod
    def build(adj: sp.spmatrix, num_shards: int, rows_per_block: int = 512,
              pad_multiple: int = 512) -> "BlockShardedGraph":
        adj = adj.tocsr()
        n = adj.shape[0]
        s_count = num_shards
        r = rows_per_block
        deg = np.asarray(adj.sum(1)).flatten()
        dinv = (1.0 / np.maximum(deg, 1e-12)).astype(np.float32)
        rows_per = -(-n // s_count)
        rows_per = -(-rows_per // r) * r   # round up to a block multiple
        nb = rows_per // r
        n_blocks = s_count * nb

        coo = adj.tocoo()
        rows = coo.row.astype(np.int64)
        cols = coo.col.astype(np.int32)
        vals = (coo.data * dinv[rows]).astype(np.float32)
        block = rows // r
        counts = np.bincount(block, minlength=n_blocks)
        mult = max(-(-int(counts.max()) // pad_multiple), 1)
        if mult % 2 == 0:   # odd multiple: HBM stride aliasing (spmm.py)
            mult += 1
        eb = mult * pad_multiple

        starts = np.zeros(n_blocks + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        slots = np.arange(rows.size, dtype=np.int64) - starts[block]
        flat = block * eb + slots
        c = np.zeros(n_blocks * eb, np.int32)
        v = np.zeros(n_blocks * eb, np.float32)
        lr = np.full(n_blocks * eb, r, np.int32)
        c[flat] = cols
        v[flat] = vals
        lr[flat] = (rows - block * r).astype(np.int32)
        shape = (s_count, nb, eb)
        # coo-of-csr is row-major, so (vals, cols, indptr) IS the folded
        # D^-1 A in CSR form — reuse the single-chip row-constant check
        from grandtpu.sparse.spmm import row_values_if_constant
        rv = row_values_if_constant(
            sp.csr_matrix((vals, cols, adj.indptr), shape=adj.shape))
        row_val = None
        if rv is not None:
            row_val = jnp.asarray(
                np.pad(rv.astype(np.float32),
                       (0, rows_per * s_count - n)).reshape(s_count,
                                                            rows_per))
        return BlockShardedGraph(
            jnp.asarray(c.reshape(shape)), jnp.asarray(v.reshape(shape)),
            jnp.asarray(lr.reshape(shape)), n, rows_per, r, row_val)


class BlockShardedPropagator:
    """Device-resident row-partitioned propagation on the one-hot-matmul
    kernel. precision: 'f32' | 'bf16' | 'int8' — int8 additionally
    quantizes the feature block BEFORE the all_gather (global per-column
    scale via a max-psum), so the collective itself moves 4x fewer bytes
    over ICI than f32."""

    def __init__(self, mesh: Mesh, g: BlockShardedGraph,
                 axis: str = "data"):
        self.mesh, self.g, self.axis = mesh, g, axis
        sh = NamedSharding(mesh, P(axis))
        self.cols = jax.device_put(g.cols, sh)
        self.vals = jax.device_put(g.vals, sh)
        self.lrow = jax.device_put(g.lrow, sh)
        self.row_val = (None if g.row_val is None
                        else jax.device_put(g.row_val, sh))

    def place(self, x: np.ndarray):
        n, f = self.g.num_nodes, x.shape[1]
        n_pad = self.g.rows_per_shard * self.g.num_shards
        x_pad = np.zeros((n_pad, f), np.float32)
        x_pad[:n] = np.asarray(x, np.float32)
        return jax.device_put(jnp.asarray(x_pad),
                              NamedSharding(self.mesh, P(self.axis, None)))

    def __call__(self, x, *, mode: str = "ppr", order: int = 10,
                 alpha: float = 0.2,
                 precision: str = "f32") -> np.ndarray:
        precision = _check_dist_precision(precision)
        g = self.g
        if not isinstance(x, jax.Array) or x.shape[0] != \
                g.rows_per_shard * g.num_shards:
            x = self.place(x)
        out = _block_sharded_prop(self.mesh, self.axis, mode, order, alpha,
                                  precision, g.rows_per_block, self.cols,
                                  self.vals, self.lrow, x, self.row_val)
        return fetch_replicated(self.mesh, out)[: g.num_nodes]


def _block_sharded_prop(mesh, axis, mode, order, alpha, precision, r,
                        cols_in, vals_in, lrow_in, x_sharded,
                        row_val_in=None):
    mm_dtype = jnp.bfloat16 if precision != "f32" else jnp.float32
    prec = None if precision != "f32" else jax.lax.Precision.HIGHEST
    # int8 on a row-constant operator runs the matmul itself in int8 on
    # the MXU (int32 accumulate, per-row value applied after) — same
    # kernel upgrade as single-chip spmm_split_q8mxu; 'int8cast' forces
    # the legacy bf16-cast matmul for general-valued operators/probes
    use_mxu = precision == "int8" and row_val_in is not None
    in_specs = (P(axis, None, None), P(axis, None, None),
                P(axis, None, None), P(axis, None))
    args = (cols_in, vals_in, lrow_in, x_sharded)
    if use_mxu:
        in_specs += (P(axis, None),)
        args += (row_val_in,)

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=P(axis, None))
    def prop(cols, vals, lrow, x_local, *maybe_rv):
        cols, vals, lrow = cols[0], vals[0], lrow[0]
        rv = maybe_rv[0][0] if use_mxu else None
        rows_per = x_local.shape[0]
        f = x_local.shape[1]
        iota = jnp.arange(r, dtype=jnp.int32)[:, None]

        def apply_p(x_loc):
            if precision in ("int8", "int8cast"):
                # global per-column scale: max over the shard axis, then
                # gather int8 — 4x less ICI traffic than f32
                amax = jax.lax.pmax(jnp.max(jnp.abs(x_loc), axis=0), axis)
                scale = jnp.where(amax > 0, amax / 127.0, 1.0)
                q = jnp.clip(jnp.round(x_loc / scale[None, :]),
                             -127, 127).astype(jnp.int8)
                x_full = jax.lax.all_gather(q, axis, axis=0, tiled=True)
            else:
                scale = None
                x_full = jax.lax.all_gather(x_loc, axis, axis=0,
                                            tiled=True)

            def step(_, blk):
                c, v, lr = blk
                if use_mxu:
                    # shared kernel-defining contraction (single source
                    # of truth with the single-chip q8mxu path)
                    return None, _block_step_q8mxu(x_full, iota, c, lr)
                g = jnp.take(x_full, c, axis=0)
                if scale is not None:
                    # rescale folds in AFTER the matmul (exact: per-column)
                    feats = g.astype(jnp.bfloat16) * v[:, None].astype(
                        jnp.bfloat16)
                else:
                    feats = (g * v[:, None]).astype(mm_dtype)
                onehot = (lr[None, :] == iota).astype(mm_dtype)
                return None, jnp.dot(onehot, feats,
                                     preferred_element_type=jnp.float32,
                                     precision=prec)

            _, outs = jax.lax.scan(step, None, (cols, vals, lrow),
                                   unroll=min(4, cols.shape[0]))
            out = outs.reshape(rows_per, f)
            if use_mxu:
                return out.astype(jnp.float32) * rv[:, None] \
                    * scale[None, :]
            return out * scale[None, :] if scale is not None else out

        if mode == "ppr":
            cur = alpha * x_local

            def body(_, carry):
                cur, acc = carry
                cur = (1.0 - alpha) * apply_p(cur)
                return cur, acc + cur

            _, out = jax.lax.fori_loop(0, order, body, (cur, cur))
        elif mode == "avg":
            def body(_, carry):
                cur, acc = carry
                cur = apply_p(cur)
                return cur, acc + cur

            _, acc = jax.lax.fori_loop(0, order, body, (x_local, x_local))
            out = acc / (order + 1)
        elif mode == "single":
            out = jax.lax.fori_loop(0, order, lambda _, v: apply_p(v),
                                    x_local)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        return out

    return prop(*args)


def dist_exact_propagate(mesh: Mesh, adj_sl, features, *,
                         mode: str = "ppr", order: int = 10,
                         alpha: float = 0.2, axis: str = "data",
                         halo_threshold: float | None = None,
                         precision: str = "f32") -> np.ndarray:
    """Row-partitioned full-graph exact propagation (the reference's test
    HOT LOOP #3, ``model.py:186-210``), choosing the exchange pattern by
    the mesh fabric and the measured comm-compression ratio:

    - single-process mesh (``jax.process_count() == 1``, shared-memory /
      single-host ICI fabric): all_gather UNCONDITIONALLY — the r4
      crossover sweep (``bench/halo_crossover.py``, RESULTS.md) measured
      all_gather winning EVERY cell on such meshes, even at compression
      0.0098, because the halo variant's gather/scatter bookkeeping costs
      more than the collective saves when the "interconnect" is memory.
    - multi-process mesh (real ICI/DCN between hosts): the halo variant
      moves S*C_max rows per iteration vs all of X for all_gather, so it
      engages when ``compression < halo_threshold`` (default 0.5 — the
      bandwidth model for a real fabric; re-sweep when multi-chip
      hardware is available); otherwise all_gather.

    Pass an explicit ``halo_threshold`` to override the fabric policy in
    either direction (e.g. 1.0 forces halo everywhere for tests).

    The all_gather variant rides the scatter-free one-hot-matmul kernel
    (``BlockShardedPropagator`` — the same formulation the single-chip
    path measures at 175M edges/s vs 21M for scatter-add), with optional
    int8-quantized collectives. The compression ratio comes from the
    cheap ``estimate_halo_compression`` pass so only ONE sharded
    representation is ever built. Both trainers route their final
    test-time propagation here when ``num_devices > 1``."""
    from grandtpu.dist.halo import (HaloPropagator, HaloShardedGraph,
                                    estimate_halo_compression)

    if precision == "bf16_carry":
        # single-chip memory backoff; sharded carries already split over
        # the mesh, so run the plain bf16 kernel with f32 carries
        precision = "bf16"
    if precision != "auto":
        # same validation/aliasing as the propagators themselves
        # ('int8mxu' -> 'int8'), so a config that works single-chip never
        # dies at the final multi-device propagation
        precision = _check_dist_precision(precision)
    if halo_threshold is None:
        # fabric-aware default (VERDICT r4 #5): measured all_gather wins
        # every cell on a single-process mesh; 0.5 models real ICI/DCN
        halo_threshold = 0.5 if jax.process_count() > 1 else 0.0
    if precision == "auto":
        # same measured working-set heuristic as the single-chip path;
        # sized on the GLOBAL [n, F] carry since the all_gather variant
        # regathers full X per hop and the gather-table regime (not the
        # per-shard slice) is what sets the int8/bf16 ranking
        from grandtpu.infer.propagate import (_max_row_nnz,
                                              choose_fast_precision)
        precision = choose_fast_precision(adj_sl.shape[0],
                                          int(np.shape(features)[1]),
                                          max_degree=_max_row_nnz(adj_sl))
    num_shards = int(mesh.shape[axis])
    if num_shards == 1:
        from grandtpu.infer import exact_propagate
        return np.asarray(exact_propagate(adj_sl, features, mode=mode,
                                          order=order, alpha=alpha,
                                          precision=precision))
    if estimate_halo_compression(adj_sl, num_shards) < halo_threshold:
        hg = HaloShardedGraph.build(adj_sl, num_shards=num_shards)
        return HaloPropagator(mesh, hg, axis)(
            features, mode=mode, order=order, alpha=alpha,
            precision=precision)
    g = BlockShardedGraph.build(adj_sl, num_shards=num_shards)
    return BlockShardedPropagator(mesh, g, axis)(
        np.asarray(features, np.float32), mode=mode, order=order,
        alpha=alpha, precision=precision)
