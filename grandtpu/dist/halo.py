"""Halo-compressed row-partitioned propagation: all-to-all boundary
feature exchange OVERLAPPED with the diagonal-block local SpMM.

The all_gather variant (``spmm_shard``) moves ALL of X to every device each
iteration. At higher device counts each shard's edges only reference a
subset of remote rows, so this variant exchanges exactly the needed
("boundary") rows, precomputed statically per (owner, receiver) pair:

  1. build time: for each receiver d and owner s, the unique global columns
     of d's edges owned by s become a padded local-index list; each shard's
     edges are split into a DIAGONAL block (columns owned by d itself,
     indexing x_local directly) and a HALO block (columns remapped into the
     receive-buffer coordinate system);
  2. step time (shard_map): each owner gathers its send rows
     [n_dev, C_max, F] and issues one ``all_to_all`` over the mesh axis;
     the diagonal-block gather + scatter-add has NO data dependence on the
     collective, so XLA's latency-hiding scheduler runs it while the halo
     is in flight; the halo-block partial sum lands on top afterwards.
     Comm volume is n_dev*C_max*F instead of n_pad*F.

This is the graph analogue of ring-attention's KV-block exchange
(SURVEY.md §5 long-context entry). Win condition: C_max*n_dev << n_pad —
high device counts and/or low average degree; at low device counts on dense
graphs nearly every row is somebody's boundary and all_gather is already
optimal (the build reports the compression ratio so callers can choose).
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


def _fill_sharded_blocks(d_of, local_r, cols, vals, num_shards, rows_per,
                         rows_per_block, pad_multiple=128):
    """Lay (shard, local_row, col, val) edges out as uniform-shape
    [S, nb, eb] one-hot-matmul blocks (the scatter-free SpMM layout of
    ``sparse/spmm.py``; r1/r2 used padded scatter-add rows here). Edges
    must arrive sorted by (shard, local_row) — CSR row-major order
    filtered by any mask satisfies this. rows_per must be a multiple of
    rows_per_block so blocks never straddle shards."""
    s_count, r = num_shards, rows_per_block
    nb = rows_per // r
    gblock = d_of * nb + local_r // r
    counts = np.bincount(gblock, minlength=s_count * nb)
    mult = max(-(-int(counts.max() if counts.size else 0) // pad_multiple),
               1)
    if mult % 2 == 0:   # odd multiple: HBM stride aliasing (spmm.py)
        mult += 1
    eb = mult * pad_multiple
    starts = np.zeros(s_count * nb + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slots = np.arange(local_r.size, dtype=np.int64) - starts[gblock]
    flat = gblock * eb + slots
    c = np.zeros(s_count * nb * eb, np.int32)
    v = np.zeros(s_count * nb * eb, np.float32)
    lr = np.full(s_count * nb * eb, r, np.int32)
    c[flat] = cols
    v[flat] = vals
    lr[flat] = (local_r - (local_r // r) * r).astype(np.int32)
    shape = (s_count, nb, eb)
    return (jnp.asarray(c.reshape(shape)), jnp.asarray(v.reshape(shape)),
            jnp.asarray(lr.reshape(shape)))


def estimate_halo_compression(adj: sp.spmatrix, num_shards: int,
                              rows_per_block: int = 512) -> float:
    """Exact comm-compression ratio of the halo exchange vs all_gather,
    WITHOUT building either sharded representation: one np.unique over the
    off-diagonal (receiver, owner, col) keys — the first (and only
    O(E log E)) half of ``HaloShardedGraph.build``. Lets
    ``dist_exact_propagate`` pick halo-vs-all_gather and then build only
    the chosen graph (r2 built both unconditionally)."""
    adj = adj.tocsr()
    n = adj.shape[0]
    S = num_shards
    rows_per = -(-n // S)
    rows_per = -(-rows_per // rows_per_block) * rows_per_block  # == build
    coo = adj.tocoo()
    row = coo.row.astype(np.int64)
    col = coo.col.astype(np.int64)
    d_of = row // rows_per
    s_of = col // rows_per
    halo_m = d_of != s_of
    key = ((d_of[halo_m] * S + s_of[halo_m]) * rows_per
           + (col[halo_m] - s_of[halo_m] * rows_per))
    uniq = np.unique(key)
    counts = np.bincount(uniq // rows_per, minlength=S * S)
    c_max = max(int(counts.max()) if uniq.size else 0, 1)
    return (S * c_max) / (rows_per * S)


@dataclasses.dataclass(frozen=True)
class HaloShardedGraph:
    """Row-partitioned D^-1 A split into diagonal + halo edge sets, both in
    the one-hot-matmul BlockCSR layout (scatter-free, MXU-reduced — same
    kernel family as the single-chip SplitCSR)."""

    # diagonal blocks: columns owned by the shard itself (index x_local)
    cols_diag: jnp.ndarray   # int32 [S, nb, Ed] local col idx (pad: 0)
    vals_diag: jnp.ndarray   # float32 [S, nb, Ed] D^-1-folded (pad: 0)
    lrow_diag: jnp.ndarray   # int32 [S, nb, Ed] row within block (pad: R)
    # halo blocks: columns delivered by the all_to_all (index recv buffer)
    cols_halo: jnp.ndarray   # int32 [S, nb, Eh] index into [S*C_max] buffer
    vals_halo: jnp.ndarray   # float32 [S, nb, Eh]
    lrow_halo: jnp.ndarray   # int32 [S, nb, Eh]
    send_idx: jnp.ndarray    # int32 [S(owner), S(receiver), C_max] local ids
    num_nodes: int
    rows_per_shard: int
    rows_per_block: int
    halo_per_pair: int       # C_max
    # per-row operator value when rows are constant-valued (D^-1 A: 1/deg)
    # — upgrades the int8 HALO matmul to exact int8 x int8 -> int32 on the
    # MXU (value applied after), mirroring spmm_shard/BlockShardedGraph
    row_val: jnp.ndarray | None = None   # float32 [S, rows_per] or None

    @property
    def num_shards(self) -> int:
        return self.cols_diag.shape[0]

    @property
    def compression(self) -> float:
        """comm volume ratio vs all_gather (<1 means halo wins). Only
        off-shard rows cross the interconnect."""
        n_pad = self.rows_per_shard * self.num_shards
        return (self.num_shards * self.halo_per_pair) / n_pad

    @staticmethod
    def build(adj: sp.spmatrix, num_shards: int,
              rows_per_block: int = 512) -> "HaloShardedGraph":
        """One vectorized group-by pass over the edge list: O(E log E)
        total (a single np.unique on a composite (receiver, owner, col)
        key), independent of shard count — the r1 version ran an O(S^2)
        loop of boolean masks over the full edge array."""
        adj = adj.tocsr()
        n = adj.shape[0]
        S = num_shards
        rows_per = -(-n // S)
        rows_per = -(-rows_per // rows_per_block) * rows_per_block
        deg = np.asarray(adj.sum(1)).flatten()
        dinv = (1.0 / np.maximum(deg, 1e-12)).astype(np.float32)

        coo = adj.tocoo()  # row-major sorted: filtered splits stay sorted
        row = coo.row.astype(np.int64)
        col = coo.col.astype(np.int64)
        d_of = row // rows_per          # receiver shard (row owner)
        s_of = col // rows_per          # column owner shard
        vals = (coo.data * dinv[row]).astype(np.float32)
        local_r = (row - d_of * rows_per).astype(np.int32)
        local_c = (col - s_of * rows_per).astype(np.int32)

        # own-shard columns never cross the interconnect — they form the
        # diagonal block read straight from x_local
        halo_m = d_of != s_of

        # per (receiver d, owner s): unique needed local column ids, all
        # pairs at once via one sorted-unique over the composite key
        pair = d_of[halo_m] * S + s_of[halo_m]
        key = pair * rows_per + local_c[halo_m]
        uniq, inv = np.unique(key, return_inverse=True)
        upair = uniq // rows_per
        ulc = (uniq % rows_per).astype(np.int32)
        counts = np.bincount(upair, minlength=S * S)
        c_max = max(int(counts.max()) if uniq.size else 0, 1)
        starts = np.zeros(S * S + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        # position of each unique col within its (d, s) group (groups are
        # contiguous in the sorted unique array)
        pos_in_group = np.arange(uniq.size, dtype=np.int64) - starts[upair]

        send_idx = np.zeros((S, S, c_max), np.int32)
        du = (upair // S).astype(np.int64)
        su = (upair % S).astype(np.int64)
        send_idx[su, du, pos_in_group] = ulc  # owner s -> receiver d

        # per-edge remap into the [S, C_max] receive-buffer coordinates
        remapped = (s_of[halo_m] * c_max + pos_in_group[inv]).astype(np.int32)

        # both edge sets arrive sorted by (shard, local_row) — CSR
        # row-major order survives the boolean filtering
        diag_m = ~halo_m
        cols_d, vals_d, lrow_d = _fill_sharded_blocks(
            d_of[diag_m], local_r[diag_m], local_c[diag_m], vals[diag_m],
            S, rows_per, rows_per_block)
        cols_h, vals_h, lrow_h = _fill_sharded_blocks(
            d_of[halo_m], local_r[halo_m], remapped, vals[halo_m],
            S, rows_per, rows_per_block)
        # coo-of-csr is row-major, so (vals, col, indptr) is the folded
        # D^-1 A in CSR form — same row-constancy check as spmm_shard
        from grandtpu.sparse.spmm import row_values_if_constant
        rv = row_values_if_constant(
            sp.csr_matrix((vals, col.astype(np.int32), adj.indptr),
                          shape=adj.shape))
        row_val = None
        if rv is not None:
            row_val = jnp.asarray(
                np.pad(rv.astype(np.float32),
                       (0, rows_per * S - n)).reshape(S, rows_per))
        return HaloShardedGraph(
            cols_d, vals_d, lrow_d, cols_h, vals_h, lrow_h,
            jnp.asarray(send_idx), n, rows_per, rows_per_block, c_max,
            row_val)


class HaloPropagator:
    """Device-resident halo-exchange propagation operator."""

    def __init__(self, mesh: Mesh, g: HaloShardedGraph,
                 axis: str = "data"):
        self.mesh, self.g, self.axis = mesh, g, axis
        sh = NamedSharding(mesh, P(axis))
        self.edge_ops = tuple(
            jax.device_put(a, sh)
            for a in (g.cols_diag, g.vals_diag, g.lrow_diag,
                      g.cols_halo, g.vals_halo, g.lrow_halo, g.send_idx))
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
        """precision='int8' quantizes the HALO exchange only: send rows
        cross the interconnect as int8 with a global per-column scale
        (4x less comm), the diagonal partial sum stays exact f32 — so
        quantization noise touches only remote contributions."""
        from grandtpu.dist.spmm_shard import _check_dist_precision
        precision = _check_dist_precision(precision)
        g, axis = self.g, self.axis
        if not isinstance(x, jax.Array) or x.shape[0] != \
                g.rows_per_shard * g.num_shards:
            x = self.place(x)

        r = g.rows_per_block
        # row-constant operator + int8 halo -> run the halo matmul as
        # exact int8 x int8 -> int32 on the MXU (value applied per-row
        # after; same upgrade as spmm_shard / single-chip q8mxu). The
        # diagonal partial sum stays exact f32 either way.
        use_mxu = precision == "int8" and self.row_val is not None
        in_specs = (P(axis, None, None),) * 6 + (P(axis, None, None),
                                                 P(axis, None))
        args = self.edge_ops + (x,)
        if use_mxu:
            in_specs += (P(axis, None),)
            args += (self.row_val,)

        @functools.partial(jax.shard_map, mesh=self.mesh,
                           in_specs=in_specs, out_specs=P(axis, None))
        def prop(cols_d, vals_d, lrow_d, cols_h, vals_h, lrow_h,
                 send_idx, x_local, *maybe_rv):
            cols_d, vals_d, lrow_d, cols_h, vals_h, lrow_h, send_idx = (
                cols_d[0], vals_d[0], lrow_d[0], cols_h[0], vals_h[0],
                lrow_h[0], send_idx[0])
            rv = maybe_rv[0][0] if use_mxu else None
            rows_per = x_local.shape[0]
            iota = jnp.arange(r, dtype=jnp.int32)[:, None]

            def onehot_spmm(blocks, src, scale=None):
                q8 = src.dtype == jnp.int8
                mxu = q8 and rv is not None

                def step(_, blk):
                    c, v, lr = blk
                    if mxu:
                        # shared kernel-defining contraction (single
                        # source of truth with the single-chip path)
                        return None, _block_step_q8mxu(src, iota, c, lr)
                    g_rows = jnp.take(src, c, axis=0)
                    if q8:
                        feats = (g_rows.astype(jnp.bfloat16)
                                 * v[:, None].astype(jnp.bfloat16))
                    else:
                        feats = g_rows * v[:, None]
                    onehot = (lr[None, :] == iota).astype(feats.dtype)
                    return None, jnp.dot(
                        onehot, feats, preferred_element_type=jnp.float32,
                        precision=None if q8
                        else jax.lax.Precision.HIGHEST)

                _, outs = jax.lax.scan(step, None, blocks,
                                       unroll=min(4, blocks[0].shape[0]))
                out = outs.reshape(rows_per, src.shape[1])
                if mxu:
                    return out.astype(jnp.float32) * rv[:, None] \
                        * scale[None, :]
                return out * scale[None, :] if scale is not None else out

            def apply_p(x_loc):
                f = x_loc.shape[1]
                if precision in ("int8", "int8cast"):
                    # 'int8cast' quantizes the exchange too but forces the
                    # legacy bf16-cast matmul (same semantics as the
                    # all_gather path / single-chip probes)
                    amax = jax.lax.pmax(jnp.max(jnp.abs(x_loc), axis=0),
                                        axis)
                    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
                    q = jnp.clip(jnp.round(x_loc / scale[None, :]),
                                 -127, 127).astype(jnp.int8)
                    send = jnp.take(q, send_idx, axis=0)   # int8 [S, C, F]
                else:
                    scale = None
                    send = jnp.take(x_loc, send_idx, axis=0)
                halo = jax.lax.all_to_all(
                    send, axis, split_axis=0, concat_axis=0, tiled=False)
                # diagonal partial sum (always exact f32): no data
                # dependence on the all_to_all — XLA overlaps it with the
                # halo in flight
                acc = onehot_spmm((cols_d, vals_d, lrow_d), x_loc)
                hbuf = halo.reshape(-1, f)                # [S*C, F]
                return acc + onehot_spmm((cols_h, vals_h, lrow_h), hbuf,
                                         scale=scale)

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

                _, acc = jax.lax.fori_loop(0, order, body,
                                           (x_local, x_local))
                out = acc / (order + 1)
            elif mode == "single":
                out = jax.lax.fori_loop(0, order, lambda _, v: apply_p(v),
                                        x_local)
            else:
                raise ValueError(f"unknown mode {mode!r}")
            return out

        result = prop(*args)
        return fetch_replicated(self.mesh, result)[: g.num_nodes]
