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


@dataclasses.dataclass(frozen=True)
class BlockCSR:
    """Row-blocked CSR for the scatter-free one-hot-matmul SpMM.

    Rows are grouped into blocks of R; each block's edges are padded to a
    common per-block count E_b. The per-block product is
        out_block[R, F] = one_hot(local_row)[R, E_b] @ (x[cols] * vals)
    — an MXU matmul instead of a scatter, and the outputs emerge already in
    row order. Measured ~2.3x over XLA's fused sorted segment_sum and ~6x
    over scatter-add on TPU v5e (125M edges/s at n=300K, deg 30, F=128).

    Perf notes baked into the design (all measured on a v5e chip):
    - keep x in float32: the row gather moves 512-byte granules (F=128),
      which is ~2x more efficient per row than bf16's 256B;
    - cast the *gathered block* to bf16 for the one-hot matmul (f32 MXU
      matmul on TPU defaults to bf16 passes anyway); accumulate f32;
    - padding slots point local_row at R, matching no one-hot row;
    - R=512 beats 256 by ~1.4x (fewer scan steps, larger gathers) while
      1024 regresses (VMEM pressure from the [Eb, F] gather buffer);
    - E_b is forced to an ODD multiple of pad_multiple: even multiples of
      512 put consecutive scan-step gathers at power-of-two-aliased HBM
      strides and cost ~1.6x (120M -> 71M edges/s measured) — classic
      bank-conflict striding, fixed by the odd round-up.
    """

    cols: jnp.ndarray     # int32 [n_blocks, E_b] global col ids (pad 0)
    vals: jnp.ndarray     # float32 [n_blocks, E_b] (pad 0)
    lrow: jnp.ndarray     # int32 [n_blocks, E_b] local row in [0,R] (pad R)
    num_nodes: int
    rows_per_block: int

    @property
    def num_blocks(self) -> int:
        return self.cols.shape[0]

    @property
    def pad_overhead(self) -> float:
        e_pad = self.cols.shape[0] * self.cols.shape[1]
        nnz = float((np.asarray(self.vals) != 0).sum())
        return e_pad / max(nnz, 1.0)

    @staticmethod
    def from_scipy(adj: sp.spmatrix, rows_per_block: int = 512,
                   pad_multiple: int = 512) -> "BlockCSR":
        adj = adj.tocsr()
        n = adj.shape[0]
        r = rows_per_block
        nb = -(-n // r)
        indptr = adj.indptr.astype(np.int64)
        counts = np.add.reduceat(np.diff(indptr), np.arange(0, n, r))
        mult = max(-(-int(counts.max()) // pad_multiple), 1)
        if mult % 2 == 0:   # odd multiple: avoid HBM stride aliasing
            mult += 1
        eb = mult * pad_multiple
        e = adj.nnz
        # vectorized fill: edge e of block b lands at slot e - indptr[b*r]
        rows_of_edge = np.repeat(np.arange(n, dtype=np.int64),
                                 np.diff(indptr))
        block_of_edge = rows_of_edge // r
        block_e0 = indptr[np.minimum(block_of_edge * r, n)]
        slots = np.arange(e, dtype=np.int64) - block_e0
        flat = block_of_edge * eb + slots
        cols = np.zeros(nb * eb, np.int32)
        vals = np.zeros(nb * eb, np.float32)
        lrow = np.full(nb * eb, r, np.int32)
        cols[flat] = adj.indices
        vals[flat] = adj.data
        lrow[flat] = (rows_of_edge - block_of_edge * r).astype(np.int32)
        return BlockCSR(jnp.asarray(cols.reshape(nb, eb)),
                        jnp.asarray(vals.reshape(nb, eb)),
                        jnp.asarray(lrow.reshape(nb, eb)), n, r)


jax.tree_util.register_pytree_node(
    BlockCSR,
    lambda p: ((p.cols, p.vals, p.lrow), (p.num_nodes, p.rows_per_block)),
    lambda aux, ch: BlockCSR(*ch, num_nodes=aux[0], rows_per_block=aux[1]),
)


@functools.partial(jax.jit, static_argnames=("fast", "trim", "unroll"))
def spmm_block(bcsr: BlockCSR, x: jnp.ndarray, fast: bool = True,
               trim: bool = True, unroll: int = 4):
    """y = A @ x via the one-hot-matmul block formulation.

    fast=True: bf16 one-hot matmul (rel err ~1e-3, 2x faster).
    fast=False: float32 with HIGHEST precision (rel err ~1e-6).
    trim=False returns the block-padded [n_blocks*R, F] result (padding rows
    are zero) — power-iteration loops keep everything padded and slice once
    at the end, avoiding a [n, F] copy per application.
    unroll: scan unroll factor; 4 lets XLA overlap block i+1's gather with
    block i's matmul (~8% measured on v5e).
    """
    r = bcsr.rows_per_block
    n, f = bcsr.num_nodes, x.shape[1]
    iota = jnp.arange(r, dtype=jnp.int32)[:, None]
    mm_dtype = jnp.bfloat16 if fast else jnp.float32
    prec = None if fast else jax.lax.Precision.HIGHEST

    def step(_, blk):
        c, v, lr = blk
        feats = (jnp.take(x, c, axis=0) * v[:, None]).astype(mm_dtype)
        onehot = (lr[None, :] == iota).astype(mm_dtype)
        out = jnp.dot(onehot, feats, preferred_element_type=jnp.float32,
                      precision=prec)
        return None, out

    _, outs = jax.lax.scan(step, None, (bcsr.cols, bcsr.vals, bcsr.lrow),
                           unroll=min(unroll, bcsr.num_blocks))
    out = outs.reshape(-1, f)
    return out[:n] if trim else out


@dataclasses.dataclass(frozen=True)
class OffsetBlockCSR:
    """BlockCSR variant for sparse *block* coverage: only non-empty row
    blocks are materialized, each tagged with its output row offset.

    The apply accumulates each block's [R, F] one-hot-matmul product into a
    caller-provided accumulator with a dynamic-slice read-modify-write —
    scan steps are sequential, so overlapping row ranges are race-free.
    Used for the overflow levels of SplitCSR, where most blocks have no
    spilled edges (a handful of hub rows hold the tail of a power-law
    degree distribution).
    """

    cols: jnp.ndarray     # int32 [nb, E_b] global col ids (pad 0)
    vals: jnp.ndarray     # float32 [nb, E_b] (pad 0)
    lrow: jnp.ndarray     # int32 [nb, E_b] local row in [0,R] (pad R)
    row0: jnp.ndarray     # int32 [nb] output row offset of each block
    rows_per_block: int


jax.tree_util.register_pytree_node(
    OffsetBlockCSR,
    lambda p: ((p.cols, p.vals, p.lrow, p.row0), (p.rows_per_block,)),
    lambda aux, ch: OffsetBlockCSR(*ch, rows_per_block=aux[0]),
)


@functools.partial(jax.jit, static_argnames=("fast", "unroll"))
def spmm_block_offset(ob: OffsetBlockCSR, x: jnp.ndarray, acc: jnp.ndarray,
                      fast: bool = True, unroll: int = 2) -> jnp.ndarray:
    """acc += A_overflow @ x for an OffsetBlockCSR; acc is [n_pad, F] with
    n_pad ≥ max(row0) + R (guaranteed when row0 are block-aligned offsets
    of the same padded row space)."""
    r = ob.rows_per_block
    f = x.shape[1]
    iota = jnp.arange(r, dtype=jnp.int32)[:, None]
    mm_dtype = jnp.bfloat16 if fast else jnp.float32
    prec = None if fast else jax.lax.Precision.HIGHEST

    def step(acc, blk):
        c, v, lr, r0 = blk
        feats = (jnp.take(x, c, axis=0) * v[:, None]).astype(mm_dtype)
        onehot = (lr[None, :] == iota).astype(mm_dtype)
        out = jnp.dot(onehot, feats, preferred_element_type=jnp.float32,
                      precision=prec)
        slab = jax.lax.dynamic_slice(acc, (r0, 0), (r, f))
        acc = jax.lax.dynamic_update_slice(acc, slab + out.astype(acc.dtype),
                                           (r0, 0))
        return acc, None

    acc, _ = jax.lax.scan(step, acc, (ob.cols, ob.vals, ob.lrow, ob.row0),
                          unroll=min(unroll, ob.row0.shape[0]))
    return acc


@dataclasses.dataclass(frozen=True)
class SplitCSR:
    """Skew-robust SpMM operator: BlockCSR base + overflow levels.

    For power-law graphs a plain BlockCSR pads every row block to the
    HOTTEST block's edge count — a few hub rows can inflate padding by an
    order of magnitude (the old fallback was the 6x-slower scatter path).
    Instead, the base level caps E_b; each block's edges beyond the cap
    spill into ONE chunked overflow level (OffsetBlockCSR) whose chunks may
    share the same output offset — the read-modify-write accumulate lets a
    single hub block span many chunks, so arbitrarily heavy rows cost only
    one chunk-tail of padding. Base cap and chunk size are chosen by exact
    slot-count minimization over candidate quantiles (slots ≈ gathered rows
    ≈ time: the row gather is the measured bottleneck). Both levels ride
    the same one-hot-matmul kernel; outputs sum in the shared padded row
    space: y = spmm_block(base) + spmm_block_offset(overflow).
    """

    base: BlockCSR
    levels: tuple      # of OffsetBlockCSR
    num_nodes: int

    @property
    def rows_per_block(self) -> int:
        return self.base.rows_per_block

    @property
    def num_blocks(self) -> int:
        return self.base.num_blocks

    @property
    def pad_overhead(self) -> float:
        slots = self.base.cols.size + sum(l.cols.size for l in self.levels)
        nnz = float((np.asarray(self.base.vals) != 0).sum()) + sum(
            float((np.asarray(l.vals) != 0).sum()) for l in self.levels)
        return slots / max(nnz, 1.0)

    @staticmethod
    def from_scipy(adj: sp.spmatrix, rows_per_block: int = 512,
                   pad_multiple: int = 512,
                   max_eb: int = 23 * 512) -> "SplitCSR":
        """max_eb caps the per-block edge capacity of both levels: beyond
        ~12K slots the [E_b, F] gather buffer spills VMEM (measured on v5e
        at F=128); dense high-degree graphs then stream through overflow
        chunks instead of one giant block."""
        adj = adj.tocsr()
        n = adj.shape[0]
        r = rows_per_block
        nb = -(-n // r)
        indptr = adj.indptr.astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
        cols = adj.indices.astype(np.int32)
        vals = adj.data.astype(np.float32)
        block = rows // r
        counts = np.bincount(block, minlength=nb)

        def odd_eb(count):
            mult = max(-(-int(count) // pad_multiple), 1)
            return (mult + 1 - mult % 2) * pad_multiple

        cap_hi = odd_eb(max_eb) if odd_eb(max_eb) <= max_eb else \
            odd_eb(max_eb) - 2 * pad_multiple
        cap_hi = max(cap_hi, pad_multiple)

        def chunk_slots(spill, eb):
            """total slots of the overflow level at chunk size eb"""
            return int((-(-spill // eb)).sum()) * eb

        # choose (base cap, overflow chunk size) minimizing total gathered
        # slots over candidate quantiles of the per-block counts
        qs = [0.5, 0.75, 0.9, 0.95, 0.99, 1.0]
        cand_caps = sorted({min(odd_eb(max(q, 1)), cap_hi)
                            for q in np.quantile(counts, qs)}) \
            if rows.size else [pad_multiple]
        best = None          # (cost, cap, eb_ovf or None)
        for cap in cand_caps:
            spill = np.maximum(counts - cap, 0)
            cost = nb * cap
            if spill.sum() == 0:
                cand = (cost, cap, None)
            else:
                nzs = spill[spill > 0]
                ebs = {min(odd_eb(max(q, 1)), cap_hi)
                       for q in np.quantile(nzs, [0.5, 0.9, 1.0])}
                slots, eb_ovf = min((chunk_slots(nzs, e), e) for e in ebs)
                cand = (cost + slots, cap, eb_ovf)
            if best is None or cand[0] < best[0]:
                best = cand
        # prefer a spill-free layout when it is within 15% of optimal
        # (an overflow level costs an extra scan + RMW pass)
        for cap in cand_caps:
            if (counts <= cap).all() and nb * cap <= 1.15 * best[0]:
                best = (nb * cap, cap, None)
                break
        _, cap, eb_ovf = best

        starts = np.zeros(nb + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        slots = np.arange(rows.size, dtype=np.int64) - starts[block]
        take = slots < cap
        base = _fill_blocks_dense(rows[take], cols[take], vals[take],
                                  slots[take], n, nb, r, cap)
        levels = ()
        if eb_ovf is not None and (~take).any():
            levels = (_fill_blocks_chunked(rows[~take], cols[~take],
                                           vals[~take], r, eb_ovf),)
        return SplitCSR(base, levels, n)


def _fill_blocks_dense(rows, cols, vals, slots, n, nb, r, eb) -> BlockCSR:
    """Materialize ALL nb row blocks (slots already local to each block)."""
    block = rows // r
    flat = block * eb + slots
    c = np.zeros(nb * eb, np.int32)
    v = np.zeros(nb * eb, np.float32)
    lr = np.full(nb * eb, r, np.int32)
    c[flat] = cols
    v[flat] = vals
    lr[flat] = (rows - block * r).astype(np.int32)
    return BlockCSR(jnp.asarray(c.reshape(nb, eb)),
                    jnp.asarray(v.reshape(nb, eb)),
                    jnp.asarray(lr.reshape(nb, eb)), n, r)


def _fill_blocks_chunked(rows, cols, vals, r, eb) -> OffsetBlockCSR:
    """Materialize overflow edges as eb-sized chunks; a row block heavier
    than eb spans several chunks sharing the same row0 (the sequential
    RMW accumulate in spmm_block_offset sums them). Only the final chunk
    of each block carries padding."""
    block = rows // r
    uniq, inv = np.unique(block, return_inverse=True)
    ng = uniq.shape[0]
    counts = np.bincount(inv, minlength=ng)
    starts = np.zeros(ng + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    local = np.arange(rows.size, dtype=np.int64) - starts[inv]
    chunks_per = -(-counts // eb)
    chunk_base = np.zeros(ng + 1, np.int64)
    np.cumsum(chunks_per, out=chunk_base[1:])
    chunk_id = chunk_base[inv] + local // eb
    nc = int(chunk_base[-1])
    flat = chunk_id * eb + local % eb
    c = np.zeros(nc * eb, np.int32)
    v = np.zeros(nc * eb, np.float32)
    lr = np.full(nc * eb, r, np.int32)
    c[flat] = cols
    v[flat] = vals
    lr[flat] = (rows - block * r).astype(np.int32)
    row0 = np.repeat(uniq * r, chunks_per).astype(np.int32)
    return OffsetBlockCSR(jnp.asarray(c.reshape(nc, eb)),
                          jnp.asarray(v.reshape(nc, eb)),
                          jnp.asarray(lr.reshape(nc, eb)),
                          jnp.asarray(row0), r)


jax.tree_util.register_pytree_node(
    SplitCSR,
    lambda p: ((p.base, p.levels), (p.num_nodes,)),
    lambda aux, ch: SplitCSR(ch[0], ch[1], num_nodes=aux[0]),
)


def spmm_split(scsr: SplitCSR, x: jnp.ndarray, fast: bool = True,
               trim: bool = True) -> jnp.ndarray:
    """y = A @ x for a SplitCSR (base + overflow levels, summed)."""
    out = spmm_block(scsr.base, x, fast=fast, trim=False)
    for lvl in scsr.levels:
        out = spmm_block_offset(lvl, x, out, fast=fast)
    return out[:scsr.num_nodes] if trim else out


# ---------------------------------------------------------------------------
# int8-packed gather path (opt-in). Measured on v5e (bench/gather_roof.py,
# RESULTS.md): the row gather is per-ROW bound, and 128-byte rows gather at
# ~164M rows/s vs ~108M for f32's 512B rows — int8 features with a
# per-column f32 rescale recover that 1.5x. The rescale is exact to fold
# AFTER the one-hot matmul (scale varies only along F):
#     out[r, f] = s[f] * sum_e onehot[r, e] * q[e, f] * v[e]
# Quantization error <= 1/254 of each column's max |x| per element — far
# below DropNode training noise; end-to-end accuracy evidence in RESULTS.md.
# ---------------------------------------------------------------------------


def quantize_columns(x: jnp.ndarray):
    """Per-column symmetric int8 quantization: x ~= q * scale[None, :]."""
    amax = jnp.max(jnp.abs(x), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def _block_step_q8(x_q, iota, c, v, lr):
    feats = (jnp.take(x_q, c, axis=0).astype(jnp.bfloat16)
             * v[:, None].astype(jnp.bfloat16))
    onehot = (lr[None, :] == iota).astype(jnp.bfloat16)
    return jnp.dot(onehot, feats, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("trim", "unroll"))
def spmm_block_q8(bcsr: BlockCSR, x_q: jnp.ndarray, scale: jnp.ndarray,
                  trim: bool = True, unroll: int = 4):
    """y = A @ (x_q * scale) with the int8 row gather (see note above)."""
    r = bcsr.rows_per_block
    n, f = bcsr.num_nodes, x_q.shape[1]
    iota = jnp.arange(r, dtype=jnp.int32)[:, None]

    def step(_, blk):
        c, v, lr = blk
        return None, _block_step_q8(x_q, iota, c, v, lr)

    _, outs = jax.lax.scan(step, None, (bcsr.cols, bcsr.vals, bcsr.lrow),
                           unroll=min(unroll, bcsr.num_blocks))
    out = outs.reshape(-1, f) * scale[None, :]
    return out[:n] if trim else out


@functools.partial(jax.jit, static_argnames=("unroll",))
def spmm_block_offset_q8(ob: OffsetBlockCSR, x_q: jnp.ndarray,
                         scale: jnp.ndarray, acc: jnp.ndarray,
                         unroll: int = 2) -> jnp.ndarray:
    """acc += A_overflow @ (x_q * scale) (int8 gather variant)."""
    r = ob.rows_per_block
    f = x_q.shape[1]
    iota = jnp.arange(r, dtype=jnp.int32)[:, None]

    def step(acc, blk):
        c, v, lr, r0 = blk
        out = _block_step_q8(x_q, iota, c, v, lr) * scale[None, :]
        slab = jax.lax.dynamic_slice(acc, (r0, 0), (r, f))
        acc = jax.lax.dynamic_update_slice(acc, slab + out.astype(acc.dtype),
                                           (r0, 0))
        return acc, None

    acc, _ = jax.lax.scan(step, acc, (ob.cols, ob.vals, ob.lrow, ob.row0),
                          unroll=min(unroll, ob.row0.shape[0]))
    return acc


def spmm_split_q8(scsr: SplitCSR, x: jnp.ndarray,
                  trim: bool = True) -> jnp.ndarray:
    """y = A @ x via per-column int8 quantize-then-gather (opt-in fast
    path; quantizes x on device each call, so power-iteration loops pay
    one cheap [n, F] elementwise pass per hop for the 1.5x gather win)."""
    x_q, scale = quantize_columns(x)
    out = spmm_block_q8(scsr.base, x_q, scale, trim=False)
    for lvl in scsr.levels:
        out = spmm_block_offset_q8(lvl, x_q, scale, out)
    return out[:scsr.num_nodes] if trim else out


# ---------------------------------------------------------------------------
# int8 MXU variant (round-4 probe, VERDICT r3 #4). The q8 path above casts
# the gathered int8 block to bf16 because edge VALUES multiply the rows
# before the one-hot matmul. But the production propagation operator is
# D^-1 A — its values are ROW-CONSTANT (1/deg) — so the value can move to
# the OUTPUT side: y[r] = row_val[r] * (onehot_i8 @ q)[r] * col_scale,
# where onehot_i8 @ q is an exact int8 x int8 -> int32 MXU matmul (2x the
# bf16 MXU rate on v5e). Matmul-side quantization error: ZERO (the bf16
# variant rounds q*v through bf16); feature quantization error identical.
# ---------------------------------------------------------------------------


def row_values_if_constant(adj: sp.spmatrix, rtol: float = 1e-6):
    """Per-row edge value if every row's nonzeros share one value (the
    D^-1 A propagation operator does), else None. Empty rows get 0."""
    adj = adj.tocsr()
    n = adj.shape[0]
    if adj.nnz == 0:
        return np.zeros(n, np.float32)
    ends = adj.indptr[1:]
    starts = adj.indptr[:-1]
    has = ends > starts
    hrows = np.flatnonzero(has)
    first = np.zeros(n, np.float32)
    first[has] = adj.data[starts[hrows]]
    # a row is constant iff its signed max == signed min; reduceat on the
    # CSR-ordered data keeps this O(nnz) vectorized (np.repeat +
    # maximum.at costs tens of seconds and a GB-scale index array at
    # 50M+ edges, paid on every block-operator build)
    smax = np.maximum.reduceat(adj.data, starts[hrows])
    smin = np.minimum.reduceat(adj.data, starts[hrows])
    if np.any(smax - smin > rtol * np.maximum(np.abs(first[has]), 1e-30)):
        return None
    return first


def _block_step_q8mxu(x_q, iota, c, lr):
    feats = jnp.take(x_q, c, axis=0)                    # int8 [E_b, F]
    onehot = (lr[None, :] == iota).astype(jnp.int8)     # int8 [R, E_b]
    return jax.lax.dot_general(
        onehot, feats, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)               # int32 [R, F]


@functools.partial(jax.jit, static_argnames=("trim", "unroll"))
def spmm_block_q8mxu(bcsr: BlockCSR, x_q: jnp.ndarray, scale: jnp.ndarray,
                     row_val: jnp.ndarray, trim: bool = True,
                     unroll: int = 4):
    """y = diag(row_val) @ onehot_sum(x_q) * scale — true int8 MXU matmul
    with int32 accumulation; row_val is [n_pad] (padded rows 0)."""
    r = bcsr.rows_per_block
    n, f = bcsr.num_nodes, x_q.shape[1]
    iota = jnp.arange(r, dtype=jnp.int32)[:, None]

    def step(_, blk):
        c, lr = blk
        return None, _block_step_q8mxu(x_q, iota, c, lr)

    _, outs = jax.lax.scan(step, None, (bcsr.cols, bcsr.lrow),
                           unroll=min(unroll, bcsr.num_blocks))
    out = outs.reshape(-1, f).astype(jnp.float32)
    out = out * row_val[:, None] * scale[None, :]
    return out[:n] if trim else out


@functools.partial(jax.jit, static_argnames=("unroll",))
def spmm_block_offset_q8mxu(ob: OffsetBlockCSR, x_q: jnp.ndarray,
                            scale: jnp.ndarray, row_val: jnp.ndarray,
                            acc: jnp.ndarray, unroll: int = 2):
    """acc += overflow contribution, int8-MXU variant (row-constant vals)."""
    r = ob.rows_per_block
    f = x_q.shape[1]
    iota = jnp.arange(r, dtype=jnp.int32)[:, None]

    def step(acc, blk):
        c, lr, r0 = blk
        out = _block_step_q8mxu(x_q, iota, c, lr).astype(jnp.float32)
        rv = jax.lax.dynamic_slice(row_val, (r0,), (r,))
        out = out * rv[:, None] * scale[None, :]
        slab = jax.lax.dynamic_slice(acc, (r0, 0), (r, f))
        acc = jax.lax.dynamic_update_slice(acc, slab + out, (r0, 0))
        return acc, None

    acc, _ = jax.lax.scan(step, acc, (ob.cols, ob.lrow, ob.row0),
                          unroll=min(unroll, ob.row0.shape[0]))
    return acc


def spmm_split_q8mxu(scsr: SplitCSR, x: jnp.ndarray, row_val: jnp.ndarray,
                     trim: bool = True) -> jnp.ndarray:
    """y = A @ x with per-column int8 features AND int8 MXU accumulation.
    Requires row-constant operator values (``row_values_if_constant``);
    row_val must be padded to num_blocks*rows_per_block."""
    x_q, scale = quantize_columns(x)
    out = spmm_block_q8mxu(scsr.base, x_q, scale, row_val, trim=False)
    for lvl in scsr.levels:
        out = spmm_block_offset_q8mxu(lvl, x_q, scale, row_val, out)
    return out[:scsr.num_nodes] if trim else out


def normalized_dense_adj(adj: sp.spmatrix, dtype=jnp.float32) -> jnp.ndarray:
    """D^-1 A as a dense device array (MXU path; D = row sums of A)."""
    deg = np.asarray(adj.sum(1)).flatten()
    dinv = 1.0 / np.maximum(deg, 1e-12)
    a = sp.diags(dinv).dot(adj)
    return jnp.asarray(np.asarray(a.todense()), dtype=dtype)


def dense_fits(n: int, budget_bytes: int = 4 << 30, bytes_per=4) -> bool:
    return n * n * bytes_per <= budget_bytes
