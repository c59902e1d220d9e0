"""Bucketed sparse-residue GFPush on TPU — memory O(frontier), not O(B*n).

The dense formulation (``jax_push.py``) carries [B, n] residues and dies at
graph scale. This backend keeps, per source row, only the *live* residue
entries in padded per-row buffers:

    frontier:  ids [B, C] int32 (node id, sentinel = n), vals [B, C] f32

and runs the exact GFPush hop semantics (``/root/reference/precompute/
graph.h:53-131``) as static-shape passes per hop:

1. **reserve log** — every residue adds ``coef[i] * r`` to its node's
   reserve (graph.h:90); logged as the (ids, coef*vals) pair and deduped
   once at the end (reserve values are never needed mid-push).
2. **rmax mask** — an entry pushes iff ``r >= rmax * deg(u)`` (graph.h:94);
   dangling nodes teleport their residue back to the source (graph.h:91-93).
   Everything else is dropped (the residue map is drained every hop).
3. **windowed expansion** — pushing entries emit ``deg(u)`` entries
   ``(nbr, r/deg)``. Neighbor lists are read in contiguous W-wide windows
   (``lax.gather`` with ``slice_sizes=(W,)``) — W-granular slice reads
   instead of per-element random gathers, the same trick the SplitCSR SpMM
   uses for its edge stream. Variable fan-out becomes static shapes via the
   marker/cummax pattern: scatter each entry's index at its exclusive-
   cumsum start slot (1-D scatter, indices unique by construction),
   ``cummax`` fills the gaps.
4. **sort + dedup** — per-row ``lax.sort`` by node id (row-batched sorts
   measure ~4x faster than one flat sort on v5e), then duplicate residues
   are summed scatter-free: segment totals fall out of a cumsum/cummax
   identity over the sorted values (residues are non-negative, so the
   running sum is monotone). The rmax test at the next hop therefore sees
   the *summed* residue, exactly like the reference's hash-map accumulate.
   Rows are compacted (one extra row sort) only when the unique count
   shrinks the buffer bucket — deduped shadows otherwise stay as zero-value
   entries that later passes ignore.
5. **final top-k** — concat all reserve logs, one more sort+dedup per row,
   then a stable sort by descending value keeps k (graph.h:111-126; only
   v > 0 entries are emitted, ties resolve id-ascending like the oracle).

Row capacities C and expansion window capacities E_w are rounded to
power-of-two buckets so each shape compiles once. The hop loop is host-side
Python: the first block of sources runs in *planning* mode (one scalar
fetch per hop to size the next buckets); subsequent blocks replay the
recorded plan with zero per-hop syncs and validate overflow flags in one
batched fetch at block end, replanning only if a block outgrows the plan.

Per-row buffers mean per-row worst-case sizing: a power-law hub multiplies
one row's E while every other row pads to it. For extreme skew the native
kernel remains the fallback; for bounded-degree graphs this path is
n-independent (the native kernel's hash maps fall out of cache at n=2M,
RESULTS.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bucket(x: int, lo: int = 128) -> int:
    """Round up to the next size in {lo*2^k, 1.5*lo*2^k} — fine-grained
    shape buckets (<= 33% padding) so compiles stay bounded but buffers
    track the data."""
    b = lo
    while True:
        if x <= b:
            return b
        if x <= (b * 3) // 2:
            return (b * 3) // 2
        b *= 2


def _entry_plan(ids, vals, indptr, deg, rmax, w):
    """rmax mask + per-entry ALIGNED edge-block counts for this frontier.

    Neighbor lists are read as w-wide blocks of the edge array aligned to
    w boundaries, so an entry's list [lo, hi) spans blocks
    lo//w .. (hi-1)//w (<= deg/w + 1 blocks; the fast 2-D row-gather path
    needs aligned rows)."""
    n = deg.shape[0]
    u_c = jnp.clip(ids, 0, n - 1)
    deg_e = deg[u_c]
    lo = indptr[u_c]
    live = vals > 0.0
    dangling = live & (deg_e == 0)
    pushable = live & (vals >= rmax * deg_e.astype(jnp.float32)) & ~dangling
    first_blk = lo // w
    n_blk = (lo + deg_e - 1) // w - first_blk + 1
    counts_w = jnp.where(pushable, n_blk, jnp.where(dangling, 1, 0))
    return deg_e, lo, first_blk, dangling, pushable, counts_w


@functools.partial(jax.jit, static_argnames=("w",))
def _plan_totals(ids, vals, indptr, deg, rmax, *, w: int):
    """Max per-row expansion block count (host sizes the E_w bucket)."""
    counts_w = _entry_plan(ids, vals, indptr, deg, rmax, w)[-1]
    return jnp.max(jnp.sum(counts_w, axis=1))


def _dedup_rows(ids, vals, n):
    """Rows sorted by id; duplicate ids summed scatter-free (cumsum/cummax
    identity — valid because residues are non-negative, so the running sum
    is monotone). Shadow duplicates keep their id with value 0; callers
    treat val <= 0 as dead. Returns (ids, vals, max live count per row)."""
    b_rows, _ = ids.shape
    ids, vals = jax.lax.sort((ids, vals), dimension=1, num_keys=1)
    boundary = jnp.concatenate(
        [jnp.ones((b_rows, 1), bool), ids[:, 1:] != ids[:, :-1]], axis=1)
    cs = jnp.cumsum(vals, axis=1)
    cs_prev = jnp.concatenate(
        [jnp.zeros((b_rows, 1), vals.dtype), cs[:, :-1]], axis=1)
    seg_base = jax.lax.cummax(jnp.where(boundary, cs_prev, -jnp.inf),
                              axis=1)
    is_last = jnp.concatenate(
        [boundary[:, 1:], jnp.ones((b_rows, 1), bool)], axis=1)
    out_vals = jnp.where(is_last & (ids != n), cs - seg_base, 0.0)
    n_live = jnp.max(jnp.sum((out_vals > 0.0).astype(jnp.int32), axis=1))
    return ids, out_vals, n_live


@functools.partial(jax.jit, static_argnames=("c_out",))
def _compact(ids, vals, n, *, c_out: int):
    """Move live entries to the row prefix (dead entries get sentinel key)
    and slice to c_out. Correct iff every row has <= c_out live entries."""
    key = jnp.where(vals > 0.0, ids, n)
    ids, vals = jax.lax.sort((key, vals), dimension=1, num_keys=1)
    return ids[:, :c_out], vals[:, :c_out]


@functools.partial(jax.jit, static_argnames=("e_w", "w", "compact_to"))
def _hop(ids, vals, indptr, edges2d, deg, src, rmax, n,
         *, e_w: int, w: int, compact_to: int):
    """One hop: frontier [B, C] -> deduped frontier.

    edges2d is the edge array reshaped [ceil(nnz/w), w] — neighbor lists
    are read as aligned w-wide blocks through the fast 2-D row-gather path
    (per-element and strided-slice gathers measure 5-200x slower on v5e).

    Output width is e_w*w (compact_to=0) or compact_to. Also returns
    (n_live, overflow): overflow means the expansion exceeded e_w blocks
    or the compaction width truncated live entries — outputs are garbage
    iff overflow, checked host-side.
    """
    b_rows, c = ids.shape

    deg_e, lo, first_blk, dangling, pushable, counts_w = _entry_plan(
        ids, vals, indptr, deg, rmax, w)
    deg_f = deg_e.astype(jnp.float32)
    push_val = jnp.where(pushable, vals / jnp.where(deg_f == 0, 1.0, deg_f),
                         jnp.where(dangling, vals, 0.0))

    inc = jnp.cumsum(counts_w, axis=1)
    starts = inc - counts_w                    # exclusive cumsum, per row
    totals = inc[:, -1]                        # [B] blocks used
    over_e = jnp.max(totals) > e_w

    # entry-id per block slot: scatter j at each entry's start (flat 1-D;
    # live starts are strictly increasing per row and dead entries get
    # distinct out-of-range positions, so indices are globally unique),
    # then cummax fills each entry's span
    rows_off = jnp.arange(b_rows, dtype=jnp.int32)[:, None] * e_w
    entry_j = jnp.broadcast_to(
        jnp.arange(c, dtype=jnp.int32)[None, :], (b_rows, c))
    oob = b_rows * e_w + jnp.arange(
        b_rows * c, dtype=jnp.int32).reshape(b_rows, c)
    flat_pos = jnp.where(counts_w > 0,
                         jnp.minimum(rows_off + starts, b_rows * e_w),
                         oob)
    marker = jnp.zeros((b_rows * e_w,), jnp.int32).at[
        flat_pos.reshape(-1)].max(entry_j.reshape(-1),
                                  mode="drop", unique_indices=True)
    eid = jax.lax.cummax(marker.reshape(b_rows, e_w), axis=1)   # [B, E_w]

    # ONE packed-record row gather for all per-entry fields (16-64B rows
    # ride the same fast gather path)
    rec = jnp.stack([
        first_blk, lo, lo + deg_e,
        jax.lax.bitcast_convert_type(push_val, jnp.int32),
        starts, dangling.astype(jnp.int32),
    ], axis=-1).reshape(b_rows * c, 6)
    flat_eid = (jnp.arange(b_rows, dtype=jnp.int32)[:, None] * c
                + eid).reshape(-1)
    r = jnp.take(rec, flat_eid, axis=0).reshape(b_rows, e_w, 6)
    e_first, e_lo, e_hi = r[..., 0], r[..., 1], r[..., 2]
    pv = jax.lax.bitcast_convert_type(r[..., 3], jnp.float32)
    e_start, tele = r[..., 4], r[..., 5] == 1

    slot = jnp.arange(e_w, dtype=jnp.int32)[None, :]
    blk = e_first + (slot - e_start)                    # aligned block id
    m_blk = edges2d.shape[0]
    nbrw = jnp.take(edges2d, jnp.clip(blk, 0, m_blk - 1).reshape(-1),
                    axis=0).reshape(b_rows, e_w, w)

    lane = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    epos = jnp.clip(blk, 0, m_blk - 1)[..., None] * w + lane
    in_list = (epos >= e_lo[..., None]) & (epos < e_hi[..., None])
    slot_ok = (slot < totals[:, None])[..., None]
    tele3 = tele[..., None]
    valid = slot_ok & jnp.where(tele3, lane == 0, in_list)
    nbr = jnp.where(tele3, src[:, None, None], nbrw)
    new_ids = jnp.where(valid, nbr, n).astype(jnp.int32)
    new_vals = jnp.where(valid, pv[..., None], 0.0)

    out_ids, out_vals, n_live = _dedup_rows(
        new_ids.reshape(b_rows, e_w * w),
        new_vals.reshape(b_rows, e_w * w), n)
    overflow = over_e
    if compact_to and compact_to < e_w * w:
        overflow = overflow | (n_live > compact_to)
        key = jnp.where(out_vals > 0.0, out_ids, n)
        out_ids, out_vals = jax.lax.sort((key, out_vals), dimension=1,
                                         num_keys=1)
        out_ids, out_vals = out_ids[:, :compact_to], out_vals[:, :compact_to]
    return out_ids, out_vals, n_live, overflow


@functools.partial(jax.jit, static_argnames=("k",))
def _finalize(ids, vals, n, *, k: int):
    """Dedup the concatenated reserve log and take per-row top-k desc.
    Stable sort by (-val) over id-sorted input → ties id-ascending,
    matching the oracle's stable argsort."""
    ids, vals, _ = _dedup_rows(ids, vals, n)
    neg, cols = jax.lax.sort((-vals, ids), dimension=1, num_keys=1,
                             is_stable=True)
    vals_k, cols_k = -neg[:, :k], cols[:, :k]
    keep = vals_k > 0.0
    return (jnp.where(keep, cols_k, 0).astype(jnp.int32),
            jnp.where(keep, vals_k, 0.0))


class _HopPlan:
    """Replay plan for one (graph, coef, rmax, block, window) push run:
    per hop, the (e_w, c_out) shape buckets recorded by the planning
    block, or None where the frontier died."""

    def __init__(self):
        self.caps: list | None = None


def _push_block(src, d_indptr, d_edges2d, d_deg, n, coef, rmax_j, k,
                w, plan, block):
    """Push one [block]-row block. Returns device (cols, vals) or None if
    the replayed plan overflowed (caller replans)."""
    n_hops = coef.shape[0] - 1
    ids = src[:, None].astype(jnp.int32)
    vals = jnp.ones((block, 1), jnp.float32)
    logs = []
    flags = []
    planning = plan.caps is None
    if planning:
        plan.caps = []

    for i in range(n_hops):
        logs.append((ids, coef[i] * vals))
        if planning:
            max_tw = int(_plan_totals(ids, vals, d_indptr, d_deg,
                                      rmax_j, w=w))
            if max_tw == 0:
                plan.caps.append(None)
                ids = None
                break
            e_w = _bucket(max_tw, lo=16)
            ids, vals, n_live, _of = _hop(
                ids, vals, d_indptr, d_edges2d, d_deg, src, rmax_j, n,
                e_w=e_w, w=w, compact_to=0)
            c_out = min(_bucket(int(n_live), lo=128), e_w * w)
            if c_out < e_w * w:
                ids, vals = _compact(ids, vals, n, c_out=c_out)
            plan.caps.append((e_w, c_out))
        else:
            cap = plan.caps[i] if i < len(plan.caps) else None
            if cap is None:
                # plan says the frontier died here; verify for THIS block
                if int(_plan_totals(ids, vals, d_indptr, d_deg,
                                    rmax_j, w=w)) > 0:
                    return None                     # replan
                ids = None
                break
            e_w, c_out = cap
            ids, vals, _nl, of = _hop(
                ids, vals, d_indptr, d_edges2d, d_deg, src, rmax_j, n,
                e_w=e_w, w=w, compact_to=c_out)
            flags.append(of)
    if ids is not None:
        logs.append((ids, coef[n_hops] * vals))

    if flags and bool(np.any(np.asarray(jnp.stack(flags)))):
        return None                                 # replan
    log_ids = jnp.concatenate([li for li, _ in logs], axis=1)
    log_vals = jnp.concatenate([lv for _, lv in logs], axis=1)
    width = log_ids.shape[1]
    wb = _bucket(max(width, k), lo=max(128, k))
    if wb > width:
        log_ids = jnp.pad(log_ids, ((0, 0), (0, wb - width)),
                          constant_values=n)
        log_vals = jnp.pad(log_vals, ((0, 0), (0, wb - width)))
    return _finalize(log_ids, log_vals, n, k=k)


def gfpush_bucketed(indptr: np.ndarray, indices: np.ndarray,
                    sources: np.ndarray, coef: np.ndarray, rmax: float,
                    k: int, *, block: int = 1024, window: int = 8,
                    slot_limit: int = 1 << 27):
    """Run bucketed GFPush over all sources in row blocks of `block`.

    Returns numpy (cols int32 [n_src, k], vals float32 [n_src, k]), each row
    sorted by descending reserve value, zero-padded — the same layout as the
    oracle/native backends.

    window: neighbor lists are streamed in `window`-wide contiguous slices
    (padding overhead < window/avg_degree of the sort width). slot_limit
    bounds block * E (total expansion slots per hop); exceeding it raises —
    retry with a smaller block (row fan-out too skewed for per-row
    buffers).
    """
    indptr = np.asarray(indptr, dtype=np.int32)
    indices_np = np.asarray(indices, dtype=np.int32)
    sources = np.asarray(sources, dtype=np.int32)
    n = indptr.shape[0] - 1
    deg_np = (indptr[1:] - indptr[:-1]).astype(np.int32)
    # reshape the edge stream into aligned window-wide blocks (padded tail)
    pad = (-indices_np.shape[0]) % window
    edges2d_np = np.pad(indices_np, (0, pad)).reshape(-1, window)

    d_indptr = jnp.asarray(indptr)
    d_edges2d = jnp.asarray(edges2d_np)
    d_deg = jnp.asarray(deg_np)
    rmax_j = jnp.float32(rmax)
    coef = np.asarray(coef, dtype=np.float32)

    n_src = sources.shape[0]
    out_cols = np.zeros((n_src, k), dtype=np.int32)
    out_vals = np.zeros((n_src, k), dtype=np.float32)

    plan = _HopPlan()
    start = 0
    while start < n_src:
        b = min(block, n_src - start)
        src_np = sources[start:start + b]
        if b < block:   # pad the tail block (cheap; outputs sliced off)
            src_np = np.concatenate([src_np, np.zeros(block - b, np.int32)])
        src = jnp.asarray(src_np)

        res = _push_block(src, d_indptr, d_edges2d, d_deg, n, coef, rmax_j,
                          k, window, plan, block)
        if res is None:           # replayed plan overflowed: replan
            plan.caps = None
            res = _push_block(src, d_indptr, d_edges2d, d_deg, n, coef,
                              rmax_j, k, window, plan, block)
        if plan.caps:
            worst = max((c[0] * window * block) for c in plan.caps if c)
            if worst > slot_limit:
                raise MemoryError(
                    f"gfpush_bucketed: a hop needs {worst} slots "
                    f"(> {slot_limit}); use a smaller block")
        cols_b, vals_b = res
        out_cols[start:start + b] = np.asarray(cols_b)[:b]
        out_vals[start:start + b] = np.asarray(vals_b)[:b]
        start += b
    return out_cols, out_vals
