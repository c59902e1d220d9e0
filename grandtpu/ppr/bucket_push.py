"""Bucketed sparse-residue GFPush on TPU — memory O(frontier), not O(B*n).

The dense formulation (``jax_push.py``) carries [B, n] residues and dies at
graph scale. This backend keeps, per source row, only the *live* residue
entries in padded per-row buffers:

    ids [B, C] int32 (node id, sentinel n) | vals [B, C] f32 | thr [B, C] f32

where ``thr`` is each entry's pruning threshold ``rmax * deg(node)``
(-1 marks a dangling node), carried as a sort payload so hops never gather
degrees for the whole frontier. The exact GFPush hop semantics
(``/root/reference/precompute/graph.h:53-131``) run as static-shape passes:

1. **reserve log** — every residue adds ``coef[i] * r`` to its node's
   reserve (graph.h:90); logged as the (ids, coef*vals) pair and deduped
   once at the end (reserve values are never needed mid-push).
2. **rmax mask** — an entry pushes iff ``r >= thr`` (graph.h:94); dangling
   nodes teleport their residue back to the source (graph.h:91-93).
   Everything else is dropped (the residue map is drained every hop).
   Each hop's compaction orders *emitting* entries (pushing or dangling)
   first, so the expansion stages touch only a [B, P] prefix — the
   dominant per-hop costs scale with the pushing set, not the frontier.
3. **windowed expansion** — pushing entries emit ``deg(u)`` entries
   ``(nbr, r/deg, thr[nbr])``. Neighbor ids and thresholds are read as
   aligned w-wide blocks of precomputed edge tables via the fast 2-D
   row-gather path (per-element and strided-slice gathers measure 5-200x
   slower on v5e). Variable fan-out becomes static shapes via the
   marker/cummax pattern: scatter each prefix entry's index at its
   exclusive-cumsum start slot (1-D scatter, indices unique by
   construction), ``cummax`` fills each entry's span; all other per-entry
   fields ride one packed-record row gather.
4. **sort + dedup** — per-row ``lax.sort`` by node id (row-batched sorts
   measure ~4x faster than one flat sort), then duplicate residues are
   summed scatter-free: segment totals fall out of a cumsum/cummax
   identity over the sorted values (residues are non-negative, so the
   running sum is monotone). The rmax test therefore sees the *summed*
   residue, exactly like the reference's hash-map accumulate. A second
   key sort compacts emit-first and slices the row buffer to its bucket.
5. **final top-k** — concat all reserve logs, one more sort+dedup per row,
   then a stable sort by descending value keeps k (graph.h:111-126; only
   v > 0 entries are emitted, ties resolve id-ascending like the oracle).

All shape buckets (prefix P, expansion blocks E_w, compacted width C) are
rounded to {1, 1.5}*2^k so each shape compiles once. The hop loop is
host-side Python: the first block of sources runs in *planning* mode (two
scalar fetches per hop to size the buckets); subsequent blocks replay the
recorded plan with zero per-hop syncs and validate overflow flags in one
batched fetch at block end, replanning only if a block outgrows the plan
(prefix violations are detected on-device from the thr payload alone).

Per-row buffers mean per-row worst-case sizing: a power-law hub multiplies
one row's E while every other row pads to it. For extreme skew the native
kernel remains the fallback; for bounded-degree graphs this path is
n-independent (902 src/s at 300K vs 889 at 2M, results/push_throughput.json).
Role: host-free precompute — an IDLE multi-core host's native kernel is
faster (the r2 belief that its accumulators fall out of cache at 2M was
background-load contamination; see the r3 clean-host numbers), so the auto
policy picks this backend when the toolchain is absent or host cores are
spoken for (GRANDTPU_PUSH_CORES).
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


def _emit_mask(vals, thr):
    """Entries that expand this hop: pushing (summed residue >= rmax*deg)
    or dangling-teleport (thr < 0). graph.h:91-100."""
    live = vals > 0.0
    return live & ((thr < 0) | (vals >= thr))


@jax.jit
def _plan_counts(ids, vals, thr):
    """(max emitting entries per row, any emitting) — host sizes P."""
    emit = _emit_mask(vals, thr)
    per_row = jnp.sum(emit.astype(jnp.int32), axis=1)
    return jnp.max(per_row)


@functools.partial(jax.jit, static_argnames=("w", "p_cap"))
def _plan_windows(ids, vals, thr, indptr, deg, *, w: int, p_cap: int):
    """Max per-row expansion block count over the emit-first prefix."""
    pids = ids[:, :p_cap]
    pvals = vals[:, :p_cap]
    pthr = thr[:, :p_cap]
    n = deg.shape[0]
    u_c = jnp.clip(pids, 0, n - 1)
    deg_p = deg[u_c]
    lo_p = indptr[u_c]
    live = pvals > 0.0
    dangling = live & (pthr < 0)
    pushable = live & ~dangling & (pvals >= pthr)
    n_blk = (lo_p + deg_p - 1) // w - lo_p // w + 1
    counts_w = jnp.where(pushable, n_blk, jnp.where(dangling, 1, 0))
    return jnp.max(jnp.sum(counts_w, axis=1))


def _dedup_rows(ids, vals, thr, n):
    """Rows sorted by id; duplicate ids summed scatter-free (cumsum/cummax
    identity — valid because residues are non-negative, so the running sum
    is monotone). Shadow duplicates keep their id with value 0; callers
    treat val <= 0 as dead. thr (may be None) rides as payload."""
    b_rows, _ = ids.shape
    ops = (ids, vals) if thr is None else (ids, vals, thr)
    out = jax.lax.sort(ops, dimension=1, num_keys=1)
    ids, vals = out[0], out[1]
    thr = out[2] if len(out) == 3 else None
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
    return ids, out_vals, thr


@functools.partial(jax.jit, static_argnames=("p_cap", "e_w", "w"))
def _hop(ids, vals, thr, indptr, packed2d, deg, src, thr_src, n,
         *, p_cap: int, e_w: int, w: int):
    """One hop: frontier [B, C] (emit-first ordered) -> frontier [B, e_w*w]
    (emit-first compacted; callers slice to the c_out bucket via _slice).

    Returns (ids, vals, thr, n_push, n_live, overflow). overflow means the
    emit-first prefix assumption was violated (an emitting entry sat beyond
    p_cap) or the expansion exceeded e_w blocks — outputs are garbage iff
    overflow, checked host-side.
    """
    b_rows, c = ids.shape
    pids, pvals, pthr = (a[:, :p_cap] for a in (ids, vals, thr))

    # replay safety: any emitting entry beyond the prefix invalidates the
    # plan (checked from the thr payload alone — no gathers)
    viol = (jnp.any(_emit_mask(vals[:, p_cap:], thr[:, p_cap:]))
            if p_cap < c else jnp.bool_(False))

    u_c = jnp.clip(pids, 0, n - 1)
    deg_p = deg[u_c]
    lo_p = indptr[u_c]
    live = pvals > 0.0
    dangling = live & (pthr < 0)
    pushable = live & ~dangling & (pvals >= pthr)
    deg_f = deg_p.astype(jnp.float32)
    push_val = jnp.where(pushable, pvals / jnp.where(deg_f == 0, 1.0, deg_f),
                         jnp.where(dangling, pvals, 0.0))
    first_blk = lo_p // w
    n_blk = (lo_p + deg_p - 1) // w - first_blk + 1
    counts_w = jnp.where(pushable, n_blk, jnp.where(dangling, 1, 0))

    inc = jnp.cumsum(counts_w, axis=1)
    starts = inc - counts_w                    # exclusive cumsum, per row
    totals = inc[:, -1]                        # [B] blocks used
    over_e = jnp.max(totals) > e_w

    # entry-id per block slot: scatter j at each entry's start (flat 1-D;
    # live starts strictly increase per row and dead entries get distinct
    # out-of-range positions, so indices are globally unique), then cummax
    # fills each entry's span
    rows_off = jnp.arange(b_rows, dtype=jnp.int32)[:, None] * e_w
    entry_j = jnp.broadcast_to(
        jnp.arange(p_cap, dtype=jnp.int32)[None, :], (b_rows, p_cap))
    oob = b_rows * e_w + jnp.arange(
        b_rows * p_cap, dtype=jnp.int32).reshape(b_rows, p_cap)
    flat_pos = jnp.where(counts_w > 0,
                         jnp.minimum(rows_off + starts, b_rows * e_w),
                         oob)
    marker = jnp.zeros((b_rows * e_w,), jnp.int32).at[
        flat_pos.reshape(-1)].max(entry_j.reshape(-1),
                                  mode="drop", unique_indices=True)
    eid = jax.lax.cummax(marker.reshape(b_rows, e_w), axis=1)   # [B, E_w]

    # ONE packed-record row gather for all per-entry fields (<=32B rows
    # ride the fast 2-D row-gather path)
    zero = jnp.zeros_like(lo_p)
    rec = jnp.stack([
        first_blk, lo_p, lo_p + deg_p,
        jax.lax.bitcast_convert_type(push_val, jnp.int32),
        starts, dangling.astype(jnp.int32), zero, zero,
    ], axis=-1).reshape(b_rows * p_cap, 8)
    flat_eid = (jnp.arange(b_rows, dtype=jnp.int32)[:, None] * p_cap
                + eid).reshape(-1)
    r = jnp.take(rec, flat_eid, axis=0).reshape(b_rows, e_w, 8)
    e_first, e_lo, e_hi = r[..., 0], r[..., 1], r[..., 2]
    pv = jax.lax.bitcast_convert_type(r[..., 3], jnp.float32)
    e_start, tele = r[..., 4], r[..., 5] == 1

    slot = jnp.arange(e_w, dtype=jnp.int32)[None, :]
    blk = e_first + (slot - e_start)                    # aligned block id
    m_blk = packed2d.shape[0]
    blk_c = jnp.clip(blk, 0, m_blk - 1).reshape(-1)
    # ONE gather for neighbor ids AND their thresholds: [*, w] rows pad to
    # 128 lanes under T(8,128) either way, so fusing the two tables into a
    # [m_blk, 2w] record halves the gathered row count for the same bytes
    # (measured 95ms -> 67ms at the peak-hop shape on v5e)
    both = jnp.take(packed2d, blk_c, axis=0).reshape(b_rows, e_w, 2 * w)
    nbrw = both[..., :w]
    thrw = jax.lax.bitcast_convert_type(both[..., w:], jnp.float32)

    lane = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    epos = jnp.clip(blk, 0, m_blk - 1)[..., None] * w + lane
    in_list = (epos >= e_lo[..., None]) & (epos < e_hi[..., None])
    slot_ok = (slot < totals[:, None])[..., None]
    tele3 = tele[..., None]
    valid = slot_ok & jnp.where(tele3, lane == 0, in_list)
    new_ids = jnp.where(
        valid, jnp.where(tele3, src[:, None, None], nbrw), n
    ).astype(jnp.int32)
    new_vals = jnp.where(valid, pv[..., None], 0.0)
    new_thr = jnp.where(tele3, thr_src[:, None, None], thrw)

    width = e_w * w
    ids2, vals2, thr2 = _dedup_rows(
        new_ids.reshape(b_rows, width), new_vals.reshape(b_rows, width),
        new_thr.reshape(b_rows, width), n)

    # compact emit-first (the next hop's prefix invariant) and slice
    emit = _emit_mask(vals2, thr2)
    live2 = vals2 > 0.0
    key = jnp.where(emit, ids2,
                    jnp.where(live2, ids2 + (n + 1), 2 * n + 2))
    key, vals3, thr3 = jax.lax.sort((key, vals2, thr2), dimension=1,
                                    num_keys=1)
    ids3 = jnp.where(key <= n, key,
                     jnp.where(key < 2 * n + 2, key - (n + 1), n))
    n_push = jnp.max(jnp.sum(emit.astype(jnp.int32), axis=1))
    n_live = jnp.max(jnp.sum(live2.astype(jnp.int32), axis=1))
    overflow = viol | over_e
    return ids3, vals3, thr3, n_push, n_live, overflow


@functools.partial(jax.jit, static_argnames=("c_out",))
def _slice(ids, vals, thr, n_live, *, c_out: int):
    """Shrink the row buffer to its bucket; flags truncation of live
    entries (replay overflow)."""
    return (ids[:, :c_out], vals[:, :c_out], thr[:, :c_out],
            n_live > c_out)


@functools.partial(jax.jit, static_argnames=("k",))
def _finalize(ids, vals, n, *, k: int):
    """Dedup the concatenated reserve log and take per-row top-k desc.
    lax.top_k over the id-sorted dedup output breaks ties lowest-index
    first = id-ascending, matching the oracle's stable argsort — and
    measures 8x faster than a full value sort on v5e."""
    ids, vals, _ = _dedup_rows(ids, vals, None, n)
    vals_k, idx = jax.lax.top_k(vals, k)
    cols_k = jnp.take_along_axis(ids, idx, axis=1)
    keep = vals_k > 0.0
    return (jnp.where(keep, cols_k, 0).astype(jnp.int32),
            jnp.where(keep, vals_k, 0.0))


class BucketPushGraph:
    """Device-resident push tables for one (graph, rmax) pair: CSR indptr,
    aligned edge-id and edge-threshold tables, degrees — built once, shared
    by every push call (the training pipeline pushes once per dataset; the
    bench reuses this to measure the kernel, not the upload)."""

    def __init__(self, indptr: np.ndarray, indices: np.ndarray,
                 rmax: float, window: int = 8):
        indptr = np.asarray(indptr, dtype=np.int32)
        indices = np.asarray(indices, dtype=np.int32)
        self.n = indptr.shape[0] - 1
        self.w = window
        self.rmax = float(rmax)
        deg = (indptr[1:] - indptr[:-1]).astype(np.int32)
        pad = (-indices.shape[0]) % window
        edges2d = np.pad(indices, (0, pad)).reshape(-1, window)
        self.indptr = jnp.asarray(indptr)
        self.deg = jnp.asarray(deg)
        edges2d_dev = jnp.asarray(edges2d)
        # per-edge pruning threshold of the TARGET node; -1 marks dangling.
        # Packed side by side with the neighbor ids into one [m_blk, 2w]
        # record so each expansion block is ONE row gather (see _hop).
        deg_t = self.deg[jnp.clip(edges2d_dev, 0, self.n - 1)]
        thr2d = jnp.where(deg_t == 0, -1.0,
                          np.float32(rmax) * deg_t.astype(jnp.float32))
        self.packed2d = jnp.concatenate(
            [edges2d_dev,
             jax.lax.bitcast_convert_type(thr2d, jnp.int32)], axis=1)
        self._plans: dict = {}

    def node_thr(self, nodes):
        d = self.deg[jnp.clip(nodes, 0, self.n - 1)].astype(jnp.float32)
        return jnp.where(d == 0, -1.0, jnp.float32(self.rmax) * d)

    def plan_for(self, coef: np.ndarray, block: int):
        key = (coef.tobytes(), block)
        if key not in self._plans:
            self._plans[key] = _HopPlan()
        return self._plans[key]


class _HopPlan:
    """Replay plan: per hop, the (p_cap, e_w, c_out) shape buckets recorded
    by the planning block, or None where the frontier died."""

    def __init__(self):
        self.caps: list | None = None


@jax.jit
def _any_flags(flags):
    return jnp.any(jnp.stack(flags))


def _push_block(g: BucketPushGraph, src, coef, k, plan, block):
    """Push one [block]-row block.

    Returns (cols, vals, bad) — all device arrays, nothing synced. `bad`
    is a scalar bool (None in planning mode, which syncs per hop anyway):
    outputs are garbage iff bad, and the caller reruns the block after
    replanning. Deferring the flag fetch keeps replay blocks fully
    asynchronous (one d2h round-trip per *call*, not per block)."""
    n, w = g.n, g.w
    n_hops = coef.shape[0] - 1
    ids = src[:, None].astype(jnp.int32)
    vals = jnp.ones((block, 1), jnp.float32)
    thr_src = g.node_thr(src)
    thr = thr_src[:, None]
    logs = []
    flags = []
    planning = plan.caps is None
    if planning:
        plan.caps = []

    for i in range(n_hops):
        logs.append((ids, coef[i] * vals))
        if planning:
            p_need = int(_plan_counts(ids, vals, thr))
            if p_need == 0:
                plan.caps.append(None)
                ids = None
                break
            p_cap = min(_bucket(p_need, lo=16), ids.shape[1])
            e_w = _bucket(int(_plan_windows(
                ids, vals, thr, g.indptr, g.deg, w=w, p_cap=p_cap)), lo=16)
            ids, vals, thr, n_push, n_live, _of = _hop(
                ids, vals, thr, g.indptr, g.packed2d, g.deg, src,
                thr_src, n, p_cap=p_cap, e_w=e_w, w=w)
            c_out = min(_bucket(int(n_live), lo=128), e_w * w)
            if c_out < ids.shape[1]:
                ids, vals, thr, _fl = _slice(ids, vals, thr, n_live,
                                             c_out=c_out)
            plan.caps.append((p_cap, e_w, c_out))
        else:
            cap = plan.caps[i] if i < len(plan.caps) else None
            if cap is None:
                # plan says the frontier died here; if THIS block still has
                # emitting entries the plan is stale — flag, don't sync
                flags.append(_plan_counts(ids, vals, thr) > 0)
                ids = None
                break
            p_cap, e_w, c_out = cap
            if p_cap > ids.shape[1]:
                p_cap = ids.shape[1]
            ids, vals, thr, _np_, n_live, of = _hop(
                ids, vals, thr, g.indptr, g.packed2d, g.deg, src,
                thr_src, n, p_cap=p_cap, e_w=e_w, w=w)
            flags.append(of)
            if c_out < ids.shape[1]:
                ids, vals, thr, fl = _slice(ids, vals, thr, n_live,
                                            c_out=c_out)
                flags.append(fl)
    if ids is not None:
        logs.append((ids, coef[n_hops] * vals))

    log_ids = jnp.concatenate([li for li, _ in logs], axis=1)
    log_vals = jnp.concatenate([lv for _, lv in logs], axis=1)
    width = log_ids.shape[1]
    wb = _bucket(max(width, k), lo=max(128, k))
    if wb > width:
        log_ids = jnp.pad(log_ids, ((0, 0), (0, wb - width)),
                          constant_values=n)
        log_vals = jnp.pad(log_vals, ((0, 0), (0, wb - width)))
    cols, vals_out = _finalize(log_ids, log_vals, n, k=k)
    bad = _any_flags(flags) if flags else None
    return cols, vals_out, bad


def _is_device_oom(e: Exception) -> bool:
    s = str(e)
    return ("RESOURCE_EXHAUSTED" in s or "Ran out of memory" in s
            or "out of memory" in s.lower())


def gfpush_bucketed(indptr: np.ndarray, indices: np.ndarray,
                    sources: np.ndarray, coef: np.ndarray, rmax: float,
                    k: int, *, block: int = 1024, window: int = 8,
                    slot_limit: int = 1 << 27, min_block: int = 64,
                    graph: BucketPushGraph | None = None):
    """Run bucketed GFPush over all sources in row blocks of `block`.

    Returns numpy (cols int32 [n_src, k], vals float32 [n_src, k]), each row
    sorted by descending reserve value, zero-padded — the same layout as the
    oracle/native backends.

    window: neighbor lists are streamed in `window`-wide aligned blocks
    (sort-width padding < window/avg_degree). slot_limit bounds block * E
    (total expansion slots per hop). If a hop exceeds slot_limit or the
    device compiler runs out of HBM, the whole push automatically retries
    at block/2 (down to min_block) — heavy-fan-out graphs degrade to
    smaller source blocks instead of failing.
    """
    if graph is None:
        graph = BucketPushGraph(indptr, indices, rmax, window=window)
    try:
        return _gfpush_bucketed_run(graph, sources, coef, rmax, k,
                                    block=block, slot_limit=slot_limit)
    except Exception as e:
        recoverable = isinstance(e, MemoryError) or _is_device_oom(e)
        if not recoverable or block // 2 < min_block:
            raise
        # a partially-recorded plan for the failed block size would be
        # replayed as complete — drop it before backing off
        graph.plan_for(np.asarray(coef, np.float32), block).caps = None
        import warnings
        warnings.warn(f"gfpush_bucketed: block={block} exceeded memory "
                      f"({type(e).__name__}); retrying at block={block // 2}")
        return gfpush_bucketed(indptr, indices, sources, coef, rmax, k,
                               block=block // 2, window=window,
                               slot_limit=slot_limit, min_block=min_block,
                               graph=graph)


def _gfpush_bucketed_run(graph: BucketPushGraph, sources, coef, rmax, k,
                         *, block: int, slot_limit: int):
    g = graph
    sources = np.asarray(sources, dtype=np.int32)
    coef = np.asarray(coef, dtype=np.float32)
    plan = g.plan_for(coef, block)

    n_src = sources.shape[0]
    out_cols = np.zeros((n_src, k), dtype=np.int32)
    out_vals = np.zeros((n_src, k), dtype=np.float32)

    def block_src(start, b):
        src_np = sources[start:start + b]
        if b < block:   # pad the tail block (cheap; outputs sliced off)
            src_np = np.concatenate([src_np, np.zeros(block - b, np.int32)])
        return jnp.asarray(src_np)

    def check_limit():
        if plan.caps:
            worst = max((c[1] * g.w * block) for c in plan.caps if c)
            if worst > slot_limit:
                raise MemoryError(
                    f"gfpush_bucketed: a hop needs {worst} slots "
                    f"(> {slot_limit}); use a smaller block")

    # dispatch blocks without syncing (the plan makes replay blocks pure
    # device work) and drain outputs + overflow flags behind a small
    # pipeline window — deep queues would hold every in-flight block's
    # reserve-log buffers in HBM at once
    pending = []       # (start, b, cols_dev, vals_dev, bad_dev)

    def drain(item):
        start, b, cols_b, vals_b, bad = item
        if bad is not None and bool(np.asarray(bad)):
            plan.caps = None       # this block outgrew the plan: replan
            cols_b, vals_b, _ = _push_block(
                g, block_src(start, b), coef, k, plan, block)
            check_limit()
        out_cols[start:start + b] = np.asarray(cols_b)[:b]
        out_vals[start:start + b] = np.asarray(vals_b)[:b]

    start = 0
    while start < n_src:
        b = min(block, n_src - start)
        cols_b, vals_b, bad = _push_block(
            g, block_src(start, b), coef, k, plan, block)
        check_limit()
        pending.append((start, b, cols_b, vals_b, bad))
        if len(pending) > 2:
            drain(pending.pop(0))
        start += b
    for item in pending:
        drain(item)
    return out_cols, out_vals
