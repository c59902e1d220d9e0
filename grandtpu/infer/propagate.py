"""Exact full-graph power-iteration propagation on TPU.

Reference semantics (``model.py:181-210``), with adj already self-looped and
D = row sums of that matrix:

    ppr    : prop = sum_{t=0..order} [(1-a) D^-1 A]^t (a X)
    avg    : prop = sum_{t=0..order} (D^-1 A)^t X / (order+1)
    single : prop = (D^-1 A)^order X

The reference runs this as scipy SpMM on the host (HOT LOOP #3). Here the
iteration is one jitted ``lax.fori_loop`` on device with one of three
matrix-apply backends:

- 'dense'   dense MXU matmul — fastest whenever n^2 fits (small graphs)
- 'block'   SplitCSR one-hot-matmul SpMM — scatter-free, ~6x the scatter
            path (the large-graph default); skewed graphs spill hub-block
            overflow into offset levels instead of inflating padding
- 'segment' padded-edge scatter-add scan — lowest memory, explicit opt-in

Zero-degree rows use the same 1e-12 clamp as the reference
(``model.py:190,198``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from grandtpu.sparse.spmm import (PaddedCSR, SplitCSR, row_values_if_constant,
                                  spmm_segment, spmm_split, spmm_split_q8,
                                  spmm_split_q8mxu)

# Measured fast-precision crossover (RESULTS.md: gather-roof study + the
# 5M-node re-measure). int8-packed gather wins while the f32 feature
# working set the loop carries stays small (153MB graph: 272.5M edges/s
# vs 126.6M bf16), but at a 2.56GB working set / avg degree 14 the
# per-hop quantize+rescale pass outweighs the narrower gather rows and
# bf16 retakes the lead (158M vs 114M). 1 GiB splits the measured
# bounds; re-sweep per hardware generation.
INT8_MAX_WORKING_SET_BYTES = 1 << 30

# Degree-skew guard (VERDICT r4 #2): int8 quantization noise accumulates
# over the per-row reduction, so hub rows are the accuracy hazard — the
# skew probe (bench/skew_probe.py, RESULTS.md) measured int8 rel err at
# hub degree 15,000 / F=128 at 4.99e-3 (MXU) and 5.03e-3 (cast kernel),
# i.e. AT/over the 5e-3 fast-path gate. Noise grows ~sqrt(degree), so the
# guard trips at roughly half the measured hazard (expected err there
# ~3.7e-3 — a 26% margin under the gate) and auto falls back to bf16
# rather than picking int8 blind on exactly the power-law graphs SplitCSR
# was built for.
INT8_MAX_HUB_DEGREE = 8192


def choose_fast_precision(num_rows: int, num_features: int,
                          max_degree: int | None = None) -> str:
    """Heuristic fast-path precision for a block-SpMM workload: 'int8'
    below the measured working-set crossover, 'bf16' above (see
    ``INT8_MAX_WORKING_SET_BYTES``). ``max_degree`` (max nonzeros in any
    operator row, when the caller knows it) engages the degree-skew guard:
    at/above ``INT8_MAX_HUB_DEGREE`` the int8 error on hub rows approaches
    the 5e-3 accuracy gate, so auto answers 'bf16'. Used to resolve
    ``precision="auto"`` when no timed calibration
    (``Propagator.calibrate``) has run."""
    if max_degree is not None and max_degree >= INT8_MAX_HUB_DEGREE:
        return "bf16"
    working_set = num_rows * num_features * 4   # the f32 [n, F] carry
    return "int8" if working_set <= INT8_MAX_WORKING_SET_BYTES else "bf16"


def _max_row_nnz(adj: sp.spmatrix) -> int:
    """Max nonzeros in any row — the quantity the int8 skew guard keys on
    (number of quantized terms a hub row accumulates)."""
    return int(adj.getnnz(axis=1).max()) if adj.nnz else 0


@functools.partial(jax.jit,
                   static_argnames=("mode", "order", "backend", "precision"))
def _propagate_device(adj_op, x, *, mode: str, order: int,
                      alpha, backend: str, precision: str = "f32",
                      row_val=None):
    # D^-1 is folded into the operator values at build time (one less
    # [n, F] elementwise pass per iteration)
    def apply_p(v):
        if backend == "dense":
            return jnp.dot(adj_op, v, preferred_element_type=jnp.float32)
        if backend == "block":
            # v is block-padded; keep it padded through the loop
            if precision in ("int8", "int8mxu", "int8cast"):
                # true int8 MXU matmul whenever the operator has
                # row-constant values (D^-1 A does): measured on v5e
                # 325.9M vs 272.7M edges/s AND rel err 1.8e-3 vs 4.3e-3
                # (bench/q8mxu_probe.py) — strictly better, so plain
                # "int8" auto-upgrades; the bf16-cast kernel remains for
                # general-valued operators, and 'int8cast' forces it so
                # the probe's adjudication stays reproducible
                if row_val is not None and precision != "int8cast":
                    return spmm_split_q8mxu(adj_op, v, row_val, trim=False)
                return spmm_split_q8(adj_op, v, trim=False)
            return spmm_split(adj_op, v, fast=precision == "bf16",
                              trim=False)
        return spmm_segment(adj_op, v)

    n = x.shape[0]
    if backend == "block":
        n_pad = adj_op.num_blocks * adj_op.rows_per_block
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    if x.dtype != jnp.float32:
        # bf16-carry mode (exact_propagate 'bf16_carry'): the kernels
        # accumulate/return f32, so cast each hop's output back to the
        # carry dtype — halved-memory carries are the entire point
        _apply = apply_p
        apply_p = lambda v: _apply(v).astype(x.dtype)  # noqa: E731

    if mode == "ppr":
        x0 = alpha * x

        def body(_, carry):
            cur, acc = carry
            cur = (1.0 - alpha) * apply_p(cur)
            return cur, acc + cur

        _, out = jax.lax.fori_loop(0, order, body, (x0, x0))
    elif mode == "avg":
        def body(_, carry):
            cur, acc = carry
            cur = apply_p(cur)
            return cur, acc + cur

        _, acc = jax.lax.fori_loop(0, order, body, (x, x))
        out = acc / (order + 1)
    elif mode == "single":
        out = jax.lax.fori_loop(0, order, lambda _, v: apply_p(v), x)
    else:
        raise ValueError(f"unknown propagation mode {mode!r}")
    return out[:n]


class Propagator:
    """Reusable device-resident propagation operator.

    Build once (host->device transfer of the adjacency happens here), apply
    many times — benchmark loops and repeated predictions must not pay the
    operator upload per call.
    """

    def __init__(self, adj: sp.spmatrix, *, dense_threshold: int = 20000,
                 backend: str | None = None, dtype=jnp.float32,
                 rows_per_block: int | None = None):
        """rows_per_block: block-SpMM row-block size. None = 512, the f32/
        bf16 optimum; pass 288 for operators dedicated to the int8 path
        (in-loop sweep on v5e: R=288 282M edges/s, 320 273M, 256 259M,
        384 collapses to 166M — the smaller int8 gather granule shifts
        the block balance; empirical, re-sweep per generation)."""
        n = adj.shape[0]
        self.max_degree = _max_row_nnz(adj)   # int8 skew-guard input
        deg = np.asarray(adj.sum(1)).flatten()
        dinv = 1.0 / np.maximum(deg, 1e-12)
        a_norm = sp.diags(dinv).dot(adj).tocsr()   # D^-1 A, folded once
        if backend is None:
            backend = "dense" if n <= dense_threshold else "block"
        if backend == "dense":
            self.adj_op = jnp.asarray(np.asarray(a_norm.todense()), dtype)
        elif backend == "block":
            # SplitCSR bounds padding on skewed (power-law) graphs by
            # spilling hub-block overflow to offset levels — no more
            # falling back to the ~6x-slower scatter path
            self.adj_op = SplitCSR.from_scipy(
                a_norm, rows_per_block=rows_per_block or 512)
            # D^-1 A values are row-constant (1/deg) — precompute the
            # per-row value so the int8mxu path can run the one-hot matmul
            # as exact int8 x int8 -> int32 on the MXU
            rv = row_values_if_constant(a_norm)
            if rv is not None:
                n_pad = (self.adj_op.num_blocks
                         * self.adj_op.rows_per_block)
                self.row_val = jnp.asarray(np.pad(rv, (0, n_pad - n)))
            else:
                self.row_val = None
        else:
            self.adj_op = PaddedCSR.from_scipy(a_norm)
        self.backend = backend
        self.dtype = dtype
        self.num_rows = n
        self._auto_precision: str | None = None

    def calibrate(self, features, *, mode: str = "ppr", order: int = 5,
                  alpha: float = 0.2, candidates=("bf16", "int8"),
                  gate: float = 5e-3, repeats: int = 3) -> str:
        """Timed on-device precision autotune (the int8/bf16 ranking is
        regime-dependent — RESULTS.md 5M-node study — so measure on the
        REAL operands when the operator will be reused). Runs the f32
        path once as the accuracy reference, drops any candidate whose
        max rel err exceeds ``gate`` (the fast-path tolerance bench.py
        enforces), times the survivors, and caches the fastest — later
        ``precision="auto"`` calls on this Propagator use the cached
        choice. Returns it ('f32' if no candidate passes the gate).

        Timing protocol: operands device-resident; dispatch all repeats
        then sync once with a scalar fetch (``block_until_ready`` can
        return early through the tunnel — see CLAUDE.md)."""
        import time

        if self.backend != "block":   # dense/segment ignore precision
            self._auto_precision = "f32"
            return "f32"
        x = jnp.asarray(features, self.dtype)
        jax.block_until_ready(x)

        def run_sync(p):
            out = self(x, mode=mode, order=order, alpha=alpha, precision=p)
            jax.block_until_ready(out)
            float(jnp.sum(out[:1, :1]))   # true sync through the tunnel
            return out

        ref = np.asarray(run_sync("f32"))
        scale = max(float(np.max(np.abs(ref))), 1e-9)
        best, best_dt = "f32", None
        for p in candidates:
            out = run_sync(p)   # compile + the error sample
            err = float(np.max(np.abs(np.asarray(out) - ref))) / scale
            if err > gate:
                continue
            t0 = time.perf_counter()
            for _ in range(repeats):
                out = self(x, mode=mode, order=order, alpha=alpha,
                           precision=p)
            jax.block_until_ready(out)
            float(jnp.sum(out[:1, :1]))
            dt = (time.perf_counter() - t0) / repeats
            if best_dt is None or dt < best_dt:
                best, best_dt = p, dt
        self._auto_precision = best
        return best

    def __call__(self, features, *, mode: str = "ppr", order: int = 10,
                 alpha: float = 0.2, fast: bool = False,
                 precision: str | None = None) -> jnp.ndarray:
        """precision: 'f32' (default), 'bf16' (== fast=True), 'int8'
        (per-column-quantized gather — see sparse/spmm.py int8 note), or
        'auto' (the cached ``calibrate()`` choice if one ran, else the
        measured working-set heuristic ``choose_fast_precision``).
        Applies to the 'block' backend; the 'dense' small-graph path
        always runs f32 MXU (already fast). `fast` is the legacy bool
        alias."""
        if precision is None:
            precision = "bf16" if fast else "f32"
        if precision not in ("auto", "f32", "bf16", "int8", "int8mxu",
                             "int8cast"):
            raise ValueError(f"unknown precision {precision!r}")
        if precision == "auto":
            if self.backend != "block":
                precision = "f32"
            else:
                precision = self._auto_precision or choose_fast_precision(
                    self.num_rows, np.shape(features)[1],
                    max_degree=self.max_degree)
        if self.backend != "block" and precision in ("int8mxu", "int8cast"):
            raise ValueError(
                f"{precision} applies to the 'block' backend only")
        if precision == "int8mxu" and getattr(self, "row_val", None) is None:
            raise ValueError(
                "int8mxu needs row-constant operator values (D^-1 A has "
                "them; this operator does not) — use 'int8' instead")
        x = jnp.asarray(features, self.dtype)
        return _propagate_device(self.adj_op, x, mode=mode,
                                 order=order, alpha=float(alpha),
                                 backend=self.backend, precision=precision,
                                 row_val=getattr(self, "row_val", None))


def exact_propagate(adj: sp.spmatrix, features, *, mode: str = "ppr",
                    order: int = 10, alpha: float = 0.2,
                    dense_threshold: int = 20000,
                    backend: str | None = None,
                    fast: bool = False,
                    precision: str | None = None,
                    dtype=jnp.float32) -> jnp.ndarray:
    """One-shot propagation of [n, F] features through the self-looped
    adjacency (builds a Propagator and applies it).

    backend: None = auto ('dense' under dense_threshold, else 'block' with
    'segment' fallback on >2x padding overhead). precision 'bf16'
    (== fast=True, rel err ~1e-3), 'int8' (quantized gather, fastest at
    <=1GiB working sets), and 'auto' (working-set heuristic between the
    two, resolved BEFORE the operator build so int8 gets its own R=288
    block size) are opt-in — the default stays f32 because this feeds
    the accuracy-critical test-time propagation. 'bf16_carry' = bf16
    matmul AND bf16 loop carries: halves the [n, F] propagation HBM
    footprint (the backoff that fits MAG-scale 12.4M x 64 embedding-space
    predict on one 16GB chip); accumulation error grows with order, so
    it is a memory knob, not a speed default.
    """
    if precision == "bf16_carry":
        precision, dtype = "bf16", jnp.bfloat16
    if precision == "auto":
        precision = choose_fast_precision(adj.shape[0],
                                          np.shape(features)[1],
                                          max_degree=_max_row_nnz(adj))
    prop = Propagator(adj, dense_threshold=dense_threshold, backend=backend,
                      dtype=dtype,
                      rows_per_block=288 if precision == "int8" else None)
    return prop(features, mode=mode, order=order, alpha=alpha, fast=fast,
                precision=precision)
