"""Unified GFPush entry point with backend dispatch.

The reference reaches its kernel through ``propagation.Graph.gfpush_omp``
(``model.py:251,268``); here ``gfpush`` picks between the native C++/OpenMP
kernel, the batched JAX push, and the numpy oracle, and returns a
``TopKProp`` in the padded layout every other subsystem consumes.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from grandtpu.ppr.coef import build_coef
from grandtpu.ppr.oracle import gfpush_numpy
from grandtpu.sparse.topk import TopKProp


def gfpush(adj: sp.spmatrix, sources: np.ndarray, *,
           prop_mode: str = "ppr", order: int = 10, alpha: float = 0.2,
           rmax: float = 1e-7, k: int = 32,
           backend: str = "auto", num_threads: int = 0) -> TopKProp:
    """Compute top-k rows of Pi for `sources` over the (self-looped) adj."""
    adj = adj.tocsr()
    indptr = np.asarray(adj.indptr, dtype=np.int32)
    indices = np.asarray(adj.indices, dtype=np.int32)
    sources = np.asarray(sources)
    coef = build_coef(prop_mode, order, alpha)

    if backend == "auto":
        from grandtpu.ppr.native import native_available
        backend = "native" if native_available() else "numpy"

    if backend == "native":
        from grandtpu.ppr.native import gfpush_native
        cols, vals = gfpush_native(indptr, indices, sources, coef, rmax, k,
                                   num_threads=num_threads)
    elif backend == "jax":
        from grandtpu.ppr.jax_push import gfpush_jax
        cols, vals = gfpush_jax(indptr, indices, sources, coef, rmax, k)
    elif backend == "bucket":
        from grandtpu.ppr.bucket_push import gfpush_bucketed
        cols, vals = gfpush_bucketed(indptr, indices, sources, coef, rmax, k)
    elif backend == "numpy":
        cols, vals = gfpush_numpy(indptr, indices, sources, coef, rmax, k)
    else:
        raise ValueError(f"unknown push backend {backend!r}")

    return TopKProp(sources, cols, vals, adj.shape[0])
