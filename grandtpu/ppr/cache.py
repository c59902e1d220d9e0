"""On-disk cache for GFPush precompute results.

The reference recomputes the top-k propagation matrix at the start of
every run (``model.py:251-272``); at production scale (MAG: 12M nodes,
minutes of push) the precompute is worth persisting. A cache entry is one
npz keyed by everything that determines the result bit-for-bit:

    sha256(indptr || indices || sources || coef || rmax || k || semver)

so any change to the graph, the source set, or the push semantics misses
cleanly. Keys hash the actual CSR arrays — not a dataset name — because
self-loop handling and split seeds change the arrays without changing the
name.

Usage (also wired behind ``GrandConfig.push_cache_dir``):

    tk = cached_gfpush(cache_dir, adj, sources, prop_mode="ppr", order=10,
                       alpha=0.2, rmax=1e-7, k=32)
"""

from __future__ import annotations

import hashlib
import os
import uuid

import numpy as np
import scipy.sparse as sp

from grandtpu.ppr.api import gfpush
from grandtpu.ppr.coef import build_coef
from grandtpu.sparse.topk import TopKProp

# bump when push semantics change in a result-affecting way
_SEMVER = b"gfpush-v1"


def push_cache_key(indptr: np.ndarray, indices: np.ndarray,
                   sources: np.ndarray, coef: np.ndarray, rmax: float,
                   k: int) -> str:
    h = hashlib.sha256()
    h.update(_SEMVER)
    for a in (np.asarray(indptr, np.int32), np.asarray(indices, np.int32),
              np.asarray(sources, np.int32),
              np.asarray(coef, np.float64)):
        h.update(a.tobytes())
    h.update(np.float64(rmax).tobytes())
    h.update(np.int64(k).tobytes())
    return h.hexdigest()[:32]


def save_topk(path: str, tk: TopKProp) -> None:
    # unique tmp per writer (two concurrent misses must not interleave
    # writes into one tmp file). uuid4 rather than pid alone: pids collide
    # across hosts sharing a network cache dir. Already .npz-suffixed so
    # savez won't rename it; unlink on failure so crashes don't orphan tmps.
    tmp = path + f".tmp{uuid.uuid4().hex}.npz"
    try:
        np.savez_compressed(tmp, sources=tk.sources, cols=tk.cols,
                            vals=tk.vals, num_nodes=np.int64(tk.num_nodes))
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_topk(path: str) -> TopKProp:
    with np.load(path) as z:
        return TopKProp(z["sources"], z["cols"], z["vals"],
                        int(z["num_nodes"]))


def cached_gfpush(cache_dir: str, adj: sp.spmatrix, sources, *,
                  prop_mode: str = "ppr", order: int = 10,
                  alpha: float = 0.2, rmax: float = 1e-7, k: int = 32,
                  backend: str = "auto") -> TopKProp:
    """gfpush with a content-addressed on-disk cache. A hit skips the push
    entirely; a miss computes and persists (atomic rename, so concurrent
    runs never read a torn file)."""
    adj = adj.tocsr()
    sources = np.asarray(sources, dtype=np.int32)
    coef = build_coef(prop_mode, order, alpha)
    key = push_cache_key(adj.indptr, adj.indices, sources, coef, rmax, k)
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"push_{key}.npz")
    if os.path.exists(path):
        return load_topk(path)
    tk = gfpush(adj, sources, prop_mode=prop_mode, order=order, alpha=alpha,
                rmax=rmax, k=k, backend=backend)
    save_topk(path, tk)
    return tk
