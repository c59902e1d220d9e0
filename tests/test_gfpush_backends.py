"""Three-way GFPush backend parity: native C++/OpenMP and batched JAX push
vs the numpy oracle (SURVEY.md §7.2 step 3 cross-check)."""

import numpy as np
import pytest

from grandtpu.ppr import build_coef, gfpush, gfpush_numpy
from grandtpu.ppr.native import gfpush_native, native_available
from grandtpu.ppr.jax_push import gfpush_jax


def _rows_as_dicts(cols, vals, tol=0.0):
    out = []
    for c, v in zip(cols, vals):
        out.append({int(ci): float(vi) for ci, vi in zip(c, v) if vi > tol})
    return out


def _assert_row_parity(cols_a, vals_a, cols_b, vals_b, atol=1e-8,
                       tie_tol=1e-12):
    """Rows must contain the same entries up to atol; ties at the k-th value
    may legitimately resolve to different columns, so compare the value
    multisets exactly and the (col -> val) maps for all non-tied entries."""
    a, b = _rows_as_dicts(cols_a, vals_a), _rows_as_dicts(cols_b, vals_b)
    for ra, rb, va, vb in zip(a, b, vals_a, vals_b):
        np.testing.assert_allclose(
            np.sort(np.asarray(list(ra.values())))[::-1],
            np.sort(np.asarray(list(rb.values())))[::-1], atol=atol)
        cutoff = min(va[va > 0].min() if (va > 0).any() else 0,
                     vb[vb > 0].min() if (vb > 0).any() else 0)
        for ccol, cval in ra.items():
            if cval > cutoff + tie_tol:
                assert ccol in rb, f"col {ccol} missing"
                np.testing.assert_allclose(cval, rb[ccol], atol=atol)


@pytest.fixture(scope="module")
def pushed(small_graph_mod):
    adj = small_graph_mod
    coef = build_coef("ppr", order=8, alpha=0.25)
    sources = np.arange(0, 120, 3)
    return adj, coef, sources


@pytest.fixture(scope="module")
def small_graph_mod():
    from grandtpu.data import synthetic_graph
    import scipy.sparse as sp
    adj, _, _ = synthetic_graph(num_nodes=120, num_classes=3,
                                num_features=16, seed=3)
    return (adj + sp.eye(adj.shape[0], format="csr")).tocsr()


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
@pytest.mark.parametrize("rmax", [0.0, 1e-4, 1e-2])
def test_native_matches_oracle(pushed, rmax):
    adj, coef, sources = pushed
    k = 16
    oc, ov = gfpush_numpy(adj.indptr, adj.indices, sources, coef, rmax, k)
    nc, nv = gfpush_native(adj.indptr, adj.indices, sources, coef, rmax, k)
    _assert_row_parity(oc, ov, nc, nv, atol=1e-10)


@pytest.mark.parametrize("rmax", [0.0, 1e-3])
def test_jax_matches_oracle(pushed, rmax):
    adj, coef, sources = pushed
    k = 16
    oc, ov = gfpush_numpy(adj.indptr, adj.indices, sources, coef, rmax, k)
    jc, jv = gfpush_jax(adj.indptr, adj.indices, sources, coef, rmax, k)
    # f32 (TPU) vs f64 (oracle) flips borderline rmax-prune decisions, so
    # for rmax > 0 differences are bounded by the pruning granularity, not
    # float eps (SURVEY.md §7.3 item 4)
    atol = max(1e-5, 2.0 * rmax)
    _assert_row_parity(oc, ov, jc, jv, atol=atol, tie_tol=atol)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_jax_sparse_path_matches_native(pushed):
    """Force the padded-edge (large-graph) path in the JAX push."""
    adj, coef, sources = pushed
    k = 12
    nc, nv = gfpush_native(adj.indptr, adj.indices, sources, coef, 1e-4, k)
    jc, jv = gfpush_jax(adj.indptr, adj.indices, sources, coef, 1e-4, k,
                        dense_threshold=0)   # disable dense fast path
    _assert_row_parity(nc, nv, jc, jv, atol=2e-4, tie_tol=2e-4)


@pytest.mark.parametrize("rmax", [0.0, 1e-3, 1e-2])
def test_bucket_matches_oracle(pushed, rmax):
    """Bucketed sparse-residue TPU push (VERDICT item 3): exact hop
    semantics with O(frontier) memory; parity at 3 rmax values."""
    from grandtpu.ppr.bucket_push import gfpush_bucketed
    adj, coef, sources = pushed
    k = 16
    oc, ov = gfpush_numpy(adj.indptr, adj.indices, sources, coef, rmax, k)
    bc, bv = gfpush_bucketed(adj.indptr, adj.indices, sources, coef, rmax,
                             k, block=16)   # several blocks + padded tail
    atol = max(1e-5, 2.0 * rmax)
    _assert_row_parity(oc, ov, bc, bv, atol=atol, tie_tol=atol)


def test_bucket_dangling_teleport():
    """A dangling node must return its residue to the source (graph.h:91-93)
    — build a graph WITHOUT self-loops so dangling nodes exist."""
    import scipy.sparse as sp
    rows = np.array([0, 0, 1, 2, 2, 3])
    cols = np.array([1, 2, 4, 1, 3, 0])
    adj = sp.csr_matrix((np.ones(6), (rows, cols)), shape=(5, 5))
    # node 4 is dangling (no out-edges)
    coef = build_coef("ppr", order=4, alpha=0.3)
    sources = np.arange(5)
    from grandtpu.ppr.bucket_push import gfpush_bucketed
    oc, ov = gfpush_numpy(adj.indptr, adj.indices, sources, coef, 0.0, 5)
    bc, bv = gfpush_bucketed(adj.indptr, adj.indices, sources, coef, 0.0, 5,
                             block=8)
    _assert_row_parity(oc, ov, bc, bv, atol=1e-6, tie_tol=1e-6)


def test_bucket_single_mode_zero_coefs():
    """'single' coefficients are one-hot on the last hop: reserve entries
    from earlier hops are all zero and must not pollute the top-k."""
    from grandtpu.ppr.bucket_push import gfpush_bucketed
    from grandtpu.data import synthetic_graph
    import scipy.sparse as sp
    adj, _, _ = synthetic_graph(num_nodes=80, num_classes=3,
                                num_features=8, seed=7)
    adj = (adj + sp.eye(80, format="csr")).tocsr()
    coef = build_coef("single", order=3, alpha=0.0)
    sources = np.arange(0, 80, 5)
    oc, ov = gfpush_numpy(adj.indptr, adj.indices, sources, coef, 0.0, 8)
    bc, bv = gfpush_bucketed(adj.indptr, adj.indices, sources, coef, 0.0, 8)
    _assert_row_parity(oc, ov, bc, bv, atol=1e-6, tie_tol=1e-6)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_deterministic_and_sorted(pushed):
    adj, coef, sources = pushed
    a = gfpush_native(adj.indptr, adj.indices, sources, coef, 1e-4, 16,
                      num_threads=1)
    b = gfpush_native(adj.indptr, adj.indices, sources, coef, 1e-4, 16,
                      num_threads=2)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    assert np.all(np.diff(a[1], axis=1) <= 0)   # descending rows


def test_api_dispatch(pushed):
    adj, coef, sources = pushed
    tk = gfpush(adj, sources, prop_mode="ppr", order=8, alpha=0.25,
                rmax=1e-4, k=16, backend="numpy")
    assert tk.cols.shape == (len(sources), 16)
    assert tk.num_nodes == adj.shape[0]
    # dangling-free graph: row mass <= 1
    assert tk.vals.sum(1).max() <= 1.0 + 1e-6


def test_push_cache_roundtrip_and_keying(pushed, tmp_path, monkeypatch):
    """Content-addressed push cache: a hit returns bit-identical results
    without recomputing; any parameter change misses."""
    from grandtpu.ppr import api, cached_gfpush
    adj, coef, sources = pushed
    d = str(tmp_path)
    tk1 = cached_gfpush(d, adj, sources, prop_mode="ppr", order=8,
                        alpha=0.25, rmax=1e-4, k=16, backend="numpy")
    files = list(tmp_path.glob("push_*.npz"))
    assert len(files) == 1

    # second call must be a pure cache hit: poison the compute path
    def boom(*a, **k):
        raise AssertionError("cache miss — gfpush recomputed")

    monkeypatch.setattr("grandtpu.ppr.cache.gfpush", boom)
    tk2 = cached_gfpush(d, adj, sources, prop_mode="ppr", order=8,
                        alpha=0.25, rmax=1e-4, k=16, backend="numpy")
    np.testing.assert_array_equal(tk1.cols, tk2.cols)
    np.testing.assert_array_equal(tk1.vals, tk2.vals)
    assert tk1.num_nodes == tk2.num_nodes
    monkeypatch.undo()

    # changing k / rmax / sources each produces a NEW entry
    cached_gfpush(d, adj, sources, prop_mode="ppr", order=8, alpha=0.25,
                  rmax=1e-4, k=8, backend="numpy")
    cached_gfpush(d, adj, sources, prop_mode="ppr", order=8, alpha=0.25,
                  rmax=2e-4, k=16, backend="numpy")
    cached_gfpush(d, adj, sources[:-1], prop_mode="ppr", order=8,
                  alpha=0.25, rmax=1e-4, k=16, backend="numpy")
    assert len(list(tmp_path.glob("push_*.npz"))) == 4


def test_trainer_uses_push_cache(tmp_path):
    """GrandConfig.push_cache_dir: a second identical run reuses the
    persisted precompute (exactly one cache entry on disk)."""
    from grandtpu.config import GrandConfig
    from grandtpu.train import train
    cfg = GrandConfig(dataset="synth:200:3:12", epochs=2, patience=2,
                      push_cache_dir=str(tmp_path))
    train(cfg)
    assert len(list(tmp_path.glob("push_*.npz"))) == 1
    train(cfg)
    assert len(list(tmp_path.glob("push_*.npz"))) == 1


def test_bucket_block_backoff(pushed):
    """A slot_limit too small for the requested block halves the block
    and still returns oracle-exact results (heavy fan-out degrades,
    never fails)."""
    import warnings
    from grandtpu.ppr.bucket_push import gfpush_bucketed
    adj, coef, sources = pushed
    indptr = adj.indptr.astype(np.int32)
    indices = adj.indices.astype(np.int32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cols, vals = gfpush_bucketed(indptr, indices, sources, coef,
                                     1e-4, 16, block=64,
                                     slot_limit=20_000, min_block=8)
    assert any("retrying at block=" in str(x.message) for x in w), \
        "expected a backoff warning"
    wc, wv = gfpush_numpy(indptr, indices, sources, coef, 1e-4, 16)
    np.testing.assert_array_equal(cols, wc)
    np.testing.assert_allclose(vals, wv, rtol=1e-5, atol=1e-7)


def test_auto_backend_policy(monkeypatch):
    """'auto' selects the TPU bucket push exactly when an accelerator is
    attached AND the push is large enough to amortize planning AND the
    measured throughput model predicts the host kernel loses (VERDICT r2
    #3b): native unavailable, or the host too core-starved to beat the
    v5e bucket rate. An idle multi-core host keeps the native kernel."""
    from grandtpu.ppr import api

    monkeypatch.setattr(api, "_accelerator_present", lambda: True)
    monkeypatch.setattr("grandtpu.ppr.native.native_available", lambda: True)
    monkeypatch.setattr(api.os, "cpu_count", lambda: 2)
    nnz = 62_000_000
    # idle 2-core host: native (~2500 src/s) beats the v5e bucket (~900)
    assert api._auto_backend(nnz, 16384) == "native"
    # host effectively core-less (all cores feeding pipelines): bucket
    monkeypatch.setenv("GRANDTPU_PUSH_CORES", "0")
    assert api._auto_backend(nnz, 16384) == "bucket"
    # too few sources to amortize the planning compiles
    assert api._auto_backend(nnz, 512) == "native"
    monkeypatch.delenv("GRANDTPU_PUSH_CORES")
    # no native toolchain: bucket (not the slow numpy oracle)
    monkeypatch.setattr(api, "native_available_override", None,
                        raising=False)
    import grandtpu.ppr.native as native_mod
    monkeypatch.setattr(native_mod, "native_available", lambda: False)
    assert api._auto_backend(nnz, 16384) == "bucket"
    # no accelerator either: numpy oracle fallback
    monkeypatch.setattr(api, "_accelerator_present", lambda: False)
    assert api._auto_backend(nnz, 16384) == "numpy"
    # explicit override wins
    monkeypatch.setenv("GRANDTPU_PUSH_BACKEND", "numpy")
    assert api._auto_backend(nnz, 16384) == "numpy"


def test_auto_backend_end_to_end_bucket(pushed, monkeypatch):
    """gfpush(backend='auto') routed to bucket produces the oracle layout
    (runs the real bucket kernel on the test backend)."""
    from grandtpu.ppr import api
    adj, coef, sources = pushed
    monkeypatch.setattr(api, "_accelerator_present", lambda: True)
    monkeypatch.setattr(api, "_BUCKET_MIN_SOURCES", 1)
    monkeypatch.setattr(api, "_BUCKET_SPS", float("inf"))
    tk = gfpush(adj, sources, prop_mode="ppr", order=6, alpha=0.25,
                rmax=1e-4, k=16, backend="auto")
    want = gfpush(adj, sources, prop_mode="ppr", order=6, alpha=0.25,
                  rmax=1e-4, k=16, backend="numpy")
    np.testing.assert_array_equal(tk.cols, want.cols)
    np.testing.assert_allclose(tk.vals, want.vals, rtol=1e-5, atol=1e-7)
