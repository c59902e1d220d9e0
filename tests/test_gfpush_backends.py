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
