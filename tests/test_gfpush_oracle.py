"""GFPush numpy-oracle correctness: exactness at rmax=0 and top-k behavior."""

import numpy as np
import scipy.sparse as sp

from grandtpu.ppr import build_coef, gfpush_numpy
from grandtpu.sparse.topk import TopKProp


def exact_pi_rows(adj, sources, coef):
    """Dense exact Pi[sources] = sum_n coef_n (D^-1 A)^n rows, no pruning.
    Assumes no dangling nodes (self-loops added)."""
    n = adj.shape[0]
    deg = np.asarray(adj.sum(1)).flatten()
    p = sp.diags(1.0 / deg).dot(adj).toarray()  # D^-1 A, row-stochastic
    rows = np.zeros((len(sources), n))
    e = np.zeros((len(sources), n))
    e[np.arange(len(sources)), sources] = 1.0
    acc = coef[0] * e
    x = e
    for c in coef[1:]:
        x = x @ p
        acc += c * x
    return acc


def test_push_exact_at_rmax_zero(small_graph):
    adj, _, _ = small_graph
    coef = build_coef("ppr", order=6, alpha=0.3)
    sources = np.array([0, 5, 17, 33])
    n = adj.shape[0]
    cols, vals = gfpush_numpy(adj.indptr, adj.indices, sources, coef,
                              rmax=0.0, k=n)
    dense = exact_pi_rows(adj, sources, coef)
    got = np.zeros_like(dense)
    for i in range(len(sources)):
        got[i, cols[i]] = np.where(vals[i] > 0, vals[i], got[i, cols[i]])
    np.testing.assert_allclose(got, dense, atol=1e-12)


def test_push_all_modes_rows_sum_near_one(small_graph):
    adj, _, _ = small_graph
    sources = np.arange(10)
    for mode in ("ppr", "avg", "single"):
        coef = build_coef(mode, order=4, alpha=0.2)
        cols, vals = gfpush_numpy(adj.indptr, adj.indices, sources, coef,
                                  rmax=0.0, k=adj.shape[0])
        # coefficients are L1-normalized and P is row-stochastic ->
        # each exact row sums to 1
        np.testing.assert_allclose(vals.sum(1), 1.0, atol=1e-10)


def test_topk_truncation(small_graph):
    adj, _, _ = small_graph
    coef = build_coef("ppr", order=4, alpha=0.2)
    sources = np.array([3, 40])
    k = 8
    cols_full, vals_full = gfpush_numpy(adj.indptr, adj.indices, sources,
                                        coef, rmax=0.0, k=adj.shape[0])
    cols_k, vals_k = gfpush_numpy(adj.indptr, adj.indices, sources, coef,
                                  rmax=0.0, k=k)
    for i in range(len(sources)):
        full = np.sort(vals_full[i][vals_full[i] > 0])[::-1]
        topk = np.sort(vals_k[i][vals_k[i] > 0])[::-1]
        np.testing.assert_allclose(topk, full[: topk.shape[0]], atol=1e-14)
        assert topk.shape[0] == min(k, full.shape[0])
        # sorted descending in output
        assert np.all(np.diff(vals_k[i]) <= 1e-14)


def test_rmax_prunes_monotonically(small_graph):
    adj, _, _ = small_graph
    coef = build_coef("ppr", order=8, alpha=0.15)
    sources = np.array([7])
    _, v0 = gfpush_numpy(adj.indptr, adj.indices, sources, coef, 0.0, 64)
    _, v1 = gfpush_numpy(adj.indptr, adj.indices, sources, coef, 1e-3, 64)
    # pruned mass never exceeds exact mass
    assert v1.sum() <= v0.sum() + 1e-12
    # and with a loose threshold we still keep the dominant entries
    assert v1.max() > 0.1 * v0.max()


def test_dangling_teleport():
    """A node with out-degree 0 returns its residue to the source."""
    # 0 -> 1, 1 -> (nothing): node 1 dangles
    indptr = np.array([0, 1, 1], dtype=np.int32)
    indices = np.array([1], dtype=np.int32)
    coef = build_coef("avg", order=2)  # [1/3,1/3,1/3]
    cols, vals = gfpush_numpy(indptr, indices, np.array([0]), coef, 0.0, 2)
    # hop0: reserve0 += 1/3; push 1->residue {1:1}
    # hop1: reserve1 += 1/3; dangling -> residue {0:1}
    # flush: reserve0 += 1/3  => Pi[0] = {0: 2/3, 1: 1/3}
    got = dict(zip(cols[0].tolist(), vals[0].tolist()))
    np.testing.assert_allclose(got[0], 2 / 3, atol=1e-12)
    np.testing.assert_allclose(got[1], 1 / 3, atol=1e-12)


def test_topk_container_roundtrip(small_graph):
    adj, _, _ = small_graph
    coef = build_coef("ppr", order=4, alpha=0.2)
    sources = np.array([1, 2, 3, 50, 80])
    cols, vals = gfpush_numpy(adj.indptr, adj.indices, sources, coef,
                              1e-4, 8)
    tk = TopKProp(sources, cols, vals, adj.shape[0])
    csr = tk.to_csr()
    c2, v2 = tk.gather(np.array([3, 50]))
    # gather returns the stored rows
    np.testing.assert_array_equal(c2[0], cols[2])
    np.testing.assert_allclose(v2[1], vals[3], rtol=1e-6)
    # csr rows match the padded rows
    row = csr[sources[0]].toarray().flatten()
    for c, v in zip(cols[0], vals[0]):
        if v > 0:
            np.testing.assert_allclose(row[c], v, rtol=1e-6)
    # round trip through from_csr preserves the entry sets
    tk2 = TopKProp.from_csr(csr, sources, 8)
    np.testing.assert_allclose(
        np.sort(tk2.vals, axis=1), np.sort(tk.vals, axis=1), rtol=1e-6)
