"""SpMM backend parity: dense MXU, padded-edge segment, BlockCSR one-hot."""

import numpy as np
import pytest

import jax.numpy as jnp

from grandtpu.sparse.spmm import (BlockCSR, PaddedCSR, spmm_block,
                                  spmm_segment)


@pytest.fixture(scope="module")
def adj_x():
    from grandtpu.data import synthetic_graph
    import scipy.sparse as sp
    adj, _, _ = synthetic_graph(num_nodes=500, num_classes=4,
                                num_features=8, avg_degree=12, seed=2)
    adj = (adj + sp.eye(500, format="csr")).tocsr()
    x = np.random.RandomState(0).randn(500, 32).astype(np.float32)
    return adj, x


def test_segment_matches_scipy(adj_x):
    adj, x = adj_x
    want = adj.dot(x)
    got = spmm_segment(PaddedCSR.from_scipy(adj), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_block_matches_scipy_f32(adj_x):
    adj, x = adj_x
    want = adj.dot(x)
    bcsr = BlockCSR.from_scipy(adj, rows_per_block=64, pad_multiple=128)
    got = spmm_block(bcsr, jnp.asarray(x), fast=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_block_fast_within_bf16_tolerance(adj_x):
    adj, x = adj_x
    want = adj.dot(x)
    bcsr = BlockCSR.from_scipy(adj, rows_per_block=64, pad_multiple=128)
    got = np.asarray(spmm_block(bcsr, jnp.asarray(x), fast=True))
    scale = np.abs(want).max()
    assert np.max(np.abs(got - want)) / scale < 5e-3


def test_block_build_vectorized_layout(adj_x):
    """Every nonzero lands in its block with the right local row."""
    adj, _ = adj_x
    r = 64
    bcsr = BlockCSR.from_scipy(adj, rows_per_block=r, pad_multiple=128)
    cols = np.asarray(bcsr.cols)
    vals = np.asarray(bcsr.vals)
    lrow = np.asarray(bcsr.lrow)
    assert vals.sum() == pytest.approx(adj.data.sum())
    coo = adj.tocoo()
    got_entries = set()
    for b in range(cols.shape[0]):
        m = lrow[b] < r
        for lr, c, v in zip(lrow[b][m], cols[b][m], vals[b][m]):
            got_entries.add((b * r + int(lr), int(c), float(np.float32(v))))
    want_entries = {(int(i), int(j), float(np.float32(v)))
                    for i, j, v in zip(coo.row, coo.col, coo.data)}
    assert got_entries == want_entries


def test_block_handles_empty_rows():
    import scipy.sparse as sp
    # graph with several all-zero rows
    adj = sp.csr_matrix((np.ones(3, np.float32),
                         (np.array([0, 5, 9]), np.array([1, 2, 3]))),
                        shape=(10, 10))
    x = np.random.RandomState(1).randn(10, 4).astype(np.float32)
    bcsr = BlockCSR.from_scipy(adj, rows_per_block=4, pad_multiple=8)
    got = spmm_block(bcsr, jnp.asarray(x), fast=False)
    np.testing.assert_allclose(np.asarray(got), adj.dot(x), atol=1e-5)


@pytest.fixture(scope="module")
def skewed_adj_x():
    """Power-law-ish graph: two hub rows with ~1/3 of all edges each plus a
    light uniform background — the regime where plain BlockCSR padding
    explodes (every block pads to the hub block's edge count)."""
    import scipy.sparse as sp
    rs = np.random.RandomState(3)
    n = 600
    rows = [np.full(400, 7), np.full(400, 310),
            rs.randint(0, n, 800)]
    cols = [rs.randint(0, n, 400), rs.randint(0, n, 400),
            rs.randint(0, n, 800)]
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    adj = sp.coo_matrix((rs.rand(r.size).astype(np.float32), (r, c)),
                        shape=(n, n)).tocsr()
    adj.sum_duplicates()
    x = rs.randn(n, 16).astype(np.float32)
    return adj, x


def test_split_multi_level_matches_scipy(skewed_adj_x):
    from grandtpu.sparse.spmm import SplitCSR, spmm_split
    adj, x = skewed_adj_x
    scsr = SplitCSR.from_scipy(adj, rows_per_block=64, pad_multiple=64)
    assert len(scsr.levels) >= 1, "hub rows must spill to overflow levels"
    got = spmm_split(scsr, jnp.asarray(x), fast=False)
    np.testing.assert_allclose(np.asarray(got), adj.dot(x), atol=1e-4)


def test_split_bounds_padding_on_skew(skewed_adj_x):
    from grandtpu.sparse.spmm import SplitCSR
    adj, _ = skewed_adj_x
    bcsr = BlockCSR.from_scipy(adj, rows_per_block=64, pad_multiple=64)
    scsr = SplitCSR.from_scipy(adj, rows_per_block=64, pad_multiple=64)
    assert scsr.pad_overhead < bcsr.pad_overhead * 0.75
    assert scsr.pad_overhead < 2.5


def test_split_degenerates_to_single_level_when_uniform(adj_x):
    from grandtpu.sparse.spmm import SplitCSR, spmm_split
    adj, x = adj_x
    scsr = SplitCSR.from_scipy(adj, rows_per_block=64, pad_multiple=128)
    assert scsr.levels == ()
    got = spmm_split(scsr, jnp.asarray(x), fast=False)
    np.testing.assert_allclose(np.asarray(got), adj.dot(x), atol=1e-4)


def test_split_fast_within_bf16_tolerance(skewed_adj_x):
    from grandtpu.sparse.spmm import SplitCSR, spmm_split
    adj, x = skewed_adj_x
    scsr = SplitCSR.from_scipy(adj, rows_per_block=64, pad_multiple=64)
    got = np.asarray(spmm_split(scsr, jnp.asarray(x), fast=True))
    want = adj.dot(x)
    scale = max(np.abs(want).max(), 1e-9)
    assert np.max(np.abs(got - want)) / scale < 5e-3


def test_quantize_columns_roundtrip(adj_x):
    from grandtpu.sparse.spmm import quantize_columns
    _, x = adj_x
    q, s = quantize_columns(jnp.asarray(x))
    assert np.asarray(q).dtype == np.int8
    back = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    colmax = np.abs(x).max(0)
    assert (np.abs(back - x) <= colmax[None, :] / 254 + 1e-7).all()


def test_split_q8_within_quant_tolerance(skewed_adj_x):
    """int8-gather path (base + overflow levels): error bounded by the
    per-column quantization step propagated through |A| (row mass)."""
    from grandtpu.sparse.spmm import SplitCSR, spmm_split_q8
    adj, x = skewed_adj_x
    scsr = SplitCSR.from_scipy(adj, rows_per_block=64, pad_multiple=64)
    assert len(scsr.levels) >= 1
    got = np.asarray(spmm_split_q8(scsr, jnp.asarray(x)))
    want = adj.dot(x)
    # per-element bound: (|A| @ colmax)/254 from quantization, plus bf16
    # rounding of the val multiply
    colmax = np.abs(x).max(0)
    bound = np.abs(adj).dot(np.broadcast_to(colmax, x.shape)) / 254
    scale = max(np.abs(want).max(), 1e-9)
    assert np.max((np.abs(got - want) - bound).clip(0)) / scale < 1.2e-2


def test_split_q8_uniform_matches(adj_x):
    from grandtpu.sparse.spmm import SplitCSR, spmm_split_q8
    adj, x = adj_x
    scsr = SplitCSR.from_scipy(adj, rows_per_block=64, pad_multiple=128)
    got = np.asarray(spmm_split_q8(scsr, jnp.asarray(x)))
    want = adj.dot(x)
    scale = max(np.abs(want).max(), 1e-9)
    assert np.max(np.abs(got - want)) / scale < 2e-2


def test_propagate_precision_int8(adj_x):
    """End-to-end ppr power iteration with precision='int8' stays close to
    the f32 result (per-hop requantization compounds mildly)."""
    from grandtpu.infer import exact_propagate
    adj, x = adj_x
    want = np.asarray(exact_propagate(adj, x, mode="ppr", order=4,
                                      alpha=0.2, backend="block"))
    got = np.asarray(exact_propagate(adj, x, mode="ppr", order=4,
                                     alpha=0.2, backend="block",
                                     precision="int8"))
    scale = max(np.abs(want).max(), 1e-9)
    assert np.max(np.abs(got - want)) / scale < 3e-2


def test_split_empty_graph():
    import scipy.sparse as sp
    from grandtpu.sparse.spmm import SplitCSR, spmm_split
    adj = sp.csr_matrix((12, 12), dtype=np.float32)
    x = np.random.RandomState(0).randn(12, 4).astype(np.float32)
    scsr = SplitCSR.from_scipy(adj, rows_per_block=4, pad_multiple=8)
    got = spmm_split(scsr, jnp.asarray(x), fast=False)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-7)


def test_propagator_block_backend_on_skewed_graph(skewed_adj_x):
    import scipy.sparse as sp
    from grandtpu.infer import Propagator
    adj, x = skewed_adj_x
    adj = (adj + sp.eye(adj.shape[0], format="csr")).tocsr()
    prop = Propagator(adj, backend="block")
    got = np.asarray(prop(x, mode="ppr", order=4, alpha=0.3, fast=False))
    # host reference loop (model.py:186-194 semantics)
    deg = np.asarray(adj.sum(1)).flatten()
    dia = (0.7 / np.maximum(deg, 1e-12)).astype(np.float32)
    cur = 0.3 * x
    want = cur.copy()
    for _ in range(4):
        cur = dia[:, None] * adj.dot(cur)
        want += cur
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_split_mega_hub_spans_multiple_chunks():
    """A single row heavier than max_eb must split across several overflow
    chunks sharing one output offset; the sequential RMW accumulate in
    spmm_block_offset sums them."""
    import scipy.sparse as sp
    from grandtpu.sparse.spmm import SplitCSR, spmm_split
    rs = np.random.RandomState(7)
    n = 1200
    hub_cols = rs.choice(n, 1000, replace=False)
    r = np.concatenate([np.full(1000, 77), rs.randint(0, n, 600)])
    c = np.concatenate([hub_cols, rs.randint(0, n, 600)])
    adj = sp.coo_matrix((rs.rand(r.size).astype(np.float32), (r, c)),
                        shape=(n, n)).tocsr()
    adj.sum_duplicates()
    x = rs.randn(n, 8).astype(np.float32)
    scsr = SplitCSR.from_scipy(adj, rows_per_block=64, pad_multiple=64,
                               max_eb=128)
    assert len(scsr.levels) == 1
    row0 = np.asarray(scsr.levels[0].row0)
    assert (row0 == (77 // 64) * 64).sum() >= 2, "hub must span >= 2 chunks"
    got = spmm_split(scsr, jnp.asarray(x), fast=False)
    np.testing.assert_allclose(np.asarray(got), adj.dot(x), atol=1e-4)


def test_row_values_if_constant():
    """D^-1 A qualifies; a perturbed row must be refused."""
    import scipy.sparse as sp
    from grandtpu.sparse.spmm import row_values_if_constant
    rs = np.random.RandomState(5)
    adj = sp.random(64, 64, density=0.1, format="csr", random_state=rs)
    adj = (adj + sp.eye(64, format="csr")).tocsr()
    adj.data[:] = 1.0   # binarize AFTER the self-loop add (random entries
    # can land on the diagonal; 2.0 there would rightly trigger refusal)
    deg = np.asarray(adj.sum(1)).flatten()
    a_norm = sp.diags(1.0 / deg).dot(adj).tocsr()
    rv = row_values_if_constant(a_norm)
    assert rv is not None
    np.testing.assert_allclose(rv, 1.0 / deg, rtol=1e-6)
    bad = a_norm.copy()
    bad.data[0] *= 2.0
    assert row_values_if_constant(bad) is None


def test_split_q8mxu_matches_q8(adj_x):
    """The int8-MXU variant (exact int8 x int8 -> int32 matmul, per-row
    value applied after) must track the same quantized result as the
    bf16-cast q8 kernel MINUS its bf16 rounding — i.e. at least as close
    to the float reference (measured on v5e: 1.8e-3 vs 4.3e-3 rel on the
    bench graph; bench/q8mxu_probe.py)."""
    import scipy.sparse as sp
    from grandtpu.sparse.spmm import (SplitCSR, row_values_if_constant,
                                      spmm_split_q8, spmm_split_q8mxu)
    adj, x = adj_x
    deg = np.asarray(adj.sum(1)).flatten()
    a_norm = sp.diags(1.0 / np.maximum(deg, 1e-12)).dot(adj).tocsr()
    rv = row_values_if_constant(a_norm)
    assert rv is not None
    scsr = SplitCSR.from_scipy(a_norm, rows_per_block=64, pad_multiple=128)
    n = adj.shape[0]
    n_pad = scsr.num_blocks * scsr.rows_per_block
    rv_pad = jnp.asarray(np.pad(rv, (0, n_pad - n)))
    xp = jnp.pad(jnp.asarray(x), ((0, n_pad - n), (0, 0)))
    want = a_norm.dot(x)
    scale = max(np.abs(want).max(), 1e-9)
    got_mxu = np.asarray(spmm_split_q8mxu(scsr, xp, rv_pad))[:n]
    got_q8 = np.asarray(spmm_split_q8(scsr, xp))[:n]
    err_mxu = np.max(np.abs(got_mxu - want)) / scale
    err_q8 = np.max(np.abs(got_q8 - want)) / scale
    # both kernels share the feature-quantization error; the MXU variant
    # additionally drops the bf16 rounding, but pointwise MAX error is not
    # mathematically ordered between them (rounding can cancel on the
    # argmax element, and the chip's matmul rounding differs from CPU's),
    # so gate each against the absolute fast-path bound instead of
    # against each other
    assert err_mxu < 2e-2, err_mxu
    assert err_q8 < 2e-2, err_q8


def test_propagator_int8_auto_upgrades_to_mxu(adj_x):
    """precision='int8' rides the MXU kernel when row values are constant
    (Propagator builds row_val for D^-1 A); 'int8mxu' must agree with it
    bit-for-bit, and still work through the ppr loop."""
    import scipy.sparse as sp
    from grandtpu.infer import Propagator
    adj, x = adj_x
    prop = Propagator(adj, backend="block")
    assert prop.row_val is not None
    a = np.asarray(prop(x, mode="ppr", order=3, alpha=0.2,
                        precision="int8"))
    b = np.asarray(prop(x, mode="ppr", order=3, alpha=0.2,
                        precision="int8mxu"))
    np.testing.assert_array_equal(a, b)
    want = np.asarray(prop(x, mode="ppr", order=3, alpha=0.2))
    scale = max(np.abs(want).max(), 1e-9)
    assert np.max(np.abs(a - want)) / scale < 3e-2
