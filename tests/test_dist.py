"""Multi-chip paths on the 8-device virtual CPU mesh: sharded propagation
parity, GSPMD-sharded train step execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grandtpu.dist import ShardedGraph, make_mesh, sharded_propagate
from grandtpu.infer import exact_propagate


@pytest.fixture(scope="module")
def graph_feats():
    from grandtpu.data import synthetic_graph
    import scipy.sparse as sp
    adj, feats, labels = synthetic_graph(num_nodes=200, num_classes=3,
                                         num_features=24, seed=9)
    return (adj + sp.eye(adj.shape[0], format="csr")).tocsr(), feats, labels


def test_eight_devices_available():
    assert len(jax.devices()) == 8, \
        "conftest must force 8 virtual CPU devices"


@pytest.mark.parametrize("mode", ["ppr", "avg", "single"])
def test_sharded_propagate_matches_single_chip(graph_feats, mode):
    adj, feats, _ = graph_feats
    mesh = make_mesh(n_data=8)
    g = ShardedGraph.build(adj, num_shards=8)
    got = sharded_propagate(mesh, g, feats, mode=mode, order=4, alpha=0.3)
    want = np.asarray(exact_propagate(adj, feats, mode=mode, order=4,
                                      alpha=0.3))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sharded_graph_covers_all_edges(graph_feats):
    adj, _, _ = graph_feats
    g = ShardedGraph.build(adj, num_shards=8)
    assert float(np.asarray(g.vals).sum()) == pytest.approx(adj.data.sum())


@pytest.mark.parametrize("mode", ["ppr", "avg", "single"])
def test_block_sharded_matches_single_chip(graph_feats, mode):
    """The one-hot-matmul sharded propagator (the production all_gather
    path since r3) == the single-chip exact result."""
    from grandtpu.dist import BlockShardedGraph, BlockShardedPropagator
    adj, feats, _ = graph_feats
    mesh = make_mesh(n_data=8)
    g = BlockShardedGraph.build(adj, num_shards=8, rows_per_block=8,
                                pad_multiple=16)
    got = BlockShardedPropagator(mesh, g)(feats, mode=mode, order=4,
                                          alpha=0.3)
    want = np.asarray(exact_propagate(adj, feats, mode=mode, order=4,
                                      alpha=0.3))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_block_sharded_int8_within_quant_tolerance(graph_feats):
    """int8-quantized collectives: result within the propagated
    quantization bound of the f32 sharded result."""
    from grandtpu.dist import BlockShardedGraph, BlockShardedPropagator
    adj, feats, _ = graph_feats
    mesh = make_mesh(n_data=8)
    g = BlockShardedGraph.build(adj, num_shards=8, rows_per_block=8,
                                pad_multiple=16)
    prop = BlockShardedPropagator(mesh, g)
    want = prop(feats, mode="ppr", order=4, alpha=0.3)
    got = prop(feats, mode="ppr", order=4, alpha=0.3, precision="int8")
    scale = max(np.abs(want).max(), 1e-9)
    assert np.max(np.abs(got - want)) / scale < 3e-2


def test_block_sharded_int8_uses_mxu_kernel_and_matches_single_chip(
        graph_feats):
    """On a row-constant operator (D^-1 A) the sharded int8 path runs the
    exact int8 x int8 -> int32 MXU matmul (same upgrade as single-chip
    spmm_split_q8mxu). Hop-1 agreement is 1 f32 ulp (verified while
    writing this); across 4 hops XLA's different fusion orders between
    the two programs let ulp noise flip occasional int8 round()
    boundaries, so the gate is one-quant-step scale (1e-3) — still 30x
    tighter than the generic 3e-2 quantization tolerance, which the
    bf16-cast kernel would need."""
    import scipy.sparse as sp
    from grandtpu.dist import BlockShardedGraph, BlockShardedPropagator
    from grandtpu.sparse.spmm import (SplitCSR, row_values_if_constant,
                                      spmm_split_q8mxu)
    adj, feats, _ = graph_feats
    n = adj.shape[0]
    mesh = make_mesh(n_data=8)
    g = BlockShardedGraph.build(adj, num_shards=8, rows_per_block=8,
                                pad_multiple=16)
    assert g.row_val is not None, "D^-1 A must be detected row-constant"
    got = BlockShardedPropagator(mesh, g)(feats, mode="ppr", order=4,
                                          alpha=0.3, precision="int8")

    # build D^-1 A with the same f32 rounding sequence as
    # BlockShardedGraph.build (f32 dinv folded per edge) — a 1-ulp
    # difference in row_val flips occasional int8 round() boundaries
    deg = np.asarray(adj.sum(1)).flatten()
    dinv32 = (1.0 / np.maximum(deg, 1e-12)).astype(np.float32)
    coo = adj.tocoo()
    a_norm = sp.csr_matrix(
        ((coo.data * dinv32[coo.row]).astype(np.float32),
         adj.indices.astype(np.int32), adj.indptr), shape=adj.shape)
    scsr = SplitCSR.from_scipy(a_norm, rows_per_block=16, pad_multiple=16)
    rv = row_values_if_constant(a_norm)
    n_pad = scsr.num_blocks * scsr.rows_per_block
    rv_pad = jnp.asarray(np.pad(rv, (0, n_pad - n)))

    x = jnp.asarray(feats)
    x0 = 0.3 * x
    cur, acc = x0, x0
    for _ in range(4):
        cur = 0.7 * spmm_split_q8mxu(
            scsr, jnp.pad(cur, ((0, n_pad - n), (0, 0)))[:n_pad],
            rv_pad)[:n]
        acc = acc + cur
    np.testing.assert_allclose(got, np.asarray(acc), rtol=1e-3, atol=1e-3)


def test_halo_int8_exchange_within_quant_tolerance(graph_feats):
    """int8-quantized halo all_to_all: only remote contributions carry
    quantization noise (diagonal stays f32)."""
    from grandtpu.dist.halo import HaloPropagator, HaloShardedGraph
    adj, feats, _ = graph_feats
    mesh = make_mesh(n_data=8)
    g = HaloShardedGraph.build(adj, num_shards=8, rows_per_block=8)
    prop = HaloPropagator(mesh, g)
    want = prop(feats, mode="ppr", order=4, alpha=0.3)
    got = prop(feats, mode="ppr", order=4, alpha=0.3, precision="int8")
    scale = max(np.abs(want).max(), 1e-9)
    assert np.max(np.abs(got - want)) / scale < 3e-2


def test_halo_int8_mxu_matches_numpy_oracle(graph_feats):
    """Pins the halo MXU branch at one-quant-step tolerance: exact-f32
    diagonal partial + int8 x int8 -> int32 halo contribution with the
    per-row value and global per-column scale applied after, replayed
    hop-for-hop in numpy (integer sums are exact in both, so agreement
    is limited only by f32 fusion-order ulp noise flipping occasional
    round() boundaries — the same bound as the BlockSharded test)."""
    import scipy.sparse as sp
    from grandtpu.dist.halo import HaloPropagator, HaloShardedGraph
    adj, feats, _ = graph_feats
    n = adj.shape[0]
    S, r, order, alpha = 8, 8, 4, 0.3
    mesh = make_mesh(n_data=8)
    g = HaloShardedGraph.build(adj, num_shards=S, rows_per_block=r)
    assert g.row_val is not None
    got = HaloPropagator(mesh, g)(feats, mode="ppr", order=order,
                                  alpha=alpha, precision="int8")

    # numpy replay with the same f32 rounding sequence as build
    deg = np.asarray(adj.sum(1)).flatten()
    dinv32 = (1.0 / np.maximum(deg, 1e-12)).astype(np.float32)
    coo = adj.tocoo()
    vals32 = (coo.data * dinv32[coo.row]).astype(np.float32)
    rows_per = g.rows_per_shard
    same = (coo.row // rows_per) == (coo.col // rows_per)
    a_diag = sp.csr_matrix((vals32[same], (coo.row[same], coo.col[same])),
                           shape=adj.shape)
    halo_cnt = sp.csr_matrix(
        (np.ones(int((~same).sum()), np.int64),
         (coo.row[~same], coo.col[~same])), shape=adj.shape)
    rv = dinv32  # row value of D^-1 A

    cur = (alpha * feats).astype(np.float32)
    acc = cur.copy()
    for _ in range(order):
        amax = np.max(np.abs(cur), axis=0)
        scale = np.where(amax > 0, amax / np.float32(127.0),
                         np.float32(1.0)).astype(np.float32)
        q = np.clip(np.round(cur / scale[None, :]), -127,
                    127).astype(np.int64)
        halo_part = (halo_cnt @ q).astype(np.float32) \
            * rv[:, None] * scale[None, :]
        diag_part = (a_diag @ cur.astype(np.float64)).astype(np.float32)
        cur = np.float32(1.0 - alpha) * (diag_part + halo_part)
        acc = acc + cur
    np.testing.assert_allclose(got, acc, rtol=1e-3, atol=1e-3)


def test_halo_int8cast_quantizes_exchange(graph_feats):
    """'int8cast' must quantize the halo exchange (legacy bf16-cast
    matmul), not silently fall back to f32 — its result has to sit
    between the f32 result and quantization noise, i.e. differ from f32
    but stay within the quant tolerance of the mxu-int8 result."""
    from grandtpu.dist.halo import HaloPropagator, HaloShardedGraph
    adj, feats, _ = graph_feats
    mesh = make_mesh(n_data=8)
    g = HaloShardedGraph.build(adj, num_shards=8, rows_per_block=8)
    prop = HaloPropagator(mesh, g)
    f32 = prop(feats, mode="ppr", order=4, alpha=0.3)
    cast = prop(feats, mode="ppr", order=4, alpha=0.3,
                precision="int8cast")
    mxu = prop(feats, mode="ppr", order=4, alpha=0.3, precision="int8")
    ref = max(np.abs(f32).max(), 1e-9)
    assert np.max(np.abs(cast - f32)) / ref > 1e-6, \
        "int8cast fell back to f32 (exchange not quantized)"
    assert np.max(np.abs(cast - mxu)) / ref < 3e-2


def test_block_sharded_covers_all_edges(graph_feats):
    from grandtpu.dist import BlockShardedGraph
    adj, _, _ = graph_feats
    deg = np.asarray(adj.sum(1)).flatten()
    dinv = 1.0 / np.maximum(deg, 1e-12)
    import scipy.sparse as sp
    want = sp.diags(dinv).dot(adj).sum()
    g = BlockShardedGraph.build(adj, num_shards=8, rows_per_block=8,
                                pad_multiple=16)
    assert float(np.asarray(g.vals).sum()) == pytest.approx(float(want))


def test_gspmd_sharded_train_step(graph_feats):
    """Full train step with batch/features/top-k sharded over the mesh:
    must compile, run, and produce finite metrics equal to single-device."""
    import scipy.sparse as sp
    from grandtpu.config import GrandConfig
    from grandtpu.dist.data_parallel import (shard_batch,
                                             shard_train_inputs)
    from grandtpu.nn.mlp import MLPConfig, init_mlp
    from grandtpu.ppr import gfpush
    from grandtpu.train.step import (StepConfig, build_train_step,
                                     make_optimizer)

    adj, feats, labels = graph_feats
    labels_int = labels.argmax(-1).astype(np.int32)
    sources = np.arange(0, 200)
    tk = gfpush(adj, sources, prop_mode="ppr", order=4, alpha=0.2,
                rmax=1e-6, k=8, backend="numpy")

    mlp_cfg = MLPConfig(num_features=24, num_classes=3, hidden=16,
                        nlayers=2, use_bn=True)
    step_cfg = StepConfig(mlp=mlp_cfg, k_aug=2, dropnode_rate=0.5,
                          n_train=32, lam=1.0, warmup=10.0, tem=0.1,
                          conf=2 / 3, loss_kind="l2", clip_norm=0.1)
    optimizer = make_optimizer(0.01, 1e-3)
    params, state = init_mlp(jax.random.PRNGKey(0), mlp_cfg)
    opt_state = optimizer.init(params)
    step = build_train_step(step_cfg, optimizer)

    batch_np = {
        "rows": np.arange(64, dtype=np.int32),
        "labels": labels_int[sources[:32]],
        "label_mask": np.ones(32, np.float32),
    }
    key = jax.random.PRNGKey(7)
    features = jnp.asarray(feats)
    tk_cols, tk_vals = jnp.asarray(tk.cols), jnp.asarray(tk.vals)

    # single-device reference
    p1, s1, o1, m1 = step(params, state, opt_state, features, tk_cols,
                          tk_vals, {k: jnp.asarray(v) for k, v in
                                    batch_np.items()},
                          key, jnp.float32(0))

    # sharded: batch over 'data' (8 ways: 64 and 32 both divide), features
    # row-sharded, tensor-parallel hidden
    mesh = make_mesh(n_data=4, n_model=2)
    pp, ss, oo, ff, tc, tv = shard_train_inputs(
        mesh, params=params, state=state, opt_state=opt_state,
        features=features, tk_cols=tk_cols, tk_vals=tk_vals,
        tensor_parallel=True)
    batch_sh = shard_batch(mesh, {k: jnp.asarray(v)
                                  for k, v in batch_np.items()})
    p2, s2, o2, m2 = step(pp, ss, oo, ff, tc, tv, batch_sh, key,
                          jnp.float32(0))

    for k in m1:
        assert np.isfinite(float(m1[k])) and np.isfinite(float(m2[k]))
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), atol=1e-4,
                                   err_msg=f"metric {k} diverged")
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_sharded_push_matches_single(graph_feats):
    """Source-sharded GFPush over the mesh == single-device jax push."""
    from grandtpu.dist.push import sharded_gfpush
    from grandtpu.ppr import build_coef
    from grandtpu.ppr.jax_push import gfpush_jax

    adj, _, _ = graph_feats
    coef = build_coef("ppr", order=5, alpha=0.3)
    sources = np.arange(0, 200, 2)  # 100 sources over 8 devices (padded)
    mesh = make_mesh(n_data=8, n_model=1)
    sc, sv = sharded_gfpush(mesh, adj.indptr, adj.indices, sources, coef,
                            1e-4, 8)
    jc, jv = gfpush_jax(adj.indptr, adj.indices, sources, coef, 1e-4, 8)
    np.testing.assert_allclose(sv, jv, atol=1e-5)
    # columns may differ only at value ties; compare via (col,val) maps
    for a_c, a_v, b_c, b_v in zip(sc, sv, jc, jv):
        da = {c: v for c, v in zip(a_c, a_v) if v > 0}
        db = {c: v for c, v in zip(b_c, b_v) if v > 0}
        for c, v in da.items():
            if c in db:
                np.testing.assert_allclose(v, db[c], atol=1e-5)


def test_trainer_num_devices(monkeypatch):
    """Full trainer with num_devices=8: runs sharded end to end, learns,
    and its FINAL test-time propagation demonstrably executes the
    row-partitioned mesh operator whose output matches single-chip
    (VERDICT r1 item 5). Batch sizes must divide the device count."""
    import grandtpu.dist as dist
    from grandtpu.config import GrandConfig
    from grandtpu.train import train

    calls = {}
    real = dist.dist_exact_propagate

    def spy(mesh, adj, feats, **kw):
        out = real(mesh, adj, feats, **kw)
        calls.setdefault("n", 0)
        calls["n"] += 1
        calls.update(out=out, adj=adj, feats=np.asarray(feats), kw=kw)
        return out

    monkeypatch.setattr(dist, "dist_exact_propagate", spy)
    cfg = GrandConfig(dataset="synth:240:3:16", epochs=20, patience=15,
                      order=4, alpha=0.2, rmax=1e-6, top_k=16, hidden=32,
                      batch_size=32, unlabel_batch_size=32, warmup=20.0,
                      eval_batch=5, push_backend="numpy", num_devices=8)
    r = train(cfg)
    assert r.test_acc > 0.7
    assert calls["n"] == 1, "trainer predict must use the sharded operator"
    want = np.asarray(exact_propagate(calls["adj"], calls["feats"],
                                      **calls["kw"]))
    np.testing.assert_allclose(np.asarray(calls["out"]), want, atol=1e-4)


def test_sparse_trainer_num_devices_sharded_predict(monkeypatch):
    """Sparse (MAG) engine with num_devices=8: the embedding-space final
    propagation runs through the row-partitioned mesh operator and matches
    single-chip (VERDICT r1 item 5, sparse half)."""
    import grandtpu.dist as dist
    from grandtpu.config import GrandConfig
    from grandtpu.train.trainer_sparse import train_sparse

    calls = {}
    real = dist.dist_exact_propagate

    def spy(mesh, adj, feats, **kw):
        out = real(mesh, adj, feats, **kw)
        calls.setdefault("n", 0)
        calls["n"] += 1
        calls.update(out=out, adj=adj, feats=np.asarray(feats), kw=kw)
        return out

    monkeypatch.setattr(dist, "dist_exact_propagate", spy)
    cfg = GrandConfig(dataset="synth:240:3:64:sparse", sparse_features=True,
                      epochs=10, patience=10, order=3, alpha=0.2, rmax=1e-6,
                      top_k=16, hidden=32, nlayers=2, batch_size=32,
                      unlabel_batch_size=32, warmup=20.0, eval_batch=5,
                      push_backend="numpy", num_devices=8)
    r = train_sparse(cfg)
    assert calls["n"] == 1
    # the sharded embedding-space propagation equals the single-chip one
    want = np.asarray(exact_propagate(calls["adj"], calls["feats"],
                                      **calls["kw"]))
    np.testing.assert_allclose(np.asarray(calls["out"]), want, atol=1e-4)
    assert r.test_acc > 0.5


def test_scaling_harness_runs():
    """Scaling sweep executes on the virtual mesh and reports efficiency
    (absolute numbers are meaningless on virtual devices — format check)."""
    from grandtpu.bench.scaling import bench_scaling
    res = bench_scaling(n=2000, avg_degree=8, f=32, order=2,
                        shard_counts=[1, 2, 4], repeats=1)
    assert [r["shards"] for r in res] == [1, 2, 4]
    assert all(r["edges_per_s"] > 0 for r in res)
    assert res[0]["scaling_efficiency"] == 1.0
    # the production one-hot variant runs through the same harness
    res_b = bench_scaling(n=2000, avg_degree=8, f=32, order=2,
                          shard_counts=[2], repeats=1, variant="block")
    assert res_b[0]["variant"] == "block"
    assert res_b[0]["edges_per_s"] > 0


@pytest.mark.parametrize("mode", ["ppr", "avg", "single"])
def test_halo_propagate_matches_single_chip(graph_feats, mode):
    """All-to-all halo exchange == all_gather variant == single chip."""
    from grandtpu.dist.halo import HaloPropagator, HaloShardedGraph

    adj, feats, _ = graph_feats
    mesh = make_mesh(n_data=8)
    g = HaloShardedGraph.build(adj, num_shards=8)
    assert 0 < g.compression <= 8.0
    prop = HaloPropagator(mesh, g)
    got = prop(feats, mode=mode, order=4, alpha=0.3)
    want = np.asarray(exact_propagate(adj, feats, mode=mode, order=4,
                                      alpha=0.3))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_halo_compression_wins_when_sparse():
    """Low-degree graph at high shard count: halo moves less than
    all_gather."""
    from grandtpu.dist.halo import HaloShardedGraph
    from grandtpu.data import synthetic_graph
    import scipy.sparse as sp
    adj, _, _ = synthetic_graph(num_nodes=4096, num_classes=4,
                                num_features=4, avg_degree=3, seed=1)
    adj = (adj + sp.eye(4096, format="csr")).tocsr()
    g = HaloShardedGraph.build(adj, num_shards=8)
    assert g.compression < 1.0, (
        f"expected halo win on sparse graph, got {g.compression:.2f}")


@pytest.mark.parametrize("avg_degree,shards", [(3, 8), (12, 4), (3, 2)])
def test_estimate_halo_compression_matches_build(avg_degree, shards):
    """The cheap pre-build estimator equals the ratio the full build
    reports — dist_exact_propagate's dispatch builds only one graph."""
    from grandtpu.dist.halo import (HaloShardedGraph,
                                    estimate_halo_compression)
    from grandtpu.data import synthetic_graph
    import scipy.sparse as sp
    adj, _, _ = synthetic_graph(num_nodes=1000, num_classes=4,
                                num_features=4, avg_degree=avg_degree,
                                seed=3)
    adj = (adj + sp.eye(1000, format="csr")).tocsr()
    est = estimate_halo_compression(adj, shards)
    g = HaloShardedGraph.build(adj, num_shards=shards)
    assert est == pytest.approx(g.compression)


def test_multihost_push_shards_union_to_full(graph_feats):
    """Rank-emulated source shards concatenate to the full native run,
    and the single-process wrapper degenerates to it exactly."""
    from grandtpu.dist.push import multihost_native_gfpush, push_source_shard
    from grandtpu.ppr import gfpush

    adj, _, _ = graph_feats
    sources = np.arange(0, 150, 3)  # 50 sources, world=4 -> shards 13/13/13/11
    kw = dict(prop_mode="ppr", order=5, alpha=0.3, rmax=1e-4, k=8)
    full = gfpush(adj, sources, backend="native", **kw)

    world = 4
    cols_parts, vals_parts, cover = [], [], 0
    for rank in range(world):
        lo, hi, c, v = push_source_shard(adj, sources, rank, world, **kw)
        assert lo == cover and c.shape == (hi - lo, 8)
        cover = hi
        cols_parts.append(c)
        vals_parts.append(v)
    assert cover == sources.shape[0]
    np.testing.assert_array_equal(np.concatenate(cols_parts), full.cols)
    np.testing.assert_array_equal(np.concatenate(vals_parts), full.vals)

    got = multihost_native_gfpush(adj, sources, **kw)  # process_count()==1
    np.testing.assert_array_equal(got.cols, full.cols)
    np.testing.assert_array_equal(got.vals, full.vals)
    assert got.num_nodes == full.num_nodes


def test_multihost_push_bucket_backend(graph_feats):
    """backend= threads through to the per-host kernel: bucket-push shards
    union to the full bucket run (each host could drive its own chip)."""
    from grandtpu.dist.push import multihost_native_gfpush, push_source_shard
    from grandtpu.ppr import gfpush

    adj, _, _ = graph_feats
    sources = np.arange(0, 120, 4)  # 30 sources, world=3 -> shards 10/10/10
    kw = dict(prop_mode="ppr", order=4, alpha=0.3, rmax=1e-4, k=8)
    full = gfpush(adj, sources, backend="bucket", **kw)

    parts = [push_source_shard(adj, sources, rank, 3, backend="bucket", **kw)
             for rank in range(3)]
    np.testing.assert_array_equal(
        np.concatenate([c for _, _, c, _ in parts]), full.cols)
    np.testing.assert_array_equal(
        np.concatenate([v for _, _, _, v in parts]), full.vals)

    got = multihost_native_gfpush(adj, sources, backend="bucket", **kw)
    np.testing.assert_array_equal(got.cols, full.cols)
    np.testing.assert_array_equal(got.vals, full.vals)


@pytest.mark.parametrize("emb_mode,mesh_shape", [("vocab", (8, 1)),
                                                 ("tp", (4, 2))])
def test_gspmd_sharded_sparse_step(emb_mode, mesh_shape):
    """Sparse (MAG) engine step with the embedding table sharded — vocab
    rows over 'data' or hidden over 'model' — equals single-device."""
    import scipy.sparse as sp
    from grandtpu.config import GrandConfig
    from grandtpu.dist.data_parallel import (shard_batch,
                                             shard_sparse_train_inputs)
    from grandtpu.nn.mlp import MLPConfig
    from grandtpu.nn.mag_mlp import init_mag_mlp
    from grandtpu.nn.sparse_input import PaddedFeatures
    from grandtpu.ppr import gfpush
    from grandtpu.train.step import make_optimizer
    from grandtpu.train.trainer_sparse import _build_sparse_steps

    rs = np.random.RandomState(3)
    n, vocab = 200, 30   # vocab deliberately not divisible by 8
    feats = sp.random(n, vocab, density=0.15, format="csr",
                      random_state=rs, dtype=np.float32)
    feats.data[:] = np.abs(feats.data) + 0.1
    from grandtpu.data import synthetic_graph
    adj, _, labels = synthetic_graph(num_nodes=n, num_classes=3,
                                     num_features=4, seed=5)
    adj = (adj + sp.eye(n, format="csr")).tocsr()
    tk = gfpush(adj, np.arange(n), prop_mode="ppr", order=4, alpha=0.2,
                rmax=1e-6, k=8, backend="numpy")
    padded = PaddedFeatures.from_csr(feats)

    cfg = GrandConfig(dataset="x", batch_size=32, unlabel_batch_size=32,
                      sample=2, dropnode_rate=0.5, lam=1.0, warmup=10.0,
                      tem=0.1, loss="l2", clip_norm=0.1, hidden=16,
                      nlayers=2, use_bn=True, input_droprate=0.0)
    mlp_cfg = MLPConfig(num_features=vocab, num_classes=3, hidden=16,
                        nlayers=2, use_bn=True)
    optimizer = make_optimizer(0.01, 1e-3)
    params, state = init_mag_mlp(jax.random.PRNGKey(0), mlp_cfg)
    opt_state = optimizer.init(params)
    train_step, _ = _build_sparse_steps(mlp_cfg, cfg, optimizer, 3)

    attr_cols = jnp.asarray(padded.attr_cols)
    attr_vals = jnp.asarray(padded.attr_vals)
    tk_cols, tk_vals = jnp.asarray(tk.cols), jnp.asarray(tk.vals)
    batch_np = {"rows": np.arange(64, dtype=np.int32),
                "labels": labels.argmax(-1)[:32].astype(np.int32),
                "label_mask": np.ones(32, np.float32)}
    key = jax.random.PRNGKey(7)

    p1, s1, o1, l1 = train_step(
        params, state, opt_state, attr_cols, attr_vals, tk_cols, tk_vals,
        {k: jnp.asarray(v) for k, v in batch_np.items()}, key,
        jnp.float32(0))

    mesh = make_mesh(n_data=mesh_shape[0], n_model=mesh_shape[1])
    pp, ss, oo, ac, av, tc, tv = shard_sparse_train_inputs(
        mesh, params=params, state=state, opt_state=opt_state,
        attr_cols=attr_cols, attr_vals=attr_vals, tk_cols=tk_cols,
        tk_vals=tk_vals, emb_mode=emb_mode)
    batch_sh = shard_batch(mesh, {k: jnp.asarray(v)
                                  for k, v in batch_np.items()})
    p2, s2, o2, l2 = train_step(pp, ss, oo, ac, av, tc, tv, batch_sh, key,
                                jnp.float32(0))

    np.testing.assert_allclose(float(l1), float(l2), atol=1e-4)
    # vocab mode row-pads the table to a divisible size; compare real rows
    np.testing.assert_allclose(
        np.asarray(p2["emb"]["table"])[:vocab],
        np.asarray(p1["emb"]["table"]), atol=1e-4)
    for part in ("fcs", "bns"):
        for a, b in zip(jax.tree.leaves(p1[part]),
                        jax.tree.leaves(p2[part])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


def _dispatch_branch(monkeypatch, adj, feats, processes):
    """Run dist_exact_propagate with default halo_threshold under a faked
    process count; return which exchange variant it built."""
    import grandtpu.dist.spmm_shard as shard_mod
    from grandtpu.dist.halo import HaloShardedGraph

    built = []
    real_halo, real_block = (HaloShardedGraph.build,
                             shard_mod.BlockShardedGraph.build)
    monkeypatch.setattr(
        "grandtpu.dist.halo.HaloShardedGraph.build",
        staticmethod(lambda *a, **k: (built.append("halo"),
                                      real_halo(*a, **k))[1]))
    monkeypatch.setattr(
        shard_mod.BlockShardedGraph, "build",
        staticmethod(lambda *a, **k: (built.append("block"),
                                      real_block(*a, **k))[1]))
    monkeypatch.setattr(shard_mod.jax, "process_count",
                        lambda: processes)
    mesh = make_mesh(n_data=8)
    out = shard_mod.dist_exact_propagate(mesh, adj, feats, mode="ppr",
                                         order=3, alpha=0.2)
    want = np.asarray(exact_propagate(adj, feats, mode="ppr", order=3,
                                      alpha=0.2))
    np.testing.assert_allclose(out, want, atol=1e-4)
    assert len(built) == 1, "dispatch must build exactly one sharded graph"
    return built[0]


def test_dispatch_fabric_default_single_process(monkeypatch):
    """VERDICT r4 #5: on a single-process mesh the default dispatch takes
    all_gather UNCONDITIONALLY — even on a graph whose halo compression is
    well under 0.5 — because the r4 crossover sweep measured all_gather
    winning every cell on shared-memory/single-host fabrics."""
    from grandtpu.data import synthetic_graph
    from grandtpu.dist.halo import estimate_halo_compression
    import scipy.sparse as sp
    adj, feats, _ = synthetic_graph(num_nodes=4096, num_classes=4,
                                    num_features=8, avg_degree=3, seed=1)
    adj = (adj + sp.eye(4096, format="csr")).tocsr()
    assert estimate_halo_compression(adj, 8) < 0.5   # halo-eligible graph
    assert _dispatch_branch(monkeypatch, adj, feats, processes=1) == "block"


def test_dispatch_fabric_default_multi_process(monkeypatch):
    """On a multi-process mesh (real ICI/DCN) the 0.5 compression
    threshold engages, so the same halo-eligible graph routes to the halo
    exchange."""
    from grandtpu.data import synthetic_graph
    import scipy.sparse as sp
    adj, feats, _ = synthetic_graph(num_nodes=4096, num_classes=4,
                                    num_features=8, avg_degree=3, seed=1)
    adj = (adj + sp.eye(4096, format="csr")).tocsr()
    assert _dispatch_branch(monkeypatch, adj, feats, processes=2) == "halo"


def test_sharded_propagator_precision_validation(graph_feats):
    """ADVICE r4: unknown precision strings raise in the propagators
    themselves (not just the dist_exact_propagate entry point), and the
    single-chip 'int8mxu' spelling maps to the sharded 'int8' path."""
    from grandtpu.dist import BlockShardedGraph, BlockShardedPropagator
    from grandtpu.dist.halo import HaloPropagator, HaloShardedGraph

    adj, feats, _ = graph_feats
    mesh = make_mesh(n_data=8)
    bp = BlockShardedPropagator(mesh, BlockShardedGraph.build(
        adj, num_shards=8, rows_per_block=8, pad_multiple=16))
    hp = HaloPropagator(mesh, HaloShardedGraph.build(adj, num_shards=8))
    for prop in (bp, hp):
        with pytest.raises(ValueError, match="unknown precision"):
            prop(feats, order=2, precision="int9")
    want = np.asarray(exact_propagate(adj, feats, mode="ppr", order=3,
                                      alpha=0.3))
    for prop in (bp, hp):
        got = prop(feats, mode="ppr", order=3, alpha=0.3,
                   precision="int8mxu")
        np.testing.assert_allclose(got, want, atol=3e-2)
