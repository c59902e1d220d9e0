"""precision="auto" — the productized round-3 finding that the int8/bf16
ranking inverts with working-set size (RESULTS.md 5M-node study).

auto resolves through three layers:
  1. ``Propagator.calibrate()`` — timed on-device autotune, accuracy-gated
     against the f32 run on the real operands (cached per operator);
  2. otherwise ``choose_fast_precision`` — the measured working-set
     heuristic (int8 <= 1GiB f32 carry, bf16 above);
  3. non-block backends ignore precision and pin f32.
"""

import numpy as np
import pytest

from grandtpu.infer import Propagator, choose_fast_precision, exact_propagate
from grandtpu.infer.propagate import INT8_MAX_WORKING_SET_BYTES


def test_heuristic_crossover():
    # 300K x 128 f32 = 153MB — the measured int8-wins regime
    assert choose_fast_precision(300_000, 128) == "int8"
    # 5M x 128 f32 = 2.56GB — the measured bf16-wins regime
    assert choose_fast_precision(5_000_000, 128) == "bf16"
    # exactly at the documented threshold still counts as small
    rows = INT8_MAX_WORKING_SET_BYTES // (128 * 4)
    assert choose_fast_precision(rows, 128) == "int8"
    assert choose_fast_precision(rows + 1, 128) == "bf16"


def test_exact_propagate_auto_matches_f32(small_graph):
    adj, feats, _ = small_graph
    ref = np.asarray(exact_propagate(adj, feats, mode="ppr", order=4,
                                     backend="block"))
    out = np.asarray(exact_propagate(adj, feats, mode="ppr", order=4,
                                     backend="block", precision="auto"))
    scale = max(np.max(np.abs(ref)), 1e-9)
    # auto resolves to a fast path here (tiny working set -> int8); it
    # must stay inside the fast-path tolerance bench.py enforces
    assert np.max(np.abs(out - ref)) / scale < 5e-3


def test_propagator_auto_uses_heuristic_before_calibration(small_graph):
    adj, feats, _ = small_graph
    prop = Propagator(adj, backend="block")
    assert prop._auto_precision is None
    expect = choose_fast_precision(adj.shape[0], feats.shape[1])
    auto = np.asarray(prop(feats, mode="avg", order=3, precision="auto"))
    manual = np.asarray(prop(feats, mode="avg", order=3, precision=expect))
    np.testing.assert_array_equal(auto, manual)


def test_calibrate_picks_gated_candidate_and_caches(small_graph):
    adj, feats, _ = small_graph
    prop = Propagator(adj, backend="block")
    choice = prop.calibrate(feats, order=3, repeats=1)
    assert choice in ("bf16", "int8", "f32")
    assert prop._auto_precision == choice
    # auto now routes through the cached calibration choice
    auto = np.asarray(prop(feats, mode="ppr", order=3, precision="auto"))
    manual = np.asarray(prop(feats, mode="ppr", order=3, precision=choice))
    np.testing.assert_array_equal(auto, manual)


def test_calibrate_gate_zero_falls_back_to_f32(small_graph):
    # an impossible accuracy gate rejects every fast candidate — auto must
    # degrade to the exact path, never to an ungated one
    adj, feats, _ = small_graph
    prop = Propagator(adj, backend="block")
    assert prop.calibrate(feats, order=3, repeats=1, gate=0.0) == "f32"
    assert prop._auto_precision == "f32"


def test_dense_backend_auto_is_f32(small_graph):
    adj, feats, _ = small_graph
    prop = Propagator(adj)   # n=120 -> dense backend
    assert prop.backend == "dense"
    assert prop.calibrate(feats) == "f32"
    out = np.asarray(prop(feats, mode="single", order=2, precision="auto"))
    ref = np.asarray(prop(feats, mode="single", order=2))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


@pytest.mark.parametrize("num_shards", [4])
def test_dist_auto_resolves_and_matches_single_chip(small_graph, num_shards):
    import jax

    from grandtpu.dist import dist_exact_propagate, make_mesh

    if len(jax.devices()) < num_shards:
        pytest.skip("needs the virtual multi-device mesh")
    adj, feats, _ = small_graph
    mesh = make_mesh(n_data=num_shards, n_model=1)
    out = np.asarray(dist_exact_propagate(mesh, adj, feats, mode="ppr",
                                          order=3, precision="auto"))
    # auto resolves to a fast path (tiny graph -> int8, whose sharded
    # variant quantizes per shard, so compare against exact f32 with the
    # fast-path gate rather than expecting bitwise int8 equality)
    ref = np.asarray(exact_propagate(adj, feats, mode="ppr", order=3,
                                     backend="block"))
    scale = max(np.max(np.abs(ref)), 1e-9)
    assert np.max(np.abs(out - ref)) / scale < 5e-3


@pytest.fixture(scope="module")
def skew_graph():
    """Mini version of the bench/skew_probe.py construction: a uniform base
    graph plus hub rows whose nnz clears the int8 skew-guard threshold."""
    import scipy.sparse as sp
    from grandtpu.data import synthetic_graph
    from grandtpu.infer.propagate import INT8_MAX_HUB_DEGREE

    n, hub_deg = 10_000, 9_000
    assert hub_deg >= INT8_MAX_HUB_DEGREE
    adj, feats, _ = synthetic_graph(num_nodes=n, num_classes=4,
                                    num_features=64, avg_degree=4, seed=11)
    rs = np.random.RandomState(7)
    hub_rows = np.repeat(rs.choice(n, 2, replace=False), hub_deg)
    # without replacement per hub so the realized row nnz equals hub_deg
    hub_cols = np.concatenate([rs.permutation(n)[:hub_deg]
                               for _ in range(2)])
    hubs = sp.coo_matrix((np.ones(hub_rows.size, np.float32),
                          (hub_rows, hub_cols)), shape=adj.shape)
    adj = (adj + hubs.tocsr() + sp.eye(n, format="csr")).tocsr()
    adj.data[:] = 1.0
    return adj, feats


def test_heuristic_skew_guard():
    """VERDICT r4 #2: the working-set heuristic must not pick int8 when a
    hub row's accumulation length approaches the measured accuracy hazard
    (rel err 4.99-5.03e-3 at degree 15K/F=128, AT the 5e-3 gate)."""
    from grandtpu.infer.propagate import INT8_MAX_HUB_DEGREE
    # small working set, benign degrees: int8 as before
    assert choose_fast_precision(300_000, 128, max_degree=100) == "int8"
    # same working set, hub at/over the guard: bf16
    assert choose_fast_precision(
        300_000, 128, max_degree=INT8_MAX_HUB_DEGREE) == "bf16"
    assert choose_fast_precision(300_000, 128, max_degree=15_000) == "bf16"
    # unknown degree preserves the legacy working-set-only behavior
    assert choose_fast_precision(300_000, 128) == "int8"


def test_auto_never_busts_gate_on_skew_graph(skew_graph):
    """On the skew-probe construction, auto resolves away from int8 (the
    Propagator records its operator's max row nnz) and the path it does
    take stays inside the 5e-3 fast-path gate vs exact f32."""
    adj, feats = skew_graph
    prop = Propagator(adj, backend="block")
    assert prop.max_degree >= 9_000
    ref = np.asarray(prop(feats, mode="ppr", order=4))
    auto = np.asarray(prop(feats, mode="ppr", order=4, precision="auto"))
    bf16 = np.asarray(prop(feats, mode="ppr", order=4, precision="bf16"))
    np.testing.assert_array_equal(auto, bf16)   # guard routed to bf16
    scale = max(np.max(np.abs(ref)), 1e-9)
    assert np.max(np.abs(auto - ref)) / scale < 5e-3


def test_exact_propagate_auto_skew_guard(skew_graph):
    """The one-shot entry point applies the same guard (it resolves auto
    BEFORE the operator build)."""
    adj, feats = skew_graph
    ref = np.asarray(exact_propagate(adj, feats, mode="ppr", order=3,
                                     backend="block"))
    out = np.asarray(exact_propagate(adj, feats, mode="ppr", order=3,
                                     backend="block", precision="auto"))
    want = np.asarray(exact_propagate(adj, feats, mode="ppr", order=3,
                                      backend="block", precision="bf16"))
    np.testing.assert_array_equal(out, want)
    scale = max(np.max(np.abs(ref)), 1e-9)
    assert np.max(np.abs(out - ref)) / scale < 5e-3


def test_bf16_carry_mode(small_graph):
    """'bf16_carry' (the MAG-scale memory backoff) propagates in bf16
    carries: output dtype is bf16, values track f32 within the bf16
    accumulation tolerance, and the plain Propagator rejects the string
    (it is an exact_propagate-level mapping)."""
    import jax.numpy as jnp

    adj, feats, _ = small_graph
    ref = np.asarray(exact_propagate(adj, feats, mode="ppr", order=5,
                                     backend="block"))
    out = exact_propagate(adj, feats, mode="ppr", order=5, backend="block",
                          precision="bf16_carry")
    assert out.dtype == jnp.bfloat16
    scale = max(np.max(np.abs(ref)), 1e-9)
    # bf16 carries accumulate error per hop; measured 1.2e-2 at order 10
    # on a 5K graph — order 5 on the small graph stays well inside 2e-2
    assert np.max(np.abs(np.asarray(out, np.float32) - ref)) / scale < 2e-2
    with pytest.raises(ValueError, match="unknown precision"):
        Propagator(adj, backend="block")(feats, precision="bf16_carry")


def test_trainer_predict_precision_threads(tmp_path):
    """cfg.predict_precision reaches the dense trainer's final
    propagation (spy asserts the call) and a fast setting keeps e2e
    accuracy."""
    import grandtpu.infer.propagate as prop_mod
    from grandtpu.config import GrandConfig
    from grandtpu.train import train

    seen = {}
    real = prop_mod.exact_propagate

    def spy(*a, **kw):
        seen.update(kw)
        return real(*a, **kw)

    # trainer.py imports exact_propagate at module level
    import grandtpu.train.trainer as trainer_mod
    orig = trainer_mod.exact_propagate
    trainer_mod.exact_propagate = spy
    try:
        cfg = GrandConfig(dataset="synth:240:3:16", epochs=10, patience=8,
                          order=4, top_k=16, hidden=32, batch_size=32,
                          unlabel_batch_size=32, warmup=20.0, eval_batch=5,
                          push_backend="numpy", predict_precision="auto")
        r = train(cfg)
    finally:
        trainer_mod.exact_propagate = orig
    assert seen.get("precision") == "auto"
    assert r.test_acc > 0.6
