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
