"""Pallas kernel tests (interpret mode on CPU; the same code compiles for
TPU — bench.py exercises the compiled path on hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ON_TPU = jax.default_backend() == "tpu"
needs_tpu = pytest.mark.skipif(
    not ON_TPU, reason="interpret-mode pltpu PRNG returns zeros; "
    "mask statistics need real hardware (covered by bench.py)")

from grandtpu.nn.dropnode import random_prop
from grandtpu.ops import dropnode_aggregate


@pytest.fixture()
def bkf():
    rs = np.random.RandomState(0)
    b, k, f = 16, 8, 128
    feats = jnp.asarray(rs.rand(b, k, f).astype(np.float32))
    vals = jnp.asarray(np.abs(rs.rand(b, k)).astype(np.float32))
    return feats, vals


def test_eval_mode_matches_xla(bkf):
    """p=0: deterministic weighted mean must equal the XLA op exactly."""
    feats, vals = bkf
    want = random_prop(feats, vals, training=False)
    got = dropnode_aggregate(feats, vals, jnp.int32(0), dropnode_rate=0.0,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@needs_tpu
def test_dropnode_statistics(bkf):
    """p=0.5 masks roughly half the weights; output stays a convex-ish
    combination (bounded by feats range) and is deterministic per seed."""
    feats, vals = bkf
    a = dropnode_aggregate(feats, vals, jnp.int32(7), dropnode_rate=0.5)
    b = dropnode_aggregate(feats, vals, jnp.int32(7), dropnode_rate=0.5)
    c = dropnode_aggregate(feats, vals, jnp.int32(8), dropnode_rate=0.5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert np.isfinite(np.asarray(a)).all()
    assert np.asarray(a).max() <= float(feats.max()) + 1e-5
    assert np.asarray(a).min() >= float(feats.min()) - 1e-5


@needs_tpu
def test_mask_rate_is_calibrated():
    """Empirical drop rate over a large [B, K] grid ~ p."""
    b, k, f = 64, 128, 128
    feats = jnp.ones((b, k, f), jnp.float32)
    vals = jnp.ones((b, k), jnp.float32)
    for p in (0.25, 0.5, 0.75):
        # with all-ones vals and feats, out = 1 whenever any weight
        # survives; use the denominator instead: reconstruct survivor count
        # via out of feats=survivor-count trick
        out = dropnode_aggregate(
            feats * jnp.arange(1, k + 1, dtype=jnp.float32)[None, :, None],
            vals, jnp.int32(3), dropnode_rate=p)
        # can't invert exactly; just check output finite and plausible
        assert np.isfinite(np.asarray(out)).all()
    # direct calibration: mean weighted output of indicator features
    p = 0.5
    ind = jnp.eye(k, dtype=jnp.float32)[None].repeat(b, axis=0)  # [B,K,K]
    out = dropnode_aggregate(ind, vals, jnp.int32(11),
                             dropnode_rate=p)  # row b = survivors/count
    survive_frac = float((np.asarray(out) > 0).sum()) / (b * k)
    assert abs(survive_frac - (1 - p)) < 0.05
