"""End-to-end training tests: both engines learn; inference parity with a
numpy power-iteration oracle; checkpoint round trip."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from grandtpu.config import GrandConfig
from grandtpu.infer import exact_propagate
from grandtpu.train import train
from grandtpu.train.trainer_sparse import train_sparse


def _fast_cfg(**kw):
    base = dict(dataset="synth:240:3:16", epochs=30, patience=15,
                order=4, alpha=0.2, rmax=1e-6, top_k=16, hidden=32,
                batch_size=32, unlabel_batch_size=48, warmup=30.0,
                lam=1.0, eval_batch=5, push_backend="numpy")
    base.update(kw)
    return GrandConfig(**base)


def test_dense_engine_learns():
    r = train(_fast_cfg())
    assert r.test_acc > 0.8
    assert r.num_batches > 10
    assert r.batch_time_avg > 0


def test_dense_engine_bn_nodenorm_clip():
    r = train(_fast_cfg(use_bn=True, node_norm=True, clip_norm=0.1,
                        nlayers=3, loss="kl", stop_mode="acc"))
    assert r.test_acc > 0.7


def test_sparse_engine_learns():
    r = train_sparse(_fast_cfg(dataset="synth:240:3:64:sparse",
                               sparse_features=True, nlayers=2,
                               input_droprate=0.2, hidden_droprate=0.2,
                               weight_decay=1e-4))
    assert r.test_acc > 0.7


def test_one_layer_mlp_variant():
    r = train(_fast_cfg(nlayers=1, use_bn=True))
    assert r.test_acc > 0.6


@pytest.mark.parametrize("mode", ["ppr", "avg", "single"])
def test_exact_propagate_matches_numpy(mode, small_graph):
    """Device power iteration vs the reference numpy formulas
    (model.py:186-210) re-run here with scipy."""
    adj, feats, _ = small_graph
    order, alpha = 5, 0.3
    x = np.asarray(feats, np.float64)
    deg = np.asarray(adj.sum(1)).flatten()
    if mode == "ppr":
        cur = alpha * x
        acc = cur.copy()
        dia = (1 - alpha) / np.maximum(deg, 1e-12)
        for _ in range(order):
            cur = dia[:, None] * adj.dot(cur)
            acc += cur
        want = acc
    elif mode == "avg":
        cur, acc = x.copy(), x.copy()
        dinv = 1 / np.maximum(deg, 1e-12)
        for _ in range(order):
            cur = dinv[:, None] * adj.dot(cur)
            acc += cur
        want = acc / (order + 1)
    else:
        cur = x.copy()
        dinv = 1 / np.maximum(deg, 1e-12)
        for _ in range(order):
            cur = dinv[:, None] * adj.dot(cur)
        want = cur

    got = exact_propagate(adj, feats, mode=mode, order=order, alpha=alpha)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    # sparse path (padded-edge segment sum) agrees with the dense path
    got_sparse = exact_propagate(adj, feats, mode=mode, order=order,
                                 alpha=alpha, dense_threshold=0)
    np.testing.assert_allclose(np.asarray(got_sparse), want, atol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    from grandtpu.nn.mlp import MLPConfig, init_mlp
    from grandtpu.train.step import make_optimizer
    from grandtpu.train.checkpoint import save_checkpoint, load_checkpoint

    cfg = MLPConfig(num_features=8, num_classes=3, hidden=4, nlayers=2,
                    use_bn=True)
    params, state = init_mlp(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3, 1e-4)
    opt_state = opt.init(params)
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, params=params, state=state, opt_state=opt_state,
                    num_batch=17, best_val_acc=0.9)
    p2, s2, o2, meta = load_checkpoint(
        p, params_template=params, state_template=state, opt_template=opt_state)
    assert meta["num_batch"] == 17 and meta["best_val_acc"] == 0.9
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_restore_slices_row_padded_tables(tmp_path):
    """A checkpoint saved from a vocab-sharded run holds a row-padded
    embedding table; restoring into the unpadded template slices the
    padding — but ONLY for leaves the save recorded as row-padded
    (everything else is a hard typed error, never a silent truncation)."""
    from grandtpu.train.checkpoint import (CheckpointShapeError,
                                           load_checkpoint, row_padded_meta,
                                           save_checkpoint)

    tmpl = {"emb": {"table": np.zeros((30, 4), np.float32)},
            "head": {"b": np.zeros(30, np.float32)}}
    padded = {"emb": {"table": np.arange(32 * 4, dtype=np.float32)
                      .reshape(32, 4)},
              "head": {"b": np.zeros(30, np.float32)}}
    rp = row_padded_meta({"params": tmpl}, {"params": padded})
    assert list(rp.values()) == [30] and "table" in list(rp)[0]
    state = {"s": np.zeros(1, np.float32)}
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, params=padded, state=state, row_padded=rp)
    got, _, _, _ = load_checkpoint(p, params_template=tmpl,
                                   state_template=state)
    np.testing.assert_array_equal(np.asarray(got["emb"]["table"]),
                                  padded["emb"]["table"][:30])
    # a genuinely wrong shape fails with a typed error naming the leaf
    bad = {"emb": {"table": np.zeros((30, 5), np.float32)},
           "head": {"b": np.zeros(30, np.float32)}}
    with pytest.raises(CheckpointShapeError, match="table"):
        load_checkpoint(p, params_template=bad, state_template=state)
    # an UNRECORDED oversize leaf must not silently slice: restoring this
    # checkpoint into a smaller-hidden template (1-D bias) hard-fails
    small = {"emb": {"table": np.zeros((30, 4), np.float32)},
             "head": {"b": np.zeros(16, np.float32)}}
    with pytest.raises(CheckpointShapeError, match="b"):
        load_checkpoint(p, params_template=small, state_template=state)


def test_checkpoint_without_row_pad_record_never_slices(tmp_path):
    """Saving without row_padded meta (the default) makes ANY shape
    mismatch a typed error — the ADVICE r1 silent-truncation hazard."""
    from grandtpu.train.checkpoint import (CheckpointShapeError,
                                           load_checkpoint, save_checkpoint)
    params = {"w": np.zeros((32, 4), np.float32)}
    state = {"s": np.zeros(1, np.float32)}
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, params=params, state=state)
    tmpl = {"w": np.zeros((30, 4), np.float32)}
    with pytest.raises(CheckpointShapeError, match="w"):
        load_checkpoint(p, params_template=tmpl, state_template=state)


def test_checkpoint_roundtrip_orbax(tmp_path):
    """orbax backend stores the same flat dict; load auto-detects the
    directory layout (no backend arg needed at restore)."""
    from grandtpu.nn.mlp import MLPConfig, init_mlp
    from grandtpu.train.step import make_optimizer
    from grandtpu.train.checkpoint import save_checkpoint, load_checkpoint

    cfg = MLPConfig(num_features=8, num_classes=3, hidden=4, nlayers=2,
                    use_bn=True)
    params, state = init_mlp(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3, 1e-4)
    opt_state = opt.init(params)
    p = str(tmp_path / "ckpt.npz")   # .npz suffix stripped for the dir
    save_checkpoint(p, params=params, state=state, opt_state=opt_state,
                    num_batch=17, best_val_acc=0.9, backend="orbax")
    assert (tmp_path / "ckpt").is_dir()
    p2, s2, o2, meta = load_checkpoint(
        p, params_template=params, state_template=state,
        opt_template=opt_state)
    assert meta["num_batch"] == 17 and meta["best_val_acc"] == 0.9
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # overwrite must not fail (best.npz is rewritten on every improvement)
    save_checkpoint(p, params=params, state=state, num_batch=18,
                    backend="orbax")
    _, _, _, meta = load_checkpoint(p, params_template=params,
                                    state_template=state)
    assert meta["num_batch"] == 18


def test_forward_k_bn_fold_matches_sequential():
    """With BN on, the vmapped K-augmentation forward + closed-form EMA
    fold must equal K explicit sequential torch-style forwards (r3
    replaced the lax.scan; exactness to fp rounding)."""
    from grandtpu.nn.dropnode import random_prop
    from grandtpu.nn.mlp import MLPConfig, apply_mlp, init_mlp
    from grandtpu.train.step import StepConfig, _forward_k

    rs = np.random.RandomState(0)
    b, ktop, f, c = 24, 8, 32, 4
    mlp_cfg = MLPConfig(num_features=f, num_classes=c, hidden=16,
                        nlayers=2, use_bn=True, input_droprate=0.3,
                        hidden_droprate=0.3)
    cfg = StepConfig(mlp=mlp_cfg, k_aug=3, dropnode_rate=0.5, n_train=b,
                     lam=1.0, warmup=10.0, tem=0.1, conf=0.5,
                     loss_kind="l2", clip_norm=-1.0)
    params, state = init_mlp(jax.random.PRNGKey(0), mlp_cfg)
    features = jnp.asarray(rs.rand(100, f).astype(np.float32))
    cols = jnp.asarray(rs.randint(0, 100, (b, ktop)).astype(np.int32))
    vals = jnp.asarray(rs.rand(b, ktop).astype(np.float32))
    key = jax.random.PRNGKey(7)

    logps, new_state = _forward_k(params, state, cfg, features, cols,
                                  vals, key, training=True)

    # explicit sequential reference (the pre-r3 scan semantics)
    keys = jax.random.split(key, cfg.k_aug)
    seq_state = state
    seq_logps = []
    feats = jnp.take(features, cols, axis=0)
    for k in keys:
        k_drop, k_mlp = jax.random.split(k)
        x = random_prop(feats, vals, key=k_drop, dropnode_rate=0.5,
                        training=True)
        logits, seq_state = apply_mlp(params, seq_state, mlp_cfg,
                                      jax.lax.stop_gradient(x), key=k_mlp,
                                      training=True)
        seq_logps.append(jax.nn.log_softmax(logits, axis=-1))

    np.testing.assert_allclose(np.asarray(logps),
                               np.asarray(jnp.stack(seq_logps)),
                               atol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(new_state),
                     jax.tree_util.tree_leaves(seq_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)


def test_scan_steps_matches_per_step_trajectory():
    """Grouped lax.scan stepping must follow the exact same training
    trajectory (same per-step keys, eval schedule, early stop) as the
    per-call path."""
    from grandtpu.config import preset
    from grandtpu.train import train
    cfg = preset("cora").replace(epochs=12, patience=4)
    r1 = train(cfg.replace(scan_steps=True))
    r2 = train(cfg.replace(scan_steps=False))
    assert r1.test_acc == r2.test_acc
    assert r1.num_batches == r2.num_batches


def test_padded_partial_batch_step_equals_true_batch():
    """VERDICT r1 item 1: a wrap-padded partial train batch (static shape)
    must produce the SAME loss, parameter update, and BN running stats as a
    step on the true smaller batch (what the reference feeds, model.py:303).
    Deterministic config (dropout/dropnode off) so the only difference is
    the padding itself."""
    from grandtpu.nn.mlp import MLPConfig, init_mlp
    from grandtpu.train.step import StepConfig, build_train_step, \
        make_optimizer

    rs = np.random.RandomState(0)
    n, f, c, ktop, ubs = 60, 12, 4, 6, 10
    nt_true, nt_pad = 5, 8
    features = jnp.asarray(rs.rand(n, f).astype(np.float32))
    n_src = 40
    tk_cols = jnp.asarray(rs.randint(0, n, (n_src, ktop)).astype(np.int32))
    tk_vals = jnp.asarray(rs.rand(n_src, ktop).astype(np.float32))

    mlp = dict(num_features=f, num_classes=c, hidden=16, nlayers=2,
               use_bn=True, node_norm=True)
    common = dict(k_aug=2, dropnode_rate=0.0, lam=1.0, warmup=10.0,
                  tem=0.1, conf=2.0 / c, loss_kind="l2", clip_norm=-1.0)
    opt = make_optimizer(1e-2, 0.0)

    params, state = init_mlp(jax.random.PRNGKey(1), MLPConfig(**mlp))
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(7)

    tr_rows = rs.randint(0, n_src, nt_true).astype(np.int32)
    un_rows = rs.randint(0, n_src, ubs).astype(np.int32)
    labels = rs.randint(0, c, nt_true).astype(np.int32)

    # exact step: the true smaller batch
    step_true = build_train_step(
        StepConfig(mlp=MLPConfig(**mlp), n_train=nt_true, **common), opt)
    batch_true = {"rows": jnp.asarray(np.concatenate([tr_rows, un_rows])),
                  "labels": jnp.asarray(labels),
                  "label_mask": jnp.ones(nt_true, jnp.float32)}
    p_t, s_t, o_t, m_t = step_true(params, state, opt_state, features,
                                   tk_cols, tk_vals, batch_true, key, 3.0)

    # padded step: wrap-pad the train rows to nt_pad, mask the padding
    step_pad = build_train_step(
        StepConfig(mlp=MLPConfig(**mlp), n_train=nt_pad, **common), opt)
    reps = -(-nt_pad // nt_true)
    tr_pad = np.tile(tr_rows, reps)[:nt_pad]
    lab_pad = np.tile(labels, reps)[:nt_pad]
    lmask = np.array([1.0] * nt_true + [0.0] * (nt_pad - nt_true),
                     np.float32)
    batch_pad = {"rows": jnp.asarray(np.concatenate([tr_pad, un_rows])),
                 "labels": jnp.asarray(lab_pad),
                 "label_mask": jnp.asarray(lmask),
                 "unlabel_mask": jnp.ones(ubs, jnp.float32)}
    p_p, s_p, o_p, m_p = step_pad(params, state, opt_state, features,
                                  tk_cols, tk_vals, batch_pad, key, 3.0)

    np.testing.assert_allclose(float(m_p["loss"]), float(m_t["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_t), jax.tree.leaves(p_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    for a, b in zip(jax.tree.leaves(s_t), jax.tree.leaves(s_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
