"""Checkpoint/resume + metrics stream through the trainer."""

import json
import os

import numpy as np

from grandtpu.config import GrandConfig
from grandtpu.train import train


def _cfg(tmp, **kw):
    base = dict(dataset="synth:240:3:16", epochs=6, patience=100,
                order=4, alpha=0.2, rmax=1e-6, top_k=16, hidden=32,
                batch_size=32, unlabel_batch_size=48, warmup=30.0,
                lam=1.0, eval_batch=3, push_backend="numpy",
                ckpt_dir=str(tmp / "ck"), save_every=1,
                metrics_path=str(tmp / "metrics.jsonl"))
    base.update(kw)
    return GrandConfig(**base)


def test_checkpoint_resume_and_metrics(tmp_path):
    r1 = train(_cfg(tmp_path))
    assert os.path.exists(tmp_path / "ck" / "latest.npz")
    assert os.path.exists(tmp_path / "ck" / "best.npz")

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert any("val_acc" in l for l in lines)
    end = [l for l in lines if l.get("event") == "train_end"]
    assert end and end[-1]["train_edges_per_s"] > 0

    # resume continues from the saved batch counter
    logs = []
    r2 = train(_cfg(tmp_path, epochs=8, resume=True), log=logs.append)
    assert any("resumed from" in str(m) for m in logs)
    assert r2.num_batches >= r1.num_batches


def test_fresh_run_without_ckpt_dir(tmp_path):
    r = train(_cfg(tmp_path, ckpt_dir=None, save_every=0,
                   metrics_path=None, resume=True))
    assert r.num_batches > 0


def test_resume_restores_best_weights(tmp_path):
    """A resumed run that never improves must still test with the weights
    from best.npz, not the latest full-state checkpoint (regression: found
    by the 2M-node soak — resume seeded `best` from latest.npz)."""
    import jax
    import jax.numpy as jnp
    from grandtpu.nn.mlp import MLPConfig, init_mlp
    from grandtpu.train.checkpoint import save_checkpoint
    from grandtpu.train.loop import run_training_loop
    from grandtpu.config import GrandConfig

    cfgm = MLPConfig(num_features=4, num_classes=2, hidden=4, nlayers=2)
    best_params, best_state = init_mlp(jax.random.PRNGKey(1), cfgm)
    latest_params, latest_state = init_mlp(jax.random.PRNGKey(2), cfgm)
    ck = tmp_path / "ck"
    save_checkpoint(str(ck / "best.npz"), params=best_params,
                    state=best_state, num_batch=5, best_val_acc=0.9)
    save_checkpoint(str(ck / "latest.npz"), params=latest_params,
                    state=latest_state, num_batch=7, best_val_acc=0.9,
                    best_val_loss=0.1)

    cfg = GrandConfig(epochs=1, batch_size=4, unlabel_batch_size=4,
                      eval_batch=1, patience=1, ckpt_dir=str(ck),
                      resume=True, stop_mode="acc")
    calls = {"n": 0}

    def step_fn(p, s, o, batch, k, nb):
        calls["n"] += 1
        return p, s, o, {"loss": jnp.float32(1.0)}

    def eval_fn(p, s):
        return 1.0, 0.1   # never improves on the restored 0.9

    out = run_training_loop(
        cfg, np.random.RandomState(0), jax.random.PRNGKey(0),
        params=latest_params, state=latest_state, opt_state=None,
        step_fn=step_fn, eval_fn=eval_fn,
        train_positions=np.arange(8), sample_positions=np.arange(8),
        train_labels_all=np.zeros(8, np.int32), edges_per_step=1,
        verbose=lambda *a: None)
    got = np.asarray(out["best"]["params"]["fcs"][0]["w"])
    want = np.asarray(best_params["fcs"][0]["w"])
    np.testing.assert_array_equal(got, want)


def test_preemption_graceful_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-training: the loop finishes the step group, saves full
    state to latest, stops; a resume=True rerun continues from there."""
    import os
    import signal

    import numpy as np

    from grandtpu.config import GrandConfig
    from grandtpu.train.loop import run_training_loop

    cfg = GrandConfig(dataset="x", epochs=4, batch_size=4,
                      unlabel_batch_size=2, eval_batch=3, patience=100,
                      ckpt_dir=str(tmp_path), save_every=0,
                      metrics_path=str(tmp_path / "m.jsonl"))
    params = {"w": np.zeros(3, np.float32)}
    state = {"s": np.zeros(1, np.float32)}
    opt_state = {"m": np.zeros(3, np.float32)}
    calls = {"n": 0}

    def step_fn(params, state, opt_state, batch, key, nb):
        calls["n"] += 1
        if calls["n"] == 5:
            os.kill(os.getpid(), signal.SIGTERM)  # delivered in-thread
        return ({"w": params["w"] + 1.0}, state, opt_state,
                {"loss": np.float32(0.5)})

    def eval_fn(params, state):
        return 0.4, 0.6

    import jax
    rng = np.random.RandomState(0)
    out = run_training_loop(
        cfg, rng, jax.random.PRNGKey(0), params=params, state=state,
        opt_state=opt_state, step_fn=step_fn, eval_fn=eval_fn,
        train_positions=np.arange(12), sample_positions=np.arange(6),
        train_labels_all=np.zeros(12, np.int32), edges_per_step=1,
        verbose=lambda *a: None)
    assert out["preempted"] is True
    assert (tmp_path / "latest.npz").exists()
    n_done = out["num_batch"]
    assert 5 <= n_done < 12   # stopped after the in-flight group
    lines = (tmp_path / "m.jsonl").read_text().splitlines()
    assert any('"preempted"' in ln for ln in lines)
    # handlers restored
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL,
                                                signal.default_int_handler,
                                                signal.Handlers.SIG_DFL)

    out2 = run_training_loop(
        cfg.replace(resume=True), np.random.RandomState(0),
        jax.random.PRNGKey(0), params=params, state=state,
        opt_state=opt_state, step_fn=lambda p, s, o, b, k, nb:
        ({"w": p["w"] + 1.0}, s, o, {"loss": np.float32(0.5)}),
        eval_fn=eval_fn, train_positions=np.arange(12),
        sample_positions=np.arange(6),
        train_labels_all=np.zeros(12, np.int32), edges_per_step=1,
        verbose=lambda *a: None)
    assert out2["preempted"] is False
    assert out2["num_batch"] > n_done   # continued past the preempt point
    # the resumed run's weights start from the checkpointed values
    assert float(np.asarray(out2["params"]["w"])[0]) > \
        float(np.asarray(out["params"]["w"])[0]) - 1e-6
