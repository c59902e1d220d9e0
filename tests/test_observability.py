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
