"""Config-combination smoke grid: every architectural toggle trains a few
batches without error across prop modes (interaction-bug net)."""

import pytest

from grandtpu.config import GrandConfig
from grandtpu.train import train

GRID = [
    dict(prop_mode="ppr", nlayers=1, use_bn=True, node_norm=False,
         loss="l2", clip_norm=-1.0),
    dict(prop_mode="avg", nlayers=2, use_bn=False, node_norm=True,
         loss="kl", clip_norm=0.1),
    dict(prop_mode="single", nlayers=3, use_bn=True, node_norm=True,
         loss="l2", clip_norm=0.5),
    dict(prop_mode="ppr", nlayers=2, use_bn=True, node_norm=False,
         loss="kl", clip_norm=-1.0, stop_mode="acc"),
    dict(prop_mode="avg", nlayers=1, use_bn=False, node_norm=False,
         loss="l2", clip_norm=-1.0, unlabel_num=30),
]


@pytest.mark.parametrize("overrides", GRID)
def test_config_combo_trains(overrides):
    cfg = GrandConfig(dataset="synth:200:3:16", epochs=3, patience=50,
                      order=3, alpha=0.2, rmax=1e-6, top_k=8, hidden=16,
                      batch_size=20, unlabel_batch_size=24, warmup=10.0,
                      eval_batch=2, push_backend="numpy",
                      input_droprate=0.3, hidden_droprate=0.3,
                      **overrides)
    r = train(cfg)
    assert r.num_batches > 0
    assert 0.0 <= r.test_acc <= 1.0
    import numpy as np
    assert np.isfinite(r.best_val_loss)


def test_sparse_combo_trains():
    cfg = GrandConfig(dataset="synth:200:3:40:sparse", epochs=3,
                      patience=50, order=3, rmax=1e-6, top_k=8, hidden=16,
                      nlayers=3, use_bn=True, node_norm=True, loss="kl",
                      batch_size=20, unlabel_batch_size=24, warmup=10.0,
                      eval_batch=2, push_backend="numpy",
                      input_droprate=0.3, hidden_droprate=0.3,
                      clip_norm=0.2)
    r = train(cfg)   # auto-dispatches to the sparse engine
    assert r.num_batches > 0
