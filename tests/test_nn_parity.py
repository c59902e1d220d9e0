"""Numerics parity vs torch oracles for the model layer (the reference's
engine is torch, so torch-on-CPU is the ground truth; SURVEY.md §4 item 2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from grandtpu.nn.mlp import MLPConfig, init_mlp, apply_mlp  # noqa: E402
from grandtpu.nn.dropnode import random_prop  # noqa: E402
from grandtpu.nn.losses import consis_loss  # noqa: E402


def build_torch_mlp(params, cfg):
    """Assemble a torch module equivalent to reference model.py:17-67 with
    our params loaded."""
    import torch.nn as nn

    class RefMLP(nn.Module):
        def __init__(self):
            super().__init__()
            fcs, bns = [], []
            if cfg.nlayers == 1:
                fcs = [nn.Linear(cfg.num_features, cfg.num_classes)]
                bns = [nn.BatchNorm1d(cfg.num_features)]
            else:
                fcs = [nn.Linear(cfg.num_features, cfg.hidden)]
                bns = [nn.BatchNorm1d(cfg.num_features)]
                for _ in range(cfg.nlayers - 2):
                    fcs.append(nn.Linear(cfg.hidden, cfg.hidden))
                    bns.append(nn.BatchNorm1d(cfg.hidden))
                bns.append(nn.BatchNorm1d(cfg.hidden))
                fcs.append(nn.Linear(cfg.hidden, cfg.num_classes))
            self.fcs = nn.ModuleList(fcs)
            self.bns = nn.ModuleList(bns)

        def normalize(self, x):
            return x / (1e-12 + torch.norm(x, p=2, dim=-1, keepdim=True))

        def forward(self, x):
            if cfg.node_norm:
                x = self.normalize(x).detach()
            if cfg.use_bn:
                x = self.bns[0](x)
            x = F.dropout(x, cfg.input_droprate, training=self.training)
            x = self.fcs[0](x)
            for fc, bn in zip(self.fcs[1:], self.bns[1:]):
                x = F.relu(x)
                if cfg.node_norm:
                    x = self.normalize(x)
                if cfg.use_bn:
                    x = bn(x)
                x = F.dropout(x, cfg.hidden_droprate,
                              training=self.training)
                x = fc(x)
            return x

    m = RefMLP()
    with torch.no_grad():
        for i, fc in enumerate(m.fcs):
            fc.weight.copy_(torch.tensor(
                np.asarray(params["fcs"][i]["w"]).T))
            fc.bias.copy_(torch.tensor(np.asarray(params["fcs"][i]["b"])))
    return m


@pytest.mark.parametrize("nlayers,use_bn,node_norm", [
    (2, False, False), (1, True, True), (3, True, False), (2, True, True),
])
def test_mlp_forward_parity(nlayers, use_bn, node_norm):
    cfg = MLPConfig(num_features=24, num_classes=5, hidden=16,
                    nlayers=nlayers, use_bn=use_bn, node_norm=node_norm,
                    input_droprate=0.0, hidden_droprate=0.0)
    params, state = init_mlp(jax.random.PRNGKey(0), cfg)
    tm = build_torch_mlp(params, cfg)
    x = np.random.RandomState(1).randn(10, 24).astype(np.float32)

    # eval mode: running stats (fresh: mean 0 var 1)
    tm.eval()
    want = tm(torch.tensor(x)).detach().numpy()
    got, _ = apply_mlp(params, state, cfg, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    # train mode without dropout: batch statistics + running-stat updates
    tm.train()
    want_tr = tm(torch.tensor(x)).detach().numpy()
    got_tr, new_state = apply_mlp(params, state, cfg, jnp.asarray(x),
                                  key=jax.random.PRNGKey(3), training=True)
    np.testing.assert_allclose(np.asarray(got_tr), want_tr, atol=2e-4)
    if use_bn:
        np.testing.assert_allclose(
            np.asarray(new_state["bns"][0]["mean"]),
            tm.bns[0].running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_state["bns"][0]["var"]),
            tm.bns[0].running_var.numpy(), atol=1e-4)


def test_random_prop_parity_fixed_mask():
    """With an identical Bernoulli mask, random_prop equals the reference
    formula: scatter-sum of masked-weighted feats / masked weight sum
    (model.py:80-87; the torch dropout 1/(1-p) scaling cancels)."""
    rs = np.random.RandomState(0)
    B, K, F_ = 6, 4, 9
    feats = rs.randn(B, K, F_).astype(np.float32)
    vals = np.abs(rs.randn(B, K)).astype(np.float32)
    vals[2, 3] = 0.0  # padding slot
    mask = rs.rand(B, K) < 0.5

    scale = 2.0  # 1/(1-0.5) torch train-mode dropout scaling
    dropped = np.where(mask, vals * scale, 0.0)
    want = (dropped[:, :, None] * feats).sum(1) / (
        dropped.sum(1, keepdims=True) + 1e-12)

    w = jnp.where(jnp.asarray(mask), jnp.asarray(vals), 0.0)
    got = random_prop(jnp.asarray(feats), w, training=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.parametrize("kind", ["l2", "kl"])
def test_consis_loss_parity(kind):
    rs = np.random.RandomState(4)
    K, U, C = 3, 12, 5
    logits = rs.randn(K, U, C).astype(np.float32) * 2
    logps = torch.log_softmax(torch.tensor(logits), dim=-1)
    tem, conf = 0.1, 2.0 / C

    # reference consis_loss (model.py:123-140)
    ps = [torch.exp(p) for p in logps]
    avg_p = sum(ps) / K
    sharp = (avg_p ** (1 / tem) /
             (avg_p ** (1 / tem)).sum(1, keepdim=True)).detach()
    loss = 0.0
    msk = avg_p.max(1)[0] > conf
    for p, lp in zip(ps, logps):
        if kind == "kl":
            loss += torch.mean((-sharp * lp).sum(1)[msk])
        else:
            loss += torch.mean((p - sharp).pow(2).sum(1)[msk])
    want = (loss / K).item()

    got = consis_loss(jnp.asarray(logps.numpy()), tem, conf, kind)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_consis_loss_empty_mask_is_finite():
    """Divergence from reference (documented): empty confidence mask gives 0,
    not NaN."""
    logps = jnp.log(jnp.full((2, 4, 10), 0.1))  # uniform; max prob 0.1 < 0.2
    out = consis_loss(logps, 0.1, 0.2, "l2")
    assert np.isfinite(float(out)) and float(out) == 0.0


def test_linear_init_distribution():
    """Init matches torch reset_parameters: U(-1/sqrt(fan_in), +)."""
    cfg = MLPConfig(num_features=400, num_classes=3, hidden=100, nlayers=2)
    params, _ = init_mlp(jax.random.PRNGKey(0), cfg)
    w = np.asarray(params["fcs"][0]["w"])
    bound = 1 / np.sqrt(400)
    assert w.min() >= -bound and w.max() <= bound
    assert w.std() > bound * 0.5  # roughly uniform, not collapsed


def test_masked_batchnorm_equals_true_smaller_batch():
    """Mask-weighted BN on a wrap-padded batch must produce the SAME batch
    statistics, normalized outputs (real rows), and running-stat updates as
    torch BatchNorm1d fed the true smaller batch (the reference feeds the
    smaller batch directly, model.py:303)."""
    from grandtpu.nn.mlp import _batchnorm

    rs = np.random.RandomState(0)
    d, n_real, n_pad = 7, 5, 8
    x_real = rs.randn(n_real, d).astype(np.float32)
    # wrap-padding duplicates leading rows (train/loop.py pad_batch)
    x_pad = np.tile(x_real, (2, 1))[:n_pad]
    mask = np.array([1.0] * n_real + [0.0] * (n_pad - n_real), np.float32)

    scale = rs.rand(d).astype(np.float32) + 0.5
    bias = rs.randn(d).astype(np.float32)
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    s = {"mean": jnp.zeros(d), "var": jnp.ones(d)}

    y, new_s = _batchnorm(jnp.asarray(x_pad), p, s, training=True,
                          mask=jnp.asarray(mask))

    bn = torch.nn.BatchNorm1d(d, momentum=0.1)
    bn.weight.data = torch.tensor(scale)
    bn.bias.data = torch.tensor(bias)
    bn.train()
    want = bn(torch.tensor(x_real)).detach().numpy()

    np.testing.assert_allclose(np.asarray(y[:n_real]), want, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_s["mean"]),
                               bn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_s["var"]),
                               bn.running_var.numpy(), atol=1e-6)
