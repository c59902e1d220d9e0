"""Full loss + gradient parity vs torch: the complete GRAND+ objective
(K DropNode augmentations -> MLP -> NLL + sharpened consistency loss) with
identical weights and identical fixed masks must produce the same loss and
the same parameter gradients as torch autograd (reference math:
model.py:80-87,123-140,321-329)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from grandtpu.nn.dropnode import random_prop  # noqa: E402
from grandtpu.nn.losses import consis_loss, nll_loss  # noqa: E402
from grandtpu.nn.mlp import MLPConfig, apply_mlp, init_mlp  # noqa: E402


def _setup(seed=0):
    rs = np.random.RandomState(seed)
    B_tr, B_un, K_top, F_in, C, K_aug = 6, 8, 5, 12, 4, 2
    B = B_tr + B_un
    feats = rs.randn(B, K_top, F_in).astype(np.float32)
    vals = np.abs(rs.randn(B, K_top)).astype(np.float32)
    masks = (rs.rand(K_aug, B, K_top) < 0.5).astype(np.float32)
    labels = rs.randint(0, C, size=B_tr)
    cfg = MLPConfig(num_features=F_in, num_classes=C, hidden=10, nlayers=2,
                    input_droprate=0.0, hidden_droprate=0.0)
    params, state = init_mlp(jax.random.PRNGKey(1), cfg)
    return (feats, vals, masks, labels, cfg, params, state,
            dict(B_tr=B_tr, K_aug=K_aug, C=C, lam=1.3, tem=0.1,
                 ramp=0.7, loss_kind="l2",
                 # low threshold so the confidence mask is non-empty at
                 # random init — torch's mean over an empty mask is NaN
                 # (the reference edge case we deliberately diverge from)
                 conf=0.8 / C))


def _jax_loss(params, feats, vals, masks, labels, cfg, state, hp):
    logps = []
    for k in range(hp["K_aug"]):
        w = jnp.asarray(vals) * jnp.asarray(masks[k])
        x = random_prop(jnp.asarray(feats), w, training=False)
        logits, _ = apply_mlp(params, state, cfg, x, training=False)
        logps.append(jax.nn.log_softmax(logits, axis=-1))
    logps = jnp.stack(logps)
    ntr = hp["B_tr"]
    sup = jnp.mean(jnp.stack([
        nll_loss(lp[:ntr], jnp.asarray(labels)) for lp in logps]))
    unsup = consis_loss(logps[:, ntr:], hp["tem"], hp["conf"],
                        hp["loss_kind"])
    return sup + hp["ramp"] * unsup


def _torch_loss(tparams, feats, vals, masks, labels, hp):
    w1, b1, w2, b2 = tparams
    logps = []
    for k in range(hp["K_aug"]):
        w = torch.tensor(vals) * torch.tensor(masks[k])
        num = (torch.tensor(feats) * w[:, :, None]).sum(1)
        den = w.sum(1, keepdim=True) + 1e-12
        x = num / den
        h = torch.relu(x @ w1 + b1)
        logits = h @ w2 + b2
        logps.append(torch.log_softmax(logits, dim=-1))
    ntr = hp["B_tr"]
    sup = sum(F.nll_loss(lp[:ntr], torch.tensor(labels))
              for lp in logps) / len(logps)
    ps = [torch.exp(lp[ntr:]) for lp in logps]
    avg_p = sum(ps) / len(ps)
    sharp = (avg_p ** (1 / hp["tem"])
             / (avg_p ** (1 / hp["tem"])).sum(1, keepdim=True)).detach()
    msk = avg_p.max(1)[0] > hp["conf"]
    closs = sum(torch.mean((p - sharp).pow(2).sum(1)[msk]) for p in ps) \
        / len(ps)
    return sup + hp["ramp"] * closs


def test_loss_and_grad_parity():
    feats, vals, masks, labels, cfg, params, state, hp = _setup()

    loss_j, grads = jax.value_and_grad(_jax_loss)(
        params, feats, vals, masks, labels, cfg, state, hp)

    tparams = [torch.tensor(np.asarray(params["fcs"][0]["w"]),
                            requires_grad=True),
               torch.tensor(np.asarray(params["fcs"][0]["b"]),
                            requires_grad=True),
               torch.tensor(np.asarray(params["fcs"][1]["w"]),
                            requires_grad=True),
               torch.tensor(np.asarray(params["fcs"][1]["b"]),
                            requires_grad=True)]
    loss_t = _torch_loss(tparams, feats, vals, masks, labels, hp)
    loss_t.backward()

    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-5)
    for jg, tg, name in [
            (grads["fcs"][0]["w"], tparams[0].grad, "w1"),
            (grads["fcs"][0]["b"], tparams[1].grad, "b1"),
            (grads["fcs"][1]["w"], tparams[2].grad, "w2"),
            (grads["fcs"][1]["b"], tparams[3].grad, "b2")]:
        np.testing.assert_allclose(np.asarray(jg), tg.numpy(), atol=2e-6,
                                   err_msg=f"grad mismatch for {name}")


def test_kl_variant_parity():
    feats, vals, masks, labels, cfg, params, state, hp = _setup(seed=3)
    hp["loss_kind"] = "kl"

    loss_j = _jax_loss(params, feats, vals, masks, labels, cfg, state, hp)

    tparams = [torch.tensor(np.asarray(params["fcs"][0]["w"])),
               torch.tensor(np.asarray(params["fcs"][0]["b"])),
               torch.tensor(np.asarray(params["fcs"][1]["w"])),
               torch.tensor(np.asarray(params["fcs"][1]["b"]))]
    # torch side with the reference's KL form
    w1, b1, w2, b2 = tparams
    logps = []
    for k in range(hp["K_aug"]):
        w = torch.tensor(vals) * torch.tensor(masks[k])
        x = (torch.tensor(feats) * w[:, :, None]).sum(1) \
            / (w.sum(1, keepdim=True) + 1e-12)
        logits = torch.relu(x @ w1 + b1) @ w2 + b2
        logps.append(torch.log_softmax(logits, dim=-1))
    ntr = hp["B_tr"]
    sup = sum(F.nll_loss(lp[:ntr], torch.tensor(labels))
              for lp in logps) / len(logps)
    ps = [torch.exp(lp[ntr:]) for lp in logps]
    avg_p = sum(ps) / len(ps)
    sharp = (avg_p ** (1 / hp["tem"])
             / (avg_p ** (1 / hp["tem"])).sum(1, keepdim=True)).detach()
    msk = avg_p.max(1)[0] > hp["conf"]
    closs = sum(torch.mean((-sharp * lp[ntr:]).sum(1)[msk])
                for lp in logps) / len(logps)
    want = sup + hp["ramp"] * closs
    np.testing.assert_allclose(float(loss_j), want.item(), rtol=1e-5)
