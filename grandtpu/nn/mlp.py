"""The GRAND+ MLP classifier, functional JAX.

Architecture parity with reference ``model.py:17-67``:

- nlayers == 1: single Linear(F, C); optional input BatchNorm(F)
- nlayers >= 2: Linear(F, H), (nlayers-2) x Linear(H, H), Linear(H, C);
  BatchNorms on the input and each hidden width
- forward: [node_norm (stop-gradient at input)] -> [BN] -> dropout -> fc,
  then per hidden layer: relu -> [node_norm] -> [BN] -> dropout -> fc

BatchNorm follows torch semantics: train mode normalizes with biased batch
statistics and updates running stats with momentum 0.1 using the *unbiased*
batch variance; eval mode normalizes with running stats. Linear init matches
torch's reset_parameters: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight
and bias (kaiming_uniform with a=sqrt(5) reduces to that bound).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.1
BN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    num_features: int
    num_classes: int
    hidden: int
    nlayers: int
    use_bn: bool = False
    node_norm: bool = False
    input_droprate: float = 0.0
    hidden_droprate: float = 0.0


# params pytree:
# {'fcs': [{'w': [in, out], 'b': [out]}, ...],
#  'bns': [{'scale': [d], 'bias': [d]}, ...]}
# state pytree (non-trained):
# {'bns': [{'mean': [d], 'var': [d]}, ...]}
MLPParams = dict[str, Any]


def _linear_init(key, fan_in: int, fan_out: int):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def _bn_init(dim: int):
    return ({"scale": jnp.ones((dim,), jnp.float32),
             "bias": jnp.zeros((dim,), jnp.float32)},
            {"mean": jnp.zeros((dim,), jnp.float32),
             "var": jnp.ones((dim,), jnp.float32)})


def layer_dims(cfg: MLPConfig):
    """[(in, out), ...] for fcs and [dim, ...] for bns, reference layout."""
    f, h, c, L = cfg.num_features, cfg.hidden, cfg.num_classes, cfg.nlayers
    if L == 1:
        return [(f, c)], [f]
    fcs = [(f, h)] + [(h, h)] * (L - 2) + [(h, c)]
    bns = [f] + [h] * (L - 2) + [h]
    return fcs, bns


def init_mlp(key, cfg: MLPConfig):
    fc_dims, bn_dims = layer_dims(cfg)
    keys = jax.random.split(key, len(fc_dims))
    fcs = [_linear_init(k, fi, fo) for k, (fi, fo) in zip(keys, fc_dims)]
    bns, bn_state = [], []
    for d in bn_dims:
        p, s = _bn_init(d)
        bns.append(p)
        bn_state.append(s)
    return {"fcs": fcs, "bns": bns}, {"bns": bn_state}


def _batchnorm(x, p, s, training: bool, mask=None):
    """Torch BatchNorm1d. Returns (y, new_state).

    mask (optional [B] 0/1 f32): row weights for the batch statistics.
    Wrap-padded partial batches pass the real-row mask so the stats equal
    those of the true smaller batch the reference feeds (model.py:303) —
    padded duplicate rows contribute nothing. With mask=None (or all ones)
    this is plain torch train-mode BN."""
    if training:
        if mask is None:
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)                  # biased, for normalize
            m = x.shape[0]
            unbiased = var * (m / max(m - 1, 1))      # for running stats
        else:
            m = jnp.maximum(mask.sum(), 1.0)
            mean = (x * mask[:, None]).sum(0) / m
            var = (((x - mean) ** 2) * mask[:, None]).sum(0) / m
            unbiased = var * (m / jnp.maximum(m - 1.0, 1.0))
        new_s = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS)
    return y * p["scale"] + p["bias"], new_s


def _node_normalize(x):
    """L2 node norm with the reference's epsilon placement
    (``model.py:45-46``): x / (1e-12 + ||x||)."""
    return x / (1e-12 + jnp.linalg.norm(x, axis=-1, keepdims=True))


def _dropout(key, x, rate: float, training: bool):
    if not training or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def apply_mlp(params, state, cfg: MLPConfig, x, *, key=None,
              training: bool = False, batch_mask=None):
    """Forward pass. Returns (logits, new_state).

    `key` is required when training with dropout. `batch_mask` ([B] 0/1)
    marks real rows for BN statistics on wrap-padded partial batches.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n_drop = max(cfg.nlayers, 1)
    keys = jax.random.split(key, n_drop)
    new_bn_state = list(state["bns"])

    if cfg.node_norm:
        x = jax.lax.stop_gradient(_node_normalize(x))
    if cfg.use_bn:
        x, new_bn_state[0] = _batchnorm(
            x, params["bns"][0], state["bns"][0], training, batch_mask)
    x = _dropout(keys[0], x, cfg.input_droprate, training)
    x = x @ params["fcs"][0]["w"] + params["fcs"][0]["b"]

    for i in range(1, cfg.nlayers):
        x = jax.nn.relu(x)
        if cfg.node_norm:
            x = _node_normalize(x)
        if cfg.use_bn:
            x, new_bn_state[i] = _batchnorm(
                x, params["bns"][i], state["bns"][i], training, batch_mask)
        x = _dropout(keys[i], x, cfg.hidden_droprate, training)
        x = x @ params["fcs"][i]["w"] + params["fcs"][i]["b"]

    return x, {"bns": new_bn_state}
