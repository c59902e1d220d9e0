"""MAG-variant model: embedding input + MLP head.

Reference ``model_mag.py:17-90``: num_features is the sparse attr vocabulary
size; the "input layer" is the embedding weighted-mean (``sparse_input``),
and the head applies, per fc layer: relu -> [node_norm] -> [BN] -> hidden
dropout -> fc. With nlayers == 1 the embedding table maps straight to
classes and the head is the identity. Note the asymmetry vs the dense MLP:
relu comes FIRST in the head loop (the embedding output is pre-activation).
"""

from __future__ import annotations

import jax


from grandtpu.nn.mlp import (MLPConfig, _batchnorm, _dropout, _linear_init,
                             _bn_init, _node_normalize)
from grandtpu.nn.sparse_input import init_embedding


def init_mag_mlp(key, cfg: MLPConfig):
    """Params/state for the sparse-feature model. cfg.num_features = attr
    vocabulary size."""
    k_emb, k_fc = jax.random.split(key)
    out_dim = cfg.num_classes if cfg.nlayers == 1 else cfg.hidden
    params = {"emb": init_embedding(k_emb, cfg.num_features, out_dim),
              "fcs": [], "bns": []}
    state = {"bns": []}
    if cfg.nlayers >= 2:
        h, c = cfg.hidden, cfg.num_classes
        dims = [(h, h)] * (cfg.nlayers - 2) + [(h, c)]
        keys = jax.random.split(k_fc, len(dims))
        params["fcs"] = [_linear_init(k, fi, fo)
                        for k, (fi, fo) in zip(keys, dims)]
        for _ in range(len(dims)):
            p, s = _bn_init(h)
            params["bns"].append(p)
            state["bns"].append(s)
    return params, state


def apply_mag_head(params, state, cfg: MLPConfig, x, *, key=None,
                   training: bool = False, batch_mask=None):
    """Head forward on [B, H] embeddings -> ([B, C] logits, new_state).
    batch_mask ([B] 0/1) marks real rows for BN stats on padded batches."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n_fc = len(params["fcs"])
    if n_fc == 0:
        return x, state
    keys = jax.random.split(key, n_fc)
    new_bn = list(state["bns"])
    for i in range(n_fc):
        x = jax.nn.relu(x)
        if cfg.node_norm:
            x = _node_normalize(x)
        if cfg.use_bn:
            x, new_bn[i] = _batchnorm(
                x, params["bns"][i], state["bns"][i], training, batch_mask)
        x = _dropout(keys[i], x, cfg.hidden_droprate, training)
        x = x @ params["fcs"][i]["w"] + params["fcs"][i]["b"]
    return x, {"bns": new_bn}
