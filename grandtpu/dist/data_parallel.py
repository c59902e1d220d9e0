"""Sharding annotations for the training step (GSPMD path).

The jitted train step from ``grandtpu.train.step`` is pure and
shape-static, so multi-chip training is a matter of placement, not new code:

- batch rows               -> sharded over the 'data' mesh axis
- features table [N, F]    -> sharded over 'data' rows (gathers become
                              XLA-inserted collectives over ICI)
- top-k table [n_src,Ktop] -> sharded over 'data' rows
- MLP hidden weights       -> sharded over 'model' (tensor parallel; XLA
                              inserts the psum after the second matmul)
- everything else          -> replicated

XLA's GSPMD propagates these seeds through the whole step — including the
BatchNorm batch-mean (becomes a cross-replica mean) and the Adam update —
which is exactly the "annotate and let the compiler insert collectives"
recipe the scaling book prescribes.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _put(tree, mesh, spec):
    sh = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def _pad_rows(x, multiple: int):
    """Pad dim 0 to a multiple with zeros (padded rows are never gathered:
    row positions only point at real entries)."""
    import jax.numpy as jnp
    pad = (-x.shape[0]) % multiple
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths)


def shard_train_inputs(mesh: Mesh, *, params, state, opt_state, features,
                       tk_cols, tk_vals, shard_features: bool = True,
                       tensor_parallel: bool = False):
    """Place training state on the mesh. Returns the placed pytrees."""
    repl = P()
    if tensor_parallel:
        params = _shard_params_tp(params, mesh)
    else:
        params = _put(params, mesh, repl)
    state = _put(state, mesh, repl)
    opt_state = _put(opt_state, mesh, repl)
    n_data = mesh.shape["data"]
    feat_spec = P("data", None) if shard_features else repl
    if shard_features:
        features = _pad_rows(features, n_data)
    features = jax.device_put(features, NamedSharding(mesh, feat_spec))
    tk_cols = jax.device_put(_pad_rows(tk_cols, n_data),
                             NamedSharding(mesh, P("data", None)))
    tk_vals = jax.device_put(_pad_rows(tk_vals, n_data),
                             NamedSharding(mesh, P("data", None)))
    return params, state, opt_state, features, tk_cols, tk_vals


def _shard_params_tp(params, mesh: Mesh):
    """Tensor-parallel placement of MLP weights: hidden dim over 'model'.

    First layer [F, H] -> (None, 'model'); middle [H, H] -> ('model', None)
    alternation is avoided (keep H sharded on output side, contract with
    psum via GSPMD); final layer [H, C] -> ('model', None).
    """
    fcs = params["fcs"]
    placed = []
    n = len(fcs)
    for i, fc in enumerate(fcs):
        if n == 1:
            w_spec, b_spec = P(), P()
        elif i == 0:
            w_spec, b_spec = P(None, "model"), P("model")
        else:
            # middle and final layers contract the sharded hidden dim;
            # GSPMD inserts the psum after the matmul
            w_spec, b_spec = P("model", None), P()
        placed.append({
            "w": jax.device_put(fc["w"], NamedSharding(mesh, w_spec)),
            "b": jax.device_put(fc["b"], NamedSharding(mesh, b_spec)),
        })
    out = dict(params)
    out["fcs"] = placed
    out["bns"] = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())),
        params["bns"])
    return out


def shard_sparse_train_inputs(mesh: Mesh, *, params, state, opt_state,
                              attr_cols, attr_vals, tk_cols, tk_vals,
                              emb_mode: str = "vocab"):
    """Place the sparse-feature (MAG) engine's state on the mesh.

    The memory-critical tensor is the embedding table (SURVEY §7.3 item 10:
    2.8M x hidden for MAG, plus its Adam moments at 2x). `emb_mode`:

    - "vocab": table rows over 'data' — V/S rows per device, the multi-host
      memory win; XLA turns the attr-id gather into collectives.
    - "tp": hidden dim over 'model' — the gather stays device-local and the
      head's first matmul contracts the sharded H with one GSPMD-inserted
      psum (Megatron-style); use when a 'model' axis exists.
    - "replicate": small-vocab datasets.

    Attr tables [N, P] and top-k tables row-shard over 'data' like the
    dense path. Adam moments follow the table's sharding (matched by
    shape) so optimizer memory scales down with it.
    """
    repl = P()
    emb_shape = params["emb"]["table"].shape
    emb_spec = {"vocab": P("data", None), "tp": P(None, "model"),
                "replicate": repl}[emb_mode]
    n_data = mesh.shape["data"]

    def place_like_emb(tree):
        # vocab mode row-pads the table (and its Adam moments, matched by
        # shape) to a 'data'-divisible size; padded rows are never gathered
        # (attr ids < V) and see zero gradients
        def put(x):
            if getattr(x, "shape", None) == emb_shape:
                if emb_mode == "vocab":
                    x = _pad_rows(jax.numpy.asarray(x), n_data)
                return jax.device_put(x, NamedSharding(mesh, emb_spec))
            return jax.device_put(x, NamedSharding(mesh, repl))
        return jax.tree.map(put, tree)

    placed = {"emb": place_like_emb(params["emb"]),
              "bns": _put(params["bns"], mesh, repl)}
    fcs = []
    for i, fc in enumerate(params["fcs"]):
        # under tp the first head fc contracts the sharded hidden dim
        w_spec = P("model", None) if emb_mode == "tp" and i == 0 else repl
        fcs.append({"w": jax.device_put(fc["w"],
                                        NamedSharding(mesh, w_spec)),
                    "b": jax.device_put(fc["b"], NamedSharding(mesh, repl))})
    placed["fcs"] = fcs
    state = _put(state, mesh, repl)
    opt_state = place_like_emb(opt_state)
    sh_rows = NamedSharding(mesh, P("data", None))
    attr_cols = jax.device_put(_pad_rows(attr_cols, n_data), sh_rows)
    attr_vals = jax.device_put(_pad_rows(attr_vals, n_data), sh_rows)
    tk_cols = jax.device_put(_pad_rows(tk_cols, n_data), sh_rows)
    tk_vals = jax.device_put(_pad_rows(tk_vals, n_data), sh_rows)
    return placed, state, opt_state, attr_cols, attr_vals, tk_cols, tk_vals


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Shard per-step batch arrays over the data axis."""
    sh = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
