"""Checkpointing: params + BN state + optimizer state + step counter.

Goes beyond the reference's best-weights-only ``torch.save``
(``model.py:350-351``): full training state is saved so interrupted runs can
resume (SURVEY.md §5 checkpoint/resume gap). Two storage backends behind one
call site:

- ``npz`` (default): plain npz of the flattened pytree — dependency-free,
  portable, fast for MLP-sized models, single file.
- ``orbax``: directory checkpoint via ``orbax.checkpoint`` — async-friendly,
  sharded-array aware; the right choice once params are mesh-sharded
  (multi-host MAG embedding tables). Select with ``ckpt_backend="orbax"``
  in the config; ``load_checkpoint`` auto-detects (directory = orbax).

Both backends store the same flat ``{section|path: array}`` dict plus a
JSON ``__meta__`` blob, so they are interchangeable at restore time.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_checkpoint(path: str, *, params, state, opt_state=None,
                    num_batch: int = 0, best_val_acc: float = 0.0,
                    best_val_loss: float = float("inf"),
                    extra: dict | None = None,
                    backend: str = "npz") -> None:
    arrays = {}
    for name, tree in (("params", params), ("state", state),
                       ("opt", opt_state)):
        if tree is None:
            continue
        flat, _ = _flatten_with_paths(tree)
        for k, v in flat.items():
            arrays[f"{name}|{k}"] = v
    meta = {"num_batch": num_batch, "best_val_acc": best_val_acc,
            "best_val_loss": best_val_loss, **(extra or {})}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    if backend == "orbax":
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(_orbax_dir(path)), arrays,
                       force=True)
        return
    if backend != "npz":
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def _orbax_dir(path: str) -> str:
    """orbax checkpoints are directories: strip a stray .npz suffix."""
    return path[: -len(".npz")] if path.endswith(".npz") else path


def load_checkpoint(path: str, *, params_template, state_template,
                    opt_template=None, backend: str | None = None):
    """Restore into the shapes of the given templates. Returns
    (params, state, opt_state, meta). backend=None auto-detects:
    a directory at the path (modulo .npz suffix) is an orbax checkpoint."""
    if backend is None:
        backend = "orbax" if os.path.isdir(_orbax_dir(path)) else "npz"
    if backend == "orbax":
        import orbax.checkpoint as ocp
        d = _orbax_dir(path)
        if not os.path.isdir(d):
            raise FileNotFoundError(d)
        with ocp.StandardCheckpointer() as ckptr:
            arrays = {k: np.asarray(v) for k, v in
                      ckptr.restore(os.path.abspath(d)).items()}
    else:
        if not path.endswith(".npz"):
            path = path + ".npz"
        with np.load(path) as d:
            arrays = {k: d[k] for k in d.files}
    meta = json.loads(bytes(arrays.pop("__meta__")).decode())

    def restore(name, template):
        if template is None:
            return None
        flat, treedef = _flatten_with_paths(template)
        leaves = []
        for k, ref in flat.items():
            arr = arrays[f"{name}|{k}"]
            if (arr.shape != ref.shape and arr.ndim == ref.ndim
                    and arr.shape[1:] == ref.shape[1:]
                    and arr.shape[0] > ref.shape[0]):
                # vocab-sharded runs row-pad the embedding table (and its
                # Adam moments) to a device-divisible size; the padded rows
                # are never gathered, so slicing restores the exact model
                arr = arr[: ref.shape[0]]
            assert arr.shape == ref.shape, f"{name}|{k}: shape mismatch"
            leaves.append(jax.numpy.asarray(arr))
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), leaves)

    return (restore("params", params_template),
            restore("state", state_template),
            restore("opt", opt_template), meta)
