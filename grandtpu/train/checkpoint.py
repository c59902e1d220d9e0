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


class CheckpointShapeError(ValueError):
    """A checkpoint leaf does not fit the restore template (names the leaf)."""


def row_padded_meta(before: dict, after: dict) -> dict[str, int]:
    """Compare section trees (e.g. ``{"params": ..., "opt": ...}``) before
    and after mesh placement; return ``{flat_key: original_dim0}`` for every
    leaf whose leading dim was row-padded to a device-divisible size
    (leading dim grew, trailing dims unchanged). The result is stored in the
    checkpoint meta so ``load_checkpoint`` slices ONLY those leaves — any
    other shape mismatch is a hard :class:`CheckpointShapeError` (restoring
    a hidden=32 checkpoint into a hidden=16 template must never silently
    truncate weights)."""
    out: dict[str, int] = {}
    for name, tree_b in before.items():
        flat_b, _ = jax.tree_util.tree_flatten_with_path(tree_b)
        flat_a, _ = jax.tree_util.tree_flatten_with_path(after[name])
        for (pb, lb), (_, la) in zip(flat_b, flat_a):
            key = "/".join(str(p) for p in pb)
            sb, sa = tuple(np.shape(lb)), tuple(np.shape(la))
            if (sb != sa and len(sa) >= 2 and len(sa) == len(sb)
                    and sa[1:] == sb[1:] and sa[0] > sb[0]):
                out[f"{name}|{key}"] = int(sb[0])
    return out


def _flatten_with_paths(tree):
    from grandtpu.dist.mesh import fetch_leaf
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        # fetch_leaf handles cross-process-sharded leaves (vocab-sharded
        # embedding tables) via a replicate collective — which is why in a
        # multi-process run EVERY rank must call save_checkpoint, even
        # though only rank 0 writes the file
        out[key] = fetch_leaf(leaf)
    return out, treedef


def save_checkpoint(path: str, *, params, state, opt_state=None,
                    num_batch: int = 0, best_val_acc: float = 0.0,
                    best_val_loss: float = float("inf"),
                    extra: dict | None = None,
                    row_padded: dict[str, int] | None = None,
                    backend: str = "npz") -> None:
    """row_padded: {flat leaf key: original dim0} for leaves the mesh
    placement row-padded (see :func:`row_padded_meta`); recorded in the
    meta so restore slices exactly those and nothing else.

    Multi-process semantics (world > 1 under ``jax.distributed``): every
    rank MUST call this together — fetching cross-process-sharded leaves
    is a collective — but only rank 0 writes the file (shared-filesystem
    convention; ranks other than 0 return after the fetch)."""
    arrays = {}
    for name, tree in (("params", params), ("state", state),
                       ("opt", opt_state)):
        if tree is None:
            continue
        flat, _ = _flatten_with_paths(tree)
        for k, v in flat.items():
            arrays[f"{name}|{k}"] = v
    if (backend != "orbax" and jax.process_count() > 1
            and jax.process_index() != 0):
        # rank-0-writes applies to the npz single-file backend only: the
        # collective fetch above already ran, so non-zero ranks return.
        # Orbax's StandardCheckpointer.save is ITSELF a cross-process
        # collective (internal sync_global_processes barrier), so under
        # world>1 every rank must reach it — it coordinates one writer
        # per shard internally.
        return
    meta = {"num_batch": num_batch, "best_val_acc": best_val_acc,
            "best_val_loss": best_val_loss,
            "__row_padded__": row_padded or {}, **(extra or {})}
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
    row_padded = meta.get("__row_padded__") or {}

    def restore(name, template):
        if template is None:
            return None
        flat, treedef = _flatten_with_paths(template)
        leaves = []
        for k, ref in flat.items():
            full_key = f"{name}|{k}"
            try:
                arr = arrays[full_key]
            except KeyError:
                raise CheckpointShapeError(
                    f"{full_key}: missing from checkpoint {path!r}") from None
            if arr.shape != ref.shape:
                # only leaves the save recorded as row-padded (vocab-sharded
                # embedding table + its Adam moments) may be sliced back to
                # their original leading dim; everything else hard-fails so
                # a misconfigured restore can't silently truncate weights
                orig = row_padded.get(full_key)
                if (orig is not None and arr.ndim >= 2
                        and arr.ndim == ref.ndim
                        and arr.shape[1:] == ref.shape[1:]
                        and ref.shape[0] == orig
                        and arr.shape[0] > ref.shape[0]):
                    arr = arr[: ref.shape[0]]
                else:
                    raise CheckpointShapeError(
                        f"{full_key}: checkpoint shape {arr.shape} does not"
                        f" match template {ref.shape}"
                        + (f" (saved row-padded from dim0={orig})"
                           if orig is not None else ""))
            leaves.append(jax.numpy.asarray(arr))
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), leaves)

    return (restore("params", params_template),
            restore("state", state_template),
            restore("opt", opt_template), meta)
