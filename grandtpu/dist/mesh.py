"""Device-mesh construction helpers."""

from __future__ import annotations

import functools

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """2D (data, model) mesh. Defaults to all devices on the data axis.

    On a pod slice, axes laid out by jax's default device order keep the
    data axis on ICI rings; across hosts the outer axis rides DCN.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    assert n_data * n_model <= devices.size, \
        f"need {n_data * n_model} devices, have {devices.size}"
    grid = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def fetch_replicated(mesh: Mesh, x) -> np.ndarray:
    """Bring a (possibly cross-process-sharded) global array to host numpy.

    Single-process arrays are fully addressable and fetch directly; in a
    multi-process run (``jax.distributed.initialize``) a row-sharded
    shard_map output spans processes, so reshard it to replicated first —
    one XLA all_gather — and read the local copy. Used by the sharded
    propagators so the same code path serves the virtual mesh AND real
    multi-host runs.
    """
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec as P
    if isinstance(x.sharding, NamedSharding):
        return fetch_leaf(x)   # one copy of the replicate-then-read logic
    return np.asarray(_replicator(NamedSharding(mesh, P()))(x))


@functools.lru_cache(maxsize=16)
def _replicator(sharding):
    # jit caching keys on the function OBJECT: a fresh lambda per fetch
    # would recompile the all_gather every propagator call in a real
    # multi-process run, so cache the jitted identity per sharding
    return jax.jit(lambda a: a, out_shardings=sharding)


def fetch_leaf(x) -> np.ndarray:
    """Host numpy of ONE array leaf, safe under real multi-process runs.

    Fully-addressable leaves (single-process, or replicated) fetch
    directly. A cross-process-sharded leaf (e.g. the vocab-sharded MAG
    embedding table) is resharded to replicated over ITS OWN mesh first —
    one XLA all_gather, so every process must reach this call (it is a
    collective). This is what lets checkpoint save and the trainers' best-
    state fetch run unchanged whether the mesh spans one process or many.
    """
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = x.sharding
    if not isinstance(sharding, NamedSharding):
        raise TypeError(
            f"cannot fetch non-addressable array with {type(sharding)}; "
            f"only NamedSharding carries the mesh needed to replicate")
    return np.asarray(_replicator(NamedSharding(sharding.mesh, P()))(x))
