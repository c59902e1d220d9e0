"""Device-mesh construction helpers."""

from __future__ import annotations

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
