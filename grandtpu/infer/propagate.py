"""Exact full-graph power-iteration propagation on TPU.

Reference semantics (``model.py:181-210``), with adj already self-looped and
D = row sums of that matrix:

    ppr    : prop = sum_{t=0..order} [(1-a) D^-1 A]^t (a X)
    avg    : prop = sum_{t=0..order} (D^-1 A)^t X / (order+1)
    single : prop = (D^-1 A)^order X

The reference runs this as scipy SpMM on the host (HOT LOOP #3). Here the
iteration is one jitted ``lax.fori_loop`` on device, with the matrix applied
either as a dense MXU matmul (small n — fastest by far) or as the padded-edge
segment-sum SpMM (large n). Zero-degree rows use the same 1e-12 clamp as the
reference (``model.py:190,198``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from grandtpu.sparse.spmm import PaddedCSR, spmm_segment


@functools.partial(jax.jit, static_argnames=("mode", "order", "use_dense"))
def _propagate_device(adj_op, dinv, x, *, mode: str, order: int,
                      alpha: float | None, use_dense: bool):
    def apply_p(v):
        if use_dense:
            # adj_op is dense A (unnormalized); scale rows afterwards
            return dinv[:, None] * jnp.dot(
                adj_op, v, preferred_element_type=jnp.float32)
        return dinv[:, None] * spmm_segment(adj_op, v)

    if mode == "ppr":
        x0 = alpha * x

        def body(_, carry):
            cur, acc = carry
            cur = (1.0 - alpha) * apply_p(cur)
            return cur, acc + cur

        _, prop = jax.lax.fori_loop(0, order, body, (x0, x0))
        return prop
    if mode == "avg":
        def body(_, carry):
            cur, acc = carry
            cur = apply_p(cur)
            return cur, acc + cur

        _, acc = jax.lax.fori_loop(0, order, body, (x, x))
        return acc / (order + 1)
    if mode == "single":
        return jax.lax.fori_loop(0, order, lambda _, v: apply_p(v), x)
    raise ValueError(f"unknown propagation mode {mode!r}")


def exact_propagate(adj: sp.spmatrix, features, *, mode: str = "ppr",
                    order: int = 10, alpha: float = 0.2,
                    dense_threshold: int = 20000,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Propagate [n, F] features through the self-looped adjacency.

    `features` may be a numpy array or an already-device jnp array.
    Returns the propagated [n, F] device array.
    """
    n = adj.shape[0]
    deg = np.asarray(adj.sum(1)).flatten()
    dinv = jnp.asarray(1.0 / np.maximum(deg, 1e-12), dtype)
    use_dense = n <= dense_threshold
    if use_dense:
        adj_op = jnp.asarray(np.asarray(adj.todense()), dtype)
    else:
        adj_op = PaddedCSR.from_scipy(adj)
    x = jnp.asarray(features, dtype)
    return _propagate_device(adj_op, dinv, x, mode=mode, order=order,
                             alpha=float(alpha), use_dense=use_dense)
