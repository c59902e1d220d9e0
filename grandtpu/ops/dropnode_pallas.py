"""Fused DropNode aggregation as a Pallas TPU kernel.

Computes, for each source row b:

    keep_bk ~ Bernoulli(1 - p)            (generated IN-KERNEL, pltpu PRNG)
    w_bk    = keep_bk * vals_bk
    out_bf  = sum_k w_bk * feats_bkf / (sum_k w_bk + 1e-12)

in one VMEM-resident pass: the mask never materializes in HBM, the random
bits come from the on-core PRNG (far cheaper than threefry in XLA), and the
weighted reduction over K rides the MXU via a [TB, K] x [TB, K, F]
batched contraction.

Numerics match ``grandtpu.nn.dropnode.random_prop`` given the same mask;
the mask stream itself differs from jax.random (documented — parity with
the reference is distributional anyway, SURVEY.md §7.3 item 9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, vals_ref, feats_ref, out_ref, *, p: float):
    b_idx = pl.program_id(0)
    vals = vals_ref[:]                       # [TB, K]
    if p > 0.0:
        pltpu.prng_seed(seed_ref[0] + b_idx)
        bits = pltpu.prng_random_bits(vals.shape)          # uint32
        threshold = jnp.uint32(min(int(p * (1 << 32)), (1 << 32) - 1))
        keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
        w = jnp.where(keep, vals, 0.0)
    else:
        w = vals
    feats = feats_ref[:]                     # [TB, K, F]
    num = jax.lax.dot_general(
        w[:, None, :], feats,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [TB, 1, F]
    den = jnp.sum(w, axis=-1)[:, None, None]
    out_ref[:] = (num / (den + 1e-12))[:, 0, :]


@functools.partial(jax.jit,
                   static_argnames=("dropnode_rate", "tile_b", "interpret"))
def dropnode_aggregate(feats: jnp.ndarray, vals: jnp.ndarray,
                       seed: jnp.ndarray, *, dropnode_rate: float = 0.5,
                       tile_b: int = 8,
                       interpret: bool = False) -> jnp.ndarray:
    """feats [B, K, F] float32, vals [B, K] float32, seed int32 scalar
    -> [B, F]. B must be a multiple of tile_b (pad rows with zero vals)."""
    b, k, f = feats.shape
    assert b % tile_b == 0, f"B={b} not a multiple of tile_b={tile_b}"
    grid = (b // tile_b,)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    kernel = functools.partial(_kernel, p=float(dropnode_rate))
    # interpret mode (CPU tests): the TPU interpreter stubs prng_random_bits
    # to zeros, so only the p=0 deterministic path is testable off-TPU
    interp = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_b, k), lambda i, *_: (i, 0)),
                pl.BlockSpec((tile_b, k, f), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((tile_b, f), lambda i, *_: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, f), jnp.float32),
        interpret=interp,
    )(seed_arr, vals, feats)
