"""Losses: supervised NLL + sharpened consistency regularization.

Consistency loss parity with reference ``model.py:123-140``: average the K
augmentation probability vectors, temperature-sharpen the average (stopped
gradient), then per-augmentation L2 or KL distance to the sharpened target,
masked to rows whose average max-prob exceeds the confidence threshold
(2/n_class, reference ``model.py:328``).

Edge case the reference leaves NaN-prone: an empty confidence mask makes
``torch.mean`` of zero elements NaN. We use a mask-safe mean that returns 0
for an empty mask (documented divergence; it only changes runs that would
have NaN'd out).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def nll_loss(log_probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean negative log-likelihood; labels are int class ids [B]."""
    picked = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)
    return -jnp.mean(picked)


def consis_loss(log_prob_list, tem: float, conf: float,
                loss_kind: str = "l2", row_mask=None) -> jnp.ndarray:
    """log_prob_list: [K, U, C] stacked log-softmax outputs on unlabeled rows.

    Returns the scalar consistency loss (mean over augmentations of the
    confidence-masked per-row distance to the sharpened average).
    row_mask (optional [U] 0/1): real-row weights for wrap-padded unlabeled
    batches — padded duplicates drop out of both the mask and the mean, so
    the loss equals the reference's on the true smaller batch.
    """
    ps = jnp.exp(log_prob_list)                  # [K, U, C]
    avg_p = jnp.mean(ps, axis=0)                 # [U, C]
    powed = jnp.power(avg_p, 1.0 / tem)
    sharp_p = lax.stop_gradient(
        powed / jnp.sum(powed, axis=-1, keepdims=True))   # [U, C]

    mask = jnp.max(avg_p, axis=-1) > conf        # [U]
    if row_mask is not None:
        mask = jnp.logical_and(mask, row_mask > 0)
    denom = jnp.maximum(jnp.sum(mask), 1)

    if loss_kind == "kl":
        per_row = jnp.sum(-sharp_p[None] * log_prob_list, axis=-1)  # [K, U]
    elif loss_kind == "l2":
        per_row = jnp.sum((ps - sharp_p[None]) ** 2, axis=-1)       # [K, U]
    else:
        raise ValueError(f"unknown consistency loss {loss_kind!r}")

    masked = jnp.where(mask[None], per_row, 0.0)
    # mean over masked rows, then over K (reference sums per-k means / K)
    return jnp.sum(masked) / denom / log_prob_list.shape[0]
