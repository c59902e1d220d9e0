"""Train/val/test split generation.

Re-implements the stratified-split protocol of the reference
(``utils/make_dataset.py:58-136``) with identical RandomState call order so
that the same ``np.random.RandomState(seed)`` produces the same node splits —
split parity is a precondition for accuracy parity.
"""

from __future__ import annotations

import numpy as np


def sample_per_class(random_state: np.random.RandomState,
                     labels: np.ndarray,
                     num_examples_per_class: int,
                     forbidden_indices=None) -> np.ndarray:
    """Draw `num_examples_per_class` node ids per class, skipping forbidden.

    Mirrors reference ``utils/make_dataset.py:121-136``: candidates are
    enumerated in (class, node-id) order and drawn with
    ``random_state.choice(..., replace=False)`` per class — the call sequence
    is what makes splits reproducible across frameworks.
    """
    num_samples, num_classes = labels.shape
    forbidden = set() if forbidden_indices is None else set(
        np.asarray(forbidden_indices).tolist())
    picks = []
    for c in range(num_classes):
        members = np.nonzero(labels[:, c] > 0.0)[0]
        if forbidden:
            members = np.array(
                [m for m in members.tolist() if m not in forbidden],
                dtype=np.int64)
        picks.append(random_state.choice(
            members, num_examples_per_class, replace=False))
    return np.concatenate(picks)


def get_train_val_test_split(random_state: np.random.RandomState,
                             labels: np.ndarray,
                             train_examples_per_class: int | None = None,
                             val_examples_per_class: int | None = None,
                             test_examples_per_class: int | None = None,
                             train_size: int | None = None,
                             val_size: int | None = None,
                             test_size: int | None = None):
    """Stratified or size-based split; semantics of reference
    ``utils/make_dataset.py:58-118`` (incl. the "rest is test" default)."""
    num_samples, _ = labels.shape
    all_indices = np.arange(num_samples)

    if train_examples_per_class is not None:
        train_indices = sample_per_class(
            random_state, labels, train_examples_per_class)
    else:
        train_indices = random_state.choice(
            list(range(num_samples)), train_size, replace=False)

    if val_examples_per_class is not None:
        val_indices = sample_per_class(
            random_state, labels, val_examples_per_class,
            forbidden_indices=train_indices)
    else:
        remaining = np.setdiff1d(all_indices, train_indices)
        val_indices = random_state.choice(remaining, val_size, replace=False)

    forbidden = np.concatenate((train_indices, val_indices))
    if test_examples_per_class is not None:
        test_indices = sample_per_class(
            random_state, labels, test_examples_per_class,
            forbidden_indices=forbidden)
    elif test_size is not None:
        remaining = np.setdiff1d(all_indices, forbidden)
        test_indices = random_state.choice(remaining, test_size, replace=False)
    else:
        test_indices = np.setdiff1d(all_indices, forbidden)

    _check_split(labels, train_indices, val_indices, test_indices,
                 full_cover=(test_size is None
                             and test_examples_per_class is None),
                 train_per_class=train_examples_per_class,
                 val_per_class=val_examples_per_class,
                 test_per_class=test_examples_per_class)
    return train_indices, val_indices, test_indices


def _check_split(labels, train, val, test, *, full_cover,
                 train_per_class, val_per_class, test_per_class):
    """Invariant checks mirroring the reference's defensive asserts
    (``utils/make_dataset.py:89-116``)."""
    for part in (train, val, test):
        assert len(set(part.tolist())) == len(part), "duplicate ids in split"
    st, sv, ss = set(train.tolist()), set(val.tolist()), set(test.tolist())
    assert not (st & sv) and not (st & ss) and not (sv & ss), \
        "overlapping splits"
    if full_cover:
        assert len(train) + len(val) + len(test) == labels.shape[0]
    for part, per_class in ((train, train_per_class), (val, val_per_class),
                            (test, test_per_class)):
        if per_class is not None:
            counts = labels[part].sum(axis=0)
            assert np.unique(counts).size == 1, \
                "unequal per-class cardinality in stratified split"
