"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports,
so multi-chip sharding paths run as real SPMD programs on any machine
(SURVEY.md §4 item 4). Bench/real-TPU runs bypass pytest entirely."""

import os

# GRANDTPU_REAL_DEVICE=1 runs the suite against the real accelerator (used
# to execute the TPU-gated Pallas PRNG tests on hardware); default is the
# virtual CPU mesh.
_REAL = os.environ.get("GRANDTPU_REAL_DEVICE") == "1"

if not _REAL:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

# jax may already be imported by pytest plugin autoload, in which case the
# env var was read too late — force the config directly (backend init is
# lazy, so this still takes effect as long as no devices were created).
import jax  # noqa: E402

if not _REAL:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cora():
    from grandtpu.data import load_data
    return load_data("cora", split_seed=42)


@pytest.fixture(scope="session")
def small_graph():
    """Deterministic small synthetic graph with self-loops added."""
    from grandtpu.data import synthetic_graph
    import scipy.sparse as sp
    adj, feats, labels = synthetic_graph(
        num_nodes=120, num_classes=3, num_features=16, seed=3)
    adj_sl = (adj + sp.eye(adj.shape[0], format="csr")).tocsr()
    return adj_sl, feats, labels


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
