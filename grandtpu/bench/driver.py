"""Benchmark harness — run on the real TPU chip.

Headline metric: edges/s of the exact-propagation SpMM power iteration (the
reference's HOT LOOP #3, scipy ``adj.dot`` on the host, ``model.py:186-210``
— which is also the measurement BASELINE.md names). vs_baseline compares
against the reference engine: the identical power iteration with scipy CSR
SpMM on this host's CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Details go to stderr.
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

# Pinned idle-host reference-engine denominator (VERDICT r4 #4b): the live
# scipy measurement moves up to 3x with host load (it polluted the r2 push
# numbers and made BENCH_r04's vs_baseline disagree with the same-code
# RESULTS.md re-run 174.9x vs 215.5x), so the official ratio uses a
# committed idle-host value and the live measurement is reported alongside.
# Protocol: best of 10 runs of ``bench_host_scipy`` on the standard bench
# graph (n=300K, nnz=6.63M, F=128, order=5) on an idle host (load<1,
# only the session agent running), measured 2026-08-20 (spread observed:
# 1.37e6-2.25e6 — the 1.6x noise band is exactly why the ratio is pinned).
# Re-pin if the host hardware changes.
PINNED_HOST_BASELINE_EDGES_PER_S = 2.249e6


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def enable_compilation_cache():
    """Persistent XLA compilation cache (VERDICT r4 #4a): amortizes the
    intermittent 100-216s remote-compile spike seen through the axon
    tunnel since r2 — once any round has compiled the bench executables,
    later runs deserialize instead of recompiling. Must run before the
    first jit."""
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "build", "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything: the spike hits executables whose normal compile is
    # seconds, so the default 1s/small-entry thresholds must not skip them
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


def build_graph(n=300_000, avg_degree=30, f=128, seed=0):
    from grandtpu.data import synthetic_graph
    t0 = time.time()
    adj, _, _ = synthetic_graph(num_nodes=n, num_classes=8, num_features=4,
                                avg_degree=avg_degree, seed=seed)
    adj = (adj + sp.eye(n, format="csr")).tocsr()
    rs = np.random.RandomState(1)
    feats = rs.rand(n, f).astype(np.float32)
    log(f"graph: n={n} nnz={adj.nnz} f={f} built in "
        f"{time.time() - t0:.1f}s")
    return adj, feats


def warmup_device():
    """Absorb the tunnel's first-op stall OUTSIDE any timed section.

    The intermittent 100-260s spike documented since r2 attaches to the
    FIRST device execution of a fresh connection, not to compilation —
    r5 measured it at 261s on a run whose compiles were all cache hits
    (0.3-0.5s), and an independent trivial matmul absorbed 80s right
    after a reconnect. Running one throwaway op first keeps the spike out
    of every per-precision compile/run measurement."""
    import jax
    import jax.numpy as jnp
    t0 = time.time()
    x = jnp.ones((128, 128))
    float(jnp.sum(jnp.dot(x, x)))
    dt = time.time() - t0
    log(f"device warmup (tunnel first-op): {dt:.1f}s"
        + (" [first-op stall absorbed here]" if dt > 30 else ""))


def bench_tpu_spmm(prop, feats, order=5, alpha=0.2, repeats=5,
                   precision="bf16"):
    import jax
    import jax.numpy as jnp

    feats = jnp.asarray(feats)   # device-resident: the tunnel to the chip
    jax.block_until_ready(feats)  # makes per-call host uploads dominate

    def sync(o):
        # block_until_ready alone can return early through the axon tunnel
        # (observed on f32 executables); a scalar fetch cannot
        jax.block_until_ready(o)
        return float(jnp.sum(o[:1, :1]))

    label = f"{precision}-block"
    t0 = time.time()
    out = prop(feats, mode="ppr", order=order, alpha=alpha,
               precision=precision)
    sync(out)
    compile_s = time.time() - t0
    # compile time through the tunnel is normally seconds-to-tens-of-
    # seconds; log it so spikes (125s seen in BENCH_r02, tunnel noise)
    # stay visible instead of silently distorting interpretation
    log(f"tpu {label} compile+first run: {compile_s:.1f}s on "
        f"{jax.devices()[0]}"
        + (" [ANOMALOUS — tunnel noise suspected]" if compile_s > 60 else ""))

    # dispatch all repeats, sync once: the chip runs launches in order on
    # one stream, so one end-of-batch sync amortizes the ~25ms tunnel
    # round-trip instead of paying it per call
    t0 = time.time()
    for _ in range(repeats):
        out = prop(feats, mode="ppr", order=order, alpha=alpha,
                   precision=precision)
    sync(out)
    per_call = (time.time() - t0) / repeats
    edges_per_s = prop.nnz * order / per_call
    log(f"tpu spmm {label}: {per_call:.3f}s/call over {repeats} -> "
        f"{edges_per_s:.3e} edges/s")
    return edges_per_s, np.asarray(out)


def bench_host_scipy(adj, feats, order=5, alpha=0.2):
    """The reference engine: scipy CSR SpMM power iteration on host CPU
    (model.py:186-194)."""
    x = alpha * feats.astype(np.float32)
    prop = x.copy()
    deg = np.asarray(adj.sum(1)).flatten()
    dia = ((1 - alpha) / np.maximum(deg, 1e-12)).astype(np.float32)
    t0 = time.time()
    for _ in range(order):
        x = dia[:, None] * adj.dot(x)
        prop += x
    dt = time.time() - t0
    edges_per_s = adj.nnz * order / dt
    log(f"host scipy spmm: {dt:.3f}s -> {edges_per_s:.3e} edges/s")
    return edges_per_s, prop


def main():
    order = 5
    cache_dir = enable_compilation_cache()
    log(f"persistent compilation cache: {cache_dir}")
    adj, feats = build_graph()
    host_eps, host_out = bench_host_scipy(adj, feats, order=order)
    warmup_device()
    from grandtpu.infer import Propagator
    prop = Propagator(adj, backend="block")
    prop.nnz = adj.nnz
    # int8's optimal row-block size differs (288 vs 512 — smaller gather
    # granule, RESULTS.md): give it its own operator like production does
    prop_q8 = Propagator(adj, backend="block", rows_per_block=288)
    prop_q8.nnz = adj.nnz
    f32_eps, f32_out = bench_tpu_spmm(prop, feats, order=order,
                                      precision="f32")
    bf16_eps, bf16_out = bench_tpu_spmm(prop, feats, order=order,
                                        precision="bf16")
    q8_eps, q8_out = bench_tpu_spmm(prop_q8, feats, order=order,
                                    precision="int8")
    # numerics gates: f32 path must match the reference engine tightly;
    # both fast paths within the same 5e-3 tolerance (measured: bf16
    # ~8e-4, int8 ~4.3e-3 over the 5-hop ppr on this graph)
    scale = max(np.max(np.abs(host_out)), 1e-9)
    err32 = np.max(np.abs(f32_out - host_out)) / scale
    err16 = np.max(np.abs(bf16_out - host_out)) / scale
    err8 = np.max(np.abs(q8_out - host_out)) / scale
    log(f"max rel err vs host: f32 {err32:.2e}, bf16 {err16:.2e}, "
        f"int8 {err8:.2e}")
    log(f"edges/s: f32 {f32_eps:.3e}, bf16 {bf16_eps:.3e}, "
        f"int8 {q8_eps:.3e}")
    assert err32 < 1e-4, "f32 TPU propagation diverged from reference"
    assert err16 < 5e-3, "bf16 TPU propagation outside bf16 tolerance"
    assert err8 < 5e-3, "int8 TPU propagation outside fast-path tolerance"
    # headline: the FASTEST path passing the 5e-3 fast-path gate bf16 was
    # held to since r1 — int8 on this graph, but the ranking is regime-
    # dependent (bf16 wins at 5M nodes/deg 14, RESULTS.md), so measure,
    # don't hardcode
    best_eps, best_name = max((q8_eps, "int8"), (bf16_eps, "bf16"))
    log(f"headline path: {best_name}")
    log(f"vs_baseline: {best_eps / PINNED_HOST_BASELINE_EDGES_PER_S:.1f}x "
        f"(pinned idle-host denominator "
        f"{PINNED_HOST_BASELINE_EDGES_PER_S:.3e}); live host measured "
        f"{host_eps:.3e} -> {best_eps / host_eps:.1f}x")
    print(json.dumps({
        "metric": "spmm_propagation_edges_per_s",
        "value": best_eps,
        "unit": "edges/s",
        # official ratio on the PINNED idle-host denominator; the live
        # measurement rides along for drift detection
        "vs_baseline": best_eps / PINNED_HOST_BASELINE_EDGES_PER_S,
        "vs_baseline_live": best_eps / host_eps,
        "host_live_edges_per_s": host_eps,
    }), flush=True)


if __name__ == "__main__":
    main()
