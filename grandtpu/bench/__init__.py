"""Benchmark harnesses: SpMM propagation and GFPush throughput.

``/root/repo/bench.py`` (the driver entry) wraps the SpMM harness; the push
harness and scaling sweeps run manually:

    python -m grandtpu.bench.push        # GFPush sources/s
    python -m grandtpu.bench.scaling     # sharded propagation sweep
    python -m grandtpu.bench.train_step  # pure-device step latency
"""
