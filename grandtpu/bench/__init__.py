"""Benchmark harnesses: SpMM propagation and GFPush throughput.

``/root/repo/bench.py`` (the driver entry) wraps the SpMM harness; the push
harness and scaling sweeps run manually:

    python -m grandtpu.bench.push
    python -m grandtpu.bench.spmm
"""
