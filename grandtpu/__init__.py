"""grandtpu — a TPU-native framework for GRAND+-style scalable graph learning.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
THUDM/GRAND-plus (WWW'22 "GRAND+: Scalable Graph Random Neural Networks"):

- ``grandtpu.data``    dataset registry, loaders, split generation (numpy only)
- ``grandtpu.ppr``     generalized forward push (GFPush) precompute:
                       numpy oracle, native C++/OpenMP kernel, batched JAX push
- ``grandtpu.sparse``  static-shape sparse containers + SpMM (segment-sum and
                       Pallas kernels)
- ``grandtpu.nn``      MLP classifier, DropNode random propagation, losses
- ``grandtpu.train``   jitted train/eval steps, host-side early stopping,
                       checkpointing
- ``grandtpu.infer``   exact full-graph power-iteration propagation + classify
- ``grandtpu.dist``    device-mesh sharding: row-partitioned propagation,
                       data-parallel training (shard_map over ICI collectives)
- ``grandtpu.cli``     per-dataset presets and the experiment driver
- ``grandtpu.bench``   edges/s throughput harnesses

Unlike the reference (single-GPU PyTorch + pybind11/OpenMP), every hot path
here is built around static shapes so XLA can tile it onto the MXU/VPU, and
scale-out is expressed with ``jax.sharding.Mesh`` + ``shard_map`` collectives.
"""

__version__ = "0.1.0"
