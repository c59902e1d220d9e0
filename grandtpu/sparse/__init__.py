"""Static-shape sparse containers and SpMM primitives for TPU.

- ``topk``  padded [n_src, K] top-k propagation rows (the training-side Pi)
- ``spmm``  full-graph sparse @ dense: dense MXU path (small graphs),
            BlockCSR one-hot-matmul path (the TPU SpMM kernel — see the
            design note in RESULTS.md: Mosaic has no row-gather, so the
            MXU formulation in XLA is the hand-optimized kernel here),
            padded-edge segment-sum fallback
"""

from grandtpu.sparse.topk import TopKProp  # noqa: F401
from grandtpu.sparse.spmm import (  # noqa: F401
    BlockCSR,
    OffsetBlockCSR,
    PaddedCSR,
    SplitCSR,
    spmm_block,
    spmm_block_offset,
    spmm_segment,
    spmm_split,
    spmm_split_q8,
    quantize_columns,
)
