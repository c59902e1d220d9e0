"""Static-shape sparse containers and SpMM primitives for TPU.

- ``topk``  padded [n_src, K] top-k propagation rows (the training-side Pi)
- ``spmm``  full-graph sparse @ dense: dense MXU path for small graphs,
            padded-edge segment-sum path for large graphs
- ``pallas_spmm`` hand-written row-blocked Pallas SpMM kernel
"""

from grandtpu.sparse.topk import TopKProp  # noqa: F401
from grandtpu.sparse.spmm import (  # noqa: F401
    PaddedCSR,
    spmm_segment,
)
