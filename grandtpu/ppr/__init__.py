"""GFPush precompute: row-sparse top-k approximation of the generalized
propagation matrix Pi = sum_n coef_n (D^-1 A)^n.

Three interchangeable backends, all returning the padded [n_src, K] layout
(see ``grandtpu.sparse.topk``):

- ``oracle``   numpy reference implementation (exact reference semantics)
- ``native``   C++/OpenMP kernel via ctypes (flat open-addressing maps,
               race-free by disjoint output slices)
- ``jax_push`` batched dense-residue formulation on TPU (static hop count,
               masked rmax pruning, lax.top_k)
"""

from grandtpu.ppr.coef import build_coef  # noqa: F401
from grandtpu.ppr.oracle import gfpush_numpy  # noqa: F401
from grandtpu.ppr.api import gfpush  # noqa: F401
from grandtpu.ppr.cache import cached_gfpush  # noqa: F401
