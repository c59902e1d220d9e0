"""Custom TPU kernels (Pallas).

Hot ops where hand-fusion beats XLA's default lowering. Each kernel ships
with a pure-XLA fallback and an interpret-mode test path so the suite runs
on any backend.
"""

from grandtpu.ops.dropnode_pallas import dropnode_aggregate  # noqa: F401
