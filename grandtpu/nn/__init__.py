"""Model layer: MLP classifier, DropNode random propagation, losses.

Functional JAX (pytree params + pure apply fns) — no framework dependency,
so BatchNorm train/eval semantics can match torch exactly (the reference
trains with batches as small as 5, where BN details matter).
"""

from grandtpu.nn.mlp import MLPParams, init_mlp, apply_mlp  # noqa: F401
from grandtpu.nn.dropnode import random_prop  # noqa: F401
from grandtpu.nn.losses import consis_loss, nll_loss  # noqa: F401
