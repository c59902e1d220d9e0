"""Inference: exact full-graph propagation + batched classification.

The reference's ``predict`` (``model.py:169-224``): after training on the
approximate top-k matrix, test-time propagates the FULL graph exactly by
power iteration and classifies every node. Keep this asymmetry — do not
unify with the top-k path (SURVEY.md §7.3 item 5).
"""

from grandtpu.infer.propagate import (  # noqa: F401
    Propagator, choose_fast_precision, exact_propagate)
from grandtpu.infer.classify import predict_logits, test_accuracy  # noqa: F401
