"""Training engine: jitted step functions + host-side experiment loop.

The reference's L3 engine (``model.py:227-373``) re-done TPU-first: the whole
batch step — K DropNode augmentations, MLP forwards with BN state threading,
supervised NLL + warmup-ramped consistency loss, Adam with coupled weight
decay, optional global-norm clipping — is ONE jitted program over static
[B, K] shapes; only shuffling, early stopping and checkpoint gating stay in
Python (SURVEY.md §7.3 item 7).
"""

from grandtpu.train.step import build_train_step, build_eval_step  # noqa: F401
from grandtpu.train.trainer import train, TrainResult  # noqa: F401
