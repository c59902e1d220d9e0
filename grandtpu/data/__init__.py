"""Dataset layer: loaders, split generation, preprocessing. numpy/scipy only.

Covers the reference's L1/L0 layers (``utils/data_loader.py``,
``utils/dataio.py``, ``utils/make_dataset.py``, ``utils/preprocess.py``,
``dataset/citation``) without torch or networkx.
"""

from grandtpu.data.registry import GraphData, load_data  # noqa: F401
from grandtpu.data.splits import (  # noqa: F401
    get_train_val_test_split,
    sample_per_class,
)
from grandtpu.data.synthetic import synthetic_graph  # noqa: F401
