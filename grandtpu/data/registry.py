"""Dataset registry: one `load_data` entry point for every dataset family.

Covers the per-dataset dispatch of reference ``utils/data_loader.py:15-144``:

- planetoid pickles            cora / citeseer / pubmed
- pickled arrays + standardize aminer
- SparseGraph npz              ms_academic_cs/phy, amazon photo/computers,
                               cora_full
- npz adjacency + npy arrays   reddit, Amazon2M
- raw npz CSR adj AND features mag_scholar_c / mag_scholar_f
- synthetic SBM                synth:* (grandtpu-only, for tests/benchmarks)

The data directory resolves from $GRANDTPU_DATA_DIR, then ``./dataset``, then
the read-only reference mount's bundled citation data.
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import numpy as np
import scipy.sparse as sp

from grandtpu.data import preprocess as pp
from grandtpu.data.planetoid import load_planetoid
from grandtpu.data.sparsegraph import load_npz_to_sparse_graph
from grandtpu.data.splits import get_train_val_test_split
from grandtpu.data.synthetic import synthetic_graph

_FALLBACK_DIRS = (
    "dataset",
    "/root/reference/dataset",
)

NPZ_FAMILY = ("ms_academic_cs", "ms_academic_phy",
              "amazon_electronics_photo", "amazon_electronics_computers",
              "cora_full")
PLANETOID = ("cora", "citeseer", "pubmed")


@dataclasses.dataclass
class GraphData:
    """Loaded dataset: adjacency + features + one-hot labels + splits."""
    adj: sp.csr_matrix                 # [n, n], no self loops added yet
    features: object                   # dense float32 [n, f] or CSR
    labels: np.ndarray                 # one-hot float32 [n, c]
    idx_train: np.ndarray
    idx_val: np.ndarray
    idx_test: np.ndarray
    idx_unlabel: np.ndarray
    name: str = ""

    @property
    def num_nodes(self) -> int:
        return self.adj.shape[0]

    @property
    def num_features(self) -> int:
        return self.features.shape[1]

    @property
    def num_classes(self) -> int:
        return self.labels.shape[1]

    @property
    def labels_int(self) -> np.ndarray:
        return np.argmax(self.labels, axis=-1).astype(np.int32)

    @property
    def has_sparse_features(self) -> bool:
        return sp.issparse(self.features)


def _resolve_dir(dataset_str: str) -> str:
    env = os.environ.get("GRANDTPU_DATA_DIR")
    candidates = ([env] if env else []) + list(_FALLBACK_DIRS)
    for base in candidates:
        if base is None:
            continue
        sub = os.path.join(base, dataset_str)
        if os.path.isdir(sub):
            return sub
        if dataset_str in PLANETOID and os.path.isdir(
                os.path.join(base, "citation")):
            return os.path.join(base, "citation")
        if os.path.isdir(base):
            # family-specific files may live directly in base
            return base
    raise FileNotFoundError(
        f"could not locate a data dir for {dataset_str!r}; set "
        f"$GRANDTPU_DATA_DIR (tried {candidates})")


def load_data(dataset_str: str = "cora", split_seed: int = 0,
              renormalize: bool = False) -> GraphData:
    """Load a dataset with reference split semantics
    (``utils/data_loader.py:15-144``)."""
    if dataset_str.startswith("synth:"):
        data = _load_synthetic(dataset_str, split_seed)
        if renormalize:
            data.adj = pp.sym_renormalize(data.adj)
        return data

    path = _resolve_dir(dataset_str)
    try:
        return _load_from_disk(dataset_str, path, split_seed, renormalize)
    except FileNotFoundError as e:
        raise FileNotFoundError(
            f"{e} — dataset {dataset_str!r} files were not found; download "
            f"them (grandtpu.data.download) and point $GRANDTPU_DATA_DIR at "
            f"the directory, or use a 'synth:<n>:<c>:<f>' spec") from None


def _load_from_disk(dataset_str: str, path: str, split_seed: int,
                    renormalize: bool) -> GraphData:

    if dataset_str in PLANETOID:
        adj, feats, labels, itr, iva, ite, iun = load_planetoid(
            dataset_str, path)
        data = GraphData(adj, feats, labels, itr, iva, ite, iun, dataset_str)
    elif dataset_str == "aminer":
        adj = _pkl(os.path.join(path, "aminer.adj.sp.pkl"))
        feats = _pkl(os.path.join(path, "aminer.features.pkl"))
        labels = _pkl(os.path.join(path, "aminer.labels.pkl"))
        labels = pp.binarize_labels(labels)
        feats = pp.col_standardize(feats).astype(np.float32)
        data = _split_stratified(adj, feats, labels, split_seed, dataset_str)
    elif dataset_str in NPZ_FAMILY:
        g = load_npz_to_sparse_graph(os.path.join(path, dataset_str + ".npz"))
        if dataset_str == "cora_full":
            keep = pp.remove_underrepresented_classes(g.labels, 20, 30)
            g = g.subgraph(keep)
        g = g.standardize()
        adj, feats, labels = g.unpack()
        labels = pp.binarize_labels(labels)
        if feats is not None and not pp.is_binary_bag_of_words(feats):
            feats = pp.to_binary_bag_of_words(feats)
        assert (adj != adj.T).nnz == 0
        feats = np.asarray(feats.todense(), dtype=np.float32)
        data = _split_stratified(adj, feats, labels, split_seed, dataset_str)
    elif dataset_str == "reddit":
        adj = sp.load_npz(os.path.join(path, "reddit_adj.npz")).tocsr()
        feats = np.load(os.path.join(path, "reddit_feat.npy"))
        labels = np.load(os.path.join(path, "reddit_labels.npy"))
        labels = pp.binarize_labels(labels)
        data = _split_stratified(adj, feats, labels, split_seed, dataset_str)
    elif dataset_str == "Amazon2M":
        adj = sp.load_npz(os.path.join(path, "Amazon2M_adj.npz")).tocsr()
        feats = np.load(os.path.join(path, "Amazon2M_feat.npy"))
        labels = np.load(os.path.join(path, "Amazon2M_labels.npy"))
        labels = pp.binarize_labels(labels)
        c = labels.shape[1]
        rs = np.random.RandomState(split_seed)
        itr, iva, ite = get_train_val_test_split(
            rs, labels, train_size=20 * c, val_size=30 * c)
        iun = np.concatenate((iva, ite))
        data = GraphData(adj, feats, labels, itr, iva, ite, iun, dataset_str)
    elif dataset_str in ("mag_scholar_c", "mag_scholar_f"):
        with np.load(os.path.join(path, dataset_str + ".npz")) as d:
            adj = sp.csr_matrix(
                (d["adj_matrix.data"], d["adj_matrix.indices"],
                 d["adj_matrix.indptr"]), shape=d["adj_matrix.shape"])
            feats = sp.csr_matrix(
                (d["attr_matrix.data"], d["attr_matrix.indices"],
                 d["attr_matrix.indptr"]), shape=d["attr_matrix.shape"])
            labels_num = d["labels"]
        labels = np.eye(int(labels_num.max()) + 1,
                        dtype=np.float32)[labels_num]
        data = _split_stratified(adj, feats, labels, split_seed, dataset_str)
    else:
        raise NotImplementedError(f"unknown dataset {dataset_str!r}")

    if renormalize:
        data.adj = pp.sym_renormalize(data.adj)
    return data


def _split_stratified(adj, feats, labels, split_seed, name,
                      train_per_class=20, val_per_class=30) -> GraphData:
    rs = np.random.RandomState(split_seed)
    itr, iva, ite = get_train_val_test_split(
        rs, labels, train_examples_per_class=train_per_class,
        val_examples_per_class=val_per_class)
    iun = np.concatenate((iva, ite))
    return GraphData(adj.tocsr(), feats, labels, itr, iva, ite, iun, name)


def _load_synthetic(spec: str, split_seed: int) -> GraphData:
    """Spec: 'synth:<nodes>[:<classes>[:<features>[:sparse]]]'."""
    parts = spec.split(":")[1:]
    n = int(parts[0]) if parts and parts[0] else 400
    c = int(parts[1]) if len(parts) > 1 and parts[1] else 4
    f = int(parts[2]) if len(parts) > 2 and parts[2] else 32
    sparse_feats = len(parts) > 3 and parts[3] == "sparse"
    adj, feats, labels = synthetic_graph(
        num_nodes=n, num_classes=c, num_features=f,
        sparse_features=sparse_feats, seed=7)
    return _split_stratified(adj, feats, labels, split_seed, spec)


def _pkl(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
