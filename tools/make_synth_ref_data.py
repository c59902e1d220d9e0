"""Dump fixed-seed synthetic graphs in the reference's on-disk formats.

Round-4 parity plan (VERDICT r3 item 1+5): the 4 large-graph engine paths
(aminer / reddit / Amazon2M / mag_scholar_c presets) and the pubmed preset
shape have never been compared against the reference on identical data —
the real datasets are not bundled and there is no egress. This tool writes
ONE synthetic stand-in per dataset, sized so the preset is exercised
faithfully (same C, same feature regime, same engine) and hard enough that
accuracy is non-trivial, in EXACTLY the file formats the reference loader
consumes (``utils/data_loader.py:21-129``):

- aminer        pickles:  <dir>/aminer/aminer.{adj.sp,features,labels}.pkl
- reddit        npz+npy:  <dir>/reddit/reddit_{adj.npz,feat.npy,labels.npy}
- Amazon2M      npz+npy:  <dir>/Amazon2M/Amazon2M_{adj.npz,feat.npy,labels.npy}
- mag_scholar_c raw npz:  <dir>/mag_scholar_c.npz  (adj_matrix.* + attr_matrix.*
                          + int labels; NOTE no subdir — the reference path
                          concat ``path + dataset_str`` breaks with one)
- pubmed        planetoid pickles: <dir>/citation/ind.pubmed.*

Both engines then read the SAME files: the reference via a workdir
``dataset`` symlink (tools/run_reference.py --data_dir), grandtpu via
$GRANDTPU_DATA_DIR. Split parity is draw-for-draw (grandtpu's splits.py is
RandomState-identical, tested), so identical arrays => identical splits.

Usage:
    python tools/make_synth_ref_data.py [--out build/refdata_synth] [--only aminer]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np
import scipy.sparse as sp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from grandtpu.data.synthetic import synthetic_graph  # noqa: E402

# Difficulty calibrated empirically (tools/ probe runs; see RESULTS.md r4
# parity section): feature_noise / bow_uniform_frac / p_in_over_p_out tuned
# so the REFERENCE engine lands ~0.7-0.9 test accuracy — separable enough
# to learn, noisy enough that engine differences would show.
SPECS = {
    "aminer": dict(num_nodes=60000, num_classes=18, num_features=100,
                   avg_degree=10.0, p_in_over_p_out=4.0, feature_noise=3.0,
                   seed=41),
    "reddit": dict(num_nodes=30000, num_classes=41, num_features=602,
                   avg_degree=15.0, p_in_over_p_out=4.0, feature_noise=4.4,
                   seed=42),
    "Amazon2M": dict(num_nodes=100000, num_classes=47, num_features=100,
                     avg_degree=10.0, p_in_over_p_out=4.0, feature_noise=2.2,
                     seed=43),
    "mag_scholar_c": dict(num_nodes=50000, num_classes=8,
                          num_features=20000, sparse_features=True,
                          feature_nnz=40, bow_uniform_frac=0.15,
                          label_noise=0.1, avg_degree=10.0,
                          p_in_over_p_out=4.0, seed=44),
    "pubmed": dict(num_nodes=19717, num_classes=3, num_features=500,
                   avg_degree=4.5, p_in_over_p_out=4.0, feature_noise=7.0,
                   nonneg_features=True, seed=45),
}


def dump_aminer(out: str, adj, feats, onehot) -> None:
    d = os.path.join(out, "aminer")
    os.makedirs(d, exist_ok=True)
    # reference: pkl adj (csr), features (dense ndarray, col_normalized by
    # the loader), labels (onehot — fed straight to get_train_val_test_split)
    with open(os.path.join(d, "aminer.adj.sp.pkl"), "wb") as f:
        pickle.dump(adj, f, protocol=4)
    with open(os.path.join(d, "aminer.features.pkl"), "wb") as f:
        pickle.dump(np.asarray(feats, np.float32), f, protocol=4)
    with open(os.path.join(d, "aminer.labels.pkl"), "wb") as f:
        pickle.dump(onehot.astype(np.float32), f, protocol=4)


def dump_npy_family(out: str, name: str, adj, feats, onehot) -> None:
    d = os.path.join(out, name)
    os.makedirs(d, exist_ok=True)
    sp.save_npz(os.path.join(d, f"{name}_adj.npz"), adj)
    np.save(os.path.join(d, f"{name}_feat.npy"), np.asarray(feats,
                                                            np.float32))
    np.save(os.path.join(d, f"{name}_labels.npy"), onehot.astype(np.float32))


def dump_mag(out: str, adj, feats, onehot) -> None:
    # raw npz with flattened-CSR keys (utils/data_loader.py:65-83); labels
    # are INT class ids there (np.eye applied by the loader)
    labels_num = np.argmax(onehot, axis=1).astype(np.int64)
    np.savez(os.path.join(out, "mag_scholar_c.npz"),
             **{"adj_matrix.data": adj.data,
                "adj_matrix.indices": adj.indices,
                "adj_matrix.indptr": adj.indptr,
                "adj_matrix.shape": np.asarray(adj.shape),
                "attr_matrix.data": feats.data,
                "attr_matrix.indices": feats.indices,
                "attr_matrix.indptr": feats.indptr,
                "attr_matrix.shape": np.asarray(feats.shape),
                "labels": labels_num})


def dump_planetoid_pubmed(out: str, adj, feats, onehot,
                          n_test: int = 1000, seed: int = 0) -> None:
    """Planetoid pickle protocol (reference ``utils/data_loader.py:85-129``):

    node ids 0..n_allx-1 are allx rows (train+unlabeled), ids
    n_allx..n-1 are test nodes; ``test.index`` lists the test ids in tx row
    order (shuffled, like the real files). The first len(y) nodes are the
    labeled training set — planetoid pubmed has 60 (20 per class), so the
    generator output is REORDERED here to put a balanced 20/class sample
    first. idx_val = next 500 nodes (loader convention).
    """
    rng = np.random.RandomState(seed)
    n = adj.shape[0]
    labels_int = np.argmax(onehot, axis=1)
    c = onehot.shape[1]

    # pick 20/class for the head, then shuffle the rest; permute everything
    train_ids = np.concatenate(
        [rng.permutation(np.flatnonzero(labels_int == k))[:20]
         for k in range(c)])
    rest = np.setdiff1d(np.arange(n), train_ids)
    rng.shuffle(rest)
    perm = np.concatenate([train_ids, rest])          # new order -> old id
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    adj = adj[perm][:, perm].tocsr()
    feats = np.asarray(feats, np.float32)[perm]
    onehot = onehot[perm].astype(np.float32)

    n_allx = n - n_test
    n_train = 20 * c
    x = sp.csr_matrix(feats[:n_train])
    y = onehot[:n_train]
    allx = sp.csr_matrix(feats[:n_allx])
    ally = onehot[:n_allx]
    test_reorder = rng.permutation(np.arange(n_allx, n))
    tx = sp.csr_matrix(feats[test_reorder])
    ty = onehot[test_reorder]

    coo = adj.tocoo()
    graph = {i: [] for i in range(n)}
    for i, j in zip(coo.row.tolist(), coo.col.tolist()):
        graph[i].append(j)

    d = os.path.join(out, "citation")
    os.makedirs(d, exist_ok=True)
    for name, obj in [("x", x), ("y", y), ("tx", tx), ("ty", ty),
                      ("allx", allx), ("ally", ally), ("graph", graph)]:
        with open(os.path.join(d, f"ind.pubmed.{name}"), "wb") as f:
            pickle.dump(obj, f, protocol=4)
    with open(os.path.join(d, "ind.pubmed.test.index"), "w") as f:
        f.write("\n".join(str(i) for i in test_reorder.tolist()) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "build",
                                                  "refdata_synth"))
    ap.add_argument("--only", default=None, choices=list(SPECS))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    names = [args.only] if args.only else list(SPECS)
    for name in names:
        spec = SPECS[name]
        adj, feats, onehot = synthetic_graph(**spec)
        if name == "aminer":
            dump_aminer(args.out, adj, feats, onehot)
        elif name in ("reddit", "Amazon2M"):
            dump_npy_family(args.out, name, adj, feats, onehot)
        elif name == "mag_scholar_c":
            dump_mag(args.out, adj, feats, onehot)
        elif name == "pubmed":
            dump_planetoid_pubmed(args.out, adj, feats, onehot,
                                  seed=spec["seed"])
        print(f"{name}: n={adj.shape[0]} edges={adj.nnz} "
              f"C={onehot.shape[1]} F={feats.shape[1]}")
    # full spec table regardless of --only (a partial regen must not drop
    # the other datasets' provenance)
    with open(os.path.join(args.out, "MANIFEST.json"), "w") as f:
        json.dump(SPECS, f, indent=1)


if __name__ == "__main__":
    main()
