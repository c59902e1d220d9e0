"""Run the UNMODIFIED reference implementation on this host for ground truth.

The reference (/root/reference, read-only) needs two binary deps this image
lacks: ``torch_scatter`` (CUDA extension) and its pybind11 ``propagation``
module. Both are shimmed in ``sys.modules`` with semantics-parity
replacements — the reference source itself is untouched:

- ``torch_scatter.scatter(..., reduce='sum')`` -> ``Tensor.index_add_``
- ``precompute.propagation.Graph.gfpush_omp`` -> grandtpu's native ctypes
  GFPush kernel (same algorithm as ``precompute/graph.h:53-131``; parity
  pinned by ``tests/test_gfpush_backends.py``)
- ``torch.cuda.set_device`` -> no-op (CPU-only torch build)

Presets are the verbatim flag lines from ``/root/reference/scripts/run_*.sh``
so the regenerated baselines use exactly the published protocol
(``run_model.py:83-99``: seed1=0, seed2=0..runs-1).

Usage:
    python tools/run_reference.py --dataset cora --prop_mode ppr --runs 10
Prints the reference's own output, then one final JSON line with per-run
test accuracies and their mean/std.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import runpy
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

# flag lines copied verbatim from the reference run scripts (minus the
# $num_runs/$gpu placeholders). scripts/run_cora.sh, scripts/run_citeseer.sh
PRESET_FLAGS = {
    ("cora", "ppr"): "--order 20 --prop_mode ppr --patience 200 "
    "--hidden_droprate 0.7 --hidden 64 --sample 2 --weight_decay 1e-3 "
    "--tem 0.1 --lam 1.5 --batch_size 50 --unlabel_batch_size 100 "
    "--top_k 32 --stop_mode both --lr 0.01 --input_droprate 0.5 "
    "--dataset cora --alpha 0.2 --warmup 1000 --rmax 1e-7 --clip-norm -1.0",
    ("cora", "avg"): "--order 4 --prop_mode avg --patience 200 "
    "--hidden_droprate 0.7 --hidden 64 --sample 2 --weight_decay 1e-3 "
    "--tem 0.1 --lam 1.5 --batch_size 50 --unlabel_batch_size 100 "
    "--top_k 32 --stop_mode both --lr 0.01 --input_droprate 0.5 "
    "--dataset cora --warmup 1000 --rmax 1e-7 --clip-norm -1.0",
    ("cora", "single"): "--order 2 --prop_mode single --patience 200 "
    "--hidden_droprate 0.7 --hidden 64 --sample 2 --weight_decay 1e-3 "
    "--tem 0.1 --lam 1.5 --batch_size 50 --unlabel_batch_size 100 "
    "--top_k 32 --stop_mode both --lr 0.01 --input_droprate 0.5 "
    "--dataset cora --warmup 1000 --rmax 1e-7 --clip-norm -1.0",
    ("citeseer", "ppr"): "--stop_mode both --prop_mode ppr --order 10 "
    "--warmup 500 --tem 0.1 --lam 0.8 --top_k 32 --input_droprate 0.0 "
    "--hidden_droprate 0.0 --weight_decay 1e-3 --unlabel_batch_size 100 "
    "--batch_size 50 --patience 200 --hidden 256 --clip-norm -1 --sample 2 "
    "--alpha 0.4 --rmax 1e-7 --dataset citeseer --loss l2 --lr 0.001",
    ("citeseer", "avg"): "--stop_mode both --prop_mode avg --order 2 "
    "--warmup 500 --tem 0.1 --lam 0.8 --top_k 32 --input_droprate 0.0 "
    "--hidden_droprate 0.0 --weight_decay 1e-3 --unlabel_batch_size 100 "
    "--batch_size 50 --patience 200 --hidden 256 --clip-norm -1 --sample 2 "
    "--rmax 1e-7 --dataset citeseer --loss l2 --lr 0.001",
    ("citeseer", "single"): "--stop_mode both --prop_mode single --order 2 "
    "--warmup 500 --tem 0.1 --lam 0.8 --top_k 32 --input_droprate 0.0 "
    "--hidden_droprate 0.0 --weight_decay 1e-3 --unlabel_batch_size 100 "
    "--batch_size 50 --patience 200 --hidden 256 --clip-norm -1 --sample 2 "
    "--rmax 1e-7 --dataset citeseer --loss l2 --lr 0.001",
    # scripts/run_pubmed.sh (duplicate --patience is verbatim; argparse
    # keeps the last one, 50)
    ("pubmed", "ppr"): "--dataset pubmed --use_bn --node_norm "
    "--clip-norm 0.1 --stop_mode both --patience 100 --weight_decay 1e-2 "
    "--nlayers 1 --input_droprate 0.2 --hidden_droprate 0.2 --patience 50 "
    "--sample 2 --prop_mode ppr --alpha 0.5 --warmup 100 --top_k 16 "
    "--rmax 1e-5 --unlabel_batch_size 100 --batch_size 5 --order 6",
    ("pubmed", "avg"): "--dataset pubmed --use_bn --node_norm "
    "--clip-norm 0.1 --stop_mode both --patience 100 --weight_decay 1e-2 "
    "--nlayers 1 --input_droprate 0.2 --hidden_droprate 0.2 --patience 50 "
    "--sample 2 --prop_mode avg --warmup 1000 --top_k 16 "
    "--rmax 1e-5 --unlabel_batch_size 100 --batch_size 5 --order 4",
    ("pubmed", "single"): "--dataset pubmed --use_bn --node_norm "
    "--clip-norm 0.1 --stop_mode both --patience 100 --weight_decay 1e-2 "
    "--nlayers 1 --input_droprate 0.2 --hidden_droprate 0.2 --patience 50 "
    "--sample 2 --prop_mode single --warmup 1000 --top_k 16 "
    "--rmax 1e-5 --unlabel_batch_size 100 --batch_size 5 --order 2",
    # scripts/run_aminer.sh
    ("aminer", "ppr"): "--dataset aminer --use_bn --lr 0.01 --rmax 1e-5 "
    "--nlayers 1 --warmup 100 --prop_mode ppr --stop_mode acc --order 6 "
    "--loss kl --weight_decay 1e-2 --input_droprate 0.0 "
    "--hidden_droprate 0.0 --top_k 64 --lam 1.5 --unlabel_num 10000 "
    "--unlabel_batch_size 100 --batch_size 20 --alpha 0.1 --patience 10",
    ("aminer", "avg"): "--dataset aminer --use_bn --lr 0.01 --rmax 1e-5 "
    "--nlayers 1 --warmup 100 --prop_mode avg --stop_mode acc --order 4 "
    "--loss kl --weight_decay 1e-2 --input_droprate 0.0 "
    "--hidden_droprate 0.0 --top_k 64 --lam 1.5 --unlabel_num 10000 "
    "--unlabel_batch_size 100 --batch_size 20 --patience 10",
    ("aminer", "single"): "--dataset aminer --use_bn --lr 0.01 --rmax 1e-5 "
    "--nlayers 1 --warmup 100 --prop_mode single --stop_mode acc --order 2 "
    "--loss kl --weight_decay 1e-2 --input_droprate 0.0 "
    "--hidden_droprate 0.0 --top_k 64 --lam 1.5 --unlabel_num 10000 "
    "--unlabel_batch_size 100 --batch_size 20 --patience 10",
    # scripts/run_reddit.sh
    ("reddit", "ppr"): "--dataset reddit --use_bn --node_norm --lr 1e-4 "
    "--hidden 512 --rmax 1e-5 --nlayers 2 --warmup 500 --prop_mode ppr "
    "--stop_mode acc --order 6 --loss kl --weight_decay 0.0 "
    "--clip-norm 0.1 --input_droprate 0.0 --hidden_droprate 0.0 "
    "--top_k 64 --lam 1.5 --unlabel_num 10000 --unlabel_batch_size 200 "
    "--batch_size 50 --alpha 0.05 --patience 20 --tem 0.1",
    ("reddit", "avg"): "--dataset reddit --use_bn --node_norm --lr 1e-4 "
    "--hidden 512 --rmax 1e-5 --nlayers 2 --warmup 500 --prop_mode avg "
    "--stop_mode acc --order 6 --loss kl --weight_decay 0.0 "
    "--clip-norm 0.1 --input_droprate 0.0 --hidden_droprate 0.0 "
    "--top_k 64 --lam 1.5 --unlabel_num 10000 --unlabel_batch_size 200 "
    "--batch_size 50 --patience 20 --tem 0.1",
    ("reddit", "single"): "--dataset reddit --use_bn --node_norm --lr 1e-4 "
    "--hidden 512 --rmax 1e-7 --nlayers 2 --warmup 500 --prop_mode single "
    "--stop_mode acc --order 2 --loss kl --weight_decay 0.0 "
    "--clip-norm 0.1 --input_droprate 0.0 --hidden_droprate 0.0 "
    "--top_k 64 --lam 1.5 --unlabel_num 10000 --unlabel_batch_size 200 "
    "--batch_size 50 --patience 20 --tem 0.1",
    # scripts/run_amazon2m.sh
    ("Amazon2M", "ppr"): "--dataset Amazon2M --use_bn --node_norm "
    "--lr 1e-3 --hidden 1024 --rmax 1e-6 --nlayers 2 --warmup 500 "
    "--tem 0.1 --prop_mode ppr --stop_mode acc --order 6 --loss kl "
    "--weight_decay 1e-5 --clip-norm -1 --input_droprate 0.0 "
    "--hidden_droprate 0.0 --top_k 64 --lam 0.8 --unlabel_num 10000 "
    "--unlabel_batch_size 200 --batch_size 50 --alpha 0.2 --patience 30",
    ("Amazon2M", "avg"): "--dataset Amazon2M --use_bn --node_norm "
    "--lr 1e-3 --hidden 1024 --rmax 1e-6 --nlayers 2 --warmup 500 "
    "--tem 0.1 --prop_mode avg --stop_mode acc --order 4 --loss kl "
    "--weight_decay 1e-5 --clip-norm -1 --input_droprate 0.0 "
    "--hidden_droprate 0.0 --top_k 64 --lam 0.8 --unlabel_num 10000 "
    "--unlabel_batch_size 200 --batch_size 50 --patience 30",
    ("Amazon2M", "single"): "--dataset Amazon2M --use_bn --node_norm "
    "--lr 1e-3 --hidden 1024 --rmax 1e-6 --nlayers 2 --warmup 500 "
    "--tem 0.1 --prop_mode single --stop_mode acc --order 2 --loss kl "
    "--weight_decay 1e-5 --clip-norm -1 --input_droprate 0.0 "
    "--hidden_droprate 0.0 --top_k 32 --lam 0.8 --unlabel_num 10000 "
    "--unlabel_batch_size 200 --batch_size 50 --patience 30",
    # scripts/run_mag.sh (sparse-feature engine, model_mag.py)
    ("mag_scholar_c", "ppr"): "--dataset mag_scholar_c --lr 0.01 "
    "--unlabel_num 10000 --stop_mode acc --weight_decay 0 "
    "--input_droprate 0.0 --hidden_droprate 0.2 --dropnode_rate 0.5 "
    "--patience 20 --sample 2 --alpha 0.2 --warmup 1000 "
    "--unlabel_batch_size 20 --eval_batch 10 --batch_size 20 --loss l2 "
    "--clip-norm -1 --order 10 --rmax 1e-5 --lam 1.0 --top_k 32 "
    "--prop_mode ppr",
    ("mag_scholar_c", "avg"): "--dataset mag_scholar_c --lr 0.01 "
    "--unlabel_num 10000 --stop_mode acc --weight_decay 0 "
    "--input_droprate 0.0 --hidden_droprate 0.2 --dropnode_rate 0.5 "
    "--patience 20 --sample 2 --warmup 1000 "
    "--unlabel_batch_size 20 --eval_batch 10 --batch_size 20 --loss l2 "
    "--clip-norm -1 --order 10 --rmax 1e-5 --lam 1.0 --top_k 32 "
    "--prop_mode avg",
    ("mag_scholar_c", "single"): "--dataset mag_scholar_c --lr 0.01 "
    "--unlabel_num 10000 --stop_mode acc --weight_decay 0 "
    "--input_droprate 0.0 --hidden_droprate 0.2 --dropnode_rate 0.5 "
    "--patience 20 --sample 2 --warmup 1000 "
    "--unlabel_batch_size 20 --eval_batch 10 --batch_size 20 --loss l2 "
    "--clip-norm -1 --order 2 --rmax 1e-5 --lam 1.0 --top_k 32 "
    "--prop_mode single",
}

# datasets whose run scripts vary the SPLIT seed across runs
# (--seed1_runs N --seed2_runs 1); the citation datasets vary the init
# seed instead (README.md protocol, run_model.py:83-86)
SEED1_PROTOCOL = {"aminer", "reddit", "Amazon2M", "mag_scholar_c"}


def install_shims() -> None:
    import numpy as np
    import torch

    # CPU-only torch build: set_device raises AttributeError, and the
    # reference's `.to(device)` with an int cuda ordinal (model.py:231,314)
    # must stay on host
    torch.cuda.set_device = lambda *a, **k: None
    # model_mag.py hard-codes .cuda() (e.g. model_mag.py:33,76) regardless
    # of --no-cuda; keep everything on host on this CPU-only build
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    _orig_to = torch.Tensor.to

    def _to(self, *a, **k):
        if a and isinstance(a[0], int):
            return self
        return _orig_to(self, *a, **k)

    torch.Tensor.to = _to

    # newer networkx returns scipy csr_array, whose .sum(1) is an ndarray
    # without .A1 (model.py:205 expects the matrix API of the torch-1.8 era)
    import networkx as nx
    import scipy.sparse as sp
    _orig_adjm = nx.adjacency_matrix
    nx.adjacency_matrix = lambda *a, **k: sp.csr_matrix(_orig_adjm(*a, **k))

    # --- torch_scatter.scatter(src, index, dim, dim_size, reduce='sum') ---
    ts = types.ModuleType("torch_scatter")

    def scatter(src, index, dim=0, dim_size=None, reduce="sum"):
        # the reference passes index as [E] or [E,1] broadcast against
        # [E,F] src (model.py:83-86, model_mag.py:52-53): the index varies
        # only along `dim`, so index_add_ with the flattened vector matches
        assert reduce == "sum", reduce
        index = index.flatten()
        if dim_size is None:
            dim_size = int(index.max()) + 1
        shape = list(src.shape)
        shape[dim] = dim_size
        out = torch.zeros(shape, dtype=src.dtype, device=src.device)
        return out.index_add_(dim, index, src)

    ts.scatter = scatter
    sys.modules["torch_scatter"] = ts

    # --- precompute.propagation.Graph -> grandtpu native GFPush ---
    sys.path.insert(0, REPO)
    from grandtpu.ppr.native import gfpush_native

    class Graph:
        def __init__(self, indptr, indices, seed):
            self.indptr = np.asarray(indptr, dtype=np.int32)
            self.indices = np.asarray(indices, dtype=np.int32)

        def gfpush_omp(self, node_idx, row_idx, col_idx, value, coef,
                       rmax, K):
            src = np.asarray(node_idx, dtype=np.int32)
            cols, vals = gfpush_native(
                self.indptr, self.indices, src,
                np.asarray(coef, dtype=np.float64), float(rmax), int(K))
            # reference writes only v>0 entries; unwritten slots stay
            # (0, 0, 0.0) from the caller's zero-init (graph.h:117-126)
            flat_v = vals.reshape(-1)
            keep = flat_v > 0
            row_idx[:] = np.where(keep, np.repeat(src.astype(np.int64), K), 0)
            col_idx[:] = np.where(keep, cols.reshape(-1), 0)
            value[:] = np.where(keep, flat_v, 0.0)

    pre = types.ModuleType("precompute")
    prop = types.ModuleType("precompute.propagation")
    prop.Graph = Graph
    pre.propagation = prop
    sys.modules["precompute"] = pre
    sys.modules["precompute.propagation"] = prop


def _last_float(pattern: str, text: str):
    ms = re.findall(pattern, text, flags=re.MULTILINE)
    return float(ms[-1]) if ms else None


class _Tee(io.TextIOBase):
    def __init__(self, *streams):
        self.streams = streams
        self.buf = io.StringIO()

    def write(self, s):
        for st in self.streams:
            st.write(s)
            st.flush()
        self.buf.write(s)
        return len(s)

    def flush(self):
        for st in self.streams:
            st.flush()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--prop_mode", required=True)
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--out", default=None,
                    help="append the result JSON line to this file")
    ap.add_argument("--data_dir", default=None,
                    help="dataset dir the workdir's dataset/ symlink points "
                    "at (e.g. build/refdata_synth from "
                    "make_synth_ref_data.py); default: the reference mount")
    args = ap.parse_args()
    if args.out:
        # resolve BEFORE the os.chdir below — a relative --out otherwise
        # raises FileNotFoundError after the whole (hours-long) sweep
        args.out = os.path.abspath(args.out)

    flags = PRESET_FLAGS[(args.dataset, args.prop_mode)].split()

    # cwd with a dataset/ symlink; the reference resolves data paths
    # relative to cwd (utils/data_loader.py:17-20,87-88) and writes its
    # best-weights pickle to cwd (model.py:350-351). A custom --data_dir
    # gets its own workdir so concurrent real-data runs are unaffected.
    if args.data_dir:
        data_dir = os.path.abspath(args.data_dir)
        work = os.path.join(REPO, "build", "refwork_synth")
    else:
        data_dir = os.path.join(REF, "dataset")
        work = os.path.join(REPO, "build", "refwork")
    os.makedirs(work, exist_ok=True)
    link = os.path.join(work, "dataset")
    if os.path.islink(link) and os.readlink(link) != data_dir:
        os.unlink(link)
    if not os.path.islink(link):
        os.symlink(data_dir, link)
    os.chdir(work)

    install_shims()
    sys.path.insert(0, REF)
    seed_flags = (["--seed1_runs", str(args.runs), "--seed2_runs", "1"]
                  if args.dataset in SEED1_PROTOCOL
                  else ["--seed2_runs", str(args.runs)])
    sys.argv = ["run_model.py"] + flags + seed_flags + ["--no-cuda"]

    tee = _Tee(sys.stdout)
    old = sys.stdout
    sys.stdout = tee
    try:
        runpy.run_path(os.path.join(REF, "run_model.py"),
                       run_name="__main__")
    finally:
        sys.stdout = old

    text = tee.buf.getvalue()
    accs = [float(m) for m in re.findall(r"Test Accuracy ([0-9.]+)", text)]
    import numpy as np
    proto = ("reference run_model.py seed1=0..N-1 seed2=0"
             if args.dataset in SEED1_PROTOCOL
             else "reference run_model.py seed1=0 seed2=0..N-1")
    result = {
        "dataset": args.dataset, "prop_mode": args.prop_mode,
        "protocol": proto,
        "n": len(accs), "accs": accs,
        "mean": float(np.mean(accs)) if accs else None,
        "std": float(np.std(accs)) if accs else None,
        # run_model.py:96-99 summary means over the runs
        "time_avg_s": _last_float(r"^time average ([0-9.eE+-]+)", text),
        "batch_time_avg_s": _last_float(
            r"^batch time average ([0-9.eE+-]+)", text),
        "batch_num_mean": _last_float(r"^batch num ([0-9.eE+-]+)", text),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
