"""Experiment driver CLI.

Usage (mirrors the reference protocol, ``README.md:45`` /
``run_model.py:83-99``):

    python -m grandtpu.cli.main run --dataset cora --prop-mode ppr \
        --seed2-runs 10 --visible
    python -m grandtpu.cli.main run --dataset synth:500:4:32 --epochs 50
    python -m grandtpu.cli.main presets            # dump the preset table

Every GrandConfig field is overridable via a --flag of the same name
(underscores become dashes). Multi-seed loops aggregate mean accuracy and
timing like the reference driver.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np

from grandtpu.config import PRESETS, GrandConfig, preset


def _add_config_flags(p: argparse.ArgumentParser):
    for f in dataclasses.fields(GrandConfig):
        flag = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(flag, type=lambda s: s.lower() in
                           ("1", "true", "yes"), default=None,
                           metavar="BOOL")
        elif isinstance(f.default, int):
            p.add_argument(flag, type=int, default=None)
        elif isinstance(f.default, float):
            p.add_argument(flag, type=float, default=None)
        else:
            p.add_argument(flag, type=str, default=None)


def _build_config(args) -> GrandConfig:
    base = (preset(args.dataset, args.prop_mode or "ppr")
            if args.dataset in PRESETS else
            GrandConfig(dataset=args.dataset))
    overrides = {}
    for f in dataclasses.fields(GrandConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            overrides[f.name] = v
    return base.replace(**overrides)


def cmd_run(args) -> int:
    from grandtpu.train import train
    from grandtpu.train.trainer_sparse import train_sparse

    cfg = _build_config(args)
    accs, times, btimes, nbatches = [], [], [], []
    for s1 in range(cfg.seed1_runs):
        for s2 in range(cfg.seed2_runs):
            run_cfg = cfg.replace(seed1=s1 if cfg.seed1_runs > 1 else
                                  cfg.seed1,
                                  seed2=s2 if cfg.seed2_runs > 1 else
                                  cfg.seed2)
            fn = train_sparse if run_cfg.sparse_features else train
            r = fn(run_cfg)
            accs.append(r.test_acc)
            times.append(r.total_time)
            btimes.append(r.batch_time_avg)
            nbatches.append(r.num_batches)
            print(f"split run: {s1}, init run: {s2}, "
                  f"acc: {r.test_acc:.4f}, avg acc: {np.mean(accs):.4f}")
    summary = {
        "dataset": cfg.dataset, "prop_mode": cfg.prop_mode,
        "runs": len(accs),
        "test_acc_mean": float(np.mean(accs)),
        "test_acc_std": float(np.std(accs)),
        "time_mean_s": float(np.mean(times)),
        "batch_time_mean_s": float(np.mean(btimes)),
        "num_batches_mean": float(np.mean(nbatches)),
    }
    print(json.dumps(summary))
    return 0


def cmd_presets(_args) -> int:
    for name, cfg in PRESETS.items():
        d = dataclasses.asdict(cfg)
        keep = ("order alpha rmax top_k hidden nlayers lr weight_decay "
                "batch_size unlabel_batch_size lam tem loss warmup "
                "use_bn node_norm patience stop_mode").split()
        print(name, json.dumps({k: d[k] for k in keep}))
    return 0


def cli(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="grandtpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_run = sub.add_parser("run", help="train + evaluate one config")
    _add_config_flags(p_run)
    p_run.set_defaults(fn=cmd_run)
    p_pre = sub.add_parser("presets", help="list per-dataset presets")
    p_pre.set_defaults(fn=cmd_presets)
    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    except (NotImplementedError, FileNotFoundError, KeyError,
            ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(cli())
