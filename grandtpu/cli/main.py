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
    # --preset applies a named preset's hyperparameters to ANY dataset
    # (e.g. a synth:* scale stand-in run under the Amazon2M recipe);
    # without it, a dataset whose name IS a preset gets its preset.
    pname = getattr(args, "preset", None)
    if pname:
        base = preset(pname, args.prop_mode or "ppr").replace(
            dataset=args.dataset or pname)
    elif args.dataset in PRESETS:
        base = preset(args.dataset, args.prop_mode or "ppr")
    else:
        base = GrandConfig(dataset=args.dataset)
    overrides = {}
    for f in dataclasses.fields(GrandConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            overrides[f.name] = v
    return base.replace(**overrides)


def _apply_platform(args) -> None:
    """Force the JAX backend before anything initializes it. Env-var
    routes (JAX_PLATFORMS) are ignored under the axon TPU plugin, so this
    must be jax.config.update — and early (see CLAUDE.md)."""
    plat = getattr(args, "platform", None)
    if plat and plat != "default":
        import os

        import jax
        if plat == "tpu" and "axon" in os.environ.get("JAX_PLATFORMS", ""):
            # this environment's chip registers as the experimental 'axon'
            # platform, not 'tpu' — map the user-facing name so
            # --platform tpu selects the chip instead of raising
            # "unable to initialize backend 'tpu'"
            plat = "axon"
        jax.config.update("jax_platforms", plat)


def cmd_run(args) -> int:
    _apply_platform(args)
    from grandtpu.train import train

    cfg = _build_config(args)
    accs, times, btimes, nbatches = [], [], [], []
    bmeds = []
    # multi-run protocols enumerate seeds 0..N-1 exactly like the reference
    # driver (run_model.py:83-86). Deliberate divergence: the reference
    # overwrites seed1/seed2 even for a single run (a 1x1 run always gets
    # seeds 0/0, making --seed flags dead); here a single run honors the
    # configured seed.
    for s1 in range(cfg.seed1_runs):
        for s2 in range(cfg.seed2_runs):
            run_cfg = cfg.replace(seed1=s1 if cfg.seed1_runs > 1 else
                                  cfg.seed1,
                                  seed2=s2 if cfg.seed2_runs > 1 else
                                  cfg.seed2)
            r = train(run_cfg)   # auto-dispatches on feature format
            accs.append(r.test_acc)
            times.append(r.total_time)
            btimes.append(r.batch_time_avg)
            bmeds.append(r.batch_time_median)
            nbatches.append(r.num_batches)
            print(f"split run: {s1}, init run: {s2}, "
                  f"acc: {r.test_acc:.4f}, avg acc: {np.mean(accs):.4f}")
    summary = {
        "dataset": cfg.dataset, "prop_mode": cfg.prop_mode,
        "runs": len(accs),
        "accs": [float(a) for a in accs],
        "test_acc_mean": float(np.mean(accs)),
        "test_acc_std": float(np.std(accs)),
        "time_mean_s": float(np.mean(times)),
        "batch_time_mean_s": float(np.mean(btimes)),
        "batch_time_median_s": float(np.median(bmeds)),
        "num_batches_mean": float(np.mean(nbatches)),
    }
    print(json.dumps(summary))
    return 0


def cmd_predict(args) -> int:
    """Offline serving: load a checkpoint, classify every node with exact
    full-graph propagation, write logits+predictions to an npz (no reference
    equivalent — the reference can only predict inside a training run)."""
    _apply_platform(args)
    import numpy as np

    import jax

    from grandtpu.data import load_data
    from grandtpu.data.preprocess import add_self_loops_adj
    from grandtpu.infer import exact_propagate
    from grandtpu.infer.classify import (predict_logits,
                                         predict_logits_sparse)
    from grandtpu.nn.mag_mlp import init_mag_mlp
    from grandtpu.nn.mlp import MLPConfig, init_mlp
    from grandtpu.nn.sparse_input import PaddedFeatures
    from grandtpu.train.checkpoint import load_checkpoint

    cfg = _build_config(args)
    data = load_data(cfg.dataset, split_seed=cfg.seed1)
    adj_sl = add_self_loops_adj(data.adj)
    sparse = cfg.sparse_features or data.has_sparse_features
    # num_features is the attr vocabulary size in the sparse case and the
    # dense feature dim otherwise — both are features.shape[1]
    mlp_cfg = MLPConfig(
        num_features=data.features.shape[1], num_classes=data.num_classes,
        hidden=cfg.hidden, nlayers=cfg.nlayers, use_bn=cfg.use_bn,
        node_norm=cfg.node_norm, input_droprate=cfg.input_droprate,
        hidden_droprate=cfg.hidden_droprate)
    init = init_mag_mlp if sparse else init_mlp
    tmpl_params, tmpl_state = init(jax.random.PRNGKey(0), mlp_cfg)
    params, state, _, meta = load_checkpoint(
        args.ckpt, params_template=tmpl_params, state_template=tmpl_state)

    mesh = None
    if cfg.num_devices > 1:
        # multi-chip serving: row-partitioned shard_map propagation (halo
        # or all_gather exchange, chosen by measured comm compression)
        from grandtpu.dist import make_mesh
        mesh = make_mesh(n_data=cfg.num_devices, n_model=1)
    if sparse:
        import jax.numpy as jnp
        padded = PaddedFeatures.from_csr(data.features)
        propagate = None
        if mesh is not None:
            from grandtpu.dist import dist_exact_propagate
            propagate = lambda embs: dist_exact_propagate(  # noqa: E731
                mesh, adj_sl, embs, mode=cfg.prop_mode, order=cfg.order,
                alpha=cfg.alpha, precision=getattr(args, "precision",
                                                   "f32"))
        logits = predict_logits_sparse(
            params, state, mlp_cfg, jnp.asarray(padded.attr_cols),
            jnp.asarray(padded.attr_vals), adj_sl, mode=cfg.prop_mode,
            order=cfg.order, alpha=cfg.alpha, propagate=propagate,
            precision=getattr(args, "precision", "f32"))
    else:
        precision = getattr(args, "precision", "f32")
        if mesh is not None:
            from grandtpu.dist import dist_exact_propagate
            prop = dist_exact_propagate(
                mesh, adj_sl, np.asarray(data.features, np.float32),
                mode=cfg.prop_mode, order=cfg.order, alpha=cfg.alpha,
                precision=precision)
        else:
            prop = exact_propagate(adj_sl, np.asarray(data.features),
                                   mode=cfg.prop_mode, order=cfg.order,
                                   alpha=cfg.alpha, precision=precision)
        logits = predict_logits(params, state, mlp_cfg, prop)
    preds = logits.argmax(1)
    acc = float(np.equal(preds[data.idx_test],
                         data.labels_int[data.idx_test]).mean())
    out = args.output or f"predictions_{cfg.dataset.replace(':', '_')}.npz"
    np.savez(out, logits=logits, predictions=preds,
             idx_test=data.idx_test)
    print(json.dumps({"dataset": cfg.dataset, "output": out,
                      "test_acc": acc,
                      "ckpt_val_acc": meta.get("best_val_acc")}))
    return 0


def cmd_bench(args) -> int:
    """Wrap the bench harnesses behind one subcommand (each also runs
    standalone as `python -m grandtpu.bench.<name>` / `python bench.py`)."""
    suite = args.suite
    if suite == "spmm":
        from grandtpu.bench import driver as driver_bench
        driver_bench.main()
    elif suite == "push":
        from grandtpu.bench.push import bench_push
        bench_push()
    elif suite == "train-step":
        from grandtpu.bench.train_step import CONFIGS, bench_train_step
        names = [args.config] if args.config else list(CONFIGS)
        for name in names:
            bench_train_step(name)
    elif suite == "scaling":
        from grandtpu.bench.scaling import bench_scaling
        bench_scaling(variant=args.variant)
    else:
        raise ValueError(f"unknown bench suite {suite!r}")
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
    p_run.add_argument("--preset", default=None, choices=sorted(PRESETS),
                       help="apply this dataset preset's hyperparameters "
                       "to --dataset (scale runs on synth:* stand-ins)")
    p_run.add_argument("--platform", default="default",
                       choices=["default", "cpu", "tpu"],
                       help="JAX backend (cpu avoids the shared chip; "
                       "JAX_PLATFORMS env is ignored under the axon plugin)")
    p_run.set_defaults(fn=cmd_run)
    p_pre = sub.add_parser("presets", help="list per-dataset presets")
    p_pre.set_defaults(fn=cmd_presets)
    p_pred = sub.add_parser(
        "predict", help="classify all nodes from a checkpoint")
    _add_config_flags(p_pred)
    p_pred.add_argument("--preset", default=None, choices=sorted(PRESETS),
                        help="apply this dataset preset's hyperparameters "
                        "to --dataset")
    p_pred.add_argument("--platform", default="default",
                        choices=["default", "cpu", "tpu"])
    p_pred.add_argument("--ckpt", required=True,
                        help="checkpoint npz (best.npz from --ckpt-dir)")
    p_pred.add_argument("--output", default=None,
                        help="output npz path")
    p_pred.add_argument("--precision", default="f32",
                        choices=["f32", "bf16", "int8", "auto"],
                        help="propagation precision: f32 (default), bf16, "
                        "int8 quantized gather (fastest at <=1GiB working "
                        "sets; ~4e-3 rel — see RESULTS.md accuracy "
                        "evidence), or auto (measured working-set "
                        "heuristic between int8 and bf16)")
    p_pred.set_defaults(fn=cmd_predict)
    p_bench = sub.add_parser("bench", help="run a benchmark suite")
    p_bench.add_argument("suite", choices=["spmm", "push", "train-step",
                                           "scaling"])
    p_bench.add_argument("--config", default=None,
                         help="train-step config name (default: all)")
    p_bench.add_argument("--variant", default="block",
                         choices=["block", "all_gather", "halo", "both",
                                  "all"],
                         help="scaling suite: propagation variant(s); "
                         "block = production one-hot kernel")
    p_bench.set_defaults(fn=cmd_bench)
    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    except (NotImplementedError, FileNotFoundError, KeyError,
            ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(cli())
