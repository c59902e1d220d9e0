"""Preset table integrity vs the reference launch scripts (Appendix A +
avg/single variant overrides)."""

import pytest

from grandtpu.config import PRESETS, preset


def test_all_seven_datasets_present():
    assert set(PRESETS) == {"cora", "citeseer", "pubmed", "aminer",
                            "reddit", "Amazon2M", "mag_scholar_c"}


def test_cora_ppr_row():
    c = preset("cora")
    assert (c.order, c.alpha, c.rmax, c.top_k) == (20, 0.2, 1e-7, 32)
    assert (c.hidden, c.nlayers, c.lr, c.weight_decay) == (64, 2, 0.01, 1e-3)
    assert (c.lam, c.tem, c.loss, c.warmup) == (1.5, 0.1, "l2", 1000.0)
    assert (c.patience, c.stop_mode) == (200, "both")


def test_variant_overrides():
    assert preset("cora", "avg").order == 4
    assert preset("cora", "single").order == 2
    assert preset("pubmed", "avg").warmup == 1000.0
    assert preset("reddit", "single").rmax == 1e-7
    assert preset("Amazon2M", "single").top_k == 32
    assert preset("mag_scholar_c", "single").order == 2
    # ppr rows untouched by variants
    assert preset("reddit").rmax == 1e-5


def test_mag_uses_sparse_engine():
    assert preset("mag_scholar_c").sparse_features
    assert not preset("reddit").sparse_features


def test_conf_is_runtime_resolved():
    c = preset("cora")
    assert c.resolve_conf(7) == pytest.approx(2 / 7)
    with pytest.raises(AttributeError):
        _ = c.conf


def test_unknown_dataset():
    with pytest.raises(KeyError):
        preset("imagenet")


def test_cli_preset_flag_applies_to_synth_dataset():
    """--preset grafts a named recipe onto any dataset (scale runs use
    synth:* stand-ins under the real presets); explicit flags still win."""
    from grandtpu.cli.main import cli as _  # noqa: F401 (import check)
    from grandtpu.cli.main import _build_config

    class A:
        pass

    args = A()
    for f in __import__("dataclasses").fields(
            __import__("grandtpu.config", fromlist=["GrandConfig"]
                       ).GrandConfig):
        setattr(args, f.name, None)
    args.dataset = "synth:5000:47:100"
    args.prop_mode = None
    args.preset = "Amazon2M"
    args.hidden = 128   # explicit override beats the preset
    cfg = _build_config(args)
    ref = preset("Amazon2M")
    assert cfg.dataset == "synth:5000:47:100"
    assert (cfg.order, cfg.alpha, cfg.top_k) == (ref.order, ref.alpha,
                                                 ref.top_k)
    assert cfg.loss == ref.loss and cfg.use_bn == ref.use_bn
    assert cfg.hidden == 128
    # no preset: synth dataset gets plain defaults
    args.preset = None
    args.hidden = None
    assert _build_config(args).hidden != ref.hidden
