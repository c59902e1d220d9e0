"""CLI: typed per-dataset presets + multi-seed experiment driver.

Replaces the reference's L4/L5 layers (``run_model.py`` + the seven
``scripts/run_*.sh`` preset scripts) with `python -m grandtpu.cli.main`.
"""
