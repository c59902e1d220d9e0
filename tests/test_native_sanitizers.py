"""Sanitizer gates for the native kernel: TSAN (race detection across the
OpenMP workers) and ASAN, via the standalone C++ driver (SURVEY.md §5 —
the reference has no sanitizer coverage; the output-slice disjointness that
makes the kernel race-free is worth machine-checking)."""

import shutil
import subprocess

import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

REPO = __file__.rsplit("/tests/", 1)[0]


def _make(target: str):
    return subprocess.run(["make", "-C", REPO, target],
                          capture_output=True, text=True, timeout=300)


def test_tsan_clean():
    r = _make("tsan-check")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ThreadSanitizer" not in r.stderr


def test_asan_clean():
    r = _make("asan-check")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "AddressSanitizer" not in r.stderr
