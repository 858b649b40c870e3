"""Smoke tests for the top-level reference-parity entry scripts and the
driver contract file."""

import importlib
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENTRY_MODULES = [
    ("train", "main_multimodal"),
    ("train_rna2dna", "main_rna2dna"),
    ("train_dna2rna", "main_dna2rna"),
    ("evaluate", "main"),
    ("compare_directional_imputation", "main"),
    ("vae_cross_modality_cv", "main"),
    ("optimize_hyperparameters", "main"),
    ("downstream_task", "main"),
    ("downstream_task_directional", "main"),
    ("reconstruct_unmatched", "main"),
    ("create_boxplots", "main"),
]


@pytest.mark.parametrize("name,attr", ENTRY_MODULES)
def test_entry_script_importable(name, attr):
    sys.path.insert(0, REPO)
    try:
        mod = importlib.import_module(name)
        assert hasattr(mod, attr) or hasattr(mod, "main")
    finally:
        sys.path.remove(REPO)


def test_prepare_scripts_importable():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "prepare_data.py"), "--help"],
        capture_output=True,
        text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0
    assert "--synthetic" in out.stdout


def test_graft_entry_lowers():
    """entry() must produce a jittable forward (lowering = compile check)."""
    sys.path.insert(0, REPO)
    try:
        import jax

        from __graft_entry__ import entry

        fn, args = entry()
        jax.jit(fn).lower(*args)  # raises if untraceable
    finally:
        sys.path.remove(REPO)


def test_graft_dryrun_multichip():
    sys.path.insert(0, REPO)
    try:
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)
    finally:
        sys.path.remove(REPO)
