"""Checkpoint roundtrip + run-id protocol tests."""

import jax
import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.models import rna2dna_vae_init
from vae_los_angeles_tpu.training import checkpoint


def test_roundtrip(tmp_path):
    params, state = rna2dna_vae_init(jax.random.PRNGKey(0), 11, 13, 4, 5)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, params, state)
    p2, s2 = checkpoint.load(path)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        p2,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state,
        s2,
    )


def test_run_id_protocol(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    params, state = rna2dna_vae_init(jax.random.PRNGKey(1), 7, 9, 3, 4)
    run_id = checkpoint.new_run_id()
    path = checkpoint.save_best("rna2dna", run_id, params, state)
    checkpoint.write_run_id("rna2dna", run_id)
    # consumer protocol: read run id file → load checkpoint
    assert checkpoint.get_run_id("rna2dna") == run_id
    p2, s2, rid = checkpoint.load_best("rna2dna")
    assert rid == run_id
    assert path.endswith(f"best_rna2dna_{run_id}.npz")
    np.testing.assert_array_equal(
        np.asarray(params["decoder_dna"]["fc1"]["w"]),
        np.asarray(p2["decoder_dna"]["fc1"]["w"]),
    )


def test_missing_run_id_raises(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert checkpoint.get_run_id("nope") is None
    try:
        checkpoint.load_best("nope")
        assert False, "expected FileNotFoundError"
    except FileNotFoundError:
        pass


def test_cli_end_to_end(tmp_path, monkeypatch):
    """Full CLI: synthetic data → train → checkpoint + run-id + plot."""
    monkeypatch.chdir(tmp_path)
    from vae_los_angeles_tpu.training.cli import run_training

    cfg = Config(
        input_dim_a=19,
        input_dim_b=23,
        latent_dim=4,
        batch_size=16,
        num_epochs=3,
    )
    # write tiny synthetic artifacts
    from vae_los_angeles_tpu.data.synthetic import write_synthetic_artifacts

    write_synthetic_artifacts("data", n_samples=96, dim_a=19, dim_b=23, n_unmatched=8)
    result, run_id, wall = run_training(
        "rna2dna", "rna2dna", cfg=cfg, argv=["--epochs", "3"]
    )
    assert (tmp_path / "latest_rna2dna_run_id.txt").read_text() == run_id
    assert (tmp_path / "checkpoints" / f"best_rna2dna_{run_id}.npz").exists()
    assert any((tmp_path / "plots").glob("training_losses_rna2dna_*.png"))


def test_empty_dict_subtree_roundtrips(tmp_path):
    """Empty subtrees (a stateless model's {}) must survive save/load."""
    path = str(tmp_path / "c.npz")
    checkpoint.save(path, {"a": {"w": np.ones(3)}, "empty": {}}, state={})
    p2, s2 = checkpoint.load(path)
    assert p2["empty"] == {}
    assert s2 == {}
    np.testing.assert_array_equal(p2["a"]["w"], np.ones(3))


def test_tuple_leaves_rejected_loudly(tmp_path):
    """Tuples would round-trip as string-keyed dicts and break the jitted
    fit with an opaque structure mismatch — refuse at save time."""
    import pytest

    with pytest.raises(TypeError, match="tuple"):
        checkpoint.save(
            str(tmp_path / "t.npz"), {"a": (np.ones(2), np.ones(2))}
        )


def test_resume_seed_absent_in_legacy_checkpoint(tmp_path):
    """Checkpoints written without a seed load with seed=None."""
    carry = {"params": {"w": np.ones(2)}}
    checkpoint.save_resume("m", "r1", carry, 5, str(tmp_path))
    _, done, rid, seed = checkpoint.load_resume("m", "r1", str(tmp_path))
    assert done == 5 and rid == "r1" and seed is None
