"""--replicates N: multi-seed training as one vmapped population.

The standard omics robustness protocol (train N seeds, report mean±std,
keep the best) — on TPU the replicate axis is just another population
batch dimension, so it reuses `parallel.vmap_meta.fit_trials` and costs
near one run. These tests pin the CLI contract: best-replicate selection,
the run-id protocol artifacts, and the guards (--resume exclusion, no
resume checkpoint written)."""

import os

import numpy as np
import pytest

from vae_los_angeles_tpu.config import Config

DIM_A, DIM_B, N_SITES = 15, 17, 4
CFG = Config(input_dim_a=DIM_A, input_dim_b=DIM_B, latent_dim=5,
             batch_size=16, num_epochs=4)


@pytest.fixture()
def workspace(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from vae_los_angeles_tpu.data.synthetic import write_synthetic_artifacts

    write_synthetic_artifacts(
        "data", n_samples=160, dim_a=DIM_A, dim_b=DIM_B, n_sites=N_SITES
    )
    return tmp_path


def test_replicates_trains_population_and_keeps_best(workspace, capsys):
    from vae_los_angeles_tpu.training.cli import run_training

    result, run_id, wall = run_training(
        "rna2dna", "rna2dna", cfg=CFG,
        argv=["--epochs", "4", "--replicates", "3", "--seed", "7"],
    )
    out = capsys.readouterr().out
    assert "r0=" in out and "r2=" in out and "keeping replicate" in out
    assert np.isfinite(float(result.best_val_loss))
    # the saved checkpoint is the winning replicate, under the protocol names
    assert os.path.exists(f"checkpoints/best_rna2dna_{run_id}.npz")
    assert os.path.exists("latest_rna2dna_run_id.txt")
    # no resume checkpoint: per-replicate noise streams can't round-trip
    # through the seed-recording resume contract
    assert not os.path.exists(f"checkpoints/resume_rna2dna_{run_id}.npz")
    assert "resume checkpoint not written" in out
    # the reported winner really is the population's min
    vals = [float(s.split("=")[1]) for s in
            [tok for tok in out.split("Replicates (best val loss each): ")[1]
             .splitlines()[0].split(", ")]]
    # printed values are rounded to 2 decimals
    assert float(result.best_val_loss) == pytest.approx(min(vals), abs=0.006)


def test_replicates_differ_and_match_single_runs(workspace):
    """Replicate r trains on the fold_in(seed, r) stream — members genuinely
    differ, and each matches a solo fit_trials run with the same key row."""
    import jax
    import jax.numpy as jnp

    from vae_los_angeles_tpu.data.dataset import MultiModalDataset
    from vae_los_angeles_tpu.data.splits import train_val_indices
    from vae_los_angeles_tpu.parallel import vmap_meta

    dataset = MultiModalDataset.from_pickle("data/processed_data.pkl")
    tr_idx, va_idx = train_val_indices(len(dataset), CFG.train_test_split,
                                       CFG.random_seed)
    arrays = dataset.to_device()
    tr, va = arrays.take(tr_idx), arrays.take(va_idx)
    seed, R = 7, 2
    keys = np.stack([
        np.asarray(jax.random.fold_in(jax.random.PRNGKey(seed), r))
        for r in range(R)
    ])
    pop = {"lr": np.full(R, CFG.learning_rate, np.float32)}
    res = vmap_meta.fit_trials(
        "rna2dna", CFG, tr, va, jax.random.PRNGKey(seed), N_SITES, pop,
        num_epochs=4, keys=keys,
    )
    vals = np.asarray(res.best_val_loss)
    assert vals[0] != vals[1], "replicates must differ (independent noise)"
    solo = vmap_meta.fit_trials(
        "rna2dna", CFG, tr, va, jax.random.PRNGKey(seed), N_SITES,
        {"lr": pop["lr"][1:]}, num_epochs=4, keys=keys[1:],
    )
    # not bit-equal: population width is part of the compiled program, so
    # XLA's fusion/reduction order differs between pop=1 and pop=2 — the
    # noise STREAM is identical (same key row), the float schedule is not
    np.testing.assert_allclose(
        np.asarray(solo.val_losses)[0], np.asarray(res.val_losses)[1],
        rtol=1e-4,
    )


def test_replicates_resume_rejected(workspace):
    from vae_los_angeles_tpu.training.cli import run_training

    with pytest.raises(SystemExit, match="does not compose"):
        run_training(
            "rna2dna", "rna2dna", cfg=CFG,
            argv=["--epochs", "2", "--replicates", "2", "--resume"],
        )
    with pytest.raises(SystemExit, match=">= 1"):
        run_training(
            "rna2dna", "rna2dna", cfg=CFG,
            argv=["--epochs", "2", "--replicates", "0"],
        )
