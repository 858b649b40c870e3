"""Misc unit tests: config env overrides, HPO sampling/bucketing, MLP
classifier parity vs torch, profiling helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.evaluation.hpo import SEARCH_SPACE, sample_trials
from vae_los_angeles_tpu.evaluation.mlp_classifier import (
    fit_classifier,
    mlp_apply,
    mlp_init,
    predict_classes,
    weighted_ce_mean,
)
from vae_los_angeles_tpu.utils.profiling import bench_line


def test_config_env_overrides(monkeypatch):
    monkeypatch.setenv("INPUT_DIM_A", "782")
    monkeypatch.setenv("INPUT_DIM_B", "572")
    monkeypatch.setenv("LATENT_DIM", "33")
    monkeypatch.setenv("LEARNING_RATE", "0.001")
    monkeypatch.setenv("USE_PALLAS", "1")
    cfg = Config.from_env()
    assert cfg.input_dim_a == 782
    assert cfg.input_dim_b == 572
    assert cfg.latent_dim == 33
    assert cfg.learning_rate == 0.001
    assert cfg.use_pallas is True
    # defaults intact
    assert cfg.batch_size == 32 and cfg.beta_warmup_epochs == 50
    assert cfg.debug_nans is False
    monkeypatch.setenv("DEBUG_NANS", "1")
    assert Config.from_env().debug_nans is True


def test_debug_nans_localizes_nan_training_data():
    """DEBUG_NANS mode (SURVEY §5 sanitizer row): a NaN produced inside the
    fused whole-run scan raises FloatingPointError instead of silently
    training to a NaN loss."""
    import pytest

    from vae_los_angeles_tpu.data.dataset import MultiModalArrays
    from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
    from vae_los_angeles_tpu.training import engine

    tpm, beta, site = generate_synthetic_arrays(
        n_samples=64, dim_a=17, dim_b=19, n_sites=4, seed=0
    )
    tpm = np.asarray(tpm).copy()
    tpm[3, 5] = np.nan  # poisoned input → NaN loss on epoch 1
    arrays = MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta), jnp.asarray(site))
    tr, va = arrays.take(jnp.arange(48)), arrays.take(jnp.arange(48, 64))
    cfg = Config(input_dim_a=17, input_dim_b=19, latent_dim=4, embed_dim=4,
                 batch_size=16, patience=10_000)
    jax.config.update("jax_debug_nans", True)
    try:
        with pytest.raises(FloatingPointError):
            engine.fit("rna2dna", cfg, tr, va, jax.random.PRNGKey(0), 4,
                       num_epochs=2)
    finally:
        jax.config.update("jax_debug_nans", False)


def test_hpo_sample_trials_within_space():
    trials = sample_trials(50, seed=1)
    assert len(trials) == 50
    for t in trials:
        lo, hi = SEARCH_SPACE["latent_dim"]
        assert lo <= t["latent_dim"] <= hi
        assert SEARCH_SPACE["learning_rate"][0] <= t["learning_rate"] <= SEARCH_SPACE["learning_rate"][1]
        assert t["embed_dim"] in SEARCH_SPACE["embed_dim"]
        assert SEARCH_SPACE["gamma"][0] <= t["gamma"] <= SEARCH_SPACE["gamma"][1]
    # log-uniform: medians differ from arithmetic midpoint
    lrs = np.array([t["learning_rate"] for t in trials])
    assert np.median(lrs) < 1e-3


def test_mlp_deep_forward_matches_torch(rng):
    params = mlp_init(jax.random.PRNGKey(0), 12, 5, arch="deep")
    t = tnn.Sequential(
        tnn.Linear(12, 256), tnn.LayerNorm(256), tnn.ReLU(), tnn.Dropout(0.3),
        tnn.Linear(256, 128), tnn.LayerNorm(128), tnn.ReLU(), tnn.Dropout(0.2),
        tnn.Linear(128, 5),
    ).eval()
    with torch.no_grad():
        t[0].weight.copy_(torch.from_numpy(np.asarray(params["fc1"]["w"]).T))
        t[0].bias.copy_(torch.from_numpy(np.asarray(params["fc1"]["b"])))
        t[1].weight.copy_(torch.from_numpy(np.asarray(params["ln1"]["gamma"])))
        t[1].bias.copy_(torch.from_numpy(np.asarray(params["ln1"]["beta"])))
        t[4].weight.copy_(torch.from_numpy(np.asarray(params["fc2"]["w"]).T))
        t[4].bias.copy_(torch.from_numpy(np.asarray(params["fc2"]["b"])))
        t[5].weight.copy_(torch.from_numpy(np.asarray(params["ln2"]["gamma"])))
        t[5].bias.copy_(torch.from_numpy(np.asarray(params["ln2"]["beta"])))
        t[8].weight.copy_(torch.from_numpy(np.asarray(params["fc3"]["w"]).T))
        t[8].bias.copy_(torch.from_numpy(np.asarray(params["fc3"]["b"])))
    x = rng.normal(size=(7, 12)).astype(np.float32)
    got = np.asarray(mlp_apply(params, jnp.asarray(x), arch="deep", train=False))
    want = t(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_weighted_ce_mean_matches_torch(rng):
    logits = rng.normal(size=(9, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=9)
    w = rng.uniform(0.5, 2.0, size=4).astype(np.float32)
    want = tnn.CrossEntropyLoss(weight=torch.from_numpy(w))(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    got = float(
        weighted_ce_mean(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_classifier_learns_separable_data(rng):
    n, d, k = 200, 10, 3
    centers = rng.normal(scale=4.0, size=(k, d))
    y = rng.integers(0, k, size=n)
    x = (centers[y] + rng.normal(size=(n, d))).astype(np.float32)
    fit = fit_classifier(
        x[:160], y[:160], x[160:], y[160:], k, np.ones(k, np.float32),
        jax.random.PRNGKey(0), arch="shallow", num_epochs=20, early_stop=False,
    )
    pred = predict_classes(fit.params, x[160:], arch="shallow")
    acc = (pred == y[160:]).mean()
    assert acc > 0.9


def test_bench_line_format():
    import json

    line = bench_line("metric", 1.23456, "s", 48.6)
    parsed = json.loads(line)
    assert parsed == {
        "metric": "metric",
        "value": 1.2346,
        "unit": "s",
        "vs_baseline": 48.6,
    }


def test_fused_kernel_noise_args_all_or_nothing():
    """Supplying only part of the injected noise must raise, not silently
    fall back to the in-kernel PRNG (review finding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from vae_los_angeles_tpu.models.directional_vae import rna2dna_vae_init
    from vae_los_angeles_tpu.ops.pallas.fused_train import (
        rna2dna_fused_train_step,
    )

    params, state = rna2dna_vae_init(jax.random.PRNGKey(0), 12, 16, 3, 4)
    rna = jnp.ones((8, 12), jnp.float32)
    dna = jnp.full((8, 16), 0.5, jnp.float32)
    site = jnp.zeros((8,), jnp.int32)
    drop = jnp.ones((8, 128), jnp.float32)
    with pytest.raises(ValueError, match="all-or-nothing"):
        rna2dna_fused_train_step(
            params, state, rna, dna, site, 3, drop_mask=drop
        )


def test_cosine_zero_norm_rows_score_zero():
    """sklearn cosine_similarity treats zero-norm rows as zero vectors."""
    import numpy as np

    from vae_los_angeles_tpu.ops.metrics import compute_imputation_metrics

    y_true = np.array([[1.0, 0.0], [1.0, 1.0]], np.float32)
    y_pred = np.array([[0.0, 0.0], [1.0, 1.0]], np.float32)  # row 0: zero norm
    m = compute_imputation_metrics(y_true, y_pred)
    assert np.isfinite(m["CosineSimilarity"])
    assert abs(m["CosineSimilarity"] - 0.5) < 1e-6  # (0 + 1) / 2


def test_r2_mean_constant_column_matches_sklearn():
    import numpy as np
    from sklearn.metrics import r2_score

    from vae_los_angeles_tpu.ops.metrics import compute_cv_metrics

    rng = np.random.default_rng(0)
    y_true = rng.normal(size=(16, 3)).astype(np.float32)
    y_true[:, 1] = 0.7  # constant column
    y_pred = y_true.copy()
    y_pred[:, 0] += 0.1 * rng.normal(size=16).astype(np.float32)
    # constant column predicted exactly -> sklearn scores it 1.0
    ours = compute_cv_metrics(y_true, y_pred)["Mean R2"]
    ref = r2_score(y_true, y_pred)
    assert abs(ours - ref) < 1e-5


def test_batchnorm_rejects_batch_of_one():
    import jax.numpy as jnp
    import pytest

    from vae_los_angeles_tpu.ops.nn import batchnorm_apply, batchnorm_init

    params, state = batchnorm_init(4)
    with pytest.raises(ValueError, match="batch size > 1"):
        batchnorm_apply(params, state, jnp.ones((1, 4)), train=True)


def test_synthetic_dataframe_matches_label_encoder():
    """make_dataframe's primary_site names decode primary_site_encoded
    consistently with make_label_encoder (review finding)."""
    import numpy as np

    from vae_los_angeles_tpu.data.synthetic import (
        generate_synthetic_arrays,
        make_dataframe,
        make_label_encoder,
    )

    tpm, beta, site = generate_synthetic_arrays(64, 8, 8, 6, seed=1)
    df = make_dataframe(tpm, beta, site, 6)
    le = make_label_encoder(6)
    decoded = le.inverse_transform(df["primary_site_encoded"].to_numpy())
    assert list(decoded) == list(df["primary_site"])


def test_loaded_wrapper_sharded_serving_matches_eager(rng):
    """The jitted (and, on this 8-device CI mesh, sample-sharded) forward in
    the evaluation loading wrappers must reproduce the eager un-jitted apply
    to float precision, for both the with-site and site=None traces."""
    from vae_los_angeles_tpu.evaluation.loading import LoadedDirectionalVAE
    from vae_los_angeles_tpu.models import rna2dna_vae_apply, rna2dna_vae_init

    dim_a, dim_b, n_sites, latent = 13, 17, 4, 5
    params, state = rna2dna_vae_init(
        jax.random.PRNGKey(0), dim_a, dim_b, n_sites, latent, 8
    )
    model = LoadedDirectionalVAE(rna2dna_vae_apply, "rna", params, state)
    x = rng.normal(size=(21, dim_a)).astype(np.float32)  # odd row count
    site = rng.integers(0, n_sites, size=21).astype(np.int64)
    key = jax.random.PRNGKey(7)

    for s in (site, None):
        recon, mu, logvar = model(rna=x, site=s, key=key)
        ref = rna2dna_vae_apply(
            params, state, key, rna=jnp.asarray(x),
            site=None if s is None else jnp.asarray(s), train=False,
        )
        np.testing.assert_allclose(recon, np.asarray(ref.recon), atol=1e-6)
        np.testing.assert_allclose(mu, np.asarray(ref.mu), atol=1e-6)
        np.testing.assert_allclose(logvar, np.asarray(ref.logvar), atol=1e-6)


def test_cv_pairwise_tests_semantics():
    """The t-test frame preserves the reference's selection quirk (best
    config chosen by Mean R2 for EVERY compared metric) and orients the
    winner correctly for error metrics."""
    from vae_los_angeles_tpu.evaluation.cross_modality_cv import (
        pairwise_tests,
        tidy_results,
    )

    def res(model, param, mean_r2, mse_scores):
        return {
            "direction": "RNA -> DNA",
            "model": model,
            "param_name": "k" if model == "knn" else "epochs",
            "param_value": param,
            "mean_Mean R2": mean_r2,
            "fold_metrics": {
                "Mean R2": [mean_r2] * len(mse_scores),
                "MSE": mse_scores,
            },
        }

    results = [
        # knn k=5 is Mean-R2-best but MSE-WORST among knn configs: the MSE
        # test must still pair k=5 (the quirk, reference :466-468)
        res("knn", 5, 0.9, [5.0, 5.1, 4.9, 5.2, 5.05]),
        res("knn", 10, 0.5, [0.10, 0.11, 0.09, 0.12, 0.10]),
        res("vae", 200, 0.8, [1.0, 1.1, 0.9, 1.2, 1.05]),
        res("mean", 0, 0.0, [9.0, 9.1, 8.9, 9.2, 9.05]),
    ]
    tests = pairwise_tests(results, metric="MSE")
    vae_knn = tests[(tests["A"] == "vae") & (tests["B"] == "knn")].iloc[0]
    assert vae_knn["B_config"] == "knn (k=5)"  # Mean-R2-best, not MSE-best
    # MSE is an error metric: vae (1.0) beats knn (5.0)
    assert vae_knn["winner"] == "vae"
    vae_mean = tests[(tests["A"] == "vae") & (tests["B"] == "mean")].iloc[0]
    assert vae_mean["winner"] == "vae"

    # on a higher-better metric the same pairing flips
    tests_r2 = pairwise_tests(results, metric="Mean R2")
    vae_knn_r2 = tests_r2[(tests_r2["A"] == "vae") & (tests_r2["B"] == "knn")]
    assert vae_knn_r2.iloc[0]["winner"] == "knn"

    frame = tidy_results(results)
    assert set(frame.columns) == {
        "Direction", "Model", "Config", "Fold", "Metric", "Score",
    }
    # one row per (config, metric, fold)
    assert len(frame) == 4 * 2 * 5


def test_cv_statistical_report_non_significant(capsys):
    """A p>=0.05 pair must render 'no significant difference' — pandas turns
    the None winner into float NaN, which is truthy and once printed
    'nan significantly better'."""
    from vae_los_angeles_tpu.evaluation.cross_modality_cv import (
        perform_statistical_comparison,
    )

    def res(model, mean_r2, scores):
        return {
            "direction": "RNA -> DNA",
            "model": model,
            "param_name": "k" if model == "knn" else "epochs",
            "param_value": 5,
            "mean_Mean R2": mean_r2,
            "fold_metrics": {"Mean R2": scores},
        }

    # ae vs vae: statistically indistinguishable folds; vae vs knn: clear gap
    results = [
        res("ae", 0.9001, [0.90, 0.91, 0.89, 0.905, 0.895]),
        res("vae", 0.9000, [0.91, 0.89, 0.90, 0.895, 0.905]),
        res("knn", 0.5, [0.50, 0.51, 0.49, 0.505, 0.495]),
        res("mean", 0.0, [0.0, 0.01, -0.01, 0.005, -0.005]),
    ]
    tests = perform_statistical_comparison(results, metric="Mean R2")
    out = capsys.readouterr().out
    ae_vae = tests[(tests["A"] == "ae") & (tests["B"] == "vae")].iloc[0]
    assert ae_vae["p"] >= 0.05
    assert "no significant difference" in out
    assert "nan significantly better" not in out
    assert "vae significantly better" in out  # the clear pairs still report


def test_hpo_trial_keys_global_and_slice_stable():
    """Trial run keys derive from the GLOBAL trial index: equal-sized shape
    buckets must not share key rows (split(key, n) would hand both buckets
    identical rows), and slicing survivors preserves their original keys."""
    from vae_los_angeles_tpu.evaluation.hpo import _trial_keys

    a = _trial_keys(0, [0, 1, 2])
    b = _trial_keys(0, [3, 4, 5])
    # no row of bucket a appears in bucket b (and vice versa)
    assert not any((row == b).all(axis=1).any() for row in a)
    # continuation: survivors keep their original rows
    np.testing.assert_array_equal(_trial_keys(0, [0, 2]), a[[0, 2]])


def test_hpo_timeout_checked_between_rungs(monkeypatch):
    """--timeout expiring mid-bucket stops STARTING new rungs (optuna
    semantics: in-flight work completes, no new work begins); survivors keep
    the results of the rungs that ran."""
    import time as time_mod

    from vae_los_angeles_tpu.config import Config
    from vae_los_angeles_tpu.data.dataset import MultiModalArrays
    from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
    from vae_los_angeles_tpu.evaluation.hpo import run_vmapped

    tpm, beta, site = generate_synthetic_arrays(
        n_samples=96, dim_a=11, dim_b=13, n_sites=3, seed=0
    )
    arr = MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta),
                           jnp.asarray(site))
    tr, va = arr.take(jnp.arange(64)), arr.take(jnp.arange(64, 96))
    cfg = Config(input_dim_a=11, input_dim_b=13, batch_size=16)
    trials = [
        dict(latent_dim=4, embed_dim=4, learning_rate=1e-3,
             weight_decay=1e-5, beta_start=1e-3, gamma=1.0)
        for _ in range(4)
    ]
    # monotonic() call order in run_vmapped: t0, bucket check, rung-1 check.
    # 0 elapsed at the bucket check (bucket starts), expired by rung 1.
    ticks = iter([0.0, 0.0, 10_000.0])
    monkeypatch.setattr(time_mod, "monotonic",
                        lambda: next(ticks, 10_000.0))
    values, pruned_at = run_vmapped(
        cfg, trials, tr, va, 3, None, num_epochs=4, seed=0,
        timeout=500.0, prune_rungs=2,
    )
    # rung 0 (2 epochs) ran for everyone — including its end-of-rung pruning
    # decision — and every trial has a finite rung-0 result; rung 1 never
    # started, so the surviving (unpruned) trials kept their epoch-2 results
    assert np.isfinite(values).all()
    survivors = pruned_at == -1
    assert survivors.any(), "median pruning can never drop every trial"
    assert (pruned_at[~survivors] == 2).all()  # pruned at the rung boundary


def test_chunked_predict_places_weights_once(monkeypatch):
    """predict(chunk_size=) must place host-resident weights on device ONCE
    before the chunk loop — per-chunk re-transfer is the cost this path's
    wide-regime users cannot afford."""
    from vae_los_angeles_tpu.data.dataset import MultiModalArrays
    from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
    from vae_los_angeles_tpu.training import engine
    from vae_los_angeles_tpu.training.tasks import TASKS

    cfg = Config(input_dim_a=11, input_dim_b=13, latent_dim=4, embed_dim=4)
    params, state = TASKS["rna2dna"].init(jax.random.PRNGKey(0), cfg, 3)
    # host-resident numpy weights, the documented chunked-serving setup
    params = jax.tree.map(np.asarray, params)
    state = jax.tree.map(np.asarray, state)
    tpm, beta, site = generate_synthetic_arrays(
        n_samples=50, dim_a=11, dim_b=13, n_sites=3, seed=1
    )
    arrays = MultiModalArrays(np.asarray(tpm), np.asarray(beta),
                              np.asarray(site))

    puts = []
    real_put = jax.device_put

    def spy(tree, *a, **k):
        puts.append(tree)
        return real_put(tree, *a, **k)

    monkeypatch.setattr(jax, "device_put", spy)
    out = engine.predict("rna2dna", params, state, arrays, chunk_size=16)
    assert out.shape == (50, 13)
    # exactly one placement of the weights, despite ceil(50/16)=4 chunks
    weight_puts = [t for t in puts if isinstance(t, tuple) and len(t) == 2]
    assert len(weight_puts) == 1


def test_optuna_mode_segmented_pruning(monkeypatch):
    """--prune-rungs in optuna mode: each trial trains in fused segments via
    carry continuation (bit-identical to one unsegmented run), and a pruned
    trial's remaining segments never execute — MedianPruner saves real
    compute, matching the reference's per-epoch abort semantics."""
    import sys
    import types

    from vae_los_angeles_tpu.config import Config
    from vae_los_angeles_tpu.data.dataset import MultiModalArrays
    from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
    from vae_los_angeles_tpu.evaluation import hpo
    from vae_los_angeles_tpu.training import engine

    class TrialPruned(Exception):
        pass

    class FakeTrial:
        """Minimal optuna.Trial: suggests the low end of each range;
        should_prune() fires (only) for odd trial numbers."""

        def __init__(self, number):
            self.number = number
            self.reports = []

        def suggest_int(self, name, lo, hi):
            return lo

        def suggest_float(self, name, lo, hi, log=False):
            return lo

        def suggest_categorical(self, name, choices):
            return choices[0]

        def report(self, value, step):
            self.reports.append((step, value))

        def should_prune(self):
            return self.number % 2 == 1

    class FakeStudy:
        def __init__(self):
            self.trials = []
            self.values = []

        def optimize(self, objective, n_trials, timeout):
            for i in range(n_trials):
                t = FakeTrial(i)
                self.trials.append(t)
                try:
                    self.values.append(objective(t))
                except TrialPruned:
                    self.values.append(None)

    fake = types.ModuleType("optuna")
    fake.TrialPruned = TrialPruned
    fake.create_study = lambda direction, pruner=None: FakeStudy()
    monkeypatch.setitem(sys.modules, "optuna", fake)

    fit_calls = []
    real_fit = engine.fit

    def spy(*a, **k):
        fit_calls.append((k.get("num_epochs"), k.get("start_epoch", 0)))
        return real_fit(*a, **k)

    monkeypatch.setattr(hpo.engine, "fit", spy)

    tpm, beta, site = generate_synthetic_arrays(
        n_samples=96, dim_a=11, dim_b=13, n_sites=3, seed=0
    )
    arr = MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta),
                           jnp.asarray(site))
    tr, va = arr.take(jnp.arange(64)), arr.take(jnp.arange(64, 96))
    cfg = Config(input_dim_a=11, input_dim_b=13, batch_size=16)

    study = hpo.run_optuna(cfg, 2, None, tr, va, 3, None,
                           num_epochs=4, seed=0, prune_rungs=2)

    # trial 0 (never pruned): two segments, [0,2) then [2,4); trial 1:
    # pruned at its first report — segment 2 never ran
    assert fit_calls == [(2, 0), (2, 2), (2, 0)]
    assert study.values[1] is None  # pruned
    assert study.trials[1].reports == [(0, study.trials[1].reports[0][1])]
    # segmented == unsegmented, bit-exact (same params/key, one fused run)
    full = real_fit(
        "multimodal",
        cfg.replace(latent_dim=10, embed_dim=16, patience=10**6),
        tr, va, jax.random.PRNGKey(0), 3, num_epochs=4,
        hp=engine.hyperparams(cfg, lr=1e-5, weight_decay=1e-6,
                              beta_start=1e-4, gamma=0.5),
    )
    assert study.values[0] == float(np.nanmin(np.asarray(full.val_losses)))
