"""Masked-dynamic-size fold/trial populations (round-5 flagship fix).

The CV/HPO training populations key their executables on `bucket_rows`-padded
row MAXIMA with the true sizes as dynamic masked arguments — the downstream
classifier's recipe (evaluation/mlp_classifier._make_fold_fit) applied to the
flagship engine (engine.build_fit_fn(masked_sizes=True)). Pinned contracts:

  * vmapped fold population ≡ one-at-a-time masked fits, BIT-exact, with
    UNEVEN KFold folds (the shapes that round-4 split into 2 programs);
  * padding content is inert (NaN-poisoned rows change nothing, bitwise);
  * an all-ones mask reproduces the exact-shape path to reduction-order
    noise (cross-program bitwise equality is at XLA fusion's mercy — the
    honest cross-shape statement, see RESULTS.md round-5 note);
  * one executable serves every fold of an uneven KFold split AND a second
    cohort size inside the same buckets (jit-cache count pinned);
  * host-side fail-loud parity for the shapes the exact path rejects at
    trace time (1-row final batch → torch BN crash, empty val).

Reference: vae_cross_modality_cv.py:549-551 (shared-fold protocol) — the
folds themselves stay seed-42 sklearn-exact; only the batching machinery is
padded and masked.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.splits import kfold_indices
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.ops.backend import bucket_rows
from vae_los_angeles_tpu.parallel import vmap_meta
from vae_los_angeles_tpu.training import engine
from vae_los_angeles_tpu.training.tasks import TASKS

CFG = Config(input_dim_a=40, input_dim_b=48, latent_dim=8, embed_dim=8,
             batch_size=16, num_epochs=3)
N_SITES = 5
EPOCHS = 3


def _arrays(n, seed=0):
    tpm, beta, site = generate_synthetic_arrays(
        n_samples=n, dim_a=CFG.input_dim_a, dim_b=CFG.input_dim_b,
        n_sites=N_SITES, seed=seed,
    )
    return MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta),
                            jnp.asarray(site))


def _uneven_folds(n=110, k=3, seed=0):
    arr = _arrays(n, seed)
    folds = kfold_indices(n, k)
    ftr = [arr.take(tr) for tr, _ in folds]
    fva = [arr.take(va) for _, va in folds]
    sizes = {(len(a), len(b)) for a, b in zip(ftr, fva)}
    assert len(sizes) == 2, "fixture must produce uneven KFold folds"
    return ftr, fva


def _bit_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y), equal_nan=True)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_uneven_folds_one_program_bitwise_vs_sequential_masked():
    """All folds of an uneven KFold split train as ONE vmapped masked
    program, bit-identical to one-at-a-time fits through the same masked
    core (the MLP-core contract, applied to the engine)."""
    ftr, fva = _uneven_folds()
    key = jax.random.PRNGKey(4)
    res = vmap_meta.fit_folds("rna2dna", CFG, ftr, fva, key, N_SITES,
                              num_epochs=EPOCHS, mask_sizes=True)

    n_tr_max = bucket_rows(max(len(t) for t in ftr))
    n_va_max = bucket_rows(max(len(v) for v in fva))
    fitm = jax.jit(engine.build_fit_fn(
        "rna2dna", EPOCHS, CFG.batch_size, n_tr_max, n_va_max, False, False,
        stop_via_mask=True, masked_sizes=True,
    ))
    keys = jax.random.split(key, len(ftr))
    hp = engine.hyperparams(CFG)
    for i in range(len(ftr)):
        p0, s0 = TASKS["rna2dna"].init(keys[i], CFG, N_SITES)
        solo = fitm(
            engine.init_carry(p0, s0, hp["lr"]),
            vmap_meta._pad_rows_arrays(ftr[i], n_tr_max),
            vmap_meta._pad_rows_arrays(fva[i], n_va_max),
            hp, None, keys[i], jnp.int32(0),
            jnp.int32(len(ftr[i])), jnp.int32(len(fva[i])),
        )
        assert _bit_equal(res[i], solo), f"fold {i} diverged from solo fit"


def test_poisoned_padding_is_inert():
    """NaN in every padded row (train and val) must not change a single
    bit: train pads are never gathered, val pads are where-masked."""
    ftr, fva = _uneven_folds(seed=1)
    key = jax.random.PRNGKey(7)
    clean = vmap_meta.fit_folds("rna2dna", CFG, ftr, fva, key, N_SITES,
                                num_epochs=EPOCHS, mask_sizes=True)

    n_tr_max = bucket_rows(max(len(t) for t in ftr))
    n_va_max = bucket_rows(max(len(v) for v in fva))

    def poison(a, n_max):
        p = vmap_meta._pad_rows_arrays(a, n_max)
        n = len(a)
        return MultiModalArrays(
            p.tpm.at[n:].set(jnp.nan), p.beta.at[n:].set(jnp.nan), p.site)

    # hand-feed poisoned pre-padded tables through the same population call
    ftr_p = [poison(a, n_tr_max) for a in ftr]
    fva_p = [poison(a, n_va_max) for a in fva]
    n_trs = jnp.asarray([len(a) for a in ftr], jnp.int32)
    n_vas = jnp.asarray([len(a) for a in fva], jnp.int32)
    fit_v = vmap_meta._vmapped_fit(
        "rna2dna", EPOCHS, int(CFG.batch_size), n_tr_max, n_va_max, False,
        False, 0, None, masked_sizes=True,
    )
    keys = jax.random.split(key, len(ftr))
    hp = engine.hyperparams(CFG)
    init = vmap_meta._vmapped_init("rna2dna", CFG, N_SITES)
    carry0 = init(keys, jnp.broadcast_to(hp["lr"], (len(ftr),)))
    poisoned = fit_v(
        carry0, vmap_meta._stack_arrays(ftr_p), vmap_meta._stack_arrays(fva_p),
        hp, None, keys, jnp.int32(0), n_trs, n_vas,
    )
    poisoned = jax.device_get(poisoned)
    for i in range(len(ftr)):
        member = jax.tree.map(lambda x: x[i], poisoned)
        assert _bit_equal(clean[i], member), f"fold {i} saw its padding"


def test_all_ones_mask_matches_exact_path_closely():
    """Maxima == true sizes, batch-divisible rows: the masked program must
    reproduce the exact-shape path to reduction-order noise (bitwise
    equality across two different compiled programs is not defensible —
    XLA fusion decides the reduction trees)."""
    arr = _arrays(128, seed=2)
    tr, va = arr.take(np.arange(96)), arr.take(np.arange(96, 128))
    key = jax.random.PRNGKey(0)
    p0, s0 = TASKS["rna2dna"].init(key, CFG, N_SITES)
    hp = engine.hyperparams(CFG)
    carry0 = engine.init_carry(p0, s0, hp["lr"])
    fe = jax.jit(engine.build_fit_fn(
        "rna2dna", 4, 16, 96, 32, False, False))
    fm = jax.jit(engine.build_fit_fn(
        "rna2dna", 4, 16, 96, 32, False, False, masked_sizes=True))
    re_ = fe(carry0, tr, va, hp, None, key, jnp.int32(0))
    rm = fm(carry0, tr, va, hp, None, key, jnp.int32(0),
            jnp.int32(96), jnp.int32(32))
    np.testing.assert_allclose(np.asarray(re_.val_losses),
                               np.asarray(rm.val_losses), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(re_.params["decoder_dna"]["fc2"]["w"]),
        np.asarray(rm.params["decoder_dna"]["fc2"]["w"]),
        atol=1e-4,
    )


def test_shuffle_restriction_property_at_reference_scale():
    """In the single-sort-round regime (n ≲ 1600 — covers the reference's
    fold sizes), jax.random.permutation(k, n_max) restricted to ids < n IS
    permutation(k, n): a masked member's shuffle stream equals the exact
    path's stream for its true size, independent of the bucket. Pinned so
    an upstream shuffle-algorithm change is caught, not silently absorbed."""
    for seed, (n, m) in [(0, (712, 1024)), (1, (90, 96)), (2, (850, 1024))]:
        k = jax.random.PRNGKey(seed)
        a = np.asarray(jax.random.permutation(k, n))
        b = np.asarray(jax.random.permutation(k, m))
        assert np.array_equal(a, b[b < n]), (seed, n, m)


def test_one_executable_for_uneven_folds_and_resized_cohorts():
    """Program-count contract: one jit entry serves both KFold fold shapes,
    and a second cohort size inside the same buckets adds NO executable."""
    ftr, fva = _uneven_folds(n=110, seed=3)
    key = jax.random.PRNGKey(9)
    vmap_meta.fit_folds("rna2dna", CFG, ftr, fva, key, N_SITES,
                        num_epochs=EPOCHS, mask_sizes=True)
    n_tr_max = bucket_rows(max(len(t) for t in ftr))
    n_va_max = bucket_rows(max(len(v) for v in fva))
    fit_v = vmap_meta._vmapped_fit(
        "rna2dna", EPOCHS, int(CFG.batch_size), n_tr_max, n_va_max, False,
        False, 0, None, masked_sizes=True,
    )
    size_before = fit_v._cache_size()
    assert size_before > 0  # the builder key must match what fit_folds used

    # 112 samples → folds (75,37)/(74,38): different true sizes, same
    # buckets as the 110-sample split → the SAME executable must serve them
    ftr2, fva2 = _uneven_folds(n=112, seed=4)
    assert bucket_rows(max(len(t) for t in ftr2)) == n_tr_max
    assert bucket_rows(max(len(v) for v in fva2)) == n_va_max
    vmap_meta.fit_folds("rna2dna", CFG, ftr2, fva2, key, N_SITES,
                        num_epochs=EPOCHS, mask_sizes=True)
    assert fit_v._cache_size() == size_before


def test_fit_trials_masked_reuses_program_across_subset_sizes():
    """The HPO population: two subset sizes in one bucket share the
    compiled trial program (the --subset recompile trap, round-4 weak #2)."""
    arr = _arrays(150, seed=5)
    pop = {"lr": np.asarray([1e-4, 1e-3], np.float32)}
    key = jax.random.PRNGKey(6)

    def run(n_tr, n_va):
        return vmap_meta.fit_trials(
            "rna2dna", CFG, arr.take(np.arange(n_tr)),
            arr.take(np.arange(n_tr, n_tr + n_va)), key, N_SITES, pop,
            num_epochs=EPOCHS, mask_sizes=True,
        )

    r1 = run(100, 37)
    fit_v = vmap_meta._vmapped_fit(
        "rna2dna", EPOCHS, int(CFG.batch_size), bucket_rows(100),
        bucket_rows(37), True, False, None, 0, masked_sizes=True,
        sizes_axis=None,
    )
    size_before = fit_v._cache_size()
    assert size_before > 0
    r2 = run(104, 38)  # same buckets → zero new executables
    assert fit_v._cache_size() == size_before
    assert np.isfinite(np.asarray(r1.best_val_loss)).all()
    assert np.isfinite(np.asarray(r2.best_val_loss)).all()


def test_masked_fail_loud_parity():
    """Shapes the exact path rejects at trace time fail loudly host-side:
    a 1-row final batch (torch BN crash) and an empty validation set."""
    arr = _arrays(80, seed=6)
    key = jax.random.PRNGKey(0)
    # n_train = 33 → 33 % 16 == 1 → final batch of one row
    with pytest.raises(ValueError, match="single row"):
        vmap_meta.fit_folds(
            "rna2dna", CFG, [arr.take(np.arange(33))],
            [arr.take(np.arange(33, 60))], key, N_SITES,
            num_epochs=1, mask_sizes=True,
        )
    with pytest.raises(ValueError, match="no training batches"):
        vmap_meta.fit_trials(
            "rna2dna", CFG, arr.take(np.arange(10)),
            arr.take(np.arange(10, 20)), key, N_SITES,
            {"lr": np.asarray([1e-3], np.float32)}, num_epochs=1,
            mask_sizes=True,
        )


def test_exact_mode_opt_out(monkeypatch):
    """POP_MASK_SIZES=0 restores exact-shape grouping (round-4 behavior)."""
    monkeypatch.setenv("POP_MASK_SIZES", "0")
    assert not vmap_meta.mask_sizes_enabled()
    ftr, fva = _uneven_folds(n=110, seed=8)
    res = vmap_meta.fit_folds("rna2dna", CFG, ftr, fva,
                              jax.random.PRNGKey(1), N_SITES,
                              num_epochs=EPOCHS)
    assert len(res) == len(ftr)
    assert all(np.isfinite(float(r.best_val_loss)) for r in res)


def test_masked_population_survives_debug_nans():
    """DEBUG_NANS mode re-runs the program op-by-op on any NaN: a healthy
    masked population must produce NONE — inactive trailing batches go
    through BatchNorm with an all-masked row set, which would divide by a
    zero count without the row-0 safety (ops.nn.batchnorm_apply), and
    post-stop rows must fill +inf, not NaN (stop_fill_inf)."""
    ftr, fva = _uneven_folds(n=110, seed=9)
    prior = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        res = vmap_meta.fit_folds(
            "rna2dna", CFG, ftr, fva, jax.random.PRNGKey(2), N_SITES,
            num_epochs=2, mask_sizes=True,
        )
    finally:
        jax.config.update("jax_debug_nans", prior)
    assert all(np.isfinite(float(r.best_val_loss)) for r in res)
