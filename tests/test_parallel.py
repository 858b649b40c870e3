"""Sharding + vmapped meta-loop tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.splits import kfold_indices
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.parallel import sharding, vmap_meta
from vae_los_angeles_tpu.training import engine

DIM_A, DIM_B, N_SITES = 21, 29, 4
CFG = Config(input_dim_a=DIM_A, input_dim_b=DIM_B, latent_dim=6, batch_size=16)


def _arrays(n=160, seed=0):
    tpm, beta, site = generate_synthetic_arrays(
        n_samples=n, dim_a=DIM_A, dim_b=DIM_B, n_sites=N_SITES, seed=seed
    )
    return MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta), jnp.asarray(site))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_train_step_dp_tp():
    """Full train step over a (data=4, model=2) mesh runs and stays sharded."""
    mesh = sharding.make_mesh(8, model_parallel=2)
    key = jax.random.PRNGKey(0)
    params, state, opt = sharding.make_sharded_train_state(
        "rna2dna", CFG, N_SITES, mesh, key
    )
    batch = sharding.shard_arrays(_arrays(n=64), mesh)
    step = sharding.sharded_train_step("rna2dna")
    params, state, opt, loss = step(
        params, state, opt, batch, key,
        jnp.float32(5e-4), jnp.float32(1e-5), jnp.float32(0.0), jnp.float32(1.0),
    )
    assert np.isfinite(float(loss))
    # TP: DecoderB's 256→512 weight is sharded over "model"
    w = params["decoder_dna"]["fc2"]["w"]
    assert len(w.sharding.device_set) == 8 or not w.sharding.is_fully_replicated


def test_sharded_train_step_donate_mode():
    """donate=True (in-place state updates for the multi-GB wide regime)
    must run repeatedly with chained outputs and produce the same loss as
    the non-donating build (donation is an aliasing hint, not math)."""
    mesh = sharding.make_mesh(8, model_parallel=2)
    key = jax.random.PRNGKey(3)
    args = (jnp.float32(5e-4), jnp.float32(1e-5), jnp.float32(0.0),
            jnp.float32(1.0))
    losses = {}
    for donate in (False, True):
        params, state, opt = sharding.make_sharded_train_state(
            "rna2dna", CFG, N_SITES, mesh, key
        )
        batch = sharding.shard_arrays(_arrays(n=64), mesh)
        step = sharding.sharded_train_step("rna2dna", donate=donate)
        for _ in range(2):
            params, state, opt, loss = step(params, state, opt, batch, key,
                                            *args)
        losses[donate] = float(loss)
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


def test_sharded_step_matches_unsharded():
    """DP+TP sharding must not change the math (collectives are exact)."""
    mesh = sharding.make_mesh(8, model_parallel=2)
    key = jax.random.PRNGKey(1)
    from vae_los_angeles_tpu.training.tasks import TASKS

    params, state = TASKS["rna2dna"].init(key, CFG, N_SITES)
    opt0 = __import__(
        "vae_los_angeles_tpu.ops.optim", fromlist=["x"]
    ).adamw_init(params)
    batch = _arrays(n=64, seed=2)
    step = sharding.sharded_train_step("rna2dna")
    args = (jnp.float32(5e-4), jnp.float32(1e-5), jnp.float32(0.0), jnp.float32(1.0))

    p1, s1, o1, loss1 = step(params, state, opt0, batch, key, *args)

    sp = sharding.shard_params(params, mesh)
    sstate = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        ),
        state,
    )
    sopt = __import__(
        "vae_los_angeles_tpu.ops.optim", fromlist=["x"]
    ).adamw_init(sp)
    sbatch = sharding.shard_arrays(batch, mesh)
    p2, s2, o2, loss2 = step(sp, sstate, sopt, sbatch, key, *args)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["decoder_dna"]["fc2"]["w"]),
        np.asarray(p2["decoder_dna"]["fc2"]["w"]),
        atol=1e-5,
    )


def test_fit_folds_matches_sequential():
    """vmapped fold population == one-at-a-time fits (same keys).

    Pinned in EXACT-shape mode (mask_sizes=False): this test's oracle is
    the single-run engine.fit, whose noise streams the exact path matches;
    the masked default's own vmap-vs-sequential bit-parity lives in
    tests/test_masked_populations.py against the masked sequential core."""
    arrays = _arrays(n=120, seed=3)
    folds = kfold_indices(len(arrays), 3)
    fold_train = [arrays.take(tr) for tr, _ in folds]
    fold_val = [arrays.take(va) for _, va in folds]
    key = jax.random.PRNGKey(4)

    batched = vmap_meta.fit_folds(
        "rna2dna", CFG, fold_train, fold_val, key, N_SITES, num_epochs=4,
        mask_sizes=False,
    )
    keys = jax.random.split(key, 3)
    for i in range(3):
        from vae_los_angeles_tpu.training.tasks import TASKS

        p0, s0 = TASKS["rna2dna"].init(keys[i], CFG, N_SITES)
        solo = engine.fit(
            "rna2dna", CFG, fold_train[i], fold_val[i], keys[i], N_SITES,
            num_epochs=4, drop_last=False, init_params=p0, init_state=s0,
        )
        np.testing.assert_allclose(
            np.asarray(batched[i].val_losses),
            np.asarray(solo.val_losses),
            rtol=2e-4,
        )


def test_fit_trials_population():
    """A 4-trial population trains in one call; lr actually differentiates."""
    arrays = _arrays(n=120, seed=5)
    tr, va = arrays.take(np.arange(96)), arrays.take(np.arange(96, 120))
    pop = {
        "lr": np.asarray([1e-5, 3e-4, 1e-3, 5e-3], np.float32),
        "beta_start": np.full(4, 1e-3, np.float32),
    }
    res = vmap_meta.fit_trials(
        "rna2dna", CFG, tr, va, jax.random.PRNGKey(6), N_SITES, pop, num_epochs=6
    )
    best_vals = np.asarray(res.best_val_loss)
    assert best_vals.shape == (4,)
    assert np.isfinite(best_vals).all()
    # the tiny-lr trial should be clearly worse than the mid-lr trials
    assert best_vals[0] > best_vals.min()


def test_fit_trials_early_stop_masked_matches_sequential():
    """Early stop firing mid-run inside the vmapped population exercises the
    stop_via_mask epoch path (engine.build_fit_fn(stop_via_mask=True), the
    4.7× compile fix): the stopped member's carry freezes, its loss rows go
    NaN, and everything matches the sequential scalar-lax.cond fit exactly."""
    from vae_los_angeles_tpu.training.tasks import TASKS

    arrays = _arrays(n=120, seed=7)
    tr, va = arrays.take(np.arange(96)), arrays.take(np.arange(96, 120))
    # trial 0: lr=0 freezes params → val loss stops improving → patience=1
    # stops it within a couple of epochs; trial 1 runs the full 10
    pop = {
        "lr": np.asarray([0.0, 1e-3], np.float32),
        "patience": np.asarray([1, 1000], np.int32),
    }
    key = jax.random.PRNGKey(11)
    res = vmap_meta.fit_trials(
        "rna2dna", CFG, tr, va, key, N_SITES, pop, num_epochs=10
    )
    epochs_ran = np.asarray(res.epochs_ran)
    assert bool(np.asarray(res.stopped)[0]), "trial 0 must early-stop"
    assert epochs_ran[0] < 10 and epochs_ran[1] == 10
    vl0 = np.asarray(res.val_losses)[0]
    assert np.isnan(vl0[epochs_ran[0]:]).all()  # masked rows are NaN

    keys = jax.random.split(key, 2)
    for i, (lr, patience) in enumerate([(0.0, 1), (1e-3, 1000)]):
        p0, s0 = TASKS["rna2dna"].init(keys[i], CFG, N_SITES)
        solo = engine.fit(
            "rna2dna", CFG, tr, va, keys[i], N_SITES, num_epochs=10,
            drop_last=True, init_params=p0, init_state=s0,
            hp=engine.hyperparams(CFG, lr=lr, patience=patience),
        )
        np.testing.assert_allclose(
            np.asarray(res.val_losses)[i], np.asarray(solo.val_losses),
            rtol=2e-4,
        )
        assert epochs_ran[i] == int(solo.epochs_ran)
        np.testing.assert_allclose(
            np.asarray(res.best_val_loss)[i], float(solo.best_val_loss),
            rtol=2e-4,
        )


def test_tp_specs_skip_narrow_ae_encoder():
    """RNA2DNAAE's narrow rna→128→latent encoder reuses DNA2RNAAE's
    enc_fc1/enc_fc2 layer names; the TP policy must shard only the genuinely
    512-wide layers and replicate the narrow name-collisions."""
    from jax.sharding import PartitionSpec as P

    from vae_los_angeles_tpu.training.tasks import TASKS

    p_narrow, _ = TASKS["rna2dna_ae"].init(jax.random.PRNGKey(0), CFG, N_SITES)
    specs = sharding.param_specs(p_narrow)
    assert specs["enc_fc1"]["w"] == P()
    assert specs["enc_fc2"]["w"] == P()

    p_wide, _ = TASKS["dna2rna_ae"].init(jax.random.PRNGKey(0), CFG, N_SITES)
    specs_w = sharding.param_specs(p_wide)
    assert specs_w["enc_fc1"]["w"] == P(None, "model")
    # row-parallel specs are written as P("model") (trailing None omitted) so
    # the hand-placed layout equals GSPMD's canonical output sharding and the
    # second train step doesn't recompile
    assert specs_w["enc_fc2"]["w"] == P("model")


def test_population_sharding_matches_unsharded():
    """Folds/trials sharded over the 8-device mesh train EXACTLY as the
    unsharded vmapped population (member trainings are independent, so
    GSPMD partitions with zero collectives). Uses an uneven population
    (3 folds on 8 devices) to cover the padded case."""
    arrays = _arrays(n=200, seed=9)
    fold_train = [arrays.take(np.arange(0, 96)),
                  arrays.take(np.arange(48, 144)),
                  arrays.take(np.arange(96, 192))]
    fold_val = [arrays.take(np.arange(96, 128)),
                arrays.take(np.arange(144, 176)),
                arrays.take(np.arange(0, 32))]
    key = jax.random.PRNGKey(11)
    mesh = vmap_meta.population_mesh()
    assert mesh is not None  # 8 virtual devices in CI

    plain = vmap_meta.fit_folds(
        "rna2dna", CFG, fold_train, fold_val, key, N_SITES, num_epochs=3
    )
    sharded = vmap_meta.fit_folds(
        "rna2dna", CFG, fold_train, fold_val, key, N_SITES, num_epochs=3,
        mesh=mesh,
    )
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(
            np.asarray(a.val_losses), np.asarray(b.val_losses), rtol=2e-5
        )

    pop = {"lr": np.asarray([1e-4, 5e-4, 1e-3], np.float32)}
    tr, va = arrays.take(np.arange(160)), arrays.take(np.arange(160, 200))
    t_plain = vmap_meta.fit_trials(
        "rna2dna", CFG, tr, va, key, N_SITES, pop, num_epochs=3
    )
    t_shard = vmap_meta.fit_trials(
        "rna2dna", CFG, tr, va, key, N_SITES, pop, num_epochs=3, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(t_plain.val_losses), np.asarray(t_shard.val_losses),
        rtol=2e-4,  # fp reduction-order noise from the partitioned layout
    )


def test_dp_fit_matches_unsharded():
    """A single training run sharded sample-wise over the 8-device mesh
    (engine.fit(mesh=...), the CLI --dp path) trains like the single-chip
    run: GSPMD partitions the whole fused scan, psum-reducing the loss sums,
    BatchNorm batch statistics, and gradients. Equal up to float
    reduction order."""
    from vae_los_angeles_tpu.training.tasks import TASKS

    arrays = _arrays(n=200, seed=13)
    tr, va = arrays.take(np.arange(160)), arrays.take(np.arange(160, 200))
    key = jax.random.PRNGKey(17)
    p0, s0 = TASKS["rna2dna"].init(key, CFG, N_SITES)

    plain = engine.fit(
        "rna2dna", CFG, tr, va, key, N_SITES, num_epochs=4,
        init_params=p0, init_state=s0,
    )
    mesh = vmap_meta.population_mesh()
    assert mesh is not None  # 8 virtual devices in CI
    dp = engine.fit(
        "rna2dna", CFG, tr, va, key, N_SITES, num_epochs=4,
        init_params=p0, init_state=s0, mesh=mesh,
    )
    np.testing.assert_allclose(
        np.asarray(plain.val_losses), np.asarray(dp.val_losses), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(plain.params["decoder_dna"]["fc2"]["w"]),
        np.asarray(dp.params["decoder_dna"]["fc2"]["w"]),
        atol=2e-4,
    )
    # Pallas paths are single-chip by design: mesh + fused must fail loudly
    import pytest

    with pytest.raises(ValueError, match="single-chip"):
        engine.fit(
            "rna2dna", CFG, tr, va, key, N_SITES, num_epochs=1,
            init_params=p0, init_state=s0, mesh=mesh, fused_epoch=True,
        )


def test_dp_predict_matches_unsharded():
    """Sample-sharded eval forward (cohort-scale imputation serving)
    matches the single-chip prediction to float precision: rows are
    independent and params replicated, so GSPMD inserts no collectives
    (per-shard codegen may still fuse differently → one-ulp wiggle). Odd
    row count (77 on 8 devices) covers GSPMD's uneven-shard padding."""
    from vae_los_angeles_tpu.training.tasks import TASKS

    arrays = _arrays(n=77, seed=19)
    key = jax.random.PRNGKey(23)
    p0, s0 = TASKS["rna2dna"].init(key, CFG, N_SITES)
    mesh = vmap_meta.population_mesh()
    assert mesh is not None  # 8 virtual devices in CI

    plain = engine.predict("rna2dna", p0, s0, arrays)
    dp = engine.predict("rna2dna", p0, s0, arrays, mesh=mesh)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(dp), atol=1e-6)


def test_fit_trials_continuation_bitexact():
    """Rung continuation (carry0 + start_epoch + explicit keys) must train
    bit-identically to one uninterrupted run — including after slicing a
    survivor subset out of the population (the HPO pruning path)."""
    arrays = _arrays(n=120, seed=7)
    tr, va = arrays.take(np.arange(96)), arrays.take(np.arange(96, 120))
    pop = {
        "lr": np.asarray([3e-4, 1e-3, 5e-3], np.float32),
        "beta_start": np.full(3, 1e-3, np.float32),
    }
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(9), 3))
    full = vmap_meta.fit_trials(
        "rna2dna", CFG, tr, va, jax.random.PRNGKey(9), N_SITES, pop,
        num_epochs=4, keys=keys,
    )

    # run 2 epochs, drop trial 1, continue trials (0, 2) for 2 more epochs
    part1 = vmap_meta.fit_trials(
        "rna2dna", CFG, tr, va, jax.random.PRNGKey(9), N_SITES, pop,
        num_epochs=2, keys=keys,
    )
    keep = np.asarray([0, 2])
    carry = jax.tree.map(lambda x: x[keep], part1.carry)
    sub_pop = {k: v[keep] for k, v in pop.items()}
    part2 = vmap_meta.fit_trials(
        "rna2dna", CFG, tr, va, jax.random.PRNGKey(9), N_SITES, sub_pop,
        num_epochs=2, carry0=carry, start_epoch=2, keys=keys[keep],
    )
    np.testing.assert_array_equal(
        np.asarray(part2.val_losses), np.asarray(full.val_losses)[keep, 2:]
    )
    np.testing.assert_array_equal(
        np.asarray(part2.best_val_loss), np.asarray(full.best_val_loss)[keep]
    )


def test_degenerate_mesh_is_plain_path():
    """fit/predict with a 1-device mesh must BIT-equal the plain path: the
    degenerate sharding constraints are semantic no-ops but routing the
    program through the SPMD partitioner measured +62 s compile on the TPU
    relay, so engine.fit/predict drop the mesh entirely when mesh.size == 1
    (and reuse the plain program's jit cache — same _build_fit key)."""
    from jax.sharding import Mesh

    from vae_los_angeles_tpu.training.tasks import TASKS

    arrays = _arrays(n=96, seed=29)
    tr, va = arrays.take(np.arange(80)), arrays.take(np.arange(80, 96))
    key = jax.random.PRNGKey(31)
    p0, s0 = TASKS["rna2dna"].init(key, CFG, N_SITES)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ("data",))

    plain = engine.fit(
        "rna2dna", CFG, tr, va, key, N_SITES, num_epochs=3,
        init_params=p0, init_state=s0,
    )
    size_after_plain = engine._build_fit.cache_info().currsize
    degen = engine.fit(
        "rna2dna", CFG, tr, va, key, N_SITES, num_epochs=3,
        init_params=p0, init_state=s0, mesh=mesh1,
    )
    # the degenerate call must hit the SAME cached program as the plain fit
    # (data_sharding=None) — a new entry would mean it recompiled a no-op
    # SPMD variant
    assert engine._build_fit.cache_info().currsize == size_after_plain
    np.testing.assert_array_equal(
        np.asarray(plain.val_losses), np.asarray(degen.val_losses)
    )
    np.testing.assert_array_equal(
        np.asarray(plain.params["decoder_dna"]["fc2"]["w"]),
        np.asarray(degen.params["decoder_dna"]["fc2"]["w"]),
    )

    p_plain = engine.predict("rna2dna", p0, s0, va)
    p_degen = engine.predict("rna2dna", p0, s0, va, mesh=mesh1)
    np.testing.assert_array_equal(np.asarray(p_plain), np.asarray(p_degen))


def test_population_debug_nans_healthy_early_stop():
    """The vmapped population honors the same debug-mode contract as the
    single-run path (CLAUDE.md: 'post-stop loss rows fill +inf there'): a
    HEALTHY early-stopped member must not crash jax_debug_nans, and the
    builder cache must not serve the NaN-fill program compiled before the
    flag flipped."""
    arrays = _arrays(n=120, seed=7)
    tr, va = arrays.take(np.arange(96)), arrays.take(np.arange(96, 120))
    pop = {
        "lr": np.asarray([0.0, 1e-3], np.float32),
        "patience": np.asarray([1, 1000], np.int32),
    }
    key = jax.random.PRNGKey(11)
    jax.config.update("jax_debug_nans", True)
    try:
        res = vmap_meta.fit_trials(
            "rna2dna", CFG, tr, va, key, N_SITES, pop, num_epochs=10
        )
    finally:
        jax.config.update("jax_debug_nans", False)
    epochs_ran = np.asarray(res.epochs_ran)
    assert bool(np.asarray(res.stopped)[0]), "trial 0 must early-stop"
    tail = np.asarray(res.val_losses)[0, epochs_ran[0]:]
    assert np.all(np.isposinf(tail))  # debug fill is +inf, not NaN


def test_fit_trials_continuation_requires_keys():
    """carry0/start_epoch without explicit keys must raise: split(key, n) is
    a function of n, so a sliced survivor population would silently switch
    noise streams mid-run."""
    import pytest

    arrays = _arrays(n=120, seed=7)
    tr, va = arrays.take(np.arange(96)), arrays.take(np.arange(96, 120))
    pop = {"lr": np.asarray([3e-4, 1e-3], np.float32)}
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(9), 2))
    part1 = vmap_meta.fit_trials(
        "rna2dna", CFG, tr, va, jax.random.PRNGKey(9), N_SITES, pop,
        num_epochs=2, keys=keys,
    )
    with pytest.raises(ValueError, match="explicit per-trial `keys`"):
        vmap_meta.fit_trials(
            "rna2dna", CFG, tr, va, jax.random.PRNGKey(9), N_SITES, pop,
            num_epochs=2, carry0=part1.carry, start_epoch=2,
        )


def test_vmapped_fit_cache_is_thread_safe(monkeypatch):
    """CV_PARALLEL_SWEEPS calls the population builders from a thread pool;
    concurrent same-key requests must build the program ONCE (an
    unsynchronized check-then-set would duplicate the multi-minute relay
    compile the cache exists to amortize)."""
    import threading

    from vae_los_angeles_tpu.training import engine as eng

    calls = []
    real = eng.build_fit_fn

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(eng, "build_fit_fn", counting)
    monkeypatch.setattr(vmap_meta, "_VMAP_FIT_CACHE", {})
    args = ("rna2dna", 3, 16, 96, 24, True, False, None, 0)
    got = [None] * 6
    barrier = threading.Barrier(6)

    def worker(i):
        barrier.wait()
        got[i] = vmap_meta._vmapped_fit(*args)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1
    assert all(g is got[0] for g in got)
