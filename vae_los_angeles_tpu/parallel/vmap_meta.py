"""Batched meta-loops: CV folds and HPO trials as vmapped populations.

The reference runs `folds × directions` full VAE trainings sequentially
(vae_cross_modality_cv.py:314, SURVEY §3.4 — its wall-clock hot spot) and
sequential Optuna trials (optimize_hyperparameters.py:140). Both collapse
here into a single compiled program: `jax.vmap` over the pure fused-fit
function gives one XLA computation that trains the whole population
simultaneously, batching every matmul across the population axis on the MXU.

Shape discipline (SURVEY hard-part #4):
  * folds ride ONE executable per family: row counts pad to
    `ops.backend.bucket_rows` maxima and the true sizes are dynamic masked
    arguments (`POP_MASK_SIZES`, default on — the downstream classifier's
    recipe applied to the engine, engine.build_fit_fn(masked_sizes=True)),
    so KFold's uneven sizes AND re-sized cohorts share the compiled
    program. ``POP_MASK_SIZES=0`` restores round-4's exact-(train, val)
    grouping (at most two executables, no masking).
  * trials vmap over the shape-free hyperparameters (lr, weight-decay,
    beta_start, gamma). Shape-carrying ones (latent_dim, embed_dim) select
    the executable; trials sharing them batch together — and the shared
    train/val tables row-pad to buckets under the same masked mode, so a
    ``--subset`` re-size compiles nothing.

Multi-chip scaling: pass ``mesh`` (or let the CLIs build one when more than
one device is visible) and the POPULATION axis is sharded over the mesh's
"data" axis — each chip trains its share of the folds/trials with ZERO
cross-chip communication (the member trainings are independent, so GSPMD
partitions the whole scanned program along the vmapped axis; no collectives
are inserted). This is the natural TPU mapping for this workload: the
reference's wall-clock hot spot is folds×directions sequential trainings
(SURVEY §3.4), which here become population_size/n_chips per chip.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.training import engine
from vae_los_angeles_tpu.training.tasks import TASKS


def _stack_arrays(list_of_arrays: Sequence[MultiModalArrays]) -> MultiModalArrays:
    return MultiModalArrays(
        tpm=jnp.stack([a.tpm for a in list_of_arrays]),
        beta=jnp.stack([a.beta for a in list_of_arrays]),
        site=jnp.stack([a.site for a in list_of_arrays]),
    )


def population_mesh(devices=None) -> Optional[Mesh]:
    """1-axis ("data",) mesh over all visible devices, or None single-chip."""
    devices = jax.devices() if devices is None else devices
    if len(devices) < 2:
        return None
    return Mesh(np.asarray(devices), axis_names=("data",))


def _shard_population(tree, mesh: Mesh):
    """Lay a stacked population pytree out with axis 0 over mesh axis "data".

    Every leaf's leading axis is the population; the rest replicate. The
    leading axis must already be a multiple of the mesh size (see
    `_pad_population`)."""

    def put(x):
        x = jnp.asarray(x)
        spec = P(*(("data",) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def _padded_size(n: int, mesh: Mesh) -> int:
    d = mesh.devices.size
    return -(-n // d) * d


def _pad_population(tree, target: int):
    """Pad every leaf's population axis to ``target`` by repeating the last
    member. Sharded device_put demands divisibility; padding (rather than
    shrinking the mesh) keeps every chip busy — the duplicate members train
    in the same wall-clock slot and their results are discarded."""

    def pad(x):
        x = jnp.asarray(x)
        n = x.shape[0]
        if n == target:
            return x
        return jnp.concatenate(
            [x, jnp.repeat(x[-1:], target - n, axis=0)], axis=0
        )

    return jax.tree.map(pad, tree)


_VMAP_FIT_CACHE: dict = {}
_VMAP_INIT_CACHE: dict = {}
# CV_PARALLEL_SWEEPS>1 calls these builders from a ThreadPoolExecutor
# (evaluation/cross_modality_cv.py); an unsynchronized check-then-set would
# let two sweeps race past the miss and EACH pay the multi-minute population
# compile the cache exists to amortize. The lock only serializes program
# CONSTRUCTION (trace/jit wrapper build, cheap) — execution stays parallel.
_CACHE_LOCK = threading.Lock()


def _vmapped_init(task_name: str, cfg: Config, n_sites: int):
    """jit(vmap(population init)), cached — a fresh lambda per call would
    defeat the jit cache and recompile init on every fit_folds/fit_trials."""
    import dataclasses

    cache_key = (task_name, dataclasses.astuple(cfg), n_sites)
    with _CACHE_LOCK:
        if cache_key not in _VMAP_INIT_CACHE:
            task = TASKS[task_name]
            _VMAP_INIT_CACHE[cache_key] = jax.jit(
                jax.vmap(
                    lambda k, lr: engine.init_carry(
                        *task.init(k, cfg, n_sites), lr,
                        moments_dtype=cfg.moments_dtype,
                        optimizer=cfg.optimizer,
                    )
                )
            )
        return _VMAP_INIT_CACHE[cache_key]


def mask_sizes_enabled() -> bool:
    """Masked-dynamic-size populations (default on): fold/trial programs are
    keyed on `ops.backend.bucket_rows`-padded row maxima with the TRUE sizes
    as dynamic masked arguments — uneven KFold folds share ONE executable
    per family and a re-sized ``--subset`` compiles nothing new (the
    downstream classifier's recipe, evaluation/mlp_classifier, applied to
    the flagship engine; see engine.build_fit_fn(masked_sizes=True) for the
    padding discipline). ``POP_MASK_SIZES=0`` restores round-4's
    exact-shape grouping (bit-compatible with the single-run CLIs' streams,
    one program per distinct (n_train, n_val))."""
    return os.getenv("POP_MASK_SIZES", "1") != "0"


def _check_masked_sizes(n_trs, n_vas, batch_size: int, drop_last: bool):
    """Host-side fail-loud parity for the masked programs: the exact-shape
    path rejects these at trace time (engine.build_fit_fn / torch BN), but
    a masked program's true sizes are dynamic, so the checks move here
    where the sizes are known."""
    for i, (n_tr, n_va) in enumerate(zip(n_trs, n_vas)):
        if (n_tr // batch_size if drop_last
                else -(-n_tr // batch_size)) == 0:
            raise ValueError(
                f"member {i}: no training batches (n_train={n_tr}, "
                f"batch_size={batch_size}, drop_last={drop_last})"
            )
        if not drop_last and n_tr % batch_size == 1:
            # torch raises "Expected more than 1 value per channel when
            # training" on the 1-row final batch; mirror it loudly instead
            # of silently normalizing a single row
            raise ValueError(
                f"member {i}: final training batch has a single row "
                f"(n_train={n_tr} % batch_size={batch_size} == 1) — "
                "train-mode BatchNorm requires batch size > 1 (the "
                "reference crashes here too)"
            )
        if n_va == 0:
            raise ValueError(f"member {i}: empty validation set")


def _pad_rows_arrays(a: MultiModalArrays, n_max: int) -> MultiModalArrays:
    """Zero-pad a table's row axis to ``n_max`` (site pads with id 0 — pad
    rows are unreachable on the train side and where-masked out of every
    val-side loss, so the content is inert; 0 keeps the embedding gather
    in-bounds)."""
    pad = n_max - len(a)
    if pad == 0:
        return a
    return MultiModalArrays(
        tpm=jnp.pad(a.tpm, ((0, pad), (0, 0))),
        beta=jnp.pad(a.beta, ((0, pad), (0, 0))),
        site=jnp.pad(a.site, (0, pad)),
    )


def _vmapped_fit(task_name, num_epochs, batch_size, n_train, n_val, drop_last,
                 has_cw, data_axis, hp_axis, compute_dtype="float32",
                 optimizer="adamw", masked_sizes=False, sizes_axis=0):
    """jit(vmap(fit)) with configurable in_axes, cached per static config.

    Deliberately the XLA-path fit, never the Pallas kernels: measured on the
    real chip (benchmarks/bench_vmap_pallas.py, round 2), vmapping the fused
    train-step/whole-epoch kernels fails in Pallas TPU lowering — the
    batching rule prepends a population axis to every operand block, after
    which the params' trailing block dims no longer satisfy the (8, 128)
    divisibility/whole-array rule ("The Pallas TPU lowering currently
    requires that the last two dimensions of your block shape are divisible
    by 8 and 128"). The XLA population path is also already compute-
    efficient: pop=4 × 50 epochs at the live dims runs in 0.235 s steady —
    the population axis batches every matmul on the MXU, which is exactly
    what the megakernel's VMEM residency buys single-run training. What the
    vmapped path pays instead is COMPILE latency (~585 s for that program on
    the relay; thread-overlapping the compiles was measured 2.7× WORSE —
    the relay serializes compiles per client, see RESULTS.md) — a platform
    property, not a reason to force Pallas under vmap. The compile cost
    itself was attacked at the source: ``stop_via_mask=True`` replaces the
    early-stop ``lax.cond`` (whose batching rule blows XLA:TPU compile up
    4.7×) with the bit-identical masked-select form — 584.9 s → 124.3 s
    measured for the pop=4×50-epoch program (RESULTS.md round 2)."""
    # Same debug-mode contract as the single-run path (engine._build_fit):
    # under jax_debug_nans a healthy early-stopped member's post-stop rows
    # must fill +inf, not NaN — otherwise the debugger re-runs the whole
    # population program op-by-op and crashes a HEALTHY run. Read at call
    # time and part of the cache key so toggling the flag in-process can't
    # serve a stale program.
    stop_fill_inf = bool(jax.config.jax_debug_nans)
    cache_key = (task_name, num_epochs, batch_size, n_train, n_val, drop_last,
                 has_cw, data_axis, hp_axis, compute_dtype, optimizer,
                 stop_fill_inf, masked_sizes, sizes_axis)
    with _CACHE_LOCK:
        if cache_key not in _VMAP_FIT_CACHE:
            fit_fn = engine.build_fit_fn(
                task_name, num_epochs, batch_size, n_train, n_val, drop_last,
                has_cw, stop_via_mask=True, compute_dtype=compute_dtype,
                optimizer=optimizer, stop_fill_inf=stop_fill_inf,
                masked_sizes=masked_sizes,
            )
            # (carry0, train, val, hp, class_weights, key, epoch_offset
            #  [, n_train, n_val] in masked mode)
            in_axes = (0, data_axis, data_axis, hp_axis, None, 0, None)
            if masked_sizes:
                in_axes = in_axes + (sizes_axis, sizes_axis)
            _VMAP_FIT_CACHE[cache_key] = jax.jit(
                jax.vmap(fit_fn, in_axes=in_axes)
            )
        return _VMAP_FIT_CACHE[cache_key]


def fit_folds(
    task_name: str,
    cfg: Config,
    fold_train: Sequence[MultiModalArrays],
    fold_val: Sequence[MultiModalArrays],
    key,
    n_sites: int,
    *,
    num_epochs=None,
    drop_last: bool = False,
    mesh: Optional[Mesh] = None,
    keys=None,
    state_overrides: Optional[Dict[str, np.ndarray]] = None,
    mask_sizes: Optional[bool] = None,
) -> List[engine.FitResult]:
    """Train one model per CV fold, folds of equal shape batched via vmap.

    Returns a list of per-fold FitResults in the input order. ``drop_last``
    defaults False to match the CV inner loaders (vae_cross_modality_cv.py:121).
    With ``mesh``, the fold axis is sharded over the mesh's "data" axis —
    each chip trains its share of the folds (see module docstring).

    ``mask_sizes`` (default: the ``POP_MASK_SIZES`` env, on): pad every
    fold's rows to the bucketed population maxima and pass the true sizes
    as dynamic masked arguments, so ALL folds — uneven KFold sizes included
    — train as ONE compiled program per family, and near-sized cohorts
    (``--subset`` sweeps) reuse it (see `mask_sizes_enabled`). Off: round-4
    exact-shape grouping, at most one program per distinct (n_train, n_val).

    ``keys``: explicit (n_folds, 2) per-fold run keys, overriding the
    default ``split(key, n_folds)`` — lets a caller embed one fold list
    inside a larger population with unchanged noise streams (the unified CV
    path reuses the standalone sweep's key rows so its VAE members train
    bit-identically to the separate-program run).

    ``state_overrides``: name → (n_folds, ...) arrays written into each
    member's state pytree (and its best-snapshot) after init — the hook for
    per-member mode scalars like the unified tasks' ``kl_on`` or a padded
    task's latent mask, in input fold order.
    """
    if num_epochs is None:
        num_epochs = cfg.num_epochs
    if mask_sizes is None:
        mask_sizes = mask_sizes_enabled()
    if mask_sizes:
        from vae_los_angeles_tpu.ops.backend import bucket_rows

        _check_masked_sizes(
            [len(t) for t in fold_train], [len(v) for v in fold_val],
            int(cfg.batch_size), bool(drop_last),
        )
        n_tr_max = bucket_rows(max(len(t) for t in fold_train))
        n_va_max = bucket_rows(max(len(v) for v in fold_val))
        # one group: every fold rides the same padded executable
        groups = {(n_tr_max, n_va_max): list(range(len(fold_train)))}
    else:
        # group folds by exact (n_train, n_val)
        groups: Dict[tuple, list] = {}
        for i, (tr, va) in enumerate(zip(fold_train, fold_val)):
            groups.setdefault((len(tr), len(va)), []).append(i)

    results: List = [None] * len(fold_train)
    if keys is None:
        keys = jax.random.split(key, len(fold_train))
    else:
        keys = jnp.asarray(keys)
        if keys.shape[0] != len(fold_train):
            raise ValueError(
                f"keys has {keys.shape[0]} rows for {len(fold_train)} folds"
            )
    hp = engine.hyperparams(cfg)
    for (n_tr, n_va), idxs in groups.items():
        if mask_sizes:
            stacked_tr = _stack_arrays(
                [_pad_rows_arrays(fold_train[i], n_tr) for i in idxs])
            stacked_va = _stack_arrays(
                [_pad_rows_arrays(fold_val[i], n_va) for i in idxs])
            sizes_tr = jnp.asarray(
                [len(fold_train[i]) for i in idxs], jnp.int32)
            sizes_va = jnp.asarray(
                [len(fold_val[i]) for i in idxs], jnp.int32)
        else:
            stacked_tr = _stack_arrays([fold_train[i] for i in idxs])
            stacked_va = _stack_arrays([fold_val[i] for i in idxs])
        group_keys = keys[np.asarray(idxs)]
        overrides = {
            name: jnp.asarray(arr)[np.asarray(idxs)]
            for name, arr in (state_overrides or {}).items()
        }
        init = _vmapped_init(task_name, cfg, n_sites)
        if mesh is not None:
            padded = _padded_size(len(idxs), mesh)
            stacked_tr = _pad_population(stacked_tr, padded)
            stacked_va = _pad_population(stacked_va, padded)
            group_keys = _pad_population(group_keys, padded)
            overrides = {
                k: _pad_population(v, padded) for k, v in overrides.items()
            }
            stacked_tr = _shard_population(stacked_tr, mesh)
            stacked_va = _shard_population(stacked_va, mesh)
            group_keys = _shard_population(group_keys, mesh)
            overrides = _shard_population(overrides, mesh)
            if mask_sizes:
                sizes_tr = _shard_population(
                    _pad_population(sizes_tr, padded), mesh)
                sizes_va = _shard_population(
                    _pad_population(sizes_va, padded), mesh)
        pop_n = group_keys.shape[0]
        carry0 = init(group_keys, jnp.broadcast_to(hp["lr"], (pop_n,)))
        for name, arr in overrides.items():
            if name not in carry0["state"]:
                raise ValueError(
                    f"state_overrides[{name!r}]: task {task_name!r} has no "
                    f"such state entry (have: {sorted(carry0['state'])})"
                )
            carry0["state"][name] = arr
            carry0["best"]["state"][name] = arr
        fit_v = _vmapped_fit(
            task_name, int(num_epochs), int(cfg.batch_size), n_tr, n_va,
            bool(drop_last), False, 0, None, str(cfg.compute_dtype),
            str(cfg.optimizer), masked_sizes=bool(mask_sizes),
        )
        if mask_sizes:
            batched: engine.FitResult = fit_v(
                carry0, stacked_tr, stacked_va, hp, None, group_keys,
                jnp.int32(0), sizes_tr, sizes_va,
            )
        else:
            batched: engine.FitResult = fit_v(
                carry0, stacked_tr, stacked_va, hp, None, group_keys,
                jnp.int32(0)
            )
        # Assemble results on host in ONE transfer before the per-member
        # slice-back (results are host-consumed by every caller). Slicing
        # member j directly out of a device leaf would dispatch a gather per
        # leaf per member — wasteful, and on population-SHARDED leaves the
        # XLA CPU backend (8 virtual devices) intermittently aborts on
        # exactly that dispatch under long test sessions. Host assembly in
        # both paths keeps the FitResult leaf type (numpy) independent of
        # device count.
        batched = jax.device_get(batched)
        for j, i in enumerate(idxs):
            results[i] = jax.tree.map(lambda x: x[j], batched)
    return results


def fit_trials(
    task_name: str,
    cfg: Config,
    train_arrays: MultiModalArrays,
    val_arrays: MultiModalArrays,
    key,
    n_sites: int,
    hp_population: Dict[str, np.ndarray],
    *,
    num_epochs=None,
    class_weights=None,
    mesh: Optional[Mesh] = None,
    carry0=None,
    start_epoch: int = 0,
    keys=None,
    mask_sizes: Optional[bool] = None,
) -> engine.FitResult:
    """Train a population of hyperparameter trials in ONE compiled program.

    ``mask_sizes`` (default: the ``POP_MASK_SIZES`` env, on): the shared
    train/val tables are row-padded to `ops.backend.bucket_rows` maxima and
    the true sizes ride as dynamic arguments, so a ``--subset`` re-size or
    a different cohort within the same buckets REUSES the compiled trial
    population instead of recompiling the stack (see `mask_sizes_enabled`).

    ``hp_population`` maps hyperparam name → (n_trials,) array for any of
    {lr, weight_decay, beta_start, gamma}. All trials share the model shape
    (cfg.latent_dim / cfg.embed_dim); callers bucket trials by shape.
    Returns a FitResult whose leaves have a leading trial axis. With
    ``mesh``, the trial axis is sharded over the mesh's "data" axis.

    ``carry0``/``start_epoch`` continue a previously returned population
    mid-run: pass (a trial-axis slice of) a prior result's ``.carry`` and
    the epoch it stopped at. β-warmup, plateau/early-stop state and the
    best-snapshot all resume exactly — this is what rung-based HPO pruning
    (evaluation/hpo.py) builds on: survivors continue, pruned trials are
    simply not re-fed, so their remaining epochs are never executed.

    ``keys``: explicit (n_trials, 2) per-trial run keys. Required for exact
    continuation of a SLICED population: the default ``split(key, n)`` is a
    function of n, so survivors would silently switch noise streams. Per-
    trial noise within a run is keyed by absolute epoch (fold_in(key, epoch)
    in the engine), so a survivor continued with its original key trains
    bit-identically to the unpruned run.
    """
    if num_epochs is None:
        num_epochs = cfg.num_epochs
    if mask_sizes is None:
        mask_sizes = mask_sizes_enabled()
    n_train_true, n_val_true = int(len(train_arrays)), int(len(val_arrays))
    if mask_sizes:
        from vae_los_angeles_tpu.ops.backend import bucket_rows

        _check_masked_sizes([n_train_true], [n_val_true],
                            int(cfg.batch_size), True)
        train_arrays = _pad_rows_arrays(
            train_arrays, bucket_rows(n_train_true))
        val_arrays = _pad_rows_arrays(val_arrays, bucket_rows(n_val_true))
    n_trials = len(next(iter(hp_population.values())))
    base = engine.hyperparams(cfg)
    hp = {
        k: (
            jnp.asarray(hp_population[k], base[k].dtype)
            if k in hp_population
            else jnp.broadcast_to(base[k], (n_trials,))
        )
        for k in base
    }

    if keys is None:
        if carry0 is not None or start_epoch:
            # split(key, n) is a function of n: continuing a SLICED population
            # without the survivors' original key rows would silently switch
            # their noise streams mid-run, breaking the bit-identical
            # continuation guarantee rung pruning is built on.
            raise ValueError(
                "continuing a population (carry0/start_epoch) requires "
                "explicit per-trial `keys` — pass the rows of the original "
                "run's keys for the surviving trials"
            )
        keys = jax.random.split(key, n_trials)
    else:
        keys = jnp.asarray(keys)
        if keys.shape[0] != n_trials:
            raise ValueError(
                f"keys has {keys.shape[0]} rows for {n_trials} trials"
            )
    if mesh is not None:
        padded = _padded_size(n_trials, mesh)
        keys = _shard_population(_pad_population(keys, padded), mesh)
        hp = _shard_population(_pad_population(hp, padded), mesh)
        if carry0 is not None:
            carry0 = _shard_population(_pad_population(carry0, padded), mesh)
    if carry0 is None:
        init = _vmapped_init(task_name, cfg, n_sites)
        carry0 = init(keys, hp["lr"])
    fit_v = _vmapped_fit(
        task_name, int(num_epochs), int(cfg.batch_size),
        int(len(train_arrays)), int(len(val_arrays)), True,
        class_weights is not None, None, 0, str(cfg.compute_dtype),
        str(cfg.optimizer), masked_sizes=bool(mask_sizes),
        sizes_axis=None,  # sizes are shared scalars, like the tables
    )
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)
    if mask_sizes:
        res = fit_v(
            carry0, train_arrays, val_arrays, hp, cw, keys,
            jnp.int32(start_epoch), jnp.int32(n_train_true),
            jnp.int32(n_val_true),
        )
    else:
        res = fit_v(
            carry0, train_arrays, val_arrays, hp, cw, keys,
            jnp.int32(start_epoch)
        )
    # host-side assembly (+ pad-drop) in one transfer — see fit_folds for
    # why slicing device leaves per trial is both slower and a flaky abort
    # site on the virtual-device CPU backend
    res = jax.device_get(res)
    if keys.shape[0] != n_trials:
        res = jax.tree.map(lambda x: x[:n_trials], res)
    return res
