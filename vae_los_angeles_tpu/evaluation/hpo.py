"""Hyperparameter optimization (reference ``optimize_hyperparameters.py``).

Search space matches the reference (:71-76): latent_dim 10–100,
lr 1e-5–1e-2 (log), weight_decay 1e-6–1e-3 (log), beta_start 1e-4–1e-2 (log),
gamma 0.5–5, embed_dim ∈ {16, 32, 64}; objective = tri-modal MultiModalVAE
val loss with balanced class weights (:33-44, 85-110). Artifacts match too:
``best_hyperparameters.json`` and a final retrained
``checkpoints/best_multivae_optimized.npz`` (:152-153, 209-210).

Two modes:
  * ``vmapped`` (default, the BASELINE.json north-star): trials are sampled
    up front, bucketed by the shape-carrying (latent_dim, embed_dim), and
    each bucket trains as ONE compiled vmapped population
    (`parallel.vmap_meta.fit_trials`) — the reference's sequential-trials
    loop (:140) collapses into a handful of device dispatches.
    ``--pad-shapes`` lifts the shape constraint entirely: latent_dim is
    sampled fully independently per trial (the reference's exact space) and
    buckets key on embed_dim only, every trial training at the bucket-max
    width with a per-trial latent mask (see `run_vmapped`).
  * ``optuna``: sequential Optuna study for API/workflow parity; each trial
    is still a single fused device dispatch, with per-epoch
    ``trial.report`` replayed from the returned loss curve.

Pruning (the reference's MedianPruner, :129-131): in vmapped mode the
TPU-native equivalent is RUNG-BASED — ``--prune-rungs K`` splits the epoch
budget into K segments; after each segment the median rule is applied across
the live population (prune trials whose best-so-far val loss is strictly
worse than the population median, optuna's MedianPruner criterion evaluated
at rung granularity) and only the survivors' carries are re-fed to continue
training. Pruned trials genuinely stop consuming device time: the population
axis is a batch dimension of every matmul, so a halved population halves the
FLOPs of every remaining epoch. The trade-off is one fresh XLA program per
distinct population width (each rung's survivor count is a new shape) —
worth it when epochs × population is large relative to compile time, which
is why the default is ``--prune-rungs 1`` (off, matching the reference's
effective behavior: its default study never fires MedianPruner for n_trials
≤ n_startup_trials=5). Optuna mode honors the same flag: ``--prune-rungs K``
trains each trial in K fused segments (bit-identical continuation via the
engine carry), reporting per-epoch losses and raising ``TrialPruned`` as
soon as ``should_prune()`` fires — a pruned trial's remaining segments never
run, so MedianPruner saves real compute there too; with the default K=1 the
whole budget runs first and the replayed curve only restores the reference's
trial-state bookkeeping. Trials train their full epoch budget with early
stopping disabled, exactly like the reference's objective loop (:101-127).

Note: the reference's objective returns an unmodified ``np.inf``
(:100,:133 — a bug documented in SURVEY §2.2); this implementation returns
the actual minimum validation loss, i.e. the intended behavior.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalDataset, load_label_encoder
from vae_los_angeles_tpu.data.splits import train_val_indices
from vae_los_angeles_tpu.parallel import vmap_meta
from vae_los_angeles_tpu.training import engine
from vae_los_angeles_tpu.training.checkpoint import save
from vae_los_angeles_tpu.training.cli import compute_class_weights

SEARCH_SPACE = {
    "latent_dim": (10, 100),
    "learning_rate": (1e-5, 1e-2),  # log
    "weight_decay": (1e-6, 1e-3),  # log
    "beta_start": (1e-4, 1e-2),  # log
    "gamma": (0.5, 5.0),
    "embed_dim": (16, 32, 64),
}


def sample_trials(n_trials: int, seed: int = 0, bucket_size: int = 4):
    """Sample trials so the vmapped mode actually batches.

    The shape-carrying dims (latent_dim, embed_dim) select the compiled
    executable, so trials sharing them train together (SURVEY hard-part #4:
    "group trials of equal shape"). Independent uniform draws over 91×3
    shape combos would make multi-trial buckets vanishingly rare — every
    "population" would be a singleton, the same wall-clock shape as the
    reference's sequential loop. Instead, ``ceil(n/bucket_size)`` distinct
    shape combos are drawn from the same space and each is shared by up to
    ``bucket_size`` trials; the shape-free hyperparameters stay fully
    independent per trial. The optuna mode keeps the reference's exact
    per-trial space."""
    rng = np.random.default_rng(seed)
    lo, hi = SEARCH_SPACE["latent_dim"]
    n_buckets = max(1, -(-n_trials // max(1, bucket_size)))
    shapes = [
        (int(rng.integers(lo, hi + 1)), int(rng.choice(SEARCH_SPACE["embed_dim"])))
        for _ in range(n_buckets)
    ]
    trials = []
    for i in range(n_trials):
        latent, embed = shapes[i // max(1, bucket_size)]
        trials.append(
            {
                "latent_dim": latent,
                "learning_rate": float(
                    np.exp(rng.uniform(*np.log(SEARCH_SPACE["learning_rate"])))
                ),
                "weight_decay": float(
                    np.exp(rng.uniform(*np.log(SEARCH_SPACE["weight_decay"])))
                ),
                "beta_start": float(
                    np.exp(rng.uniform(*np.log(SEARCH_SPACE["beta_start"])))
                ),
                "gamma": float(rng.uniform(*SEARCH_SPACE["gamma"])),
                "embed_dim": embed,
            }
        )
    return trials


def _load(cfg: Config):
    dataset = MultiModalDataset.from_pickle(
        os.path.join(cfg.data_dir, "processed_data.pkl")
    )
    label_encoder = load_label_encoder(os.path.join(cfg.data_dir, "label_encoder.pkl"))
    n_sites = len(label_encoder.classes_)
    tr_idx, va_idx = train_val_indices(len(dataset), cfg.train_test_split, cfg.random_seed)
    arrays = dataset.to_device()
    cw = compute_class_weights(dataset.primary_site[tr_idx], n_sites)
    cfg = cfg.replace(
        input_dim_a=dataset.tpm_data.shape[1], input_dim_b=dataset.beta_data.shape[1]
    )
    return cfg, arrays.take(tr_idx), arrays.take(va_idx), n_sites, cw


def _rung_lengths(num_epochs: int, rungs: int):
    """Split the epoch budget into ``rungs`` near-equal segments (first
    segments take the remainder so every rung is ≥1 epoch)."""
    rungs = max(1, min(rungs, num_epochs)) if num_epochs > 0 else 1
    base, rem = divmod(num_epochs, rungs)
    return [base + (1 if r < rem else 0) for r in range(rungs)]


def _trial_keys(seed: int, idxs) -> np.ndarray:
    """Per-trial run keys, derived from each trial's GLOBAL index.

    ``split(PRNGKey(seed), len(idxs))`` would hand two equal-sized shape
    buckets byte-identical key rows — position-j trials across buckets would
    share dropout/sampling noise streams. fold_in by global trial index makes
    every trial's stream unique and independent of bucket composition."""
    return np.stack(
        [np.asarray(jax.random.fold_in(jax.random.PRNGKey(seed), i))
         for i in idxs]
    )


def _padded_carry(cfg, n_sites, trial_keys, lrs, latents):
    """Population carry for the pad-latent-to-max mode (SURVEY hard-part #4).

    Initializes every trial at the PADDED width ``cfg.latent_dim`` (the
    bucket max), then

    * stores each trial's 0/1 latent mask in the state pytree, where it
      threads through the fused engine, rung-pruned carry slices and the
      best-snapshot without engine changes (``models/vae.py`` masks
      mu/logvar/z, so padded dims contribute 0 loss, 0 KL, 0 gradient); and
    * rescales the three decoder first layers to each trial's TRUE fan-in:
      torch-parity Linear init bounds are 1/√fan_in (ops/nn.linear_init,
      reference torch.nn.Linear), and the padded init drew them at
      fan_in = max_latent — without the √(max/true) correction a trial
      padded 20→100 would start its decoders ~2.2× too small vs an
      unpadded latent-20 model.
    """
    init = vmap_meta._vmapped_init("multimodal_padded", cfg, n_sites)
    carry = init(jnp.asarray(trial_keys), jnp.asarray(lrs, jnp.float32))
    masks = np.zeros((len(latents), cfg.latent_dim), np.float32)
    for j, width in enumerate(latents):
        masks[j, :width] = 1.0
    mask_arr = jnp.asarray(masks)
    carry["state"]["latent_mask"] = mask_arr
    carry["best"]["state"]["latent_mask"] = mask_arr
    scale = jnp.asarray(
        np.sqrt(cfg.latent_dim / np.asarray(latents, np.float64)), jnp.float32
    )
    for dec in ("decoder_a", "decoder_b", "decoder_c"):
        w = carry["params"][dec]["fc1"]["w"] * scale[:, None, None]
        b = carry["params"][dec]["fc1"]["b"] * scale[:, None]
        for tree in (carry["params"], carry["best"]["params"]):
            tree[dec]["fc1"]["w"] = w
            tree[dec]["fc1"]["b"] = b
    return carry


def run_vmapped(cfg, trials, train_arrays, val_arrays, n_sites, class_weights,
                num_epochs, seed=0, timeout=None, prune_rungs: int = 1,
                pad_shapes: bool = False):
    """Bucket trials by shape; train each bucket as one vmapped population.

    ``timeout``: wall-clock budget in seconds (the reference's 3000 s cap,
    :139-140) checked between buckets — buckets that have not started when
    it expires are skipped (their trials keep val_loss=inf).

    ``prune_rungs`` > 1 enables rung-based median pruning (module docstring):
    after each rung, trials whose best-so-far val loss is strictly worse than
    the live population's median are dropped, and the survivors' training
    carries continue into the next rung — pruned trials' remaining epochs are
    never executed.

    ``pad_shapes`` (SURVEY hard-part #4, "pad latent to max and mask"):
    buckets are keyed by ``embed_dim`` ONLY; every trial in a bucket trains
    at the bucket's max ``latent_dim`` with a per-trial 0/1 latent mask
    (task ``multimodal_padded``), so trials of DIFFERENT latent widths share
    one compiled executable. Masked dims contribute exactly 0 loss, 0 KL and
    0 gradient (``models/vae.py``), and each trial's decoder first layers
    are rescaled to its true fan-in (``_padded_carry``), so a padded trial's
    live sub-model is initialized and trained exactly like an unpadded one
    (tests/test_hpo_padded.py proves both properties). The trade-off vs the
    default bucketing is padded FLOPs: a latent-10 trial in a max-latent-100
    bucket pays 100-wide matmuls on the latent edge. Composes with
    ``prune_rungs`` — the mask rides in the carry's state pytree, so rung
    slicing threads it automatically.

    Returns ``(values, pruned_at)``: per-trial best val loss (inf for
    never-started trials) and the epoch a trial was pruned at (-1 = ran to
    completion). Pruned trials report the best val loss they reached before
    pruning; like optuna's study, they are excluded from best-trial selection
    by the caller.
    """
    import time

    buckets = {}
    for i, t in enumerate(trials):
        bkey = t["embed_dim"] if pad_shapes else (t["latent_dim"], t["embed_dim"])
        buckets.setdefault(bkey, []).append(i)

    t0 = time.monotonic()
    values = np.full(len(trials), np.inf)
    pruned_at = np.full(len(trials), -1, np.int64)
    for bkey, idxs in buckets.items():
        latents = [trials[i]["latent_dim"] for i in idxs]
        if pad_shapes:
            latent, embed = max(latents), bkey
        else:
            latent, embed = bkey
        if timeout is not None and time.monotonic() - t0 > timeout:
            print(
                f"  --timeout {timeout:.0f}s reached; skipping bucket "
                f"latent={latent} embed={embed} ({len(idxs)} trial(s))"
            )
            continue
        task_name = "multimodal_padded" if pad_shapes else "multimodal"
        bucket_cfg = cfg.replace(latent_dim=latent, embed_dim=embed, patience=10**6)
        pop = {
            "lr": np.asarray([trials[i]["learning_rate"] for i in idxs], np.float32),
            "weight_decay": np.asarray(
                [trials[i]["weight_decay"] for i in idxs], np.float32
            ),
            "beta_start": np.asarray(
                [trials[i]["beta_start"] for i in idxs], np.float32
            ),
            "gamma": np.asarray([trials[i]["gamma"] for i in idxs], np.float32),
        }
        rungs = _rung_lengths(num_epochs, prune_rungs)
        print(
            f"  bucket latent={latent} embed={embed}: "
            f"{len(idxs)} trial(s) in one vmapped fit"
            + (f" (padded widths {sorted(set(latents))})" if pad_shapes else "")
            + (f", {len(rungs)} pruning rungs {rungs}" if len(rungs) > 1 else "")
        )
        # fixed per-trial run keys, reused across rungs: each trial's noise
        # stream is keyed by absolute epoch (fold_in(key, epoch)), so a
        # continued survivor trains bit-identically to an unpruned run
        trial_keys = _trial_keys(seed, idxs)
        live = list(range(len(idxs)))  # bucket-local positions still training
        carry = (
            _padded_carry(bucket_cfg, n_sites, trial_keys, pop["lr"], latents)
            if pad_shapes
            else None
        )
        epoch_offset = 0
        for r, rung_epochs in enumerate(rungs):
            if r and timeout is not None and time.monotonic() - t0 > timeout:
                # same semantics as optuna's study timeout: no NEW work is
                # started once the budget expires — survivors keep the best
                # val loss they reached through the completed rungs
                print(
                    f"    --timeout {timeout:.0f}s reached after rung {r - 1};"
                    f" {len(live)} survivor(s) keep their epoch-{epoch_offset}"
                    " results"
                )
                break
            sub_pop = {k: v[live] for k, v in pop.items()}
            res = vmap_meta.fit_trials(
                task_name, bucket_cfg, train_arrays, val_arrays,
                jax.random.PRNGKey(seed), n_sites, sub_pop,
                num_epochs=rung_epochs, class_weights=class_weights,
                # multi-chip: trials shard over all visible devices
                mesh=vmap_meta.population_mesh(),
                carry0=carry, start_epoch=epoch_offset,
                keys=trial_keys[live],
            )
            best_vals = np.asarray(res.best_val_loss)
            for j, pos in enumerate(live):
                values[idxs[pos]] = float(best_vals[j])
            epoch_offset += rung_epochs
            if r == len(rungs) - 1:
                break
            # MedianPruner criterion at rung granularity: prune strictly-
            # worse-than-median trials (ties survive; non-finite always
            # pruned). The best trial can never be pruned.
            finite = best_vals[np.isfinite(best_vals)]
            if finite.size == 0:
                # every live trial diverged: that's failure, not pruning —
                # leave pruned_at unset so the summary reports [failed]
                print(f"    rung {r}: no finite val loss — bucket abandoned")
                live = []
                break
            median = float(np.median(finite))
            keep = [
                j for j, v in enumerate(best_vals)
                if np.isfinite(v) and v <= median
            ]
            dropped = [pos for j, pos in enumerate(live) if j not in keep]
            for pos in dropped:
                pruned_at[idxs[pos]] = epoch_offset
            if dropped:
                print(
                    f"    rung {r}: pruned {len(dropped)} trial(s) at epoch "
                    f"{epoch_offset} (median val loss {median:.2f})"
                )
            live = [live[j] for j in keep]
            carry = jax.tree.map(lambda x: x[np.asarray(keep)], res.carry)
    return values, pruned_at


def run_optuna(cfg, n_trials, timeout, train_arrays, val_arrays, n_sites,
               class_weights, num_epochs, seed=0, prune_rungs: int = 1,
               pruner=None):
    """Sequential Optuna study (reference optimize_hyperparameters.py:135-140).

    ``prune_rungs`` > 1 trains each trial in that many fused segments,
    reporting per-epoch losses and checking ``trial.should_prune()`` at each
    segment boundary — a pruned trial's remaining segments never run, so
    MedianPruner saves real compute here (reference :129-131 aborts
    per-epoch; a fused whole-run program cannot stop mid-dispatch, so the
    segment boundary is the TPU-native pruning point, same as the vmapped
    mode's rungs). Continuation across segments is bit-identical to an
    unsegmented run: the carry round-trips and the noise schedule is keyed
    by absolute epoch. With the default ``prune_rungs=1`` the whole budget
    runs first and pruning only restores the study's trial-state
    bookkeeping."""
    try:
        import optuna
    except ImportError:
        raise SystemExit(
            "optuna is not installed in this environment; use the default "
            "--mode vmapped (TPU-native population search) instead."
        )

    def objective(trial):
        params = {
            "latent_dim": trial.suggest_int("latent_dim", *SEARCH_SPACE["latent_dim"]),
            "learning_rate": trial.suggest_float(
                "learning_rate", *SEARCH_SPACE["learning_rate"], log=True
            ),
            "weight_decay": trial.suggest_float(
                "weight_decay", *SEARCH_SPACE["weight_decay"], log=True
            ),
            "beta_start": trial.suggest_float(
                "beta_start", *SEARCH_SPACE["beta_start"], log=True
            ),
            "gamma": trial.suggest_float("gamma", *SEARCH_SPACE["gamma"]),
            "embed_dim": trial.suggest_categorical(
                "embed_dim", list(SEARCH_SPACE["embed_dim"])
            ),
        }
        trial_cfg = cfg.replace(
            latent_dim=params["latent_dim"], embed_dim=params["embed_dim"],
            patience=10**6,
        )
        hp = engine.hyperparams(
            trial_cfg,
            lr=params["learning_rate"],
            weight_decay=params["weight_decay"],
            beta_start=params["beta_start"],
            gamma=params["gamma"],
        )
        key = jax.random.PRNGKey(seed + trial.number)
        carry = None
        offset = 0
        best = np.inf
        for rung_epochs in _rung_lengths(num_epochs, prune_rungs):
            res = engine.fit(
                "multimodal", trial_cfg, train_arrays, val_arrays, key,
                n_sites, num_epochs=rung_epochs,
                class_weights=class_weights, hp=hp,
                resume_carry=carry, start_epoch=offset,
            )
            val_losses = np.asarray(jax.device_get(res.val_losses))
            finite = val_losses[np.isfinite(val_losses)]
            if finite.size:
                best = min(best, float(finite.min()))
            for epoch, v in enumerate(val_losses):
                if np.isfinite(v):
                    # per-epoch report + prune check, the reference's exact
                    # pruning point (:129-131). Within an already-computed
                    # segment this only restores the study's trial-state
                    # bookkeeping; with prune_rungs>1 it also skips the
                    # remaining segments — real compute saved.
                    trial.report(float(v), offset + epoch)
                    if trial.should_prune():
                        raise optuna.TrialPruned()
            offset += rung_epochs
            carry = res.carry
        return best if np.isfinite(best) else float("inf")

    # default pruner = MedianPruner, like the reference's create_study
    study = optuna.create_study(direction="minimize", pruner=pruner)
    study.optimize(objective, n_trials=n_trials, timeout=timeout)
    return study


def retrain_best(cfg, best_params, train_arrays, val_arrays, n_sites,
                 class_weights, num_epochs, seed=0):
    """Final retrain with the winning hyperparameters
    (reference :157-211 → checkpoints/best_multivae_optimized)."""
    final_cfg = cfg.replace(
        latent_dim=int(best_params["latent_dim"]),
        embed_dim=int(best_params["embed_dim"]),
    )
    hp = engine.hyperparams(
        final_cfg,
        lr=best_params["learning_rate"],
        weight_decay=best_params["weight_decay"],
        beta_start=best_params["beta_start"],
        gamma=best_params["gamma"],
    )
    res = engine.fit(
        "multimodal", final_cfg, train_arrays, val_arrays,
        jax.random.PRNGKey(seed), n_sites,
        num_epochs=num_epochs, class_weights=class_weights, hp=hp,
    )
    path = os.path.join(cfg.checkpoint_dir, "best_multivae_optimized.npz")
    save(path, res.params, res.state)
    print(f"Final optimized model saved to {path} "
          f"(val loss {float(res.best_val_loss):.2f})")
    return res, path


def main(argv=None, cfg: Optional[Config] = None):
    parser = argparse.ArgumentParser(description="Hyperparameter optimization")
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--timeout", type=float, default=3000)
    parser.add_argument("--mode", choices=["vmapped", "optuna"], default="vmapped")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--bucket-size", type=int, default=None,
        help="trials sharing one (latent_dim, embed_dim) shape draw in "
        "vmapped mode (default 4); 1 restores the reference's fully "
        "independent per-trial shape sampling (at the cost of singleton "
        "populations). Mutually exclusive with --pad-shapes, which batches "
        "independent shapes without bucketed sampling",
    )
    parser.add_argument(
        "--prune-rungs", type=int, default=1,
        help="split the epoch budget into this many rungs/segments and "
        "apply the median pruning rule between them (both modes); "
        "1 = no mid-run pruning",
    )
    parser.add_argument(
        "--pad-shapes", action="store_true",
        help="vmapped mode: sample latent_dim fully independently per trial "
        "(the reference's exact space) and still batch — trials sharing an "
        "embed_dim train together at the bucket-max latent width, each with "
        "a 0/1 latent mask (masked dims are exactly inert; see run_vmapped)",
    )
    parser.add_argument(
        "--synthetic", action="store_true",
        help="generate synthetic data first if processed_data.pkl is "
        "missing (same bootstrap as the training CLIs)",
    )
    args = parser.parse_args(argv)
    if args.pad_shapes and args.mode == "optuna":
        parser.error("--pad-shapes applies to the vmapped mode only "
                     "(optuna mode is sequential — nothing to batch)")
    if args.pad_shapes and args.bucket_size is not None:
        parser.error("--bucket-size and --pad-shapes are mutually "
                     "exclusive: pad-shapes samples shapes fully "
                     "independently and batches by embed_dim")

    cfg = cfg or Config.from_env()
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    if args.synthetic:
        from vae_los_angeles_tpu.data.synthetic import ensure_synthetic_artifacts

        ensure_synthetic_artifacts(
            cfg.data_dir, dim_a=cfg.input_dim_a, dim_b=cfg.input_dim_b
        )
    cfg, train_arrays, val_arrays, n_sites, class_weights = _load(cfg)
    # explicit --epochs 0 means "no training epochs", like the training CLIs
    num_epochs = cfg.num_epochs if args.epochs is None else args.epochs

    if args.mode == "vmapped":
        # --pad-shapes batches across DIFFERENT latent widths, so shape
        # bucketing in the sampler is unnecessary: bucket_size=1 restores
        # the reference's fully independent per-trial shape draws
        bucket_size = 1 if args.pad_shapes else (
            4 if args.bucket_size is None else args.bucket_size
        )
        trials = sample_trials(args.trials, args.seed, bucket_size)
        print(f"Running {args.trials} trials (vmapped populations"
              + (", padded latents)..." if args.pad_shapes else ")..."))
        values, pruned_at = run_vmapped(
            cfg, trials, train_arrays, val_arrays, n_sites, class_weights,
            num_epochs, args.seed, timeout=args.timeout,
            prune_rungs=args.prune_rungs, pad_shapes=args.pad_shapes,
        )
        # like optuna's study: only COMPLETE trials are eligible as best
        # (pruned excluded), and an all-diverged/skipped sweep is an error,
        # not a silently retrained NaN/inf config
        complete = np.isfinite(values) & (pruned_at < 0)
        for i, (t, v) in enumerate(zip(trials, values)):
            # divergence outranks pruning: a NaN/inf trial reported as
            # "PRUNED" would read as a viable config dropped by the median
            # rule (the prune_rungs=1 path already labels these "failed")
            status = "failed" if not np.isfinite(v) else (
                "PRUNED@%d" % pruned_at[i] if pruned_at[i] >= 0 else "complete"
            )
            print(f"  trial {i}: val_loss={v:.2f} [{status}]  {t}")
        if not complete.any():
            raise SystemExit(
                "no trial completed with a finite validation loss — every "
                "trial diverged, was pruned, or was skipped by --timeout; "
                "nothing to retrain (try more --trials, a longer --timeout, "
                "or --prune-rungs 1)"
            )
        best_idx = int(np.argmin(np.where(complete, values, np.inf)))
        best_params, best_value = trials[best_idx], float(values[best_idx])
    else:
        study = run_optuna(
            cfg, args.trials, args.timeout, train_arrays, val_arrays, n_sites,
            class_weights, num_epochs, args.seed,
            prune_rungs=args.prune_rungs,
        )
        best_params, best_value = dict(study.best_params), float(study.best_value)

    print(f"\nBest hyperparameters (val_loss={best_value:.2f}): {best_params}")
    with open("best_hyperparameters.json", "w") as f:
        json.dump({"best_params": best_params, "best_value": best_value}, f, indent=2)
    print("Saved best_hyperparameters.json")

    print("\nRetraining final model with best hyperparameters...")
    retrain_best(
        cfg, best_params, train_arrays, val_arrays, n_sites, class_weights,
        num_epochs, args.seed,
    )
    return best_params, best_value


if __name__ == "__main__":
    main()
