"""Shared training CLI driver for the three training entry points.

Replicates the reference's training-script behavior end to end
(train_rna2dna.py:150-257, SURVEY §3.1): load processed data → 80/20 split →
train with β-warmup + AdamW + plateau scheduler + early stopping → save best
checkpoint under the run-id protocol → write loss plot. The difference is
that the whole training loop is ONE device dispatch (`engine.fit`) and the
per-epoch log lines are printed afterwards from the returned loss arrays.

Also provides the `train` entry point for the tri-modal MultiModalVAE, which
the reference *references* (run_pipeline.sh:19, README) but never shipped —
its behavior is reconstructed from the HPO retraining loop
(optimize_hyperparameters.py:157-211) which trains MultiModalVAE with
balanced class weights.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# NOTE: deliberately NOT enabling JAX_COMPILATION_CACHE_DIR here. On
# remote-compile TPU relays the persistent cache forces local executable
# serialization and measured 3-10x SLOWER end-to-end CLI runs (584s cold /
# 148s warm vs ~40s uncached for the same 200-epoch training). Set the env
# var yourself on platforms where local compilation is the norm.

import jax
import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalDataset, load_label_encoder
from vae_los_angeles_tpu.data.splits import train_val_indices
from vae_los_angeles_tpu.training import checkpoint, engine


def setup_directories(cfg: Config):
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    os.makedirs(cfg.plots_dir, exist_ok=True)


def load_data(cfg: Config, data_path=None):
    """Load processed data + label encoder (reference train_rna2dna.py:26-37).

    ``data_path``, when given, names the exact pickle to load (the
    label encoder is looked up next to it)."""
    data_path = data_path or os.path.join(cfg.data_dir, "processed_data.pkl")
    le_path = os.path.join(os.path.dirname(data_path) or ".", "label_encoder.pkl")
    if not os.path.exists(data_path):
        raise FileNotFoundError(
            f"{data_path} not found. Run `python scripts/prepare_data.py` "
            "(or with --synthetic for offline environments) first."
        )
    print("Loading processed data...")
    dataset = MultiModalDataset.from_pickle(data_path)
    label_encoder = load_label_encoder(le_path)
    print(f"Data shape: ({len(dataset)}, ...)")
    print(f"Number of primary sites: {len(label_encoder.classes_)}")
    return dataset, label_encoder


def compute_class_weights(site_labels, n_classes):
    """Balanced class weights (reference optimize_hyperparameters.py:33-44)."""
    from sklearn.utils.class_weight import compute_class_weight

    unique = np.unique(site_labels)
    present = compute_class_weight("balanced", classes=unique, y=site_labels)
    weights = np.ones(n_classes, dtype=np.float32)
    weights[unique] = present
    return weights


def plot_losses(train_losses, val_losses, run_id, model_name, plots_dir="plots",
                start_epoch=0):
    """Loss plot (reference train_rna2dna.py:134-147). ``start_epoch`` keeps
    the x-axis in global epoch numbers on resumed runs."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = range(start_epoch, start_epoch + len(train_losses))
    plt.figure(figsize=(10, 6))
    plt.plot(epochs, train_losses, label="Train Loss")
    plt.plot(epochs, val_losses, label="Validation Loss")
    plt.title(f"Training & Validation Loss for {model_name}")
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.legend()
    plt.grid(True)
    filename = os.path.join(plots_dir, f"training_losses_{model_name}_{run_id}.png")
    plt.savefig(filename, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"Loss plot saved to {filename}")
    return filename


def run_training(
    task_name: str,
    model_name: str,
    cfg: Config = None,
    use_class_weights: bool = False,
    argv=None,
):
    parser = argparse.ArgumentParser(description=f"Train {model_name} on TPU")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--data_path", type=str, default=None)
    parser.add_argument(
        "--seed", type=int, default=None,
        help="run PRNG seed (default 0; on --resume, defaults to the seed "
        "recorded in the checkpoint so the noise schedule continues exactly)",
    )
    parser.add_argument(
        "--synthetic",
        action="store_true",
        help="generate synthetic data first if processed_data.pkl is missing",
    )
    parser.add_argument(
        "--profile", type=str, default=None, metavar="LOG_DIR",
        help="capture a jax.profiler trace of the training dispatch",
    )
    parser.add_argument(
        "--resume",
        action="store_true",
        help="continue the latest run from its saved training state "
        "(full carry: params, optimizer moments, scheduler, early-stop)",
    )
    parser.add_argument(
        "--compute_dtype", choices=["float32", "bfloat16"], default=None,
        help="bfloat16 = MXU-native matmul operands, fp32 accumulation + "
        "fp32 masters/AdamW/BN (XLA paths; default float32 = torch-parity "
        "recipe). Same as COMPUTE_DTYPE env",
    )
    parser.add_argument(
        "--moments_dtype", choices=["float32", "bfloat16"], default=None,
        help="bfloat16 = optimizer moments STORED reduced, fp32 math — the "
        "wide-regime HBM-sweep knob. Same as MOMENTS_DTYPE env",
    )
    parser.add_argument(
        "--optimizer", choices=["adamw", "adafactor"], default=None,
        help="adafactor = factored second moments (wide-regime optimizer, "
        "parity-locked vs transformers' Adafactor; use a higher lr). "
        "Default adamw = torch-parity recipe. Same as OPTIMIZER env",
    )
    parser.add_argument(
        "--replicates", type=int, default=1, metavar="N",
        help="train N independent replicates (identical hyperparameters, "
        "per-replicate seeds) as ONE vmapped population — the standard "
        "multi-seed robustness protocol at near-single-run device cost "
        "(the replicate axis batches every matmul; multi-chip hosts shard "
        "replicates over all chips). Saves the best replicate under the "
        "run-id protocol and reports mean±std. XLA path only; does not "
        "compose with --resume",
    )
    parser.add_argument(
        "--dp",
        action="store_true",
        help="data-parallel training: shard the sample axis over all visible "
        "chips (replicated params, GSPMD-inserted psums). XLA path only — "
        "overrides USE_PALLAS. Worthwhile for large cohorts/batches; at the "
        "reference's batch-32 scale one chip is faster",
    )
    args = parser.parse_args(argv)

    cfg = cfg or Config.from_env()
    # explicit flags win over env/config spellings of the same knobs
    overrides = {
        k: v
        for k, v in (("compute_dtype", args.compute_dtype),
                     ("moments_dtype", args.moments_dtype),
                     ("optimizer", args.optimizer))
        if v is not None
    }
    if overrides:
        cfg = cfg.replace(**overrides)
    if cfg.platform:
        # honor the reference's DEVICE env override (train_rna2dna.py:166-174)
        try:
            jax.config.update("jax_platforms", cfg.platform)
        except Exception as e:  # backend already initialized — keep going
            print(f"Note: could not switch platform to {cfg.platform!r}: {e}")
    if cfg.debug_nans:
        # debug mode (DEBUG_NANS=1): raise at the first NaN-producing
        # primitive instead of training to a silent NaN loss. Costs a
        # device sync per dispatch — a debugging tool, not a training mode.
        jax.config.update("jax_debug_nans", True)
        print("DEBUG_NANS: jax_debug_nans enabled (op-level NaN localization)")
    if args.replicates < 1:
        raise SystemExit(f"--replicates must be >= 1, got {args.replicates}")
    if args.replicates > 1 and args.resume:
        raise SystemExit(
            "--resume does not compose with --replicates: population members "
            "train on per-member noise streams that a single resume "
            "checkpoint cannot reproduce"
        )
    resume_carry, start_epoch = None, 0
    if args.resume:
        resume_carry, start_epoch, run_id, saved_seed = checkpoint.load_resume(
            model_name, checkpoint_dir=cfg.checkpoint_dir
        )
        if bool(np.asarray(resume_carry["estop"]["stopped"])):
            # the stop latch is part of the exact-resume contract: every
            # epoch of a resumed dispatch would cond-skip. Say so instead of
            # compiling a run that silently trains nothing.
            best_ep = int(np.asarray(resume_carry["estop"]["best_epoch"]))
            print(
                f"Run {run_id} already early-stopped (best epoch "
                f"{best_ep + 1}, {start_epoch} epochs ran) — resuming would "
                "train 0 epochs. Start a fresh run, or retrain with a "
                "higher PATIENCE."
            )
            return None, run_id, 0.0
        if args.seed is None:
            if saved_seed is None:
                print(
                    "WARNING: this checkpoint predates seed recording; "
                    "resuming with seed 0 — pass --seed to reproduce the "
                    "original noise schedule"
                )
            seed = saved_seed if saved_seed is not None else 0
        else:
            seed = args.seed
            if saved_seed is not None and saved_seed != seed:
                print(
                    f"WARNING: --seed {seed} differs from the checkpoint's "
                    f"recorded seed {saved_seed}; the resumed noise schedule "
                    "will not bit-match the original run"
                )
        print(f"Resuming {model_name} run {run_id} from epoch {start_epoch}")
    else:
        seed = 0 if args.seed is None else args.seed
        run_id = checkpoint.new_run_id()
        print(f"Starting {model_name} training run: {run_id}")

    setup_directories(cfg)
    if args.data_path:
        # honor the exact file named, not just its directory
        cfg = cfg.replace(data_dir=os.path.dirname(args.data_path) or ".")
    if args.synthetic:
        from vae_los_angeles_tpu.data.synthetic import ensure_synthetic_artifacts

        ensure_synthetic_artifacts(
            cfg.data_dir, target_pkl=args.data_path,
            dim_a=cfg.input_dim_a, dim_b=cfg.input_dim_b,
        )

    dataset, label_encoder = load_data(cfg, data_path=args.data_path)
    n_sites = len(label_encoder.classes_)

    # env-derived dims must match the data (reference treats dims as config)
    cfg = cfg.replace(
        input_dim_a=dataset.tpm_data.shape[1], input_dim_b=dataset.beta_data.shape[1]
    )

    if resume_carry is not None:
        # fail with dims, not with an opaque dot_general shape error deep in
        # tracing, when the checkpoint was trained on different-width data
        from vae_los_angeles_tpu.training.tasks import TASKS

        # eval_shape: abstract trace only — no RNG work or parameter
        # allocation at the (possibly large) data dims just to compare shapes
        ref_params, _ = jax.eval_shape(
            lambda: TASKS[task_name].init(jax.random.PRNGKey(0), cfg, n_sites)
        )
        got = jax.tree.map(lambda x: tuple(np.shape(x)), resume_carry["params"])
        want = jax.tree.map(lambda x: tuple(x.shape), ref_params)
        if got != want:
            raise ValueError(
                f"resume checkpoint parameter shapes do not match the "
                f"current dataset/config (data dims {cfg.input_dim_a}/"
                f"{cfg.input_dim_b}, {n_sites} sites) — resuming against a "
                "different --data_path or regenerated data is not possible"
            )

    print("\nSplitting data into train/validation sets...")
    tr_idx, va_idx = train_val_indices(
        len(dataset), cfg.train_test_split, cfg.random_seed
    )
    print(f"Train set size: {len(tr_idx)}")
    print(f"Validation set size: {len(va_idx)}")

    # Bench-grade wall decomposition (bench.py's stderr split, so CLI
    # walls can be adjudicated against the RESULTS.md compile ledger):
    # backend init (relay-dependent, 150-250 s measured cold) and data
    # placement are timed apart from compile+run; a steady-state re-run
    # probe after training splits compile from execution (WALL_DETAIL=0
    # skips the probe; it is skipped automatically off-TPU where a rerun
    # costs minutes, and under --profile).
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.device_get(jnp.zeros((8, 128)).sum()))
    init_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    arrays = dataset.to_device()
    train_arrays, val_arrays = arrays.take(tr_idx), arrays.take(va_idx)
    for tbl in (train_arrays, val_arrays):
        # force ALL six arrays: a pending transfer would otherwise leak
        # into the compile timer (same discipline as bench.py)
        for leaf in (tbl.tpm, tbl.beta, tbl.site):
            float(jax.device_get(leaf[0] if leaf.ndim == 1 else leaf[0, 0]))
    place_s = time.perf_counter() - t0

    class_weights = None
    if use_class_weights:
        class_weights = compute_class_weights(
            dataset.primary_site[tr_idx], n_sites
        )

    num_epochs = cfg.num_epochs if args.epochs is None else args.epochs
    print(f"\nStarting training for {num_epochs} epochs...")
    print(f"Early stopping patience: {cfg.patience}")

    import contextlib

    trace_ctx = (
        jax.profiler.trace(args.profile)
        if args.profile
        else contextlib.nullcontext()
    )
    t0 = time.perf_counter()
    on_tpu = jax.default_backend() == "tpu"
    # fastest Pallas path for all three VAE families: the whole-epoch
    # megakernel (every AdamW step of an epoch in one kernel). The tri-modal
    # kernel holds ~22 MB of params+moments in VMEM — above the 16 MiB/core
    # of TPU v2/v3 — so on those chips fall back to the per-step fused
    # kernel, which fits the default budget.
    device_kind = jax.devices()[0].device_kind if on_tpu else ""
    old_vmem = any(g in device_kind for g in ("v2", "v3"))
    fused_epoch = (
        cfg.use_pallas
        and on_tpu
        and (
            task_name in ("rna2dna", "dna2rna")
            or (task_name == "multimodal" and not old_vmem)
        )
    )
    fused_step = (
        cfg.use_pallas and on_tpu and task_name == "multimodal" and old_vmem
    )
    import jax.numpy as jnp

    from vae_los_angeles_tpu.ops import nn as ops_nn

    reduced = {
        name: dtype
        for name, dtype in (
            ("COMPUTE_DTYPE", cfg.compute_dtype),
            ("MOMENTS_DTYPE", cfg.moments_dtype),
        )
        if ops_nn.resolve_compute_dtype(dtype) != jnp.float32
    }
    if cfg.optimizer != "adamw":
        reduced["OPTIMIZER"] = cfg.optimizer
    if reduced and (fused_step or fused_epoch):
        # same graceful downgrade as --dp below: the Pallas kernels are fp32
        # AdamW programs, so an explicit reduced-precision/alt-optimizer
        # request routes to the XLA path. Measured (RESULTS.md round-5
        # megakernel×bf16 A/B): at reference dims the fp32 megakernel beats
        # XLA-bf16 2.6× (0.62 s vs 1.63 s / 200 epochs) — if you set these
        # knobs for SPEED at reference scale, unset them and keep
        # USE_PALLAS; they exist for the wide regime.
        req = ", ".join(f"{k}={v}" for k, v in reduced.items())
        print(f"{req}: using the XLA path (Pallas kernels are fp32 AdamW "
              "programs; at reference dims the fp32 megakernel is 2.6x "
              "FASTER than XLA-bf16 — RESULTS.md round-5 A/B)")
        fused_step = fused_epoch = False
    mesh = None
    if args.dp:
        from vae_los_angeles_tpu.parallel.vmap_meta import population_mesh

        # same "all visible devices, or None single-chip" policy as the
        # CV/HPO CLIs' population sharding
        mesh = population_mesh()
        if mesh is None:
            print("--dp requested but only one device is visible; running single-chip")
        else:
            if fused_step or fused_epoch:
                print("--dp: using the XLA path (Pallas kernels are single-chip)")
                fused_step = fused_epoch = False
            print(f"Data-parallel over {mesh.devices.size} devices")
    if args.replicates > 1 and (fused_step or fused_epoch):
        print("--replicates: using the XLA path (vmapped populations)")
        fused_step = fused_epoch = False
    with trace_ctx:
        if args.replicates > 1:
            # N identical-hyperparameter members, per-replicate noise streams
            # keyed by fold_in(seed, r) — one compiled program trains them
            # all; population_mesh() shards replicates over multi-chip hosts
            # (the same machinery as the CV folds / HPO trials)
            from vae_los_angeles_tpu.parallel import vmap_meta

            if mesh is not None:
                print("--dp with --replicates: replicates themselves shard "
                      "over the mesh (no sample-axis sharding needed)")
            R = args.replicates
            rep_keys = np.stack([
                np.asarray(jax.random.fold_in(jax.random.PRNGKey(seed), r))
                for r in range(R)
            ])
            pop = {"lr": np.full(R, cfg.learning_rate, np.float32)}
            res = vmap_meta.fit_trials(
                task_name, cfg, train_arrays, val_arrays,
                jax.random.PRNGKey(seed), n_sites, pop,
                num_epochs=num_epochs, class_weights=class_weights,
                mesh=vmap_meta.population_mesh(), keys=rep_keys,
            )
            best_vals = np.asarray(res.best_val_loss)
            finite = np.isfinite(best_vals)
            if not finite.any():
                raise SystemExit(
                    "every replicate diverged to a non-finite validation "
                    "loss — nothing to save"
                )
            best_r = int(np.argmin(np.where(finite, best_vals, np.inf)))
            print(f"\nReplicates (best val loss each): "
                  + ", ".join(f"r{r}={v:.2f}" for r, v in enumerate(best_vals)))
            print(
                f"mean={best_vals[finite].mean():.2f} "
                f"std={best_vals[finite].std():.2f} -> keeping replicate "
                f"{best_r}"
            )
            result = jax.tree.map(lambda x: x[best_r], res)
        else:
            result = engine.fit(
                task_name,
                cfg,
                train_arrays,
                val_arrays,
                jax.random.PRNGKey(seed),
                n_sites,
                num_epochs=num_epochs,
                class_weights=class_weights,
                resume_carry=resume_carry,
                start_epoch=start_epoch,
                fused_step=fused_step,
                fused_epoch=fused_epoch,
                mesh=mesh,
            )
        # device_get (not block_until_ready): remote-relay platforms can
        # return from block_until_ready before execution completes
        float(jax.device_get(result.best_val_loss))
        result = jax.device_get(result)
    wall = time.perf_counter() - t0
    # steady-state probe: one extra dispatch of the already-compiled
    # program (sub-second at reference scale on the chip) turns the CLI
    # wall into the same compile/steady split bench.py reports. The probe
    # re-executes the WHOLE run, so by default it only fires when the
    # first run was cheap (< WALL_DETAIL_MAX_S, default 300 s — at
    # reference scale execution is <1 s of that); WALL_DETAIL=1 forces it
    # for expensive runs, WALL_DETAIL=0 disables.
    steady_s = None
    detail = os.getenv("WALL_DETAIL", "")
    probe_ok = detail == "1" or (
        detail != "0"
        and wall < float(os.getenv("WALL_DETAIL_MAX_S", "300"))
    )
    if (jax.default_backend() == "tpu" and args.replicates == 1
            and not args.profile and probe_ok):
        t0 = time.perf_counter()
        probe = engine.fit(
            task_name, cfg, train_arrays, val_arrays,
            jax.random.PRNGKey(seed), n_sites, num_epochs=num_epochs,
            class_weights=class_weights, resume_carry=resume_carry,
            start_epoch=start_epoch, fused_step=fused_step,
            fused_epoch=fused_epoch, mesh=mesh,
        )
        float(jax.device_get(probe.best_val_loss))
        steady_s = time.perf_counter() - t0
        print(
            f"backend init: {init_s:.2f}s | data placement: {place_s:.2f}s"
            f" | compile: {max(0.0, wall - steady_s):.2f}s | compile+run: "
            f"{wall:.2f}s | steady-state run: {steady_s:.2f}s",
            file=sys.stderr,
        )
    else:
        print(
            f"backend init: {init_s:.2f}s | data placement: {place_s:.2f}s"
            f" | compile+run: {wall:.2f}s (steady probe skipped)",
            file=sys.stderr,
        )
    if args.profile:
        print(f"Profiler trace written to {args.profile}")

    train_losses = np.asarray(result.train_losses)
    val_losses = np.asarray(result.val_losses)
    # epochs_ran comes from the engine's own bookkeeping: counting non-NaN
    # val losses would conflate "skipped after early stop" with "ran but
    # diverged to NaN". Epoch numbers are GLOBAL (offset by start_epoch) so
    # resumed-run logs line up with the metrics JSONL.
    n_ran = int(result.epochs_ran)
    total = start_epoch + num_epochs
    # ONE loop drives both observability outputs so the console log and the
    # metrics JSONL agree by construction (same 1-based GLOBAL epoch number)
    import json

    metrics_path = os.path.join(
        cfg.plots_dir, f"metrics_{model_name}_{run_id}.jsonl"
    )
    with open(metrics_path, "a") as f:
        for epoch in range(n_ran):
            global_epoch = start_epoch + epoch + 1
            print(
                f"Epoch [{global_epoch}/{total}] | "
                f"Train Loss: {train_losses[epoch]:.2f} | "
                f"Val Loss: {val_losses[epoch]:.2f} | "
                f"β={float(result.betas[epoch]):.5f}"
            )
            f.write(
                json.dumps(
                    {
                        "epoch": global_epoch,
                        "train_loss": float(train_losses[epoch]),
                        "val_loss": float(val_losses[epoch]),
                        "beta": float(result.betas[epoch]),
                        "lr": float(result.lrs[epoch]),
                    }
                )
                + "\n"
            )
    print(f"Per-epoch metrics appended to {metrics_path}")
    if bool(result.stopped):
        print(f"\nEarly stopping triggered at epoch {start_epoch + n_ran}!")

    model_path = checkpoint.save_best(
        model_name, run_id, result.params, result.state, cfg.checkpoint_dir
    )
    print(f"✓ Best model saved (val_loss: {float(result.best_val_loss):.2f})")
    if args.replicates == 1:
        checkpoint.save_resume(
            model_name, run_id, result.carry, start_epoch + n_ran,
            cfg.checkpoint_dir, seed=seed,
        )
    else:
        # a replicate's noise stream is keyed by fold_in(seed, r), which a
        # seed-recording resume checkpoint cannot reproduce — skipping keeps
        # the bit-exact --resume contract honest
        print("(resume checkpoint not written for --replicates runs)")

    print("\nGenerating loss plots...")
    plot_losses(
        train_losses[:n_ran], val_losses[:n_ran], run_id, model_name,
        cfg.plots_dir, start_epoch=start_epoch,
    )
    checkpoint.write_run_id(model_name, run_id)

    # honest throughput: drop_last discards the remainder, so count the
    # samples actually trained, and label that wall includes compilation
    trained_per_epoch = (len(tr_idx) // cfg.batch_size) * cfg.batch_size
    # with --replicates the wall covers the whole population, so the
    # population's samples are what it trained
    trained_per_epoch *= args.replicates
    samples_per_sec = (
        n_ran * trained_per_epoch / wall if wall > 0 else float("inf")
    )
    print("\n" + "=" * 50)
    print("Training complete!")
    print(f"Run ID: {run_id}")
    print(f"Best validation loss: {float(result.best_val_loss):.2f}")
    print(f"Best model saved to: {model_path}")
    print(
        f"Wall-clock: {wall:.2f}s for {n_ran} epochs, incl. compile "
        f"({samples_per_sec:,.0f} samples/sec)"
    )
    if steady_s is not None and steady_s > 0:
        print(
            f"Steady-state: {steady_s:.2f}s "
            f"({n_ran * trained_per_epoch / steady_s:,.0f} samples/sec "
            "excl. compile)"
        )
    print("=" * 50)
    return result, run_id, wall


def main_rna2dna(argv=None):
    """Entry point mirroring `python train_rna2dna.py`."""
    return run_training("rna2dna", "rna2dna", argv=argv)


def main_dna2rna(argv=None):
    """Entry point mirroring `python train_dna2rna.py`."""
    return run_training("dna2rna", "dna2rna", argv=argv)


def main_multimodal(argv=None):
    """The `train.py` contract the reference is missing (SURVEY integrity
    notes): trains the tri-modal MultiModalVAE with balanced class weights."""
    return run_training("multimodal", "multivae", use_class_weights=True, argv=argv)


if __name__ == "__main__":
    main_rna2dna(sys.argv[1:])
