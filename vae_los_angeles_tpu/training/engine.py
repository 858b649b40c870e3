"""Fused training engine: an entire training run as ONE device dispatch.

The reference's canonical loop (train_rna2dna.py:150-245, SURVEY §3.1) pays a
host→device copy per tensor per batch plus a device→host ``.item()`` sync per
batch, and drives epochs/early-stopping/LR-scheduling from Python. Here the
whole 200-epoch run — β-warmup, shuffled batching, AdamW, ReduceLROnPlateau,
early stopping with best-snapshot rollback — compiles into a single jitted
``lax.scan`` over epochs (each epoch an inner scan over batches), so the host
is touched exactly twice: once to stage the tables into HBM and once to fetch
the result.

Semantics replicated exactly (SURVEY hard-part #2):
  * β = min(1, epoch/warmup)·beta_start, 0-based epochs (train_rna2dna.py:80);
  * train loss reported as Σ(batch sum-losses)/n_batches with drop_last
    (train_rna2dna.py:57-67,103); val loss as full-set sum / ceil(n_val/B)
    — identical to the reference's batch-summed average since sum-reductions
    are additive over batches;
  * scheduler steps on val loss AFTER the epoch; the reduced LR applies from
    the next epoch (torch ReduceLROnPlateau semantics);
  * early stop when val fails to strictly improve ``patience`` times; the best
    (params, bn_state) snapshot is carried on-device and returned (the
    reference re-loads its best checkpoint, vae_cross_modality_cv.py:192-194);
  * epochs after the stop are skipped via ``lax.cond`` — they cost one
    predicate evaluation, not a full epoch of compute.

The engine is model-agnostic via the Task registry and is itself pure, so
`parallel.vmap_meta` vmaps it over CV folds and HPO trial populations.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.ops import nn as ops_nn
from vae_los_angeles_tpu.ops import optim
from vae_los_angeles_tpu.training.tasks import TASKS, Task


# canonical string→dtype mapping lives beside cast_matmul_params in ops.nn
_resolve_compute_dtype = ops_nn.resolve_compute_dtype


class FitResult(NamedTuple):
    params: dict  # best-validation snapshot (rolled back, like the reference)
    state: dict  # BatchNorm state at the best snapshot
    final_params: dict
    final_state: dict
    best_val_loss: jnp.ndarray
    best_epoch: jnp.ndarray
    stopped: jnp.ndarray
    train_losses: jnp.ndarray  # (num_epochs,), NaN after early stop
    val_losses: jnp.ndarray
    betas: jnp.ndarray
    lrs: jnp.ndarray  # learning rate applied in each epoch (post-plateau)
    carry: dict  # full final training state (params/opt/scheduler/early-stop)
                 # — pass back as ``resume_carry`` for true mid-run resume,
                 # a capability the reference lacks (SURVEY §5 checkpoint row)
    epochs_ran: jnp.ndarray  # scalar: epochs actually executed (counts
                             # NaN-diverged epochs, unlike isnan(val_losses))


# "adamw" (torch-parity default) | "adafactor" (factored second moments, no
# first moment — sweeps params only instead of params+m+v: the wide regime's
# optimizer; ops/optim.py adafactor_init)
_OPTIMIZERS = optim.OPTIMIZERS


def init_carry(params0, state0, lr, moments_dtype: str = "float32",
               optimizer: str = "adamw"):
    """Fresh fused-training carry for a model; vmap-able over populations.

    ``moments_dtype="bfloat16"`` stores optimizer moments reduced (fp32
    math) — a wide-regime HBM-sweep knob, see ``optim.adamw_init``.
    ``optimizer="adafactor"`` switches to factored second moments (the
    bigger wide-regime lever; see ``optim.adafactor_init``)."""
    if optimizer not in _OPTIMIZERS:
        raise ValueError(
            f"unsupported optimizer {optimizer!r}; valid: {sorted(_OPTIMIZERS)}"
        )
    opt_init, _ = _OPTIMIZERS[optimizer]
    return {
        "params": params0,
        "state": state0,
        "opt": opt_init(params0, ops_nn.resolve_compute_dtype(moments_dtype)),
        "plateau": optim.plateau_init(lr),
        "estop": optim.early_stop_init(),
        "best": {"params": params0, "state": state0},
    }


_batch_unroll_override = None  # benchmarks/bench_dp_compile.py A/B hook


def _batch_unroll(n_batches: int) -> int:
    """Inner batch-scan unroll factor: 8 on TPU (dispatch-overhead win),
    1 elsewhere (keeps CPU/CI compile times sane)."""
    if _batch_unroll_override is not None:
        return min(_batch_unroll_override, max(n_batches, 1))
    if jax.default_backend() != "tpu":
        return 1
    return min(8, max(n_batches, 1))


def hyperparams(cfg: Config, **overrides):
    """Traced hyperparameter bundle (one compile serves any values)."""
    hp = {
        "lr": jnp.float32(cfg.learning_rate),
        "weight_decay": jnp.float32(cfg.weight_decay),
        "beta_start": jnp.float32(cfg.beta_start),
        "warmup_epochs": jnp.float32(cfg.beta_warmup_epochs),
        "gamma": jnp.float32(cfg.gamma),
        "patience": jnp.int32(cfg.patience),
        "sched_factor": jnp.float32(cfg.lr_scheduler_factor),
        "sched_patience": jnp.int32(cfg.lr_scheduler_patience),
    }
    for k, v in overrides.items():
        if k not in hp:
            # a typo'd name (or the Config spelling, e.g. learning_rate for
            # lr) would otherwise be silently ignored — every trial of a
            # sweep would train at the default
            raise ValueError(
                f"unknown hyperparameter override {k!r}; valid: {sorted(hp)}"
            )
        hp[k] = jnp.asarray(v, hp[k].dtype)
    return hp


@functools.lru_cache(maxsize=None)
def build_fit_fn(
    task_name: str,
    num_epochs: int,
    batch_size: int,
    n_train: int,
    n_val: int,
    drop_last: bool,
    has_class_weights: bool,
    fused_step: bool = False,
    fused_epoch: bool = False,
    data_sharding=None,
    stop_via_mask: bool = False,
    compute_dtype: str = "float32",
    stop_fill_inf: bool = False,
    optimizer: str = "adamw",
    masked_sizes: bool = False,
):
    """Construct the PURE fused training function for a static problem shape.

    Signature: _fit(carry0, train_arrays, val_arrays, hp, class_weights, key,
    epoch_offset) -> FitResult, where carry0 comes from `init_carry` (fresh
    run) or a restored resume checkpoint. Returned unjitted so that
    `parallel.vmap_meta` can vmap it over fold/trial populations; `_build_fit`
    wraps it in jit for single-run use.

    ``masked_sizes=True`` builds the MASKED-DYNAMIC-SIZE variant: the
    (n_train, n_val) statics become PADDED MAXIMA that only key the compiled
    program, and the true sizes ride as two extra trailed DYNAMIC int32
    arguments — ``_fit(..., epoch_offset, n_train, n_val)``. This is the
    downstream classifier's recipe (evaluation/mlp_classifier._make_fold_fit)
    applied to the flagship engine, so uneven KFold folds and near-sized
    cohorts share ONE executable per family instead of compiling per exact
    shape (parallel/vmap_meta masked mode). Padding discipline:

      * the shuffle draws ``permutation(pkey, n_train_max)`` and stable-
        partitions the valid ids first — a member whose true size equals
        the padded max reproduces the exact-shape path's stream verbatim,
        smaller members train on a uniform restriction of it. (Cross-shape
        bit-parity is impossible in principle: threefry pairs its counters
        by draw length, so ``permutation(k, n)`` and ``permutation(k, m)``
        are unrelated streams — see benchmarks/RESULTS.md round-5 note.)
      * rows past ``n_train`` are NEVER gathered; pad slots of a partial
        final batch re-gather row perm[0] and are masked out of the loss
        AND the BatchNorm batch statistics (ops.nn.batchnorm_apply
        row_mask), keeping torch's short-final-batch semantics.
      * trailing batches a small member doesn't need are computed-and-
        discarded (params/opt/BN state gated per batch), so optimizer
        steps advance exactly the reference's ceil/floor(n/B) per epoch.
      * val rows past ``n_val`` are where-masked out of the sum-losses
        (garbage padding cannot poison through 0·inf), and the val
        denominator ceil(n_val/B) is computed dynamically.
    """
    task: Task = TASKS[task_name]
    if masked_sizes and (fused_step or fused_epoch):
        raise ValueError(
            "masked_sizes is an XLA-path feature: the Pallas fused kernels "
            "are exact-shape programs"
        )
    if masked_sizes and data_sharding is not None:
        raise ValueError(
            "masked_sizes composes with POPULATION sharding "
            "(parallel/vmap_meta), not with intra-run data sharding"
        )
    n_full = n_train // batch_size
    remainder = 0 if drop_last else n_train % batch_size
    n_batches = n_full + (1 if remainder else 0)
    if n_batches == 0:
        # the reference crashes on an empty DataLoader (train_rna2dna.py:103
        # divides by len(loader)); fail loudly instead of training nothing
        raise ValueError(
            f"no training batches: n_train={n_train} < batch_size="
            f"{batch_size} with drop_last=True — lower batch_size or pass "
            "drop_last=False"
        )
    if n_val == 0:
        # same class of silent failure: val_loss = val_sum / 0 would feed
        # NaN into the plateau scheduler and early stopping
        raise ValueError("empty validation set: n_val=0")
    n_val_batches = -(-n_val // batch_size)  # val loader never drops last
    n_slots = n_batches * batch_size  # masked mode: padded batch grid

    fwd_dtype = _resolve_compute_dtype(compute_dtype)
    if fwd_dtype != jnp.float32 and (fused_step or fused_epoch):
        raise ValueError(
            "compute_dtype='bfloat16' applies to the XLA paths only — the "
            "Pallas fused kernels are fp32 programs. Measured on the chip "
            "(RESULTS.md round-5 megakernel×bf16 A/B): the fp32 megakernel "
            "runs the 200-epoch reference recipe in 0.62 s vs 1.63 s for "
            "XLA-bf16, and bf16 buys 1.4% over XLA-fp32 at batch 32 — a "
            "bf16 megakernel has no bytes to save (state is VMEM-resident "
            "fp32 masters by design); the bf16 win is the WIDE/batched XLA "
            "regime, benchmarks/bench_wide.py"
        )

    def train_loss_fn(params, state, key, batch, beta_kl, class_weights, gamma):
        cw = class_weights if has_class_weights else None
        # mixed precision: cast matmul operands INSIDE the differentiated fn
        # so masters/optimizer stay fp32 (identity when fwd_dtype is fp32)
        fwd_params = ops_nn.cast_matmul_params(params, fwd_dtype)
        return task.loss(fwd_params, state, key, batch, beta_kl, gamma, cw, True)

    def eval_loss_fn(params, state, key, batch, beta_kl, class_weights, gamma):
        cw = class_weights if has_class_weights else None
        fwd_params = ops_nn.cast_matmul_params(params, fwd_dtype)
        loss, _ = task.loss(
            fwd_params, state, key, batch, beta_kl, gamma, cw, False
        )
        return loss

    def train_loss_fn_masked(params, state, key, batch, beta_kl,
                             class_weights, gamma, row_mask):
        cw = class_weights if has_class_weights else None
        fwd_params = ops_nn.cast_matmul_params(params, fwd_dtype)
        return task.loss(fwd_params, state, key, batch, beta_kl, gamma, cw,
                         True, row_mask=row_mask)

    def eval_loss_fn_masked(params, state, key, batch, beta_kl,
                            class_weights, gamma, row_mask):
        cw = class_weights if has_class_weights else None
        fwd_params = ops_nn.cast_matmul_params(params, fwd_dtype)
        loss, _ = task.loss(fwd_params, state, key, batch, beta_kl, gamma,
                            cw, False, row_mask=row_mask)
        return loss

    if optimizer not in _OPTIMIZERS:
        raise ValueError(
            f"unsupported optimizer {optimizer!r}; valid: {sorted(_OPTIMIZERS)}"
        )
    if optimizer != "adamw" and (fused_step or fused_epoch):
        raise ValueError(
            "optimizer='adafactor' applies to the XLA paths only — the "
            "Pallas fused kernels run AdamW in-kernel (at the reference dims "
            "the AdamW state is VMEM-resident anyway; Adafactor's sweep "
            "saving exists for the wide XLA regime, benchmarks/bench_wide.py)"
        )
    _, opt_update = _OPTIMIZERS[optimizer]
    grad_fn = jax.value_and_grad(train_loss_fn, has_aux=True)
    grad_fn_masked = jax.value_and_grad(train_loss_fn_masked, has_aux=True)

    if fused_step:
        if task_name not in ("rna2dna", "dna2rna", "multimodal"):
            raise ValueError("fused_step is only implemented for the "
                             "directional and tri-modal VAE tasks")
        if remainder:
            # a short final batch would compile an untested ragged-shape
            # kernel instance; reject loudly like fused_epoch+drop_last does
            raise ValueError(
                f"fused_step with drop_last=False needs n_train divisible by "
                f"batch_size (got {n_train} % {batch_size} = {remainder}) — "
                "use drop_last=True or the XLA path"
            )
        if task_name == "multimodal":
            from vae_los_angeles_tpu.ops.pallas.fused_train_multimodal import (
                multimodal_fused_train_step,
            )
        else:
            from vae_los_angeles_tpu.ops.pallas import fused_train

            fused_step_fn = (
                fused_train.rna2dna_fused_train_step
                if task_name == "rna2dna"
                else fused_train.dna2rna_fused_train_step
            )
            fused_bn_key = (
                "encoder_rna" if task_name == "rna2dna" else "encoder_dna"
            )
    if fused_epoch:
        if task_name not in ("rna2dna", "dna2rna", "multimodal") or not drop_last:
            raise ValueError(
                "fused_epoch requires drop_last=True and one of the VAE "
                "tasks 'rna2dna', 'dna2rna', 'multimodal' "
                f"(got task={task_name!r}, drop_last={drop_last})"
            )
        if task_name == "multimodal":
            from vae_los_angeles_tpu.ops.pallas.fused_epoch_multimodal import (
                multimodal_fused_epoch,
            )
        else:
            from vae_los_angeles_tpu.ops.pallas import fused_epoch as fe

            fused_epoch_fn = (
                fe.rna2dna_fused_epoch if task_name == "rna2dna"
                else fe.dna2rna_fused_epoch
            )
            fused_epoch_bn = (
                "encoder_rna" if task_name == "rna2dna" else "encoder_dna"
            )

    def _fit(carry0, train_arrays, val_arrays, hp, class_weights, key,
             epoch_offset, n_train_d=None, n_val_d=None):
        if masked_sizes:
            n_train_d = jnp.asarray(n_train_d, jnp.int32)
            n_val_d = jnp.asarray(n_val_d, jnp.int32)

        if data_sharding is not None:
            # Data-parallel SPMD: constrain the sample axis of both tables to
            # the mesh's "data" axis INSIDE the program — GSPMD pads uneven
            # row counts transparently (a concrete device_put would demand
            # divisibility) and propagates the layout through the whole scan,
            # inserting psums for loss sums, BatchNorm batch statistics and
            # gradient reduction.
            train_arrays, val_arrays = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, data_sharding),
                (train_arrays, val_arrays),
            )

        def gather(idx):
            return MultiModalArrays(
                tpm=jnp.take(train_arrays.tpm, idx, axis=0),
                beta=jnp.take(train_arrays.beta, idx, axis=0),
                site=jnp.take(train_arrays.site, idx, axis=0),
            )

        def run_epoch(carry, epoch):
            ekey = jax.random.fold_in(key, epoch)
            pkey, dkey, vkey = jax.random.split(ekey, 3)
            if task.uses_kl_warmup:
                # warmup_epochs=0 means "no warmup" (β at full strength from
                # epoch 0) — the unguarded 0/0 would silently NaN the run
                warm = hp["warmup_epochs"]
                frac = jnp.where(
                    warm > 0,
                    epoch.astype(jnp.float32) / jnp.maximum(warm, 1.0),
                    1.0,
                )
                beta_kl = jnp.minimum(1.0, frac) * hp["beta_start"]
            else:
                beta_kl = jnp.float32(0.0)

            perm = jax.random.permutation(pkey, n_train)
            if not masked_sizes:
                full_idx = perm[: n_full * batch_size].reshape(
                    n_full, batch_size)
            lr = carry["plateau"]["lr"]

            if masked_sizes:
                # stable partition: valid row ids first, relative order kept
                # — a member with n_train_d == n_train reproduces the exact-
                # shape path's shuffle verbatim; smaller members train on a
                # uniform restriction of it
                perm_c = perm[jnp.argsort(perm >= n_train_d, stable=True)]
                slot = jnp.arange(n_slots)
                n_used = (
                    (n_train_d // batch_size) * batch_size
                    if drop_last else n_train_d
                )
                slot_valid = slot < n_used
                # pad slots re-gather the first shuffled row (never a pad
                # row: the train table's padding is unreachable by
                # construction) and are masked out of loss + BN statistics
                idx = perm_c[jnp.where(slot_valid, slot, 0)].reshape(
                    n_batches, batch_size)
                bmask = slot_valid.reshape(n_batches, batch_size)
                n_batches_d = (
                    n_train_d // batch_size if drop_last
                    else -(-n_train_d // batch_size)
                )
                batch_active = jnp.arange(n_batches) < n_batches_d

                def batch_step_m(bstate, scan_in):
                    b_i, bidx, bm, active = scan_in
                    params, state, opt = bstate
                    batch = gather(bidx)
                    bkey = jax.random.fold_in(dkey, b_i)
                    (loss, new_state), grads = grad_fn_masked(
                        params, state, bkey, batch, beta_kl, class_weights,
                        hp["gamma"], bm,
                    )
                    new_params, new_opt = opt_update(
                        params, grads, opt, lr, hp["weight_decay"]
                    )
                    # trailing batches a small member doesn't need must not
                    # advance params/opt/BN (zero grads would still decay
                    # moments and apply weight decay)
                    gate = lambda new, old: jax.tree.map(
                        lambda n_, o_: jnp.where(active, n_, o_), new, old)
                    return (
                        gate(new_params, params),
                        gate(new_state, state),
                        gate(new_opt, opt),
                    ), jnp.where(active, loss, 0.0)

                (params, state, opt), batch_losses = jax.lax.scan(
                    batch_step_m,
                    (carry["params"], carry["state"], carry["opt"]),
                    (jnp.arange(n_batches), idx, bmask, batch_active),
                    unroll=_batch_unroll(n_batches),
                )
                train_loss = jnp.sum(batch_losses) / n_batches_d.astype(
                    jnp.float32)
            elif fused_epoch:
                # ONE Pallas kernel runs every AdamW step of the epoch with
                # params + moments VMEM-resident (ops/pallas/fused_epoch.py)
                ep = gather(perm[: n_full * batch_size])
                seed = jax.random.randint(dkey, (), 0, 2**31 - 1, jnp.int32)
                if task_name == "multimodal":
                    n_sites_ = carry["params"]["encoder_c"]["embedding"][
                        "table"
                    ].shape[0]
                    batch_losses, new_p, new_m, new_v, new_bn = (
                        multimodal_fused_epoch(
                            carry["params"], carry["opt"]["m"], carry["opt"]["v"],
                            carry["state"], ep.tpm, ep.beta, ep.site, n_sites_,
                            seed=seed, beta=beta_kl, gamma=hp["gamma"],
                            class_weights=class_weights
                            if has_class_weights
                            else None,
                            lr=lr, weight_decay=hp["weight_decay"],
                            step0=carry["opt"]["step"], n_batches=n_full,
                        )
                    )
                    params, state = new_p, new_bn
                else:
                    # rna2dna trains tpm→beta; dna2rna trains beta→tpm
                    x_ep, t_ep = (
                        (ep.tpm, ep.beta)
                        if task_name == "rna2dna"
                        else (ep.beta, ep.tpm)
                    )
                    batch_losses, new_p, new_m, new_v, new_bn = fused_epoch_fn(
                        carry["params"], carry["opt"]["m"], carry["opt"]["v"],
                        carry["state"], x_ep, t_ep, ep.site,
                        carry["params"]["encoder_site"]["embedding"][
                            "table"
                        ].shape[0],
                        seed=seed, beta=beta_kl, lr=lr,
                        weight_decay=hp["weight_decay"],
                        step0=carry["opt"]["step"], n_batches=n_full,
                    )
                    params, state = new_p, {
                        fused_epoch_bn: new_bn[fused_epoch_bn]
                    }
                opt = {
                    "step": carry["opt"]["step"] + n_full,
                    "m": new_m,
                    "v": new_v,
                }
                train_loss = jnp.sum(batch_losses) / n_batches
            else:
                def batch_step(bstate, scan_in):
                    b_i, bidx = scan_in
                    params, state, opt = bstate
                    batch = gather(bidx)
                    if fused_step:
                        # whole fwd+bwd as ONE Pallas kernel (in-kernel PRNG);
                        # step seed derived from (run key, epoch, batch) — dkey is
                        # already fold_in(key, epoch)-derived, so different --seed
                        # runs get independent noise streams (same contract as the
                        # fused_epoch path above)
                        seed = jax.random.randint(
                            jax.random.fold_in(dkey, b_i), (), 0, 2**31 - 1,
                            jnp.int32,
                        )
                        if task_name == "multimodal":
                            n_sites_ = params["encoder_c"]["embedding"][
                                "table"
                            ].shape[0]
                            loss, grads, new_state = multimodal_fused_train_step(
                                params, state, batch.tpm, batch.beta, batch.site,
                                n_sites_, seed=seed, beta=beta_kl, gamma=hp["gamma"],
                                class_weights=class_weights
                                if has_class_weights
                                else None,
                            )
                        else:
                            loss, grads, bn_new = fused_step_fn(
                                params, state, batch.tpm, batch.beta, batch.site,
                                params["encoder_site"]["embedding"]["table"].shape[0],
                                seed=seed, beta=beta_kl,
                            )
                            new_state = {fused_bn_key: bn_new[fused_bn_key]}
                    else:
                        bkey = jax.random.fold_in(dkey, b_i)
                        (loss, new_state), grads = grad_fn(
                            params, state, bkey, batch, beta_kl, class_weights,
                            hp["gamma"],
                        )
                    params, opt = opt_update(
                        params, grads, opt, lr, hp["weight_decay"]
                    )
                    return (params, new_state, opt), loss

                # unroll=8 on TPU: XLA pipelines the tiny per-step matmul chains,
                # cutting per-step dispatch overhead ~2.5× (200-epoch run 4.15s →
                # 1.64s on v5e; unroll 16 is no faster but triples compile time).
                (params, state, opt), batch_losses = jax.lax.scan(
                    batch_step,
                    (carry["params"], carry["state"], carry["opt"]),
                    (jnp.arange(n_full), full_idx),
                    unroll=_batch_unroll(n_full),
                )
                total_train = jnp.sum(batch_losses)
                if remainder:
                    rem_idx = perm[n_full * batch_size :]
                    (params, state, opt), rem_loss = batch_step(
                        (params, state, opt), (jnp.int32(n_full), rem_idx)
                    )
                    total_train = total_train + rem_loss
                train_loss = total_train / n_batches

            # Validation: full-set sum loss / ceil(n_val/B) — equal to the
            # reference's mean of per-batch sum losses.
            if masked_sizes:
                val_sum = eval_loss_fn_masked(
                    params, state, vkey, val_arrays, beta_kl, class_weights,
                    hp["gamma"], jnp.arange(n_val) < n_val_d,
                )
                val_loss = val_sum / (
                    -(-n_val_d // batch_size)).astype(jnp.float32)
            else:
                val_sum = eval_loss_fn(
                    params, state, vkey, val_arrays, beta_kl, class_weights,
                    hp["gamma"]
                )
                val_loss = val_sum / n_val_batches

            plateau = optim.plateau_step(
                carry["plateau"], val_loss, hp["sched_factor"], hp["sched_patience"]
            )
            estop, snap = optim.early_stop_step(
                carry["estop"], val_loss, epoch, hp["patience"]
            )
            best = jax.tree.map(
                lambda b, c: jnp.where(snap, c, b),
                carry["best"],
                {"params": params, "state": state},
            )
            new_carry = {
                "params": params,
                "state": state,
                "opt": opt,
                "plateau": plateau,
                "estop": estop,
                "best": best,
            }
            return new_carry, (train_loss, val_loss, beta_kl, lr, jnp.bool_(True))

        def epoch_step(carry, epoch):
            # post-early-stop epochs fill their loss rows with NaN (cosmetic:
            # consumers slice by epochs_ran, hpo uses nanmin). Under
            # jax_debug_nans those benign rows would crash a HEALTHY stopped
            # run, so debug mode fills with +inf instead (stop_fill_inf).
            nan = jnp.float32(jnp.inf if stop_fill_inf else jnp.nan)
            if stop_via_mask:
                # For vmapped fold/trial populations. A lax.cond with a
                # batched predicate lowers to select anyway — both branches
                # execute for every population member, so the cond saves no
                # compute under vmap; what its batching rule DOES cost is a
                # 4.7× XLA:TPU backend-compile blowup (584.9 s → 124.3 s for
                # the pop=4×50-epoch program, benchmarks/RESULTS.md round 2).
                # This masked form computes exactly what vmap(cond) computes
                # — run the epoch, keep the old carry and emit NaN rows for
                # already-stopped members — without the pathological cond
                # batching structure.
                stopped = carry["estop"]["stopped"]
                new_carry, (tl, vl, bk, lr, _) = run_epoch(carry, epoch)
                merged = jax.tree.map(
                    lambda old, new: jnp.where(stopped, old, new),
                    carry, new_carry,
                )
                mask = lambda x: jnp.where(stopped, nan, x)
                return merged, (mask(tl), mask(vl), mask(bk), mask(lr),
                                jnp.logical_not(stopped))
            # Single-run path: the predicate is scalar, so the cond is a real
            # branch — post-stop epochs cost nothing.
            return jax.lax.cond(
                carry["estop"]["stopped"],
                lambda c: (c, (nan, nan, nan, nan, jnp.bool_(False))),
                lambda c: run_epoch(c, epoch),
                carry,
            )

        carry, (train_losses, val_losses, betas, lrs, ran) = jax.lax.scan(
            epoch_step, carry0, jnp.arange(num_epochs) + epoch_offset
        )
        return FitResult(
            params=carry["best"]["params"],
            state=carry["best"]["state"],
            final_params=carry["params"],
            final_state=carry["state"],
            best_val_loss=carry["estop"]["best_val"],
            best_epoch=carry["estop"]["best_epoch"],
            stopped=carry["estop"]["stopped"],
            train_losses=train_losses,
            val_losses=val_losses,
            betas=betas,
            lrs=lrs,
            carry=carry,
            epochs_ran=jnp.sum(ran.astype(jnp.int32)),
        )

    return _fit


@functools.lru_cache(maxsize=None)
def _build_fit(*static_args):
    return jax.jit(build_fit_fn(*static_args))


def fit(
    task_name: str,
    cfg: Config,
    train_arrays: MultiModalArrays,
    val_arrays: MultiModalArrays,
    key,
    n_sites: int,
    *,
    num_epochs: Optional[int] = None,
    drop_last: bool = True,
    class_weights=None,
    hp=None,
    init_params=None,
    init_state=None,
    resume_carry=None,
    start_epoch: int = 0,
    fused_step: bool = False,
    fused_epoch: bool = False,
    mesh=None,
) -> FitResult:
    """Train a task end-to-end on device. Returns the best-val snapshot.

    ``drop_last=True`` matches the standalone training CLIs
    (train_rna2dna.py:61); the CV harness passes ``drop_last=False`` to match
    its inner loaders (vae_cross_modality_cv.py:121).

    ``cfg.compute_dtype`` = "bfloat16" runs the XLA paths with bf16 matmul
    operands (fp32 accumulation/biases/BN/losses, fp32 master params and
    optimizer) — the MXU-native mode for the wide/batched regime
    (benchmarks/bench_wide.py); fp32 default is bit-compatible with the
    reference recipe. Incompatible with fused_step/fused_epoch (fp32 Pallas
    programs; at reference dims they are latency-bound anyway).

    ``mesh``: a Mesh with a "data" axis turns the whole fused run into a
    data-parallel SPMD program — the sample axis of the train/val tables is
    sharded over "data", the carry (params/opt/scheduler) is replicated, and
    GSPMD inserts the psums for the batch reductions (loss sums, BatchNorm
    statistics, gradient accumulation). Same math as the single-chip run up
    to float reduction order. XLA path only: the Pallas kernels are
    single-chip programs (multi-chip Pallas use goes through the population
    sharding in parallel/vmap_meta instead).
    """
    task = TASKS[task_name]
    if num_epochs is None:  # explicit 0 means "no training epochs", not 200
        num_epochs = cfg.num_epochs
    if hp is None:
        hp = hyperparams(cfg)
    if resume_carry is not None:
        carry0 = resume_carry
        if ("vr" in carry0["opt"]) != (cfg.optimizer == "adafactor"):
            # a structure mismatch would otherwise surface as an opaque
            # pytree error deep in tracing
            found = "adafactor" if "vr" in carry0["opt"] else "adamw"
            raise ValueError(
                f"resume checkpoint holds {found!r} optimizer state but "
                f"Config.optimizer is {cfg.optimizer!r} — resume with the "
                "optimizer the run was started with"
            )
        want = np.dtype(ops_nn.resolve_compute_dtype(cfg.moments_dtype))
        stored = {
            np.dtype(leaf.dtype)
            for k in ("m", "v", "vr", "vc") if k in carry0["opt"]
            for leaf in jax.tree.leaves(carry0["opt"][k])
        }
        if stored and stored != {want}:
            # the checkpoint's storage dtype rules on resume — say so
            # instead of silently ignoring the knob
            print(
                f"Note: resume checkpoint stores optimizer moments as "
                f"{'/'.join(sorted(str(d) for d in stored))}; "
                f"Config.moments_dtype={cfg.moments_dtype!r} is ignored for "
                "this run (the knob applies to fresh runs)"
            )
    else:
        if init_params is None:
            init_params, init_state = task.init(key, cfg, n_sites)
        elif init_state is None:
            # every task's init returns a (possibly empty) state dict; a None
            # state would only surface as an opaque TypeError deep in tracing
            raise ValueError(
                "init_params was given without init_state — pass both halves "
                "of the task.init(...) result"
            )
        carry0 = init_carry(init_params, init_state, hp["lr"],
                            moments_dtype=cfg.moments_dtype,
                            optimizer=cfg.optimizer)
    if (fused_step or fused_epoch) and any(
        jnp.issubdtype(leaf.dtype, jnp.floating) and leaf.dtype != jnp.float32
        for leaf in jax.tree.leaves(carry0["opt"])
    ):
        raise ValueError(
            "moments_dtype='bfloat16' applies to the XLA paths only — the "
            "Pallas fused kernels are fp32 programs; at the reference dims "
            "they keep moments VMEM-resident anyway, so the HBM-sweep saving "
            "this knob exists for (wide regime) doesn't apply there"
        )
    data_sharding = None
    if mesh is not None:
        if fused_step or fused_epoch:
            raise ValueError(
                "mesh-sharded fit requires the XLA path: the Pallas kernels "
                "are single-chip programs (use parallel/vmap_meta population "
                "sharding for multi-chip Pallas workloads)"
            )
        if mesh.size == 1:
            # Degenerate mesh: sharding constraints over one device are
            # semantic no-ops, but they still route the program through the
            # TPU toolchain's SPMD-partitioner pipeline — measured +62 s
            # compile over the identical unsharded program on the relay
            # (benchmarks/RESULTS.md compile ledger). Compile the plain
            # program instead; >1-device meshes take the real GSPMD path.
            mesh = None
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            data_sharding = NamedSharding(mesh, PartitionSpec("data"))
    fit_fn = _build_fit(
        task_name,
        int(num_epochs),
        int(cfg.batch_size),
        int(len(train_arrays)),
        int(len(val_arrays)),
        bool(drop_last),
        class_weights is not None,
        bool(fused_step),
        bool(fused_epoch),
        data_sharding,
        False,  # stop_via_mask (vmap_meta populations build unjitted instead)
        str(cfg.compute_dtype),
        # read at call time and part of the cache key, so toggling debug mode
        # in-process can't serve a stale program
        bool(jax.config.jax_debug_nans),
        str(cfg.optimizer),
    )
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)
    if mesh is not None:
        # replicate the small state explicitly so every chip starts identical
        # (one pytree-level device_put: transfers batch into a single dispatch)
        carry0, hp, cw, key = jax.device_put(
            (carry0, hp, cw, key), NamedSharding(mesh, PartitionSpec())
        )
    return fit_fn(
        carry0, train_arrays, val_arrays, hp, cw, key, jnp.int32(start_epoch)
    )


@functools.lru_cache(maxsize=None)
def _build_predict(task_name: str, data_sharding=None,
                   compute_dtype: str = "float32"):
    task = TASKS[task_name]
    fwd_dtype = _resolve_compute_dtype(compute_dtype)

    def _predict(params, state, arrays, key):
        if data_sharding is not None:
            # cohort-scale imputation serving: shard the sample axis over the
            # mesh's "data" axis; the eval forward is embarrassingly parallel
            # row-wise so GSPMD inserts no collectives (params replicated)
            arrays = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, data_sharding),
                arrays,
            )
        params_c = ops_nn.cast_matmul_params(params, fwd_dtype)
        return task.predict(params_c, state, key, arrays)

    return jax.jit(_predict)


def replicate_for_serving(tree, mesh):
    """Pre-place a params/state pytree replicated on ``mesh`` ONCE.

    Cohort-imputation loops call ``predict(mesh=...)`` many times with the
    same weights; replicating up front makes the per-call placement below a
    no-op instead of a full host→device transfer per call."""
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.device_put(tree, NamedSharding(mesh, PartitionSpec()))


def predict(task_name: str, params, state, arrays: MultiModalArrays, key=None,
            mesh=None, chunk_size=None, compute_dtype: str = "float32"):
    """Eval-mode cross-modal prediction over a full table (jitted & cached).

    ``mesh``: shard the sample axis over the mesh's "data" axis — the
    multi-chip path for imputing large unmatched cohorts
    (reconstruct_unmatched.py's serving workload). Weights that already carry
    the replicated mesh layout (see ``replicate_for_serving``) are used
    as-is; only unplaced leaves pay a transfer.

    ``compute_dtype``: "bfloat16" serves with bf16 matmul operands (fp32
    accumulation) — same policy as training's Config.compute_dtype; use the
    dtype the model was trained with.

    ``chunk_size``: serve cohorts that exceed HBM by streaming fixed-size
    row chunks through ONE compiled program (the last chunk is padded by
    clipped gather indices so every chunk hits the same executable, then
    trimmed). Keep ``arrays`` host-resident (numpy leaves) for this —
    `MultiModalArrays.take` then gathers each chunk on the host and only
    the chunk rides to the device; results return as a host numpy array.
    Composes with ``mesh``."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if chunk_size is not None:
        # uniform contract whatever the cohort size: host numpy result,
        # per-chunk fold_in keys — a 5k-row cohort must not silently flip
        # to device arrays / the unfolded key just because it fits one chunk
        if chunk_size < 1:
            raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
        n = len(arrays)
        if n == 0:
            raise ValueError("cannot serve an empty cohort")
        # Place the WEIGHTS once before the chunk loop: the per-chunk calls
        # get a fresh fold_in key each iteration, so host-resident
        # params/state would otherwise re-ride host→device with every chunk
        # (multi-GB per transfer in the wide regime this path serves).
        if mesh is not None and mesh.size > 1:
            params, state = replicate_for_serving((params, state), mesh)
        else:
            params, state = jax.device_put((params, state))
        # Two-deep dispatch window: jit dispatch is async, so staging the
        # NEXT chunk (host gather + transfer + dispatch) overlaps the
        # CURRENT chunk's compute+fetch instead of serializing behind its
        # blocking np.asarray. Costs one extra in-flight chunk of device
        # memory (chunk_size rows in + out), preserving the HBM bound that
        # is this path's reason to exist.
        outs = []
        pending = []  # [(device_out, valid_rows)], at most 2 in flight
        for i, start in enumerate(range(0, n, chunk_size)):
            # clipped indices pad the final chunk to the common shape
            idx = np.minimum(np.arange(start, start + chunk_size), n - 1)
            out = predict(
                task_name, params, state, arrays.take(idx),
                # distinct per-chunk fold so sampling noise is not reused
                jax.random.fold_in(key, i), mesh,
                compute_dtype=compute_dtype,
            )
            pending.append((out, min(chunk_size, n - start)))
            if len(pending) == 2:
                done, rows = pending.pop(0)
                outs.append(np.asarray(done)[:rows])
        for done, rows in pending:
            outs.append(np.asarray(done)[:rows])
        return np.concatenate(outs, axis=0)
    data_sharding = None
    if mesh is not None and mesh.size == 1:
        # same degenerate-mesh skip as fit(): a 1-device sharding constraint
        # changes nothing but forces the SPMD-partitioner compile pipeline
        mesh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        data_sharding = NamedSharding(mesh, PartitionSpec("data"))
        replicated = NamedSharding(mesh, PartitionSpec())
        placed = lambda x: isinstance(x, jax.Array) and x.sharding == replicated
        if not all(map(placed, jax.tree.leaves((params, state, key)))):
            # ONE pytree-level device_put (single batched transfer dispatch),
            # not one per leaf; weights pre-placed via replicate_for_serving
            # skip the transfer entirely
            params, state, key = jax.device_put(
                (params, state, key), replicated
            )
    return _build_predict(task_name, data_sharding, str(compute_dtype))(
        params, state, arrays, key
    )
