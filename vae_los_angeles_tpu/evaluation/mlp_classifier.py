"""JAX MLP classifiers for the downstream site-classification task.

Two architectures from the reference:
  * "deep" (downstream_task.py:54-71): Linear(in,256) → LayerNorm → ReLU →
    Dropout(0.3) → Linear(256,128) → LayerNorm → ReLU → Dropout(0.2) →
    Linear(128,n). Trained with Adam(lr=1e-3, weight_decay=1e-4), plateau
    scheduler on val loss, early stopping on best val ACCURACY (patience 10,
    max 100 epochs) — reference :84-139.
  * "shallow" (downstream_task_directional.py:151-162): Linear(in,128) →
    ReLU → Dropout(0.2) → Linear(128,n). Adam(lr=1e-3), fixed 20 epochs.

The whole training run is one fused `lax.scan` like the VAE engine; the loss
is torch-semantics weighted cross-entropy with 'mean' reduction
(Σ w[yᵢ]·nllᵢ / Σ w[yᵢ]). A scenario's whole StratifiedKFold population
trains as ONE vmapped program via `fit_classifier_folds` (uneven fold sizes
padded to the max and masked — same recipe as `parallel/vmap_meta.fit_folds`
on the CV side), replacing the reference's sequential 40-fit meta-loop
(downstream_task.py:164-237).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.ops import optim
from vae_los_angeles_tpu.ops.nn import dropout_apply, linear_apply, linear_init, relu

LN_EPS = 1e-5


def feature_bucket(input_dim: int) -> int:
    """Pad the classifier's feature width up to the next 128-lane boundary.

    The MXU already zero-pads the contraction dimension to a multiple of 128
    internally, so this costs no FLOPs it wasn't paying — but it makes
    near-sized scenario widths share one compiled executable (the reference's
    8 downstream scenarios span widths 1177/1211/2388 → buckets 1280/2432,
    cutting the population compiles 3 → 2). Training on the padded width is
    BIT-IDENTICAL to the true width: pad input columns are zero, so their
    fc1 weight rows (initialized zero, see `_pad_fc1_rows`) receive zero
    gradient and zero Adam/weight-decay drift forever.
    ``DOWNSTREAM_DIM_BUCKET=0`` disables.
    """
    if os.getenv("DOWNSTREAM_DIM_BUCKET", "1") == "0":
        return input_dim
    return -(-input_dim // 128) * 128


def _pad_cols(a, dim: int):
    a = np.asarray(a)
    if a.shape[1] == dim:
        return a
    if a.shape[1] > dim:
        raise ValueError(
            f"features wider ({a.shape[1]}) than trained width ({dim}); "
            "a classifier only accepts inputs at or below the (bucketed) "
            "width it was fit on"
        )
    return np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, dim - a.shape[1])])


def _bucket_fold_rows(n: int) -> int:
    """Row-count bucketing for the classifier programs (the evaluation
    kernels' `ops/backend.bucket_rows` ladder, honoring ``EVAL_BUCKET=0``).

    Executables are keyed on the padded (n_train_max, n_val_max) maxima;
    the TRUE sizes are dynamic arguments with mask-exact discipline (see
    `_make_fold_fit`), so padding the maxima up the ladder is provably
    inert — and near-sized cohorts (a 850- vs 890-sample validation split)
    share every compiled program instead of each paying the relay's cold
    stack."""
    from vae_los_angeles_tpu.ops.backend import bucket_rows

    return bucket_rows(n)


def _pad_fc1_rows(params, dim: int):
    """Zero-pad fc1's weight rows to the bucketed input width. Init stays at
    the TRUE width (same RNG draws, same Kaiming bound) so the padded
    program reproduces the unpadded one bit-for-bit."""
    w = params["fc1"]["w"]
    if w.shape[0] == dim:
        return params
    padded = dict(params)
    padded["fc1"] = {
        "w": jnp.pad(w, ((0, dim - w.shape[0]), (0, 0))),
        "b": params["fc1"]["b"],
    }
    return padded


def _layernorm_init(dim):
    return {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}


def _layernorm_apply(p, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * p["gamma"] + p["beta"]


def mlp_init(key, input_dim: int, n_classes: int, arch: str = "deep"):
    if arch == "deep":
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "fc1": linear_init(k1, input_dim, 256),
            "ln1": _layernorm_init(256),
            "fc2": linear_init(k2, 256, 128),
            "ln2": _layernorm_init(128),
            "fc3": linear_init(k3, 128, n_classes),
        }
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, input_dim, 128),
        "fc2": linear_init(k2, 128, n_classes),
    }


def mlp_apply(params, x, *, arch: str = "deep", train: bool = False, key=None):
    if arch == "deep":
        if key is not None:
            kd1, kd2 = jax.random.split(key)
        else:
            kd1 = kd2 = None
        h = linear_apply(params["fc1"], x)
        h = relu(_layernorm_apply(params["ln1"], h))
        h = dropout_apply(kd1, h, 0.3, train=train)
        h = linear_apply(params["fc2"], h)
        h = relu(_layernorm_apply(params["ln2"], h))
        h = dropout_apply(kd2, h, 0.2, train=train)
        return linear_apply(params["fc3"], h)
    h = relu(linear_apply(params["fc1"], x))
    h = dropout_apply(key, h, 0.2, train=train)
    return linear_apply(params["fc2"], h)


def weighted_ce_mean(logits, labels, class_weights):
    """torch CrossEntropyLoss(weight=w) 'mean': Σ w[yᵢ]·nllᵢ / Σ w[yᵢ]."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    w = jnp.take(class_weights, labels)
    return jnp.sum(w * nll) / jnp.sum(w)


class ClassifierFit(NamedTuple):
    params: dict
    best_val_acc: jnp.ndarray
    val_accs: jnp.ndarray


def _make_fold_fit(arch: str, num_epochs: int, batch_size: int,
                   n_train_max: int, n_val_max: int, early_stop: bool):
    """The single-fold fit core, written against PADDED maxima with dynamic
    true sizes so the same program serves the sequential path
    (n_train == n_train_max, masks all-ones) and the vmapped fold
    population (uneven StratifiedKFold folds padded to the max — the
    reference's 40-sequential-MLP meta-loop, downstream_task.py:164-237,
    collapses to one program per feature width).

    Padded-row discipline: train rows past ``n_train`` are NEVER gathered
    (the masked-argsort permutation only emits valid row ids), trailing
    batches a fold doesn't need are computed-and-discarded (optimizer state
    gated per batch, so Adam steps/moments advance exactly ceil(n/bs) times
    per epoch like the sequential loop), and val metrics mask rows past
    ``n_val`` with `where` (not multiply) so garbage padding can't NaN
    through 0·inf.
    """
    n_batches = -(-n_train_max // batch_size)  # torch keeps partial batches
    n_slots = n_batches * batch_size

    def loss_fn(params, key, x, y, class_weights, mask):
        logits = mlp_apply(params, x, arch=arch, train=True, key=key)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(log_probs, y[:, None], axis=-1)[:, 0]
        w = jnp.take(class_weights, y) * mask
        # max() guards the fully-masked (inactive, discarded) batches of
        # short folds; active batches always have Σw ≫ 1e-12 so the loss
        # value is untouched
        return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)

    grad_fn = jax.value_and_grad(loss_fn)

    def _fit(params0, x_train, y_train, n_train, x_val, y_val, n_val,
             class_weights, key, lr, weight_decay):
        opt0 = optim.adamw_init(params0)
        plateau0 = optim.plateau_init(lr)
        # one contribution per valid sample per epoch (cyclic padding of the
        # final short batch, torch drop_last=False semantics)
        pos_mask = (jnp.arange(n_slots) < n_train).astype(jnp.float32).reshape(
            n_batches, batch_size
        )
        # batch b exists for this fold iff b < ceil(n_train / batch_size)
        batch_active = (jnp.arange(n_batches) * batch_size) < n_train
        val_mask = jnp.arange(n_val_max) < n_val
        carry0 = {
            "params": params0,
            "opt": opt0,
            "plateau": plateau0,
            "best_params": params0,
            "best_acc": jnp.float32(0.0),
            "patience": jnp.int32(0),
            "stopped": jnp.zeros((), jnp.bool_),
        }

        def run_epoch(carry, epoch):
            ekey = jax.random.fold_in(key, epoch)
            pkey, dkey = jax.random.split(ekey)
            # uniform permutation of the VALID rows via masked argsort
            # (jax.random.permutation needs a static length; this form is
            # vmappable over folds with different n_train)
            u = jax.random.uniform(pkey, (n_train_max,))
            u = jnp.where(jnp.arange(n_train_max) < n_train, u, jnp.inf)
            perm = jnp.argsort(u)
            idx = perm[jnp.mod(jnp.arange(n_slots), n_train)].reshape(
                n_batches, batch_size
            )
            lr_now = carry["plateau"]["lr"]

            def batch_step(bstate, scan_in):
                b_i, bidx, bmask, active = scan_in
                params, opt = bstate
                bkey = jax.random.fold_in(dkey, b_i)
                loss, grads = grad_fn(
                    params, bkey, x_train[bidx], y_train[bidx], class_weights,
                    bmask,
                )
                new_params, new_opt = optim.adam_update(
                    params, grads, opt, lr_now, weight_decay
                )
                # inactive trailing batches must not advance Adam state
                # (zero grads still decay moments / apply weight decay)
                params = jax.tree.map(
                    lambda n, o: jnp.where(active, n, o), new_params, params
                )
                opt = jax.tree.map(
                    lambda n, o: jnp.where(active, n, o), new_opt, opt
                )
                return (params, opt), loss

            (params, opt), losses = jax.lax.scan(
                batch_step, (carry["params"], carry["opt"]),
                (jnp.arange(n_batches), idx, pos_mask, batch_active),
            )
            logits = mlp_apply(params, x_val, arch=arch, train=False)
            log_probs = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(log_probs, y_val[:, None], axis=-1)[:, 0]
            nll = jnp.where(val_mask, nll, 0.0)
            w = jnp.where(val_mask, jnp.take(class_weights, y_val), 0.0)
            val_loss = jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)
            correct = jnp.where(
                val_mask, jnp.argmax(logits, axis=-1) == y_val, False
            )
            val_acc = 100.0 * jnp.sum(correct.astype(jnp.float32)) / n_val
            plateau = optim.plateau_step(
                carry["plateau"], val_loss, jnp.float32(0.5), jnp.int32(5)
            )
            improved = val_acc > carry["best_acc"]
            best_params = jax.tree.map(
                lambda b, c: jnp.where(improved, c, b), carry["best_params"], params
            )
            patience = jnp.where(improved, 0, carry["patience"] + 1)
            stopped = jnp.logical_or(carry["stopped"], patience >= 10)
            new_carry = {
                "params": params,
                "opt": opt,
                "plateau": plateau,
                "best_params": best_params,
                "best_acc": jnp.maximum(carry["best_acc"], val_acc),
                "patience": patience,
                "stopped": stopped if early_stop else carry["stopped"],
            }
            return new_carry, val_acc

        def epoch_step(carry, epoch):
            return jax.lax.cond(
                carry["stopped"],
                lambda c: (c, jnp.float32(jnp.nan)),
                lambda c: run_epoch(c, epoch),
                carry,
            )

        carry, val_accs = jax.lax.scan(epoch_step, carry0, jnp.arange(num_epochs))
        final = carry["best_params"] if early_stop else carry["params"]
        return ClassifierFit(
            params=final, best_val_acc=carry["best_acc"], val_accs=val_accs
        )

    return _fit


@functools.lru_cache(maxsize=None)
def _build_classifier_fit(arch: str, num_epochs: int, batch_size: int,
                          n_train: int, n_val: int, early_stop: bool):
    return jax.jit(_make_fold_fit(
        arch, num_epochs, batch_size, n_train, n_val, early_stop
    ))


@functools.lru_cache(maxsize=None)
def _build_classifier_fit_folds(arch: str, num_epochs: int, batch_size: int,
                                n_train_max: int, n_val_max: int,
                                early_stop: bool):
    """The whole fold population as ONE program: `vmap` of the fold core
    over the leading fold axis. jit's shape cache shares the executable
    across scenarios of equal feature width (the 8 downstream scenarios
    collapse to 3 compiles: RNA, DNA and concat widths)."""
    fit = _make_fold_fit(
        arch, num_epochs, batch_size, n_train_max, n_val_max, early_stop
    )
    return jax.jit(jax.vmap(fit, in_axes=(0,) * 9 + (None, None)))


def fit_classifier(
    x_train, y_train, x_val, y_val, n_classes, class_weights, key,
    *, arch: str = "deep", num_epochs: int = 100, batch_size: int = 32,
    lr: float = 1e-3, weight_decay: float = 1e-4, early_stop: bool = True,
):
    dim_pad = feature_bucket(int(np.asarray(x_train).shape[1]))
    params0 = mlp_init(key, int(np.asarray(x_train).shape[1]), n_classes, arch)
    params0 = _pad_fc1_rows(params0, dim_pad)
    n_train, n_val = len(x_train), len(x_val)
    n_tr_pad = _bucket_fold_rows(n_train)
    n_va_pad = _bucket_fold_rows(n_val)
    x_train = jnp.asarray(
        _pad_rows(_pad_cols(x_train, dim_pad), n_tr_pad), jnp.float32)
    y_train = jnp.asarray(_pad_rows(y_train, n_tr_pad), jnp.int32)
    x_val = jnp.asarray(
        _pad_rows(_pad_cols(x_val, dim_pad), n_va_pad), jnp.float32)
    y_val = jnp.asarray(_pad_rows(y_val, n_va_pad), jnp.int32)
    fit_fn = _build_classifier_fit(
        arch, int(num_epochs), int(batch_size), n_tr_pad, n_va_pad,
        bool(early_stop),
    )
    return fit_fn(
        params0, x_train, y_train, jnp.int32(n_train),
        x_val, y_val, jnp.int32(n_val),
        jnp.asarray(class_weights, jnp.float32), key,
        jnp.float32(lr), jnp.float32(weight_decay),
    )


def _pad_rows(a, n_max: int):
    a = np.asarray(a)
    if len(a) == n_max:
        return a
    pad = [(0, n_max - len(a))] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


def fit_classifier_folds(
    folds, n_classes, *, arch: str = "deep", num_epochs: int = 100,
    batch_size: int = 32, lr: float = 1e-3, weight_decay: float = 1e-4,
    early_stop: bool = True, seeds=None,
):
    """Train ALL folds of a scenario as ONE vmapped program.

    ``folds`` is a sequence of ``(x_train, y_train, x_val, y_val,
    class_weights)`` tuples (uneven StratifiedKFold sizes welcome — rows are
    padded to the population max and masked; see `_make_fold_fit` for the
    padding discipline). Replaces the reference's sequential per-fold loop
    (downstream_task.py:164-237): one dispatch trains the 5-fold population,
    and jit shape-caching shares the compiled program across scenarios of
    equal feature width. Returns a `ClassifierFit` whose leaves carry a
    leading fold axis.

    Per-fold PRNG: fold i uses ``PRNGKey(seeds[i])`` (default ``seeds =
    range(len(folds))``, matching the sequential path's ``seed=fold_idx``).

    Feature widths may differ ACROSS members: every fold matrix is
    column-padded to `feature_bucket` of the population max, and each
    member's params are initialized at its own TRUE width then zero-row
    padded (`_pad_fc1_rows`), so a mixed-width population reproduces each
    member's standalone fit bit-for-bit while sharing one executable.
    """
    n_folds = len(folds)
    seeds = list(range(n_folds)) if seeds is None else list(seeds)
    n_train_max = _bucket_fold_rows(max(len(f[0]) for f in folds))
    n_val_max = _bucket_fold_rows(max(len(f[2]) for f in folds))
    dim_pad = feature_bucket(max(int(np.asarray(f[0]).shape[1]) for f in folds))

    x_tr = jnp.asarray(
        np.stack([_pad_rows(_pad_cols(f[0], dim_pad), n_train_max)
                  for f in folds]), jnp.float32)
    y_tr = jnp.asarray(
        np.stack([_pad_rows(f[1], n_train_max) for f in folds]), jnp.int32)
    n_tr = jnp.asarray([len(f[0]) for f in folds], jnp.int32)
    x_va = jnp.asarray(
        np.stack([_pad_rows(_pad_cols(f[2], dim_pad), n_val_max)
                  for f in folds]), jnp.float32)
    y_va = jnp.asarray(
        np.stack([_pad_rows(f[3], n_val_max) for f in folds]), jnp.int32)
    n_va = jnp.asarray([len(f[2]) for f in folds], jnp.int32)
    cw = jnp.asarray(np.stack([f[4] for f in folds]), jnp.float32)
    keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])

    params0 = jax.tree.map(
        lambda *leaves: jnp.stack(leaves),
        *[
            _pad_fc1_rows(
                mlp_init(k, int(np.asarray(f[0]).shape[1]), n_classes, arch),
                dim_pad,
            )
            for k, f in zip(keys, folds)
        ],
    )
    fit_fn = _build_classifier_fit_folds(
        arch, int(num_epochs), int(batch_size), int(n_train_max),
        int(n_val_max), bool(early_stop),
    )
    args = [params0, x_tr, y_tr, n_tr, x_va, y_va, n_va, cw, keys]

    # multi-chip hosts: shard the member axis over the ("data",) mesh — the
    # serving-policy convention every evaluation kernel follows. Each member
    # trains entirely on one chip (identical per-member math; GSPMD just
    # partitions the population), members padded to the device count by
    # repeating the last one (discarded). DOWNSTREAM_SHARD=0 opts out.
    mesh = None
    if os.getenv("DOWNSTREAM_SHARD", "1") != "0":
        from vae_los_angeles_tpu.parallel.vmap_meta import (
            _pad_population,
            _padded_size,
            _shard_population,
            population_mesh,
        )

        mesh = population_mesh()
    if mesh is not None:
        target = _padded_size(n_folds, mesh)
        args = [
            _shard_population(_pad_population(a, target), mesh) for a in args
        ]
    fit = fit_fn(*args, jnp.float32(lr), jnp.float32(weight_decay))
    if mesh is not None and int(fit.best_val_acc.shape[0]) != n_folds:
        fit = jax.tree.map(lambda leaf: leaf[:n_folds], fit)
    return fit


def predict_classes(params, x, arch: str = "deep"):
    x = _pad_cols(x, int(params["fc1"]["w"].shape[0]))
    logits = mlp_apply(params, jnp.asarray(x, jnp.float32), arch=arch, train=False)
    return np.asarray(jnp.argmax(logits, axis=-1))


def predict_classes_folds(params, x_vals, arch: str = "deep"):
    """Vmapped per-fold prediction. ``params`` carries a leading fold axis
    (from `fit_classifier_folds`); ``x_vals`` is the padded (F, n_val_max,
    D) stack — callers slice row i to its true fold length. Columns are
    padded to the population's bucketed width to match the params."""
    x_vals = np.stack(
        [_pad_cols(x, int(params["fc1"]["w"].shape[1])) for x in x_vals]
    )
    logits = jax.vmap(
        lambda p, x: mlp_apply(p, x, arch=arch, train=False)
    )(params, jnp.asarray(x_vals, jnp.float32))
    return np.asarray(jnp.argmax(logits, axis=-1))
