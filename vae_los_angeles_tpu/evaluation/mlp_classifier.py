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
(Σ w[yᵢ]·nllᵢ / Σ w[yᵢ]).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.ops import optim
from vae_los_angeles_tpu.ops.nn import dropout_apply, linear_apply, linear_init, relu

LN_EPS = 1e-5


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


@functools.lru_cache(maxsize=None)
def _build_classifier_fit(arch: str, num_epochs: int, batch_size: int,
                          n_train: int, n_val: int, early_stop: bool):
    n_batches = -(-n_train // batch_size)  # torch loaders keep partial batches
    # fixed-shape batches are padded cyclically; `mask` zeroes the padded
    # rows out of the loss so each sample contributes exactly once per epoch
    # (torch's short-final-batch semantics) and any n_train works
    n_slots = n_batches * batch_size
    pos_mask = (jnp.arange(n_slots) < n_train).astype(jnp.float32).reshape(
        n_batches, batch_size
    )

    def loss_fn(params, key, x, y, class_weights, mask):
        logits = mlp_apply(params, x, arch=arch, train=True, key=key)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(log_probs, y[:, None], axis=-1)[:, 0]
        w = jnp.take(class_weights, y) * mask
        return jnp.sum(w * nll) / jnp.sum(w)

    grad_fn = jax.value_and_grad(loss_fn)

    def _fit(params0, x_train, y_train, x_val, y_val, class_weights, key,
             lr, weight_decay):
        opt0 = optim.adamw_init(params0)
        plateau0 = optim.plateau_init(lr)
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
            perm = jax.random.permutation(pkey, n_train)
            idx = jnp.resize(perm, n_slots).reshape(n_batches, batch_size)
            lr_now = carry["plateau"]["lr"]

            def batch_step(bstate, scan_in):
                b_i, bidx, bmask = scan_in
                params, opt = bstate
                bkey = jax.random.fold_in(dkey, b_i)
                loss, grads = grad_fn(
                    params, bkey, x_train[bidx], y_train[bidx], class_weights,
                    bmask,
                )
                params, opt = optim.adam_update(
                    params, grads, opt, lr_now, weight_decay
                )
                return (params, opt), loss

            (params, opt), losses = jax.lax.scan(
                batch_step, (carry["params"], carry["opt"]),
                (jnp.arange(n_batches), idx, pos_mask),
            )
            logits = mlp_apply(params, x_val, arch=arch, train=False)
            val_loss = weighted_ce_mean(logits, y_val, class_weights)
            val_acc = jnp.mean(
                (jnp.argmax(logits, axis=-1) == y_val).astype(jnp.float32)
            ) * 100.0
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

    return jax.jit(_fit)


def fit_classifier(
    x_train, y_train, x_val, y_val, n_classes, class_weights, key,
    *, arch: str = "deep", num_epochs: int = 100, batch_size: int = 32,
    lr: float = 1e-3, weight_decay: float = 1e-4, early_stop: bool = True,
):
    x_train = jnp.asarray(x_train, jnp.float32)
    y_train = jnp.asarray(y_train, jnp.int32)
    x_val = jnp.asarray(x_val, jnp.float32)
    y_val = jnp.asarray(y_val, jnp.int32)
    params0 = mlp_init(key, x_train.shape[1], n_classes, arch)
    fit_fn = _build_classifier_fit(
        arch, int(num_epochs), int(batch_size), int(len(x_train)),
        int(len(x_val)), bool(early_stop),
    )
    return fit_fn(
        params0, x_train, y_train, x_val, y_val,
        jnp.asarray(class_weights, jnp.float32), key,
        jnp.float32(lr), jnp.float32(weight_decay),
    )


def predict_classes(params, x, arch: str = "deep"):
    logits = mlp_apply(params, jnp.asarray(x, jnp.float32), arch=arch, train=False)
    return np.asarray(jnp.argmax(logits, axis=-1))
