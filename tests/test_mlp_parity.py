"""Downstream-MLP torch parity (VERDICT r2 #9).

The VAE families have live-oracle parity in test_nn_parity.py; this gives the
downstream site classifier (`evaluation/mlp_classifier.py`) the same
treatment against the reference's exact recipe (downstream_task.py:54-139):
LayerNorm MLP, weighted mean-reduced CrossEntropyLoss, and COUPLED-decay
torch.optim.Adam. The torch modules below are the oracle, not product code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vae_los_angeles_tpu.evaluation import mlp_classifier as mlp
from vae_los_angeles_tpu.ops import optim


def _torch_deep(input_dim, n_classes):
    """Reference downstream_task.py:54-71 (dropouts omitted — parity is
    checked in eval-mode forwards; dropout semantics have their own test in
    test_nn_parity.py)."""
    return torch.nn.Sequential(
        torch.nn.Linear(input_dim, 256),
        torch.nn.LayerNorm(256),
        torch.nn.ReLU(),
        torch.nn.Linear(256, 128),
        torch.nn.LayerNorm(128),
        torch.nn.ReLU(),
        torch.nn.Linear(128, n_classes),
    )


def _params_from_torch(model):
    lin = [m for m in model if isinstance(m, torch.nn.Linear)]
    ln = [m for m in model if isinstance(m, torch.nn.LayerNorm)]
    p = {
        "fc1": {"w": jnp.asarray(lin[0].weight.detach().numpy().T),
                "b": jnp.asarray(lin[0].bias.detach().numpy())},
        "ln1": {"gamma": jnp.asarray(ln[0].weight.detach().numpy()),
                "beta": jnp.asarray(ln[0].bias.detach().numpy())},
        "fc2": {"w": jnp.asarray(lin[1].weight.detach().numpy().T),
                "b": jnp.asarray(lin[1].bias.detach().numpy())},
        "ln2": {"gamma": jnp.asarray(ln[1].weight.detach().numpy()),
                "beta": jnp.asarray(ln[1].bias.detach().numpy())},
        "fc3": {"w": jnp.asarray(lin[2].weight.detach().numpy().T),
                "b": jnp.asarray(lin[2].bias.detach().numpy())},
    }
    return p


def test_deep_mlp_forward_matches_torch(rng):
    x = rng.normal(size=(16, 40)).astype(np.float32)
    model = _torch_deep(40, 7).eval()
    params = _params_from_torch(model)
    got = np.asarray(mlp.mlp_apply(params, jnp.asarray(x), arch="deep",
                                   train=False))
    want = model(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_weighted_ce_mean_matches_torch(rng):
    logits = rng.normal(size=(32, 9)).astype(np.float32) * 3
    labels = rng.integers(0, 9, size=(32,))
    w = (rng.random(9) + 0.2).astype(np.float32)
    got = float(mlp.weighted_ce_mean(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w)
    ))
    want = float(torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_deep_mlp_adam_steps_match_torch(rng):
    """Five full train steps — weighted-CE loss, LayerNorm backward, and
    torch.optim.Adam's COUPLED weight decay (reference downstream_task.py:84
    Adam(lr=1e-3, weight_decay=1e-4)) — must track the torch oracle on every
    parameter. Forwards run in eval mode on both sides so the comparison is
    dropout-free but the full backward (including LayerNorm's) is covered."""
    input_dim, n_classes, lr, wd = 24, 5, 1e-3, 1e-4
    torch.manual_seed(0)
    model = _torch_deep(input_dim, n_classes).eval()
    params = _params_from_torch(model)
    w = (rng.random(n_classes) + 0.5).astype(np.float32)
    opt_t = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=wd)
    ce = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))

    opt_j = optim.adamw_init(params)  # same slots; update fn differs

    def loss_fn(p, x, y):
        logits = mlp.mlp_apply(p, x, arch="deep", train=False)
        return mlp.weighted_ce_mean(logits, y, jnp.asarray(w))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    for step in range(5):
        x = rng.normal(size=(32, input_dim)).astype(np.float32)
        y = rng.integers(0, n_classes, size=(32,))

        loss_j, grads = grad_fn(params, jnp.asarray(x), jnp.asarray(y))
        params, opt_j = optim.adam_update(
            params, grads, opt_j, jnp.float32(lr), jnp.float32(wd)
        )

        opt_t.zero_grad()
        loss_t = ce(model(torch.from_numpy(x)), torch.from_numpy(y))
        loss_t.backward()
        opt_t.step()

        np.testing.assert_allclose(
            float(loss_j), float(loss_t), rtol=1e-5,
            err_msg=f"loss diverged at step {step}",
        )

    want = _params_from_torch(model)
    # five accumulated fp32 steps: matmul/LayerNorm reduction-order noise
    # compounds through the Adam moments, so per-element slack is wider
    # than a single forward's
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5
        ),
        params, want,
    )


def test_shallow_mlp_forward_matches_torch(rng):
    """downstream_task_directional.py:151-162: Linear(in,128)→ReLU→Linear."""
    x = rng.normal(size=(10, 12)).astype(np.float32)
    model = torch.nn.Sequential(
        torch.nn.Linear(12, 128), torch.nn.ReLU(), torch.nn.Linear(128, 4)
    ).eval()
    lin = [m for m in model if isinstance(m, torch.nn.Linear)]
    params = {
        "fc1": {"w": jnp.asarray(lin[0].weight.detach().numpy().T),
                "b": jnp.asarray(lin[0].bias.detach().numpy())},
        "fc2": {"w": jnp.asarray(lin[1].weight.detach().numpy().T),
                "b": jnp.asarray(lin[1].bias.detach().numpy())},
    }
    got = np.asarray(mlp.mlp_apply(params, jnp.asarray(x), arch="shallow",
                                   train=False))
    want = model(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pad_cols_rejects_wider_than_trained(rng):
    """A caller passing features wider than the trained (bucketed) width
    must get a clear shape-mismatch error, not an opaque np.pad failure
    (round-4 advisor finding)."""
    import pytest

    with pytest.raises(ValueError, match="wider .*trained width"):
        mlp._pad_cols(rng.normal(size=(4, 40)).astype(np.float32), 32)
