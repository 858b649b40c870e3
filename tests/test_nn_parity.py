"""Golden-parity tests of NN primitives against torch (CPU).

The torch models here are built inline from the architecture documented in
SURVEY §2 — they define the *oracle*, they are not the product path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vae_los_angeles_tpu.ops import nn as vnn


def test_linear_matches_torch(rng):
    x = rng.normal(size=(8, 32)).astype(np.float32)
    tl = torch.nn.Linear(32, 16)
    params = {
        "w": jnp.asarray(tl.weight.detach().numpy().T),
        "b": jnp.asarray(tl.bias.detach().numpy()),
    }
    got = np.asarray(vnn.linear_apply(params, jnp.asarray(x)))
    want = tl(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_linear_init_distribution():
    params = vnn.linear_init(jax.random.PRNGKey(0), 400, 300)
    bound = 1.0 / np.sqrt(400)
    w = np.asarray(params["w"])
    assert w.shape == (400, 300)
    assert np.abs(w).max() <= bound
    # uniform(-b, b) has std b/sqrt(3)
    assert np.isclose(w.std(), bound / np.sqrt(3), rtol=0.05)
    assert np.abs(np.asarray(params["b"])).max() <= bound


def test_embedding_matches_torch(rng):
    te = torch.nn.Embedding(10, 6)
    params = {"table": jnp.asarray(te.weight.detach().numpy())}
    idx = rng.integers(0, 10, size=(12,))
    got = np.asarray(vnn.embedding_apply(params, jnp.asarray(idx)))
    want = te(torch.from_numpy(idx)).detach().numpy()
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("train", [True, False])
def test_batchnorm_matches_torch(rng, train):
    x = rng.normal(size=(16, 24)).astype(np.float32) * 3 + 1
    tbn = torch.nn.BatchNorm1d(24)
    # randomize torch's running stats + affine params to make eval non-trivial
    with torch.no_grad():
        tbn.weight.copy_(torch.rand(24) + 0.5)
        tbn.bias.copy_(torch.rand(24) - 0.5)
        tbn.running_mean.copy_(torch.rand(24))
        tbn.running_var.copy_(torch.rand(24) + 0.5)
    params = {
        "gamma": jnp.asarray(tbn.weight.detach().numpy()),
        "beta": jnp.asarray(tbn.bias.detach().numpy()),
    }
    state = {
        "mean": jnp.asarray(tbn.running_mean.numpy().copy()),
        "var": jnp.asarray(tbn.running_var.numpy().copy()),
    }
    tbn.train(train)
    want = tbn(torch.from_numpy(x)).detach().numpy()
    got, new_state = vnn.batchnorm_apply(params, state, jnp.asarray(x), train=train)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    # running-stat updates (unbiased var, momentum 0.1)
    np.testing.assert_allclose(
        np.asarray(new_state["mean"]), tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state["var"]), tbn.running_var.numpy(), atol=1e-5
    )


def test_dropout_semantics():
    x = jnp.ones((1000, 50))
    key = jax.random.PRNGKey(1)
    y = vnn.dropout_apply(key, x, 0.1, train=True)
    y_np = np.asarray(y)
    kept = y_np != 0
    # kept values are scaled by 1/(1-p)
    np.testing.assert_allclose(y_np[kept], 1.0 / 0.9, rtol=1e-6)
    assert np.isclose(kept.mean(), 0.9, atol=0.01)
    # eval mode: identity
    np.testing.assert_array_equal(
        np.asarray(vnn.dropout_apply(key, x, 0.1, train=False)), np.asarray(x)
    )


def test_batchnorm_multi_step_fuzz(rng):
    """Random shapes × several train steps of running-stat accumulation,
    then eval — the BN lifecycle a whole training run exercises — must track
    torch step for step (biased batch norm, unbiased running var,
    momentum 0.1; SURVEY hard-part #1)."""
    for trial in range(10):
        n = int(rng.integers(2, 40))
        d = int(rng.integers(1, 70))
        steps = int(rng.integers(1, 6))
        tbn = torch.nn.BatchNorm1d(d)
        with torch.no_grad():
            tbn.weight.copy_(torch.from_numpy(rng.random(d).astype(np.float32) + 0.5))
            tbn.bias.copy_(torch.from_numpy(rng.random(d).astype(np.float32) - 0.5))
        params = {
            "gamma": jnp.asarray(tbn.weight.detach().numpy()),
            "beta": jnp.asarray(tbn.bias.detach().numpy()),
        }
        state = {
            "mean": jnp.asarray(tbn.running_mean.numpy().copy()),
            "var": jnp.asarray(tbn.running_var.numpy().copy()),
        }
        tbn.train(True)
        for _ in range(steps):
            x = (rng.normal(size=(n, d)) * rng.uniform(0.1, 5) + rng.normal()).astype(
                np.float32
            )
            want = tbn(torch.from_numpy(x)).detach().numpy()
            got, state = vnn.batchnorm_apply(params, state, jnp.asarray(x), train=True)
            np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
        tbn.train(False)
        xe = rng.normal(size=(n, d)).astype(np.float32)
        want = tbn(torch.from_numpy(xe)).detach().numpy()
        got, _ = vnn.batchnorm_apply(params, state, jnp.asarray(xe), train=False)
        np.testing.assert_allclose(
            np.asarray(got), want, atol=1e-4,
            err_msg=f"trial {trial} n={n} d={d} steps={steps}",
        )
        np.testing.assert_allclose(
            np.asarray(state["mean"]), tbn.running_mean.numpy(), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(state["var"]), tbn.running_var.numpy(), atol=1e-4
        )
