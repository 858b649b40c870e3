"""AdamW and scheduler parity vs torch.optim."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vae_los_angeles_tpu.ops import optim


def test_adamw_matches_torch(rng):
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    b0 = rng.normal(size=(3,)).astype(np.float32)
    x = rng.normal(size=(16, 5)).astype(np.float32)
    y = rng.normal(size=(16, 3)).astype(np.float32)
    lr, wd = 5e-4, 1e-5

    tw = torch.tensor(w0, requires_grad=True)
    tb = torch.tensor(b0, requires_grad=True)
    topt = torch.optim.AdamW([tw, tb], lr=lr, weight_decay=wd)

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    state = optim.adamw_init(params)

    def loss_fn(p):
        pred = jnp.dot(x, p["w"]) + p["b"]
        return jnp.sum(jnp.square(pred - y))

    grad_fn = jax.grad(loss_fn)
    for _ in range(25):
        topt.zero_grad()
        tloss = ((torch.from_numpy(x) @ tw + tb - torch.from_numpy(y)) ** 2).sum()
        tloss.backward()
        topt.step()
        grads = grad_fn(params)
        params, state = optim.adamw_update(params, grads, state, lr, wd)

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(), atol=1e-5)


def test_plateau_matches_torch():
    factor, patience = 0.5, 5
    lr0 = 5e-4
    p = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([p], lr=lr0)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, mode="min", factor=factor, patience=patience
    )
    state = optim.plateau_init(lr0)

    # metric trace: improves, stalls long enough to trigger two reductions
    trace = [10.0, 9.0, 8.5] + [8.5] * 8 + [8.4999] + [9.0] * 9 + [1.0, 1.0]
    for m in trace:
        tsched.step(m)
        state = optim.plateau_step(
            state, jnp.float32(m), jnp.float32(factor), jnp.int32(patience)
        )
        np.testing.assert_allclose(
            float(state["lr"]), topt.param_groups[0]["lr"], rtol=1e-6
        ), f"mismatch at metric {m}"


def test_early_stop_state_machine():
    patience = 3
    state = optim.early_stop_init()
    vals = [5.0, 4.0, 4.5, 4.6, 4.7, 4.8, 3.0]
    snapshots = []
    for i, v in enumerate(vals):
        state, snap = optim.early_stop_step(
            state, jnp.float32(v), jnp.int32(i), jnp.int32(patience)
        )
        snapshots.append(bool(snap))
    # improves at 0,1; then 3 bad epochs → stopped before the 3.0 arrives
    assert snapshots[:2] == [True, True]
    assert bool(state["stopped"])
    assert float(state["best_val"]) == 4.0
    assert int(state["best_epoch"]) == 1
    # after stopping, no further snapshots even on improvement
    assert snapshots[-1] is False
