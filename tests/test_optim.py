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


def test_adafactor_matches_hf_oracle(rng):
    """Factored (2-D), full (1-D) and 3-D leaves vs the live
    transformers.optimization.Adafactor in its recommended external-lr
    configuration (scale_parameter=False, relative_step=False, beta1=None) —
    the semantics adafactor_update documents."""
    import pytest

    pytest.importorskip(
        "transformers", reason="live Adafactor oracle needs transformers"
    )
    from transformers.optimization import Adafactor

    w0 = rng.normal(size=(7, 4)).astype(np.float32)
    e0 = rng.normal(size=(3, 5, 2)).astype(np.float32)  # 3-D: leading batch
    b0 = rng.normal(size=(4,)).astype(np.float32)
    x = rng.normal(size=(16, 7)).astype(np.float32)
    y = rng.normal(size=(16, 4)).astype(np.float32)
    lr, wd = 1e-3, 1e-2

    tw = torch.tensor(w0, requires_grad=True)
    te = torch.tensor(e0, requires_grad=True)
    tb = torch.tensor(b0, requires_grad=True)
    topt = Adafactor(
        [tw, te, tb], lr=lr, weight_decay=wd, beta1=None,
        scale_parameter=False, relative_step=False, warmup_init=False,
    )

    params = {"w": jnp.asarray(w0), "e": jnp.asarray(e0), "b": jnp.asarray(b0)}
    state = optim.adafactor_init(params)
    assert state["vr"]["w"].shape == (7,)
    assert state["vc"]["w"].shape == (4,)
    assert state["vr"]["e"].shape == (3, 5)
    assert state["vc"]["e"].shape == (3, 2)
    assert state["vr"]["b"].shape == (4,)  # 1-D: full second moment

    def loss_fn(p):
        pred = jnp.dot(x, p["w"]) + p["b"]
        return jnp.sum(jnp.square(pred - y)) + jnp.sum(jnp.square(p["e"]))

    grad_fn = jax.grad(loss_fn)
    for _ in range(25):
        topt.zero_grad()
        tloss = ((torch.from_numpy(x) @ tw + tb - torch.from_numpy(y)) ** 2).sum()
        tloss = tloss + (te**2).sum()
        tloss.backward()
        topt.step()
        grads = grad_fn(params)
        params, state = optim.adafactor_update(params, grads, state, lr, wd)

    for k, t in (("w", tw), ("e", te), ("b", tb)):
        np.testing.assert_allclose(
            np.asarray(params[k]), t.detach().numpy(), atol=2e-5, err_msg=k
        )


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


def test_plateau_matches_torch_fuzz(rng):
    """40 random metric traces (drifts, plateaus, spikes, exact ties) must
    reproduce torch ReduceLROnPlateau's LR trajectory step for step."""
    factor, patience = 0.5, 5
    lr0 = 5e-4
    for trial in range(40):
        n = int(rng.integers(5, 40))
        # random walk with occasional exact repeats (plateau ties) and spikes
        trace = np.round(rng.normal(10.0, 2.0, size=n), 2)
        for i in range(1, n):
            r = rng.random()
            if r < 0.35:
                trace[i] = trace[i - 1]  # exact tie — threshold-mode edge
            elif r < 0.45:
                trace[i] = trace[i - 1] + 5.0  # spike

        p = torch.nn.Parameter(torch.zeros(1))
        topt = torch.optim.SGD([p], lr=lr0)
        tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            topt, mode="min", factor=factor, patience=patience
        )
        state = optim.plateau_init(lr0)
        for step, m in enumerate(trace):
            tsched.step(float(m))
            state = optim.plateau_step(
                state, jnp.float32(m), jnp.float32(factor), jnp.int32(patience)
            )
            np.testing.assert_allclose(
                float(state["lr"]),
                topt.param_groups[0]["lr"],
                rtol=1e-6,
                err_msg=f"trial {trial} step {step} trace {trace[:step+1]}",
            )


def test_early_stop_matches_reference_loop_fuzz(rng):
    """Random val-loss traces against a literal transcription of the
    reference's early-stop bookkeeping (train_rna2dna.py:225-237: strict
    improvement saves + resets the counter, else counter += 1, break when
    counter >= patience)."""
    for trial in range(40):
        patience = int(rng.integers(1, 6))
        n = int(rng.integers(3, 30))
        vals = np.round(rng.normal(5.0, 1.0, size=n), 2)
        for i in range(1, n):
            if rng.random() < 0.3:
                vals[i] = vals[i - 1]  # tie: NOT an improvement

        # reference loop
        best, counter, stopped_at, ref_snaps = np.inf, 0, None, []
        for i, v in enumerate(vals):
            if stopped_at is not None:
                ref_snaps.append(False)
                continue
            if v < best:
                best, counter = v, 0
                ref_snaps.append(True)
            else:
                counter += 1
                ref_snaps.append(False)
                if counter >= patience:
                    stopped_at = i

        state = optim.early_stop_init()
        got_snaps = []
        for i, v in enumerate(vals):
            state, snap = optim.early_stop_step(
                state, jnp.float32(v), jnp.int32(i), jnp.int32(patience)
            )
            got_snaps.append(bool(snap))
        assert got_snaps == ref_snaps, (
            f"trial {trial} patience {patience} vals {vals}"
        )
        assert bool(state["stopped"]) == (stopped_at is not None)
        if np.isfinite(best):
            np.testing.assert_allclose(float(state["best_val"]), best)


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


def test_adamw_hyperparam_fuzz(rng):
    """AdamW parity vs torch across random lr/weight-decay combinations
    (incl. wd=0 and large-wd regimes where the decoupled-decay order shows)."""
    for trial in range(6):
        lr = float(10.0 ** rng.uniform(-5, -2))
        wd = 0.0 if trial == 0 else float(10.0 ** rng.uniform(-6, -1))
        w0 = rng.normal(size=(4, 6)).astype(np.float32)
        x = rng.normal(size=(8, 4)).astype(np.float32)
        y = rng.normal(size=(8, 6)).astype(np.float32)

        tw = torch.tensor(w0, requires_grad=True)
        topt = torch.optim.AdamW([tw], lr=lr, weight_decay=wd)
        params = {"w": jnp.asarray(w0)}
        state = optim.adamw_init(params)
        grad_fn = jax.grad(lambda p: jnp.sum(jnp.square(x @ p["w"] - y)))
        for _ in range(15):
            topt.zero_grad()
            ((torch.from_numpy(x) @ tw - torch.from_numpy(y)) ** 2).sum().backward()
            topt.step()
            params, state = optim.adamw_update(params, grad_fn(params), state, lr, wd)
        np.testing.assert_allclose(
            np.asarray(params["w"]), tw.detach().numpy(), atol=1e-5,
            err_msg=f"trial {trial} lr={lr} wd={wd}",
        )
