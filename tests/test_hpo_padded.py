"""Padded-latent HPO (SURVEY hard-part #4, "pad latent to max and mask").

The claim being enforced: a trial trained at a PADDED latent width L with a
0/1 mask keeping k dims is EXACTLY the k-dim model on its live slices —
masked dims contribute 0 loss, 0 KL and 0 gradient (models/vae.py), so the
live trajectory is independent of the masked parameter slices, and an
all-ones mask is bit-identical to the unmasked task.

Note on what is NOT tested: a padded-k trial vs a freshly-initialized
unpadded-k model are not bit-comparable — ``jax.random`` draws depend on the
array shapes (the eps draw is (batch, L) vs (batch, k), and init splits
differ), so their realizations differ even though the distributions match
after `_padded_carry`'s fan-in rescale. The exact statements proved here
(all-ones identity + masked-slice inertness + exact-0 KL/grad + rescale
bounds) are the full mask-math contract those draws sit on top of.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.evaluation import hpo
from vae_los_angeles_tpu.models import vae
from vae_los_angeles_tpu.training import engine
from vae_los_angeles_tpu.training.tasks import TASKS

DIM_A, DIM_B, N_SITES = 11, 13, 3
CFG = Config(input_dim_a=DIM_A, input_dim_b=DIM_B, latent_dim=8, batch_size=16)


def _arrays(n=96, seed=0):
    tpm, beta, site = generate_synthetic_arrays(
        n_samples=n, dim_a=DIM_A, dim_b=DIM_B, n_sites=N_SITES, seed=seed
    )
    return MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta), jnp.asarray(site))


def _split(arr, n_train=64):
    n = len(arr)
    return arr.take(jnp.arange(n_train)), arr.take(jnp.arange(n_train, n))


def _masked_slices(params, k):
    """Every parameter slice the width-k mask must make inert: the mu/logvar
    head output columns [k:] of all three encoders and the fc1 input rows
    [k:] of all three decoders (linear w is stored (in, out), ops/nn.py)."""
    out = {}
    for enc in ("encoder_a", "encoder_b", "encoder_c"):
        for head in ("mu", "logvar"):
            out[f"{enc}.{head}.w"] = params[enc][head]["w"][:, k:]
            out[f"{enc}.{head}.b"] = params[enc][head]["b"][k:]
    for dec in ("decoder_a", "decoder_b", "decoder_c"):
        out[f"{dec}.fc1.w"] = params[dec]["fc1"]["w"][k:, :]
    return out


def _live_slices(params, k):
    out = {}
    for enc in ("encoder_a", "encoder_b", "encoder_c"):
        for head in ("mu", "logvar"):
            out[f"{enc}.{head}.w"] = params[enc][head]["w"][:, :k]
            out[f"{enc}.{head}.b"] = params[enc][head]["b"][:k]
    for dec in ("decoder_a", "decoder_b", "decoder_c"):
        out[f"{dec}.fc1.w"] = params[dec]["fc1"]["w"][:k, :]
    return out


def test_all_ones_mask_bit_identical_to_unmasked():
    """multimodal_padded with its default all-ones mask must train
    bit-identically to the plain multimodal task (mask multiply by 1.0 is
    IEEE-exact), including the final parameters."""
    arr = _arrays(seed=1)
    tr, va = _split(arr)
    key = jax.random.PRNGKey(5)
    p0, s0 = TASKS["multimodal"].init(key, CFG, N_SITES)
    pp, sp = TASKS["multimodal_padded"].init(key, CFG, N_SITES)
    # identical init draws; padded adds only the mask
    jax.tree.map(np.testing.assert_array_equal, p0, pp)
    assert set(sp) == set(s0) | {"latent_mask"}
    np.testing.assert_array_equal(np.asarray(sp["latent_mask"]), 1.0)

    cw = np.ones(N_SITES, np.float32)
    plain = engine.fit("multimodal", CFG, tr, va, key, N_SITES,
                       num_epochs=4, class_weights=cw,
                       init_params=p0, init_state=s0)
    padded = engine.fit("multimodal_padded", CFG, tr, va, key, N_SITES,
                        num_epochs=4, class_weights=cw,
                        init_params=pp, init_state=sp)
    np.testing.assert_array_equal(np.asarray(plain.train_losses),
                                  np.asarray(padded.train_losses))
    np.testing.assert_array_equal(np.asarray(plain.val_losses),
                                  np.asarray(padded.val_losses))
    jax.tree.map(np.testing.assert_array_equal, plain.params, padded.params)


def test_masked_dims_exact_zero_kl_and_gradient():
    """Width-k mask: masked posterior dims are exactly 0 (hence 0 KL:
    −½(1+0−0−e⁰)=0) and every masked parameter slice gets an exactly-0
    gradient through the full tri-modal training loss."""
    k, L = 3, CFG.latent_dim
    arr = _arrays(seed=2)
    key = jax.random.PRNGKey(9)
    params, state = TASKS["multimodal_padded"].init(key, CFG, N_SITES)
    state["latent_mask"] = jnp.asarray([1.0] * k + [0.0] * (L - k))

    batch = arr.take(jnp.arange(32))
    out = vae.multimodal_vae_apply(
        params, state, key, a=batch.tpm, b=batch.beta, site=batch.site,
        train=True, latent_mask=state["latent_mask"],
    )
    np.testing.assert_array_equal(np.asarray(out.mu[:, k:]), 0.0)
    np.testing.assert_array_equal(np.asarray(out.logvar[:, k:]), 0.0)

    cw = jnp.ones(N_SITES, jnp.float32)

    def loss_fn(p):
        total, _ = TASKS["multimodal_padded"].loss(
            p, state, key, batch, jnp.float32(1e-3), jnp.float32(1.0), cw, True
        )
        return total

    grads = jax.grad(loss_fn)(params)
    for name, g in _masked_slices(grads, k).items():
        np.testing.assert_array_equal(
            np.asarray(g), 0.0, err_msg=f"nonzero grad in masked slice {name}"
        )
    # sanity: the live slices DO receive gradient
    live = _live_slices(grads, k)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in live.values())


def test_masked_param_slices_are_trajectory_inert():
    """Two padded fits whose masked parameter slices differ (live slices and
    everything else identical) must produce bit-identical loss trajectories
    and bit-identical live slices of the final params — the whole-trajectory
    form of the 0-gradient claim, through AdamW, plateau LR and best-snapshot
    logic. (Masked slices themselves drift apart via decoupled weight decay,
    which is exactly why only live slices are compared.)"""
    k = 3
    arr = _arrays(seed=3)
    tr, va = _split(arr)
    key = jax.random.PRNGKey(7)
    params_a, state = TASKS["multimodal_padded"].init(key, CFG, N_SITES)
    state["latent_mask"] = jnp.asarray([1.0] * k + [0.0] * (CFG.latent_dim - k))

    params_b = jax.tree.map(jnp.array, params_a)
    for enc in ("encoder_a", "encoder_b", "encoder_c"):
        for head in ("mu", "logvar"):
            w = params_b[enc][head]["w"]
            params_b[enc][head]["w"] = w.at[:, k:].set(w[:, k:] * 3.0 + 0.5)
            b = params_b[enc][head]["b"]
            params_b[enc][head]["b"] = b.at[k:].set(b[k:] - 2.0)
    for dec in ("decoder_a", "decoder_b", "decoder_c"):
        w = params_b[dec]["fc1"]["w"]
        params_b[dec]["fc1"]["w"] = w.at[k:, :].set(w[k:, :] * -5.0 + 1.0)

    cw = np.ones(N_SITES, np.float32)
    fits = [
        engine.fit("multimodal_padded", CFG, tr, va, key, N_SITES,
                   num_epochs=5, class_weights=cw,
                   init_params=p, init_state=state)
        for p in (params_a, params_b)
    ]
    np.testing.assert_array_equal(np.asarray(fits[0].train_losses),
                                  np.asarray(fits[1].train_losses))
    np.testing.assert_array_equal(np.asarray(fits[0].val_losses),
                                  np.asarray(fits[1].val_losses))
    live0 = _live_slices(fits[0].params, k)
    live1 = _live_slices(fits[1].params, k)
    for name in live0:
        np.testing.assert_array_equal(
            np.asarray(live0[name]), np.asarray(live1[name]),
            err_msg=f"live slice {name} diverged",
        )


def test_padded_carry_rescale_and_masks():
    """_padded_carry: trials at the full width get the vanilla init
    bit-for-bit (scale = √(L/L) = 1.0 exactly); padded trials get decoder
    fc1 weights re-bounded to their TRUE fan-in (|w| ≤ 1/√k, the
    torch.nn.Linear bound an unpadded k-latent model would draw), and each
    trial's mask keeps exactly its first `latent_dim` dims."""
    L = CFG.latent_dim
    keys = hpo._trial_keys(0, [0, 1])
    lrs = np.asarray([1e-3, 1e-3], np.float32)
    k = 3
    carry = hpo._padded_carry(CFG, N_SITES, keys, lrs, [L, k])

    masks = np.asarray(carry["state"]["latent_mask"])
    np.testing.assert_array_equal(masks[0], 1.0)
    np.testing.assert_array_equal(masks[1], [1.0] * k + [0.0] * (L - k))
    np.testing.assert_array_equal(
        masks, np.asarray(carry["best"]["state"]["latent_mask"])
    )

    # trial 0 (true width = padded width): bit-equal to the vanilla init
    p_ref, _ = TASKS["multimodal"].init(jnp.asarray(keys[0]), CFG, N_SITES)
    for dec in ("decoder_a", "decoder_b", "decoder_c"):
        np.testing.assert_array_equal(
            np.asarray(carry["params"][dec]["fc1"]["w"][0]),
            np.asarray(p_ref[dec]["fc1"]["w"]),
        )
    # trial 1 (padded L→k): rescaled bound is 1/√k, and actually used
    for dec in ("decoder_a", "decoder_b", "decoder_c"):
        w = np.asarray(carry["params"][dec]["fc1"]["w"][1])
        bound = 1.0 / np.sqrt(k)
        assert np.abs(w).max() <= bound * (1 + 1e-6)
        assert np.abs(w).max() > bound * 0.8  # would fail at the unscaled 1/√L


def test_run_vmapped_pad_shapes_singleton_buckets_match_unpadded():
    """pad_shapes=True with every bucket a singleton (distinct embed_dims)
    degenerates to mask=all-ones at each trial's own width — values must be
    BIT-identical to the unpadded path (same trial keys, all-ones identity,
    scale=1 rescale)."""
    arr = _arrays(seed=4)
    tr, va = _split(arr)
    trials = [
        dict(latent_dim=5, embed_dim=4, learning_rate=1e-3,
             weight_decay=1e-5, beta_start=1e-3, gamma=1.0),
        dict(latent_dim=7, embed_dim=8, learning_rate=3e-4,
             weight_decay=1e-6, beta_start=5e-4, gamma=2.0),
    ]
    cfg = CFG
    results = {}
    for pad in (False, True):
        values, pruned = hpo.run_vmapped(
            cfg, [dict(t) for t in trials], tr, va, N_SITES, None,
            num_epochs=3, seed=0, prune_rungs=1, pad_shapes=pad,
        )
        assert (pruned == -1).all()
        assert np.isfinite(values).all()
        results[pad] = values
    np.testing.assert_array_equal(results[False], results[True])


def test_run_vmapped_pad_shapes_composes_with_pruning():
    """One shared-embed bucket of 4 trials with DIFFERENT latent widths,
    prune_rungs=2: the heterogeneous population trains as ONE program, the
    median rule prunes at the rung boundary, and survivors' masks thread
    through the sliced carry into the continuation rung."""
    arr = _arrays(seed=5)
    tr, va = _split(arr)
    trials = [
        dict(latent_dim=ld, embed_dim=4, learning_rate=lr,
             weight_decay=1e-5, beta_start=1e-3, gamma=1.0)
        for ld, lr in [(3, 1e-3), (8, 3e-4), (5, 1e-3), (6, 3e-9)]
    ]
    values, pruned_at = hpo.run_vmapped(
        CFG, trials, tr, va, N_SITES, None,
        num_epochs=4, seed=0, prune_rungs=2, pad_shapes=True,
    )
    assert np.isfinite(values).all()
    survivors = pruned_at == -1
    assert survivors.any(), "median pruning can never drop every trial"
    dropped = ~survivors
    assert dropped.any(), "a strict median rule on 4 distinct losses prunes"
    assert (pruned_at[dropped] == 2).all()  # the rung boundary


def test_mask_under_bfloat16_policy():
    """ADVICE r2 follow-up: the mask is cast to the activation dtype at the
    point of use (models/vae.py), so it composes with the mixed-precision
    policy. Note the policy itself is already upcast-proof: ``linear_apply``
    re-casts its input to the WEIGHT's dtype at every dot (ops/nn.py:48), so
    even an fp32 z cannot silently de-bf16 the decoder matmuls. What must
    hold under COMPUTE_DTYPE=bfloat16 is the same exact mask contract as
    fp32: all-ones mask ≡ unmasked, bit for bit, through a whole fit."""
    arr = _arrays(seed=6)
    tr, va = _split(arr)
    key = jax.random.PRNGKey(12)
    cfg = CFG.replace(compute_dtype="bfloat16")
    p0, s0 = TASKS["multimodal"].init(key, cfg, N_SITES)
    pp, sp = TASKS["multimodal_padded"].init(key, cfg, N_SITES)
    cw = np.ones(N_SITES, np.float32)
    plain = engine.fit("multimodal", cfg, tr, va, key, N_SITES,
                       num_epochs=3, class_weights=cw,
                       init_params=p0, init_state=s0)
    padded = engine.fit("multimodal_padded", cfg, tr, va, key, N_SITES,
                        num_epochs=3, class_weights=cw,
                        init_params=pp, init_state=sp)
    np.testing.assert_array_equal(np.asarray(plain.val_losses),
                                  np.asarray(padded.val_losses))


def test_pad_shapes_cli_guards():
    """--pad-shapes is vmapped-only and replaces bucketed sampling — the
    CLI rejects the silent-no-op combinations instead of ignoring them."""
    import pytest

    with pytest.raises(SystemExit):
        hpo.main(["--mode", "optuna", "--pad-shapes"])
    with pytest.raises(SystemExit):
        hpo.main(["--pad-shapes", "--bucket-size", "4"])
