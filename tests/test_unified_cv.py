"""Family-unified directional tasks (VERDICT r2 #5).

The CV harness compiles one vmapped fold-population program per (direction,
family) — four programs whose compiles dominate its wall. The ``*_unified``
tasks collapse each direction's (vae, ae) pair into ONE program selected per
member by ``state["kl_on"]``. These tests pin the equivalence claims that
make the collapse sound:

  * kl_on=1 is BIT-identical to the plain directional VAE task (eps·1.0 and
    β·1.0 are IEEE-exact) — reference parity of the VAE family is untouched;
  * kl_on=0 is deterministic (z = mu exactly) with zero gradient to the
    logvar heads — the reference AE's math on the VAE's param tree
    (identical trunk; the mu head is the AE latent projection; mean-of-mus
    fusion ≡ mean-of-latents when z = mu).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.dataset import MultiModalArrays
from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
from vae_los_angeles_tpu.parallel import vmap_meta
from vae_los_angeles_tpu.training.tasks import TASKS

DIM_A, DIM_B, N_SITES = 21, 29, 4
CFG = Config(input_dim_a=DIM_A, input_dim_b=DIM_B, latent_dim=6, batch_size=16)


def _arrays(n=160, seed=0):
    tpm, beta, site = generate_synthetic_arrays(
        n_samples=n, dim_a=DIM_A, dim_b=DIM_B, n_sites=N_SITES, seed=seed
    )
    return MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta), jnp.asarray(site))


def _folds(arr, n_folds=2, n_train=64, n_val=16):
    trs, vas = [], []
    for f in range(n_folds):
        base = f * (n_train + n_val)
        trs.append(arr.take(jnp.arange(base, base + n_train)))
        vas.append(arr.take(jnp.arange(base + n_train, base + n_train + n_val)))
    return trs, vas


def test_unified_vae_half_bit_matches_standalone_vae():
    """Folds 0..F-1 of the unified population (kl_on=1, same key rows) must
    reproduce the standalone VAE fold population bit for bit — the unified
    program cannot perturb the reference-parity family."""
    arr = _arrays()
    trs, vas = _folds(arr)
    key = jax.random.PRNGKey(3)
    standalone = vmap_meta.fit_folds(
        "rna2dna", CFG, trs, vas, key, N_SITES, num_epochs=4
    )
    fold_keys = jax.random.split(key, len(trs))
    unified = vmap_meta.fit_folds(
        "rna2dna_unified", CFG, trs * 2, vas * 2, key, N_SITES, num_epochs=4,
        keys=jnp.concatenate([fold_keys, fold_keys]),
        state_overrides={"kl_on": np.asarray([1.0, 1.0, 0.0, 0.0], np.float32)},
    )
    for f in range(len(trs)):
        np.testing.assert_array_equal(
            np.asarray(standalone[f].val_losses),
            np.asarray(unified[f].val_losses),
        )
        jax.tree.map(
            np.testing.assert_array_equal,
            standalone[f].params, unified[f].params,
        )


def test_unified_ae_member_deterministic_and_logvar_inert():
    """kl_on=0: the forward is deterministic (two different keys, identical
    eval predictions — z = mu exactly) and the logvar heads get exactly-0
    gradients through the training loss."""
    arr = _arrays(seed=1)
    batch = arr.take(jnp.arange(32))
    task = TASKS["rna2dna_unified"]
    key = jax.random.PRNGKey(5)
    params, state = task.init(key, CFG, N_SITES)
    state["kl_on"] = jnp.float32(0.0)

    p1 = task.predict(params, state, jax.random.PRNGKey(1), batch)
    p2 = task.predict(params, state, jax.random.PRNGKey(2), batch)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def loss_fn(p):
        total, _ = task.loss(
            p, state, key, batch, jnp.float32(1e-3), jnp.float32(1.0),
            None, True,
        )
        return total

    grads = jax.grad(loss_fn)(params)
    for enc in ("encoder_rna", "encoder_site"):
        np.testing.assert_array_equal(
            np.asarray(grads[enc]["logvar"]["w"]), 0.0,
            err_msg=f"{enc}.logvar.w must be inert at kl_on=0",
        )
        np.testing.assert_array_equal(
            np.asarray(grads[enc]["logvar"]["b"]), 0.0
        )
    # sanity: the mu heads (the AE latent projection) DO train
    assert np.abs(np.asarray(grads["encoder_rna"]["mu"]["w"])).max() > 0

    # and with kl_on=1 the same predict is stochastic (a VAE again)
    state["kl_on"] = jnp.float32(1.0)
    s1 = task.predict(params, state, jax.random.PRNGKey(1), batch)
    s2 = task.predict(params, state, jax.random.PRNGKey(2), batch)
    assert np.abs(np.asarray(s1) - np.asarray(s2)).max() > 0


def test_unified_ae_quality_tracks_standalone_ae():
    """The unified AE member is the standalone AE's math on a different
    param naming/key layout — trained on the same folds it must land in the
    same quality regime (not bit-equal: init draws and dropout streams
    differ)."""
    arr = _arrays(seed=2)
    trs, vas = _folds(arr)
    key = jax.random.PRNGKey(7)
    standalone = vmap_meta.fit_folds(
        "dna2rna_ae", CFG, trs, vas, key, N_SITES, num_epochs=6
    )
    fold_keys = jax.random.split(key, len(trs))
    unified = vmap_meta.fit_folds(
        "dna2rna_unified", CFG, trs * 2, vas * 2, key, N_SITES, num_epochs=6,
        keys=jnp.concatenate([fold_keys, fold_keys]),
        state_overrides={"kl_on": np.asarray([1.0, 1.0, 0.0, 0.0], np.float32)},
    )
    for f in range(len(trs)):
        sa = float(standalone[f].best_val_loss)
        un = float(unified[len(trs) + f].best_val_loss)
        assert np.isfinite(sa) and np.isfinite(un)
        assert 0.5 < un / sa < 2.0, (
            f"fold {f}: unified-AE val loss {un:.2f} vs standalone {sa:.2f}"
        )


def test_fit_folds_state_overrides_unknown_key_rejected():
    arr = _arrays(seed=3)
    trs, vas = _folds(arr)
    try:
        vmap_meta.fit_folds(
            "rna2dna", CFG, trs, vas, jax.random.PRNGKey(0), N_SITES,
            num_epochs=1,
            state_overrides={"bogus": np.zeros(2, np.float32)},
        )
    except ValueError as e:
        assert "bogus" in str(e)
    else:
        raise AssertionError("unknown state override must be rejected")
