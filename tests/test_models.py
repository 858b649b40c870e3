"""Forward-pass parity of the JAX models vs torch oracles built to the
reference architecture (SURVEY §2: encoders.py / decoders.py / vae.py /
directional_vae.py / directional_ae.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from vae_los_angeles_tpu.models import (
    dna2rna_ae_apply,
    dna2rna_ae_init,
    dna2rna_vae_apply,
    dna2rna_vae_init,
    multimodal_vae_apply,
    multimodal_vae_init,
    reparameterize,
    rna2dna_ae_apply,
    rna2dna_ae_init,
    rna2dna_vae_apply,
    rna2dna_vae_init,
)
from vae_los_angeles_tpu.models.decoders import (
    decoder_a_apply,
    decoder_b_apply,
    decoder_c_apply,
)
from vae_los_angeles_tpu.models.encoders import (
    encoder_a_apply,
    encoder_b_apply,
    encoder_c_apply,
)

DIM_A, DIM_B, N_SITES, LATENT, EMBED = 23, 37, 5, 6, 8


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _copy_linear(torch_linear, params):
    with torch.no_grad():
        torch_linear.weight.copy_(_t(params["w"]).T)
        torch_linear.bias.copy_(_t(params["b"]))


class TorchEncoderA(tnn.Module):
    def __init__(self, input_dim, latent_dim):
        super().__init__()
        self.fc = tnn.Sequential(
            tnn.Linear(input_dim, 128), tnn.BatchNorm1d(128), tnn.ReLU(), tnn.Dropout(0.1)
        )
        self.fc_mu = tnn.Linear(128, latent_dim)
        self.fc_logvar = tnn.Linear(128, latent_dim)

    def forward(self, x):
        h = self.fc(x)
        return self.fc_mu(h), self.fc_logvar(h)


class TorchEncoderB(tnn.Module):
    def __init__(self, input_dim, latent_dim):
        super().__init__()
        self.fc = tnn.Sequential(
            tnn.Linear(input_dim, 512),
            tnn.BatchNorm1d(512),
            tnn.ReLU(),
            tnn.Dropout(0.1),
            tnn.Linear(512, 256),
            tnn.BatchNorm1d(256),
            tnn.ReLU(),
            tnn.Dropout(0.1),
        )
        self.fc_mu = tnn.Linear(256, latent_dim)
        self.fc_logvar = tnn.Linear(256, latent_dim)

    def forward(self, x):
        h = self.fc(x.view(x.size(0), -1))
        return self.fc_mu(h), self.fc_logvar(h)


def test_encoder_a_parity(rng):
    from vae_los_angeles_tpu.models.encoders import encoder_a_init

    params, state = encoder_a_init(jax.random.PRNGKey(0), DIM_A, LATENT)
    t = TorchEncoderA(DIM_A, LATENT).eval()
    _copy_linear(t.fc[0], params["fc"])
    with torch.no_grad():
        t.fc[1].weight.copy_(_t(params["bn"]["gamma"]))
        t.fc[1].bias.copy_(_t(params["bn"]["beta"]))
    _copy_linear(t.fc_mu, params["mu"])
    _copy_linear(t.fc_logvar, params["logvar"])

    x = rng.normal(size=(9, DIM_A)).astype(np.float32)
    mu, logvar, _ = encoder_a_apply(params, state, jnp.asarray(x), train=False)
    tmu, tlogvar = t(_t(x))
    np.testing.assert_allclose(np.asarray(mu), tmu.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar), tlogvar.detach().numpy(), atol=2e-5)


def test_encoder_b_parity(rng):
    from vae_los_angeles_tpu.models.encoders import encoder_b_init

    params, state = encoder_b_init(jax.random.PRNGKey(1), DIM_B, LATENT)
    t = TorchEncoderB(DIM_B, LATENT).eval()
    _copy_linear(t.fc[0], params["fc1"])
    _copy_linear(t.fc[4], params["fc2"])
    with torch.no_grad():
        t.fc[1].weight.copy_(_t(params["bn1"]["gamma"]))
        t.fc[1].bias.copy_(_t(params["bn1"]["beta"]))
        t.fc[5].weight.copy_(_t(params["bn2"]["gamma"]))
        t.fc[5].bias.copy_(_t(params["bn2"]["beta"]))
    _copy_linear(t.fc_mu, params["mu"])
    _copy_linear(t.fc_logvar, params["logvar"])

    x = rng.normal(size=(9, DIM_B)).astype(np.float32)
    mu, logvar, _ = encoder_b_apply(params, state, jnp.asarray(x), train=False)
    tmu, tlogvar = t(_t(x))
    np.testing.assert_allclose(np.asarray(mu), tmu.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logvar), tlogvar.detach().numpy(), atol=2e-5)


def test_decoders_parity(rng):
    from vae_los_angeles_tpu.models.decoders import (
        decoder_a_init,
        decoder_b_init,
        decoder_c_init,
    )

    z = rng.normal(size=(9, LATENT)).astype(np.float32)

    pa = decoder_a_init(jax.random.PRNGKey(2), LATENT, DIM_A)
    ta = tnn.Sequential(tnn.Linear(LATENT, 128), tnn.ReLU(), tnn.Linear(128, DIM_A))
    _copy_linear(ta[0], pa["fc1"])
    _copy_linear(ta[2], pa["fc2"])
    np.testing.assert_allclose(
        np.asarray(decoder_a_apply(pa, jnp.asarray(z))),
        ta(_t(z)).detach().numpy(),
        atol=2e-5,
    )

    pb = decoder_b_init(jax.random.PRNGKey(3), LATENT, DIM_B)
    tb = tnn.Sequential(
        tnn.Linear(LATENT, 256),
        tnn.ReLU(),
        tnn.Linear(256, 512),
        tnn.ReLU(),
        tnn.Linear(512, DIM_B),
        tnn.Sigmoid(),
    )
    _copy_linear(tb[0], pb["fc1"])
    _copy_linear(tb[2], pb["fc2"])
    _copy_linear(tb[4], pb["fc3"])
    np.testing.assert_allclose(
        np.asarray(decoder_b_apply(pb, jnp.asarray(z))),
        tb(_t(z)).detach().numpy(),
        atol=2e-5,
    )

    pc = decoder_c_init(jax.random.PRNGKey(4), LATENT, N_SITES)
    tc = tnn.Sequential(tnn.Linear(LATENT, 64), tnn.ReLU(), tnn.Linear(64, N_SITES))
    _copy_linear(tc[0], pc["fc1"])
    _copy_linear(tc[2], pc["fc2"])
    np.testing.assert_allclose(
        np.asarray(decoder_c_apply(pc, jnp.asarray(z))),
        tc(_t(z)).detach().numpy(),
        atol=2e-5,
    )


def test_reparameterize_stats():
    key = jax.random.PRNGKey(0)
    mu = jnp.full((20000, 4), 2.0)
    logvar = jnp.full((20000, 4), np.log(0.25))  # std = 0.5
    z = reparameterize(key, mu, logvar)
    z_np = np.asarray(z)
    assert np.isclose(z_np.mean(), 2.0, atol=0.02)
    assert np.isclose(z_np.std(), 0.5, atol=0.02)


def test_multimodal_vae_modality_subsets(rng):
    params, state = multimodal_vae_init(
        jax.random.PRNGKey(5), DIM_A, DIM_B, N_SITES, LATENT, EMBED
    )
    a = jnp.asarray(rng.normal(size=(4, DIM_A)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(4, DIM_B)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(4,)))
    key = jax.random.PRNGKey(6)
    for kwargs in (
        dict(a=a),
        dict(b=b),
        dict(site=site),
        dict(a=a, b=b),
        dict(a=a, site=site),
        dict(b=b, site=site),
        dict(a=a, b=b, site=site),
    ):
        out = multimodal_vae_apply(params, state, key, **kwargs)
        assert out.out_a.shape == (4, DIM_A)
        assert out.out_b.shape == (4, DIM_B)
        assert out.out_c.shape == (4, N_SITES)
        assert out.mu.shape == (4, LATENT)
        assert np.all(np.isfinite(np.asarray(out.out_b)))
        assert np.asarray(out.out_b).min() >= 0 and np.asarray(out.out_b).max() <= 1


def test_posterior_fusion_is_arithmetic_mean(rng):
    """Fused mu of (a, site) must equal mean of the single-modality mus."""
    params, state = multimodal_vae_init(
        jax.random.PRNGKey(7), DIM_A, DIM_B, N_SITES, LATENT, EMBED
    )
    a = jnp.asarray(rng.normal(size=(4, DIM_A)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(4,)))
    key = jax.random.PRNGKey(8)
    mu_a = multimodal_vae_apply(params, state, key, a=a).mu
    mu_c = multimodal_vae_apply(params, state, key, site=site).mu
    mu_both = multimodal_vae_apply(params, state, key, a=a, site=site).mu
    np.testing.assert_allclose(
        np.asarray(mu_both), (np.asarray(mu_a) + np.asarray(mu_c)) / 2, atol=1e-6
    )


def test_directional_models_shapes(rng):
    rna = jnp.asarray(rng.normal(size=(4, DIM_A)).astype(np.float32))
    dna = jnp.asarray(rng.uniform(size=(4, DIM_B)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(4,)))
    key = jax.random.PRNGKey(9)

    p, s = rna2dna_vae_init(jax.random.PRNGKey(10), DIM_A, DIM_B, N_SITES, LATENT)
    out = rna2dna_vae_apply(p, s, key, rna=rna, site=site)
    assert out.recon.shape == (4, DIM_B)
    out_nosite = rna2dna_vae_apply(p, s, key, rna=rna)  # site=None path
    assert out_nosite.recon.shape == (4, DIM_B)

    p, s = dna2rna_vae_init(jax.random.PRNGKey(11), DIM_A, DIM_B, N_SITES, LATENT)
    out = dna2rna_vae_apply(p, s, key, dna=dna, site=site)
    assert out.recon.shape == (4, DIM_A)
    out_nosite = dna2rna_vae_apply(p, s, key, dna=dna)
    assert out_nosite.recon.shape == (4, DIM_A)

    p, s = rna2dna_ae_init(jax.random.PRNGKey(12), DIM_A, DIM_B, N_SITES, LATENT)
    out = rna2dna_ae_apply(p, s, key, rna=rna, site=site)
    assert out.recon.shape == (4, DIM_B)
    assert out.latent.shape == (4, LATENT)

    p, s = dna2rna_ae_init(jax.random.PRNGKey(13), DIM_A, DIM_B, N_SITES, LATENT)
    out = dna2rna_ae_apply(p, s, key, dna=dna, site=site)
    assert out.recon.shape == (4, DIM_A)


def test_models_vmap_over_params(rng):
    """Fold/trial-level vmap: a population of models applies in one call."""
    n_pop = 3
    keys = jax.random.split(jax.random.PRNGKey(14), n_pop)
    init = jax.vmap(
        lambda k: rna2dna_vae_init(k, DIM_A, DIM_B, N_SITES, LATENT)
    )
    params, state = init(keys)
    rna = jnp.asarray(rng.normal(size=(4, DIM_A)).astype(np.float32))
    site = jnp.asarray(rng.integers(0, N_SITES, size=(4,)))

    def fwd(p, s, k):
        return rna2dna_vae_apply(p, s, k, rna=rna, site=site).recon

    recons = jax.vmap(fwd)(params, state, jax.random.split(jax.random.PRNGKey(15), n_pop))
    assert recons.shape == (n_pop, 4, DIM_B)
    # different params → different outputs
    assert not np.allclose(np.asarray(recons[0]), np.asarray(recons[1]))


def _copy_embedding(torch_emb, params):
    with torch.no_grad():
        torch_emb.weight.copy_(_t(params["table"]))


def test_rna2dna_vae_full_forward_parity(rng):
    """WHOLE-model integration parity: EncoderA + EncoderC → arithmetic-mean
    posterior fusion, vs a torch assembly of the reference's RNA2DNAVAE
    (directional_vae.py:12-60). The sampled z differs by RNG, so the locked
    contract is the fused (mu, logvar) — the complete deterministic part."""
    params, state = rna2dna_vae_init(
        jax.random.PRNGKey(3), DIM_A, DIM_B, N_SITES, LATENT, EMBED
    )

    enc_rna = TorchEncoderA(DIM_A, LATENT).eval()
    _copy_linear(enc_rna.fc[0], params["encoder_rna"]["fc"])
    with torch.no_grad():
        enc_rna.fc[1].weight.copy_(_t(params["encoder_rna"]["bn"]["gamma"]))
        enc_rna.fc[1].bias.copy_(_t(params["encoder_rna"]["bn"]["beta"]))
    _copy_linear(enc_rna.fc_mu, params["encoder_rna"]["mu"])
    _copy_linear(enc_rna.fc_logvar, params["encoder_rna"]["logvar"])

    emb = tnn.Embedding(N_SITES, EMBED)
    site_mu = tnn.Linear(EMBED, LATENT)
    site_lv = tnn.Linear(EMBED, LATENT)
    _copy_embedding(emb, params["encoder_site"]["embedding"])
    _copy_linear(site_mu, params["encoder_site"]["mu"])
    _copy_linear(site_lv, params["encoder_site"]["logvar"])

    x = rng.normal(size=(11, DIM_A)).astype(np.float32)
    site = rng.integers(0, N_SITES, size=11)

    out = rna2dna_vae_apply(
        params, state, jax.random.PRNGKey(0),
        rna=jnp.asarray(x), site=jnp.asarray(site), train=False,
    )
    with torch.no_grad():
        tmu_r, tlv_r = enc_rna(_t(x))
        e = emb(_t(site))
        tmu = torch.stack([tmu_r, site_mu(e)]).mean(0)
        tlv = torch.stack([tlv_r, site_lv(e)]).mean(0)
    np.testing.assert_allclose(np.asarray(out.mu), tmu.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.logvar), tlv.numpy(), atol=2e-5)

    # site=None path: posterior collapses to the RNA encoder alone
    out_ns = rna2dna_vae_apply(
        params, state, jax.random.PRNGKey(0),
        rna=jnp.asarray(x), site=None, train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_ns.mu), enc_rna(_t(x))[0].detach().numpy(), atol=2e-5
    )


def test_rna2dna_ae_full_recon_parity(rng):
    """The deterministic AE's ENTIRE eval forward (encoder + site projection
    + mean fusion + DecoderB sigmoid) matches the torch reference assembly
    bit-for-tolerance — no sampling, so the full recon is comparable
    (directional_ae.py:10-68)."""
    params, state = rna2dna_ae_init(
        jax.random.PRNGKey(4), DIM_A, DIM_B, N_SITES, LATENT, EMBED
    )

    enc = tnn.Sequential(
        tnn.Linear(DIM_A, 128), tnn.BatchNorm1d(128), tnn.ReLU(),
        tnn.Dropout(0.1), tnn.Linear(128, LATENT),
    ).eval()
    _copy_linear(enc[0], params["enc_fc1"])
    with torch.no_grad():
        enc[1].weight.copy_(_t(params["enc_bn"]["gamma"]))
        enc[1].bias.copy_(_t(params["enc_bn"]["beta"]))
    _copy_linear(enc[4], params["enc_fc2"])

    emb = tnn.Embedding(N_SITES, EMBED)
    proj = tnn.Linear(EMBED, LATENT)
    _copy_embedding(emb, params["site_embedding"])
    _copy_linear(proj, params["site_projection"])

    dec = tnn.Sequential(
        tnn.Linear(LATENT, 256), tnn.ReLU(), tnn.Linear(256, 512), tnn.ReLU(),
        tnn.Linear(512, DIM_B), tnn.Sigmoid(),
    ).eval()
    _copy_linear(dec[0], params["decoder_dna"]["fc1"])
    _copy_linear(dec[2], params["decoder_dna"]["fc2"])
    _copy_linear(dec[4], params["decoder_dna"]["fc3"])

    x = rng.normal(size=(10, DIM_A)).astype(np.float32)
    site = rng.integers(0, N_SITES, size=10)
    out = rna2dna_ae_apply(
        params, state, None, rna=jnp.asarray(x), site=jnp.asarray(site),
        train=False,
    )
    with torch.no_grad():
        latent = torch.stack([enc(_t(x)), proj(emb(_t(site)))]).mean(0)
        want = dec(latent).numpy()
    np.testing.assert_allclose(np.asarray(out.recon), want, atol=2e-5)


def test_multimodal_vae_full_fusion_parity(rng):
    """Tri-modal posterior fusion over all three encoders matches the torch
    reference assembly (vae.py:37-79: stack-mean of available posteriors)."""
    params, state = multimodal_vae_init(
        jax.random.PRNGKey(5), DIM_A, DIM_B, N_SITES, LATENT, EMBED
    )
    enc_a = TorchEncoderA(DIM_A, LATENT).eval()
    _copy_linear(enc_a.fc[0], params["encoder_a"]["fc"])
    with torch.no_grad():
        enc_a.fc[1].weight.copy_(_t(params["encoder_a"]["bn"]["gamma"]))
        enc_a.fc[1].bias.copy_(_t(params["encoder_a"]["bn"]["beta"]))
    _copy_linear(enc_a.fc_mu, params["encoder_a"]["mu"])
    _copy_linear(enc_a.fc_logvar, params["encoder_a"]["logvar"])

    enc_b = TorchEncoderB(DIM_B, LATENT).eval()
    _copy_linear(enc_b.fc[0], params["encoder_b"]["fc1"])
    _copy_linear(enc_b.fc[4], params["encoder_b"]["fc2"])
    with torch.no_grad():
        enc_b.fc[1].weight.copy_(_t(params["encoder_b"]["bn1"]["gamma"]))
        enc_b.fc[1].bias.copy_(_t(params["encoder_b"]["bn1"]["beta"]))
        enc_b.fc[5].weight.copy_(_t(params["encoder_b"]["bn2"]["gamma"]))
        enc_b.fc[5].bias.copy_(_t(params["encoder_b"]["bn2"]["beta"]))
    _copy_linear(enc_b.fc_mu, params["encoder_b"]["mu"])
    _copy_linear(enc_b.fc_logvar, params["encoder_b"]["logvar"])

    emb = tnn.Embedding(N_SITES, EMBED)
    c_mu = tnn.Linear(EMBED, LATENT)
    c_lv = tnn.Linear(EMBED, LATENT)
    _copy_embedding(emb, params["encoder_c"]["embedding"])
    _copy_linear(c_mu, params["encoder_c"]["mu"])
    _copy_linear(c_lv, params["encoder_c"]["logvar"])

    a = rng.normal(size=(8, DIM_A)).astype(np.float32)
    b = rng.normal(size=(8, DIM_B)).astype(np.float32)
    site = rng.integers(0, N_SITES, size=8)

    out = multimodal_vae_apply(
        params, state, jax.random.PRNGKey(0),
        a=jnp.asarray(a), b=jnp.asarray(b), site=jnp.asarray(site), train=False,
    )
    with torch.no_grad():
        mu_a, lv_a = enc_a(_t(a))
        mu_b, lv_b = enc_b(_t(b))
        e = emb(_t(site))
        tmu = torch.stack([mu_a, mu_b, c_mu(e)]).mean(0)
        tlv = torch.stack([lv_a, lv_b, c_lv(e)]).mean(0)
    np.testing.assert_allclose(np.asarray(out.mu), tmu.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.logvar), tlv.numpy(), atol=2e-5)


def test_dna2rna_vae_full_forward_parity(rng):
    """Same whole-model lock for the DNA→RNA direction (EncoderB + EncoderC
    fusion, directional_vae.py:63-111)."""
    params, state = dna2rna_vae_init(
        jax.random.PRNGKey(6), DIM_A, DIM_B, N_SITES, LATENT, EMBED
    )
    enc_b = TorchEncoderB(DIM_B, LATENT).eval()
    _copy_linear(enc_b.fc[0], params["encoder_dna"]["fc1"])
    _copy_linear(enc_b.fc[4], params["encoder_dna"]["fc2"])
    with torch.no_grad():
        enc_b.fc[1].weight.copy_(_t(params["encoder_dna"]["bn1"]["gamma"]))
        enc_b.fc[1].bias.copy_(_t(params["encoder_dna"]["bn1"]["beta"]))
        enc_b.fc[5].weight.copy_(_t(params["encoder_dna"]["bn2"]["gamma"]))
        enc_b.fc[5].bias.copy_(_t(params["encoder_dna"]["bn2"]["beta"]))
    _copy_linear(enc_b.fc_mu, params["encoder_dna"]["mu"])
    _copy_linear(enc_b.fc_logvar, params["encoder_dna"]["logvar"])

    emb = tnn.Embedding(N_SITES, EMBED)
    site_mu = tnn.Linear(EMBED, LATENT)
    site_lv = tnn.Linear(EMBED, LATENT)
    _copy_embedding(emb, params["encoder_site"]["embedding"])
    _copy_linear(site_mu, params["encoder_site"]["mu"])
    _copy_linear(site_lv, params["encoder_site"]["logvar"])

    x = rng.normal(size=(9, DIM_B)).astype(np.float32)
    site = rng.integers(0, N_SITES, size=9)
    out = dna2rna_vae_apply(
        params, state, jax.random.PRNGKey(0),
        dna=jnp.asarray(x), site=jnp.asarray(site), train=False,
    )
    with torch.no_grad():
        tmu_d, tlv_d = enc_b(_t(x))
        e = emb(_t(site))
        tmu = torch.stack([tmu_d, site_mu(e)]).mean(0)
        tlv = torch.stack([tlv_d, site_lv(e)]).mean(0)
    np.testing.assert_allclose(np.asarray(out.mu), tmu.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.logvar), tlv.numpy(), atol=2e-5)


def test_dna2rna_ae_full_recon_parity(rng):
    """Full deterministic eval recon of DNA2RNAAE (dna→512→256→latent + site
    projection, mean fusion, DecoderA; directional_ae.py:71-134)."""
    params, state = dna2rna_ae_init(
        jax.random.PRNGKey(7), DIM_A, DIM_B, N_SITES, LATENT, EMBED
    )
    enc = tnn.Sequential(
        tnn.Linear(DIM_B, 512), tnn.BatchNorm1d(512), tnn.ReLU(), tnn.Dropout(0.1),
        tnn.Linear(512, 256), tnn.BatchNorm1d(256), tnn.ReLU(), tnn.Dropout(0.1),
        tnn.Linear(256, LATENT),
    ).eval()
    _copy_linear(enc[0], params["enc_fc1"])
    _copy_linear(enc[4], params["enc_fc2"])
    _copy_linear(enc[8], params["enc_fc3"])
    with torch.no_grad():
        enc[1].weight.copy_(_t(params["enc_bn1"]["gamma"]))
        enc[1].bias.copy_(_t(params["enc_bn1"]["beta"]))
        enc[5].weight.copy_(_t(params["enc_bn2"]["gamma"]))
        enc[5].bias.copy_(_t(params["enc_bn2"]["beta"]))

    emb = tnn.Embedding(N_SITES, EMBED)
    proj = tnn.Linear(EMBED, LATENT)
    _copy_embedding(emb, params["site_embedding"])
    _copy_linear(proj, params["site_projection"])

    dec = tnn.Sequential(
        tnn.Linear(LATENT, 128), tnn.ReLU(), tnn.Linear(128, DIM_A),
    ).eval()
    _copy_linear(dec[0], params["decoder_rna"]["fc1"])
    _copy_linear(dec[2], params["decoder_rna"]["fc2"])

    x = rng.normal(size=(10, DIM_B)).astype(np.float32)
    site = rng.integers(0, N_SITES, size=10)
    out = dna2rna_ae_apply(
        params, state, None, dna=jnp.asarray(x), site=jnp.asarray(site),
        train=False,
    )
    with torch.no_grad():
        latent = torch.stack([enc(_t(x)), proj(emb(_t(site)))]).mean(0)
        want = dec(latent).numpy()
    np.testing.assert_allclose(np.asarray(out.recon), want, atol=2e-5)
