#!/usr/bin/env python
"""Accuracy-parity benchmark: JAX fused engine vs a PyTorch oracle.

BASELINE.json's second metric: cross-modal Pearson r within 0.01 of the
PyTorch reference. This script trains BOTH implementations of a directional
VAE (``--direction rna2dna`` default, or ``dna2rna``) on the same synthetic
dataset with the reference's exact recipe (AdamW 5e-4/1e-5, batch 32
shuffle+drop_last, β-warmup to 1e-3 over 50 epochs, ReduceLROnPlateau 0.5/5,
early-stop 15) and compares validation Pearson r of the mu-decoded
imputation.

The torch model here is an ORACLE built inline from the architecture
documented in SURVEY §2 (encoders.py/decoders.py/directional_vae.py) — the
same pattern as tests/test_models.py; it is not the product path.

Usage: python benchmarks/parity_vs_torch.py [--n 2000] [--epochs 60]
       [--direction dna2rna] ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def build_torch_model(dim_a, dim_b, n_sites, latent):
    import torch.nn as nn

    class EncoderA(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Sequential(
                nn.Linear(dim_a, 128), nn.BatchNorm1d(128), nn.ReLU(), nn.Dropout(0.1)
            )
            self.fc_mu = nn.Linear(128, latent)
            self.fc_logvar = nn.Linear(128, latent)

        def forward(self, x):
            h = self.fc(x)
            return self.fc_mu(h), self.fc_logvar(h)

    class EncoderC(nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = nn.Embedding(n_sites, 32)
            self.fc_mu = nn.Linear(32, latent)
            self.fc_logvar = nn.Linear(32, latent)

        def forward(self, s):
            h = self.embedding(s)
            return self.fc_mu(h), self.fc_logvar(h)

    class DecoderB(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Sequential(
                nn.Linear(latent, 256), nn.ReLU(), nn.Linear(256, 512), nn.ReLU(),
                nn.Linear(512, dim_b), nn.Sigmoid(),
            )

        def forward(self, z):
            return self.fc(z)

    class RNA2DNAVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder_rna = EncoderA()
            self.encoder_site = EncoderC()
            self.decoder_dna = DecoderB()

        def forward(self, rna, site, sample=True):
            import torch

            mu_r, lv_r = self.encoder_rna(rna)
            mu_s, lv_s = self.encoder_site(site)
            mu = (mu_r + mu_s) / 2
            lv = (lv_r + lv_s) / 2
            if sample:
                z = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
            else:
                z = mu
            return self.decoder_dna(z), mu, lv

    return RNA2DNAVAE()


def build_torch_model_d2r(dim_a, dim_b, n_sites, latent):
    """DNA→RNA oracle: EncoderB (two BN blocks) + EncoderC → DecoderA
    (SURVEY §2.1 directional_vae.py:63-111)."""
    import torch.nn as nn

    class EncoderB(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Sequential(
                nn.Linear(dim_b, 512), nn.BatchNorm1d(512), nn.ReLU(),
                nn.Dropout(0.1),
                nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
                nn.Dropout(0.1),
            )
            self.fc_mu = nn.Linear(256, latent)
            self.fc_logvar = nn.Linear(256, latent)

        def forward(self, x):
            h = self.fc(x)
            return self.fc_mu(h), self.fc_logvar(h)

    class EncoderC(nn.Module):
        def __init__(self):
            super().__init__()
            self.embedding = nn.Embedding(n_sites, 32)
            self.fc_mu = nn.Linear(32, latent)
            self.fc_logvar = nn.Linear(32, latent)

        def forward(self, s):
            h = self.embedding(s)
            return self.fc_mu(h), self.fc_logvar(h)

    class DecoderA(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Sequential(
                nn.Linear(latent, 128), nn.ReLU(), nn.Linear(128, dim_a)
            )

        def forward(self, z):
            return self.fc(z)

    class DNA2RNAVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder_dna = EncoderB()
            self.encoder_site = EncoderC()
            self.decoder_rna = DecoderA()

        def forward(self, dna, site, sample=True):
            import torch

            mu_d, lv_d = self.encoder_dna(dna)
            mu_s, lv_s = self.encoder_site(site)
            mu = (mu_d + mu_s) / 2
            lv = (lv_d + lv_s) / 2
            if sample:
                z = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
            else:
                z = mu
            return self.decoder_rna(z), mu, lv

    return DNA2RNAVAE()


def build_torch_model_mm(dim_a, dim_b, n_sites, latent):
    """Tri-modal oracle: EncoderA/B/C + DecoderA/B/C with arithmetic-mean
    posterior fusion (SURVEY §2.1 vae.py:18-79)."""
    import torch
    import torch.nn as nn

    class MultiModalVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc_a = nn.Sequential(
                nn.Linear(dim_a, 128), nn.BatchNorm1d(128), nn.ReLU(),
                nn.Dropout(0.1),
            )
            self.enc_a_mu = nn.Linear(128, latent)
            self.enc_a_lv = nn.Linear(128, latent)
            self.enc_b = nn.Sequential(
                nn.Linear(dim_b, 512), nn.BatchNorm1d(512), nn.ReLU(),
                nn.Dropout(0.1),
                nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
                nn.Dropout(0.1),
            )
            self.enc_b_mu = nn.Linear(256, latent)
            self.enc_b_lv = nn.Linear(256, latent)
            self.embedding = nn.Embedding(n_sites, 32)
            self.enc_c_mu = nn.Linear(32, latent)
            self.enc_c_lv = nn.Linear(32, latent)
            self.dec_a = nn.Sequential(
                nn.Linear(latent, 128), nn.ReLU(), nn.Linear(128, dim_a)
            )
            self.dec_b = nn.Sequential(
                nn.Linear(latent, 256), nn.ReLU(), nn.Linear(256, 512),
                nn.ReLU(), nn.Linear(512, dim_b), nn.Sigmoid(),
            )
            self.dec_c = nn.Sequential(
                nn.Linear(latent, 64), nn.ReLU(), nn.Linear(64, n_sites)
            )

        def forward(self, a=None, b=None, site=None, sample=True):
            mus, lvs = [], []
            if a is not None:
                h = self.enc_a(a)
                mus.append(self.enc_a_mu(h))
                lvs.append(self.enc_a_lv(h))
            if b is not None:
                h = self.enc_b(b)
                mus.append(self.enc_b_mu(h))
                lvs.append(self.enc_b_lv(h))
            if site is not None:
                h = self.embedding(site)
                mus.append(self.enc_c_mu(h))
                lvs.append(self.enc_c_lv(h))
            mu = torch.stack(mus).mean(0)
            lv = torch.stack(lvs).mean(0)
            if sample:
                z = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
            else:
                z = mu
            return self.dec_a(z), self.dec_b(z), self.dec_c(z), mu, lv

    return MultiModalVAE()


def build_torch_model_ae(direction, dim_a, dim_b, n_sites, latent):
    """Deterministic AE oracles (SURVEY §2.1 directional_ae.py:10-134).
    forward returns (recon, zeros, zeros) so train_torch's β·KLD term is
    exactly 0 and the shared loop reduces to the pure AE loss."""
    import torch
    import torch.nn as nn

    class DirectionalAE(nn.Module):
        def __init__(self):
            super().__init__()
            if direction == "rna2dna_ae":
                self.enc = nn.Sequential(
                    nn.Linear(dim_a, 128), nn.BatchNorm1d(128), nn.ReLU(),
                    nn.Dropout(0.1),
                )
                self.to_latent = nn.Linear(128, latent)
                self.dec = nn.Sequential(
                    nn.Linear(latent, 256), nn.ReLU(), nn.Linear(256, 512),
                    nn.ReLU(), nn.Linear(512, dim_b), nn.Sigmoid(),
                )
            else:
                self.enc = nn.Sequential(
                    nn.Linear(dim_b, 512), nn.BatchNorm1d(512), nn.ReLU(),
                    nn.Dropout(0.1),
                    nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
                    nn.Dropout(0.1),
                )
                self.to_latent = nn.Linear(256, latent)
                self.dec = nn.Sequential(
                    nn.Linear(latent, 128), nn.ReLU(), nn.Linear(128, dim_a)
                )
            self.embedding = nn.Embedding(n_sites, 32)
            self.site_proj = nn.Linear(32, latent)

        def forward(self, x, site, sample=True):
            import torch

            z = self.to_latent(self.enc(x))
            z_site = self.site_proj(self.embedding(site))
            z = (z + z_site) / 2
            recon = self.dec(z)
            zeros = torch.zeros_like(z)
            return recon, zeros, zeros

    return DirectionalAE()


def train_torch_mm(model, tr, va, epochs, class_weights, batch_size=32,
                   patience=15, gamma=1.0):
    """Tri-modal training with the reference's vae_loss
    (MSE-sum + BCE-sum + γ·weighted-CE-sum + β·KLD, losses.py:8-46)."""
    import torch
    import torch.nn.functional as F

    a_tr = torch.from_numpy(tr[0])
    b_tr = torch.from_numpy(tr[1])
    s_tr = torch.from_numpy(tr[2].astype(np.int64))
    a_va = torch.from_numpy(va[0])
    b_va = torch.from_numpy(va[1])
    s_va = torch.from_numpy(va[2].astype(np.int64))
    cw = torch.from_numpy(class_weights.astype(np.float32))

    def vae_loss(out, a, b, s, beta):
        recon_a, recon_b, logits_c, mu, lv = out
        loss = F.mse_loss(recon_a, a, reduction="sum")
        loss = loss + F.binary_cross_entropy(recon_b, b, reduction="sum")
        loss = loss + gamma * F.cross_entropy(
            logits_c, s, weight=cw, reduction="sum"
        )
        return loss + beta * (-0.5 * torch.sum(1 + lv - mu.pow(2) - lv.exp()))

    opt = torch.optim.AdamW(model.parameters(), lr=5e-4, weight_decay=1e-5)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=5
    )
    best_val, trigger, best_state = np.inf, 0, None
    n = len(a_tr)
    n_batches = n // batch_size
    n_val_batches = -(-len(a_va) // batch_size)
    g = torch.Generator().manual_seed(0)
    for epoch in range(epochs):
        beta = min(1.0, epoch / 50) * 1e-3
        model.train()
        perm = torch.randperm(n, generator=g)
        for k in range(n_batches):
            idx = perm[k * batch_size : (k + 1) * batch_size]
            loss = vae_loss(
                model(a_tr[idx], b_tr[idx], s_tr[idx]), a_tr[idx], b_tr[idx],
                s_tr[idx], beta,
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
        model.eval()
        with torch.no_grad():
            vloss = float(
                vae_loss(model(a_va, b_va, s_va), a_va, b_va, s_va, beta)
            ) / n_val_batches
        sched.step(vloss)
        if vloss < best_val:
            best_val, trigger = vloss, 0
            best_state = {k: v.clone() for k, v in model.state_dict().items()}
        else:
            trigger += 1
            if trigger >= patience:
                break
    if best_state is not None:
        model.load_state_dict(best_state)
    return model


def train_torch(model, tr, va, epochs, batch_size=32, patience=15,
                recon="bce"):
    import torch
    import torch.nn.functional as F

    x_tr = torch.from_numpy(tr[0])
    y_tr = torch.from_numpy(tr[1])
    s_tr = torch.from_numpy(tr[2].astype(np.int64))
    x_va = torch.from_numpy(va[0])
    y_va = torch.from_numpy(va[1])
    s_va = torch.from_numpy(va[2].astype(np.int64))

    opt = torch.optim.AdamW(model.parameters(), lr=5e-4, weight_decay=1e-5)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=5
    )
    best_val, trigger, best_state = np.inf, 0, None
    n = len(x_tr)
    n_batches = n // batch_size
    n_val_batches = -(-len(x_va) // batch_size)
    g = torch.Generator().manual_seed(0)
    for epoch in range(epochs):
        beta = min(1.0, epoch / 50) * 1e-3
        model.train()
        perm = torch.randperm(n, generator=g)
        for b in range(n_batches):
            idx = perm[b * batch_size : (b + 1) * batch_size]
            recon_out, mu, lv = model(x_tr[idx], s_tr[idx])
            if recon == "bce":
                loss = F.binary_cross_entropy(recon_out, y_tr[idx], reduction="sum")
            else:
                loss = F.mse_loss(recon_out, y_tr[idx], reduction="sum")
            loss = loss + beta * (-0.5 * torch.sum(1 + lv - mu.pow(2) - lv.exp()))
            opt.zero_grad()
            loss.backward()
            opt.step()
        model.eval()
        with torch.no_grad():
            recon_out, mu, lv = model(x_va, s_va)
            if recon == "bce":
                vloss = F.binary_cross_entropy(recon_out, y_va, reduction="sum")
            else:
                vloss = F.mse_loss(recon_out, y_va, reduction="sum")
            vloss = vloss + beta * (
                -0.5 * torch.sum(1 + lv - mu.pow(2) - lv.exp())
            )
            vloss = float(vloss) / n_val_batches
        sched.step(vloss)
        if vloss < best_val:
            best_val, trigger = vloss, 0
            best_state = {k: v.clone() for k, v in model.state_dict().items()}
        else:
            trigger += 1
            if trigger >= patience:
                break
    if best_state is not None:
        model.load_state_dict(best_state)
    return model


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=2000)
    parser.add_argument("--dim_a", type=int, default=1177)
    parser.add_argument("--dim_b", type=int, default=1211)
    parser.add_argument("--sites", type=int, default=24)
    parser.add_argument("--latent", type=int, default=20)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument(
        "--direction",
        choices=["rna2dna", "dna2rna", "multimodal", "rna2dna_ae",
                 "dna2rna_ae"],
        default="rna2dna",
        help="directional VAEs compare their native imputation; multimodal "
        "compares est-DNA from RNA-only input (downstream_task.py:32 usage)",
    )
    args = parser.parse_args()

    import torch

    torch.manual_seed(0)

    import jax
    import jax.numpy as jnp

    from vae_los_angeles_tpu.config import Config
    from vae_los_angeles_tpu.data.dataset import MultiModalArrays
    from vae_los_angeles_tpu.data.splits import train_val_indices
    from vae_los_angeles_tpu.data.synthetic import generate_synthetic_arrays
    from vae_los_angeles_tpu.models.decoders import decoder_a_apply, decoder_b_apply
    from vae_los_angeles_tpu.models.encoders import (
        encoder_a_apply,
        encoder_b_apply,
        encoder_c_apply,
    )
    from vae_los_angeles_tpu.ops.metrics import compute_imputation_metrics
    from vae_los_angeles_tpu.training import engine

    tpm, beta, site = generate_synthetic_arrays(
        args.n, args.dim_a, args.dim_b, args.sites, seed=0
    )
    tr_idx, va_idx = train_val_indices(args.n)
    if args.direction in ("dna2rna", "dna2rna_ae"):
        # model input = DNA β-values, target = RNA
        tr = (beta[tr_idx], tpm[tr_idx], site[tr_idx])
        va = (beta[va_idx], tpm[va_idx], site[va_idx])
    else:
        # rna2dna / multimodal: (RNA, DNA β-values, site)
        tr = (tpm[tr_idx], beta[tr_idx], site[tr_idx])
        va = (tpm[va_idx], beta[va_idx], site[va_idx])

    # --- JAX fused engine ---
    cfg = Config(
        input_dim_a=args.dim_a, input_dim_b=args.dim_b, latent_dim=args.latent
    )
    arrays = MultiModalArrays(jnp.asarray(tpm), jnp.asarray(beta), jnp.asarray(site))
    class_weights = None
    if args.direction == "multimodal":
        from vae_los_angeles_tpu.training.cli import compute_class_weights

        class_weights = compute_class_weights(tr[2], args.sites)
    t0 = time.perf_counter()
    res = engine.fit(
        args.direction, cfg, arrays.take(tr_idx), arrays.take(va_idx),
        jax.random.PRNGKey(0), args.sites, num_epochs=args.epochs,
        class_weights=class_weights,
    )
    res = jax.device_get(res)
    t_jax = time.perf_counter() - t0
    if args.direction in ("rna2dna_ae", "dna2rna_ae"):
        # deterministic AE: eval-mode forward IS the prediction
        val_arrays = arrays.take(va_idx)
        jax_pred = np.asarray(
            engine.predict(args.direction, res.params, res.state, val_arrays)
        )
    elif args.direction == "multimodal":
        # est-DNA from RNA-only input, mu-decoded (downstream_task.py:22-51)
        mu_a, _, _ = encoder_a_apply(
            res.params["encoder_a"], res.state["encoder_a"],
            jnp.asarray(va[0]), train=False,
        )
        jax_pred = np.asarray(decoder_b_apply(res.params["decoder_b"], mu_a))
    elif args.direction == "rna2dna":
        mu_r, lv_r, _ = encoder_a_apply(
            res.params["encoder_rna"], res.state["encoder_rna"],
            jnp.asarray(va[0]), train=False,
        )
        mu_s, _, _ = encoder_c_apply(
            res.params["encoder_site"], {}, jnp.asarray(va[2])
        )
        jax_pred = np.asarray(
            decoder_b_apply(res.params["decoder_dna"], 0.5 * (mu_r + mu_s))
        )
    else:
        mu_d, lv_d, _ = encoder_b_apply(
            res.params["encoder_dna"], res.state["encoder_dna"],
            jnp.asarray(va[0]), train=False,
        )
        mu_s, _, _ = encoder_c_apply(
            res.params["encoder_site"], {}, jnp.asarray(va[2])
        )
        jax_pred = np.asarray(
            decoder_a_apply(res.params["decoder_rna"], 0.5 * (mu_d + mu_s))
        )
    m_jax = compute_imputation_metrics(va[1], jax_pred)

    # --- torch oracle ---
    t0 = time.perf_counter()
    if args.direction in ("rna2dna_ae", "dna2rna_ae"):
        tmodel = build_torch_model_ae(
            args.direction, args.dim_a, args.dim_b, args.sites, args.latent
        )
        recon_kind = "bce" if args.direction == "rna2dna_ae" else "mse"
        tmodel = train_torch(tmodel, tr, va, args.epochs, recon=recon_kind)
    elif args.direction == "multimodal":
        tmodel = build_torch_model_mm(
            args.dim_a, args.dim_b, args.sites, args.latent
        )
        tmodel = train_torch_mm(tmodel, tr, va, args.epochs, class_weights)
    elif args.direction == "rna2dna":
        tmodel = build_torch_model(args.dim_a, args.dim_b, args.sites, args.latent)
        tmodel = train_torch(tmodel, tr, va, args.epochs, recon="bce")
    else:
        tmodel = build_torch_model_d2r(
            args.dim_a, args.dim_b, args.sites, args.latent
        )
        tmodel = train_torch(tmodel, tr, va, args.epochs, recon="mse")
    t_torch = time.perf_counter() - t0
    with torch.no_grad():
        if args.direction == "multimodal":
            torch_pred = (
                tmodel(a=torch.from_numpy(va[0]), sample=False)[1].numpy()
            )
        else:
            torch_pred = (
                tmodel(
                    torch.from_numpy(va[0]),
                    torch.from_numpy(va[2].astype(np.int64)),
                    sample=False,
                )[0]
                .numpy()
            )
    m_torch = compute_imputation_metrics(va[1], torch_pred)

    print(f"\ndirection: {args.direction}")
    print(f"JAX/TPU  : Pearson={m_jax['PearsonMean']:.4f}  MSE={m_jax['MSE']:.5f}  "
          f"R2={m_jax['R2']:.4f}  wall={t_jax:.1f}s (incl. compile)")
    print(f"torch/CPU: Pearson={m_torch['PearsonMean']:.4f}  MSE={m_torch['MSE']:.5f}  "
          f"R2={m_torch['R2']:.4f}  wall={t_torch:.1f}s")
    delta = abs(m_jax["PearsonMean"] - m_torch["PearsonMean"])
    print(f"\n|Δ Pearson r| = {delta:.4f}  (target: < 0.01)")
    print("PARITY:", "PASS" if delta < 0.01 else "FAIL")


if __name__ == "__main__":
    main()
