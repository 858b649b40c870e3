"""Golden-fixture pipeline test: REAL-shaped raw Kaggle tables through
prepare → train → evaluate → compare.

The synthetic generator (data/synthetic.py) produces already-clean tables;
this suite instead drives the prep layer over the committed golden fixture
(tests/fixtures/golden_*.parquet, built by tests/fixtures/make_golden.py)
that carries the real datasets' quirks verbatim: null case/probe keys
(reference scripts/prepare_dna.py:33 dedups them), duplicate (case, gene)
and (case, probe) rows, ragged gene panels, >24 primary sites so the top-24
filter bites (reference scripts/prepare_data.py:70,108-118), unmatched
cohorts, and a null-first primary_site row.

Expected counts are derived from the generator's constants:
  RNA kept  = 220 matched + 18 RNA-only                      = 238 cases
  DNA kept  = 215 matched (5 dropped: duplicated probe row → width 16)
              + 7 ragged-RNA cases + 14 DNA-only             = 236 cases
  merged    = 215 both − 4 cases on the two rarest sites     = 211 rows
  unmatched = 23 RNA-only (18 + 5 dup-probe), 21 DNA-only (14 + 7 ragged)
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from vae_los_angeles_tpu.config import Config
from vae_los_angeles_tpu.data.prepare_data import (
    merge_and_normalize_data,
    prepare_dna_methylation_data,
    prepare_rna_data,
    save_artifacts,
)

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
GENES, PROBES = 12, 15
CFG = Config(
    input_dim_a=GENES,
    input_dim_b=PROBES,
    latent_dim=6,
    batch_size=32,
    num_epochs=4,
)


@pytest.fixture(scope="module")
def raw():
    return (
        pd.read_parquet(os.path.join(FIXTURES, "golden_rna.parquet")),
        pd.read_parquet(os.path.join(FIXTURES, "golden_dna.parquet")),
    )


@pytest.fixture(scope="module")
def golden_workspace(tmp_path_factory, raw):
    """Full prep over the golden fixture + both directional trainings."""
    ws = tmp_path_factory.mktemp("golden")
    old_cwd = os.getcwd()
    os.chdir(ws)
    try:
        rna_raw, dna_raw = raw
        rna_df, gene_names = prepare_rna_data(rna_raw, GENES)
        dna_df, probe_ids = prepare_dna_methylation_data(dna_raw, PROBES)
        merged, le = merge_and_normalize_data(rna_df, dna_df, data_dir="data")
        save_artifacts(merged, le, gene_names, probe_ids, data_dir="data")

        from vae_los_angeles_tpu.training.cli import run_training

        run_training("rna2dna", "rna2dna", cfg=CFG, argv=["--epochs", "4"])
        run_training("dna2rna", "dna2rna", cfg=CFG, argv=["--epochs", "4"])
        yield ws
    finally:
        os.chdir(old_cwd)


def test_prep_counts_and_quirks(golden_workspace):
    merged = pd.read_pickle(golden_workspace / "data" / "processed_data.pkl")
    # 215 matched survive the width filters; the top-24 site filter drops the
    # 4 cases on the 2 rarest sites
    assert len(merged) == 211
    assert merged["primary_site"].nunique() == 24
    assert "Site_Y" not in set(merged["primary_site"])  # rare site dropped
    assert "Site_Z" not in set(merged["primary_site"])
    # encoded labels are dense 0..23
    assert sorted(merged["primary_site_encoded"].unique()) == list(range(24))
    # duplicate-(case, gene) conflicts: the first occurrence won — the
    # injected -999 value must appear nowhere post-log1p (log1p(-999) = nan)
    tpm = np.stack(merged["tpm_unstranded"].map(np.asarray).values)
    assert tpm.shape == (211, GENES)
    assert np.isfinite(tpm).all() and tpm.min() >= 0  # log1p'd, no -999
    beta = np.stack(merged["beta_value"].map(np.asarray).values)
    assert beta.shape == (211, PROBES)
    assert beta.min() >= 0 and beta.max() <= 1
    # the null-first-site case kept its real (later-row) site
    row = merged[merged["case_barcode"] == "TCGA-14-1020"]
    assert len(row) == 1 and row["primary_site"].notna().all()

    rna_only = pd.read_pickle(golden_workspace / "data" / "rna_only_unmatched.pkl")
    dna_only = pd.read_pickle(golden_workspace / "data" / "dna_only_unmatched.pkl")
    # 18 pure RNA-only + 5 whose DNA was invalidated by a duplicated probe
    assert len(rna_only) == 23
    # 14 pure DNA-only + 7 whose RNA panel was ragged
    assert len(dna_only) == 21

    with open(golden_workspace / "data" / "feature_names.pkl", "rb") as f:
        import pickle

        names = pickle.load(f)
    assert names["gene_names"] == [f"GENE_{i:03d}" for i in range(GENES)]
    assert names["probe_ids"] == [f"cg{i:08d}" for i in range(PROBES)]


def test_prep_engine_equivalence(raw):
    """Vectorized grouping == the pandas-oracle formulation on the golden
    fixture (outside the deliberately-conflicted duplicate cells, whose
    winner the oracle's non-stable sort leaves unspecified)."""
    rna_raw, dna_raw = raw
    fast, genes_fast = prepare_rna_data(rna_raw, GENES)
    oracle, genes_oracle = prepare_rna_data(rna_raw, GENES, engine="pandas")
    assert genes_fast == genes_oracle
    assert list(fast["case_barcode"]) == list(oracle["case_barcode"])
    conflicted = {f"TCGA-{i:02X}-{1000 + i}" for i in range(10, 16)}
    for (_, a), (_, b) in zip(fast.iterrows(), oracle.iterrows()):
        if a["case_barcode"] in conflicted:
            continue
        np.testing.assert_allclose(a["tpm_unstranded"], b["tpm_unstranded"])
    # the DNA table carries null case keys → the vectorized path must have
    # fallen back to the pandas path, so both engines are trivially equal
    fast_dna, probes_fast = prepare_dna_methylation_data(dna_raw, PROBES)
    oracle_dna, probes_oracle = prepare_dna_methylation_data(
        dna_raw, PROBES, engine="pandas"
    )
    assert probes_fast == probes_oracle
    pd.testing.assert_frame_equal(fast_dna, oracle_dna)
    # null case keys were dropped, not grouped
    assert fast_dna["case_barcode"].notna().all()


def test_prepare_dna_shards_golden():
    """prepare_dna over the golden shards: cross-shard dedup keeps the first
    occurrence, and the incomplete patient×probe grid is mean-imputed —
    native C++ and pandas engines agree."""
    from vae_los_angeles_tpu.data.prepare_dna import (
        build_imputed_matrix,
        load_parquet_shards,
    )

    combined = load_parquet_shards(os.path.join(FIXTURES, "golden_dna_shards"))
    out_pd = build_imputed_matrix(combined, engine="pandas")
    # complete grid: every (patient, probe) pair exists exactly once
    n_pat = combined["case_barcode"].nunique()
    n_probe = combined["probe_id"].nunique()
    assert len(out_pd) == n_pat * n_probe
    assert out_pd["beta_value"].notna().all()
    # the conflicting cross-shard duplicates (-1.0 from shard_1) lost to
    # shard_0's first occurrence
    assert (out_pd["beta_value"] >= 0).all()
    # imputed cells equal their patient's observed mean
    missing = combined.drop_duplicates(["case_barcode", "probe_id"])
    obs = missing.groupby("case_barcode")["beta_value"].mean()
    key = set(zip(missing["case_barcode"], missing["probe_id"]))
    imputed_rows = out_pd[
        [(c, p) not in key for c, p in zip(out_pd["case_barcode"], out_pd["probe_id"])]
    ]
    assert len(imputed_rows) > 0
    np.testing.assert_allclose(
        imputed_rows["beta_value"].to_numpy(),
        obs.loc[imputed_rows["case_barcode"]].to_numpy(),
        rtol=1e-12,
    )

    try:
        out_native = build_imputed_matrix(combined, engine="native")
    except RuntimeError:
        pytest.skip("no C++ toolchain in this environment")
    pd.testing.assert_frame_equal(
        out_native.reset_index(drop=True), out_pd.reset_index(drop=True)
    )


def test_train_and_evaluate_on_golden(golden_workspace):
    """The trained-on-golden-data checkpoints drive the evaluate and
    comparison surfaces end to end (closing the synthetic-only gap)."""
    ckpts = list((golden_workspace / "checkpoints").glob("best_*.npz"))
    assert len(ckpts) >= 2

    from vae_los_angeles_tpu.evaluation.compare_directional_imputation import (
        main as compare_main,
    )

    results = compare_main(cfg=CFG)
    models = {(r["Modality"], r["Model"]) for r in results}
    assert ("DNA methylation", "RNA2DNAVAE") in models
    assert ("RNA expression", "DNA2RNAVAE") in models
    for r in results:
        for k in ("MSE", "MAE", "CosineSimilarity", "PearsonMean"):
            assert np.isfinite(r[k])
    out_dirs = list((golden_workspace / "plots").glob("directional_comparison_*"))
    assert out_dirs and (out_dirs[0] / "comparison_results.json").exists()

    # unmatched reconstruction consumes the golden unmatched cohorts (raw
    # TPM → log1p at inference, site=None DNA-only path)
    from vae_los_angeles_tpu.evaluation.reconstruct_unmatched import (
        main as recon_main,
    )

    rna_df, dna_df = recon_main(cfg=CFG)
    assert rna_df is not None and "reconstructed_beta_value" in rna_df.columns
    assert dna_df is not None and "reconstructed_tpm_unstranded" in dna_df.columns
    assert len(dna_df) == 21  # every DNA-only case imputed (site=None path)
