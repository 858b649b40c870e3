"""Unit tests for the data-preparation transformations (reference
scripts/prepare_data.py / prepare_dna.py logic) on tiny synthetic frames —
no Kaggle access required."""

import numpy as np
import pandas as pd

from vae_los_angeles_tpu.data.prepare_data import (
    merge_and_normalize_data,
    prepare_dna_methylation_data,
    prepare_rna_data,
)
from vae_los_angeles_tpu.data.prepare_dna import build_imputed_matrix


def _rna_long(cases, genes, drop=()):
    rows = []
    for c in cases:
        for g in genes:
            if (c, g) in drop:
                continue
            rows.append(
                {
                    "case_barcode": c,
                    "gene_name": g,
                    "tpm_unstranded": float(hash((c, g)) % 100),
                    "primary_site": "Breast" if c.endswith("1") else "Lung",
                }
            )
    return pd.DataFrame(rows)


def test_prepare_rna_data_grouping_and_filtering():
    genes = ["G3", "G1", "G2"]
    df = _rna_long(["C1", "C2", "C3"], genes, drop=[("C3", "G2")])
    # duplicate row → must be deduped
    df = pd.concat([df, df.iloc[[0]]], ignore_index=True)
    out, gene_names = prepare_rna_data(df, input_dim_a=3)
    # C3 has only 2 genes → filtered out
    assert sorted(out["case_barcode"]) == ["C1", "C2"]
    assert gene_names == ["G1", "G2", "G3"]
    # vectors follow sorted gene order
    row = out[out["case_barcode"] == "C1"].iloc[0]
    assert len(row["tpm_unstranded"]) == 3
    assert row["primary_site"] == "Breast"


def test_prepare_dna_data_grouping():
    rows = []
    for c in ["C1", "C2"]:
        for p in ["cg2", "cg1"]:
            rows.append({"case_barcode": c, "probe_id": p, "beta_value": 0.5})
    rows.append({"case_barcode": "C3", "probe_id": "cg1", "beta_value": 0.1})
    out, probe_ids = prepare_dna_methylation_data(pd.DataFrame(rows), input_dim_b=2)
    assert sorted(out["case_barcode"]) == ["C1", "C2"]
    assert probe_ids == ["cg1", "cg2"]


def test_merge_and_normalize(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rna = pd.DataFrame(
        {
            "case_barcode": ["C1", "C2", "C3"],
            "tpm_unstranded": [[1.0, 2.0]] * 3,
            "primary_site": ["Breast", "Lung", "Breast"],
        }
    )
    dna = pd.DataFrame(
        {
            "case_barcode": ["C1", "C2", "C4"],
            "beta_value": [[0.1, 0.9, 0.5]] * 3,
        }
    )
    merged, le = merge_and_normalize_data(rna, dna, top_n_sites=24, data_dir="data")
    # matched: C1, C2; unmatched saved
    assert sorted(merged["case_barcode"]) == ["C1", "C2"]
    rna_only = pd.read_pickle("data/rna_only_unmatched.pkl")
    assert list(rna_only["case_barcode"]) == ["C3"]
    dna_only = pd.read_pickle("data/dna_only_unmatched.pkl")
    assert list(dna_only["case_barcode"]) == ["C4"]
    # RNA log1p'd
    np.testing.assert_allclose(
        merged["tpm_unstranded"].iloc[0], np.log1p([1.0, 2.0])
    )
    # label encoding matches sklearn convention
    assert set(le.classes_) == {"Breast", "Lung"}
    assert merged["primary_site_encoded"].tolist() == list(
        le.transform(merged["primary_site"])
    )


def test_top_n_site_filter(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    n = 30
    rna = pd.DataFrame(
        {
            "case_barcode": [f"C{i}" for i in range(n)],
            "tpm_unstranded": [[1.0]] * n,
            "primary_site": ["Common"] * 28 + ["Rare1", "Rare2"],
        }
    )
    dna = pd.DataFrame(
        {"case_barcode": [f"C{i}" for i in range(n)], "beta_value": [[0.5]] * n}
    )
    merged, le = merge_and_normalize_data(rna, dna, top_n_sites=1, data_dir="data")
    assert set(merged["primary_site"]) == {"Common"}
    assert len(merged) == 28


def test_build_imputed_matrix():
    """Dedup → complete patient×probe grid → per-patient mean imputation
    (reference prepare_dna.py:33-65)."""
    df = pd.DataFrame(
        {
            "case_barcode": ["P1", "P1", "P1", "P2"],
            "probe_id": ["a", "a", "b", "a"],  # P1/a duplicated; P2 missing b
            "beta_value": [0.2, 0.9, 0.4, 0.6],
        }
    )
    out = build_imputed_matrix(df)
    assert len(out) == 4  # complete 2×2 grid
    p1a = out[(out.case_barcode == "P1") & (out.probe_id == "a")]["beta_value"].iloc[0]
    assert p1a == 0.2  # keep='first' dedup
    # P2's missing probe b imputed with P2's own mean (0.6)
    p2b = out[(out.case_barcode == "P2") & (out.probe_id == "b")]["beta_value"].iloc[0]
    np.testing.assert_allclose(p2b, 0.6)
    assert not out["beta_value"].isnull().any()


def test_build_imputed_matrix_native_matches_pandas():
    """The C++ pivot/impute kernel must reproduce the pandas (reference)
    formulation exactly — same grid, same row order, same keep='first'
    dedup (including a first-occurrence NaN shadowing a later value), same
    per-patient mean imputation, same all-NaN-patient behavior."""
    import pytest

    from vae_los_angeles_tpu.utils.native import load_pivot_impute

    if load_pivot_impute() is None:
        pytest.skip("no C++ toolchain: native path unavailable (pandas "
                    "fallback covers correctness)")

    rng = np.random.default_rng(5)
    for trial in range(5):
        n_pat = int(rng.integers(2, 12))
        n_probe = int(rng.integers(2, 20))
        n_rows = int(rng.integers(4, n_pat * n_probe + 20))
        df = pd.DataFrame(
            {
                "case_barcode": rng.choice(
                    [f"P{i}" for i in range(n_pat)], size=n_rows
                ),
                "probe_id": rng.choice(
                    [f"pr{i}" for i in range(n_probe)], size=n_rows
                ),
                "beta_value": rng.random(n_rows),
            }
        )
        # sprinkle NaNs (incl. possibly a first-occurrence NaN that must
        # shadow a later duplicate's value under keep='first')
        nan_mask = rng.random(n_rows) < 0.25
        df.loc[nan_mask, "beta_value"] = np.nan
        # one patient whose every row is NaN → mean undefined, stays NaN
        df.loc[df.case_barcode == "P0", "beta_value"] = np.nan

        want = build_imputed_matrix(df, engine="pandas")
        got = build_imputed_matrix(df, engine="native")
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            want.reset_index(drop=True),
            check_dtype=False,
            atol=1e-6,
        )


def test_build_imputed_matrix_native_fallback_on_extra_columns():
    """Inputs with extra columns must ride the pandas path (the native
    dense-matrix path would drop them silently)."""
    df = pd.DataFrame(
        {
            "case_barcode": ["P1", "P2"],
            "probe_id": ["a", "a"],
            "beta_value": [0.2, 0.4],
            "platform": ["450k", "450k"],
        }
    )
    out = build_imputed_matrix(df)  # auto → pandas because of extra column
    assert "platform" in out.columns
    import pytest

    with pytest.raises(RuntimeError, match="native"):
        build_imputed_matrix(df, engine="native")


def test_build_imputed_matrix_nan_keys_fall_back():
    """Null case_barcode/probe_id (factorize code -1) must ride the pandas
    path under engine='auto' instead of crashing the native kernel."""
    df = pd.DataFrame(
        {
            "case_barcode": ["P1", None, "P2"],
            "probe_id": ["a", "a", None],
            "beta_value": [0.2, 0.4, 0.6],
        }
    )
    out = build_imputed_matrix(df)  # must not raise
    want = build_imputed_matrix(df, engine="pandas")
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_build_imputed_matrix_native_preserves_dtype():
    """The written parquet schema must not depend on toolchain presence:
    float32 input stays float32 through the native path."""
    from vae_los_angeles_tpu.utils.native import load_pivot_impute

    if load_pivot_impute() is None:
        import pytest

        pytest.skip("no C++ toolchain")
    df = pd.DataFrame(
        {
            "case_barcode": ["P1", "P2"],
            "probe_id": ["a", "b"],
            "beta_value": np.asarray([0.25, 0.5], dtype=np.float32),
        }
    )
    out = build_imputed_matrix(df, engine="native")
    assert out["beta_value"].dtype == np.float32


def test_grouping_vectorized_matches_pandas_fuzz():
    """The vectorized grouping (engine='auto') must reproduce the pandas
    (reference-formulation) oracle on random long-format tables: shuffled
    input, duplicate (case, feature) rows, cases with missing or extra
    features, per-case site labels."""
    rng = np.random.default_rng(11)
    for trial in range(6):
        n_cases = int(rng.integers(2, 10))
        width = int(rng.integers(2, 7))
        rows = []
        for c in range(n_cases):
            feats = [f"F{j}" for j in range(width)]
            r = rng.random()
            if r < 0.25 and width > 2:
                feats = feats[:-1]  # missing feature → dropped
            elif r < 0.5:
                feats = feats + [f"F{width}"]  # extra feature → dropped
            for f in feats:
                rows.append(
                    {
                        "case_barcode": f"C{c:03d}",
                        "gene_name": f,
                        "tpm_unstranded": float(rng.random()),
                        "primary_site": f"Site{c % 3}",
                    }
                )
        df = pd.DataFrame(rows)
        # duplicate rows (same value — the reference's non-stable sort makes
        # the survivor of CONFLICTING duplicates unspecified)
        dups = df.sample(frac=0.2, random_state=trial)
        df = (
            pd.concat([df, dups], ignore_index=True)
            .sample(frac=1.0, random_state=trial)  # shuffle
            .reset_index(drop=True)
        )

        fast, fast_names = prepare_rna_data(df, width)
        ref, ref_names = prepare_rna_data(df, width, engine="pandas")
        assert list(fast_names) == list(ref_names)
        pd.testing.assert_frame_equal(
            fast.reset_index(drop=True), ref.reset_index(drop=True)
        )

        dna = df.rename(
            columns={"gene_name": "probe_id", "tpm_unstranded": "beta_value"}
        )[["case_barcode", "probe_id", "beta_value"]]
        fast_d, fast_p = prepare_dna_methylation_data(dna, width)
        ref_d, ref_p = prepare_dna_methylation_data(dna, width, engine="pandas")
        assert list(fast_p) == list(ref_p)
        pd.testing.assert_frame_equal(
            fast_d.reset_index(drop=True), ref_d.reset_index(drop=True)
        )


def test_grouping_vectorized_empty_and_none_keys():
    """Empty tables and null keys must not crash the vectorized path."""
    empty = pd.DataFrame(
        {"case_barcode": [], "gene_name": [], "tpm_unstranded": [],
         "primary_site": []}
    )
    out, names = prepare_rna_data(empty, 3)
    assert len(out) == 0
    # null keys: factorize maps them to -1 → ValueError → pandas fallback
    df = pd.DataFrame(
        {
            "case_barcode": ["C1", None],
            "gene_name": ["G1", "G1"],
            "tpm_unstranded": [1.0, 2.0],
            "primary_site": ["S", "S"],
        }
    )
    out2, _ = prepare_rna_data(df, 1)
    want2, _ = prepare_rna_data(df, 1, engine="pandas")
    pd.testing.assert_frame_equal(
        out2.reset_index(drop=True), want2.reset_index(drop=True)
    )


def test_grouping_nan_site_uses_first_non_null():
    """groupby-'first' semantics: a leading null primary_site must be
    skipped, not propagated (a NaN site would silently drop the case at the
    top-N-sites filter downstream)."""
    df = pd.DataFrame(
        {
            "case_barcode": ["C1", "C1"],
            "gene_name": ["G1", "G2"],
            "tpm_unstranded": [1.0, 2.0],
            "primary_site": [None, "Lung"],
        }
    )
    fast, _ = prepare_rna_data(df, 2)
    ref, _ = prepare_rna_data(df, 2, engine="pandas")
    assert fast["primary_site"].tolist() == ["Lung"]
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), ref.reset_index(drop=True)
    )


def test_grouping_preserves_feature_name_types():
    """Integer probe ids must come back as ints from both engines (the
    feature_names.pkl content type must not depend on the engine)."""
    df = pd.DataFrame(
        {
            "case_barcode": ["C1", "C1"],
            "probe_id_id": [2, 1],
            "beta_value": [0.5, 0.25],
        }
    )
    fast, fast_ids = prepare_dna_methylation_data(df, 2)
    ref, ref_ids = prepare_dna_methylation_data(df, 2, engine="pandas")
    assert list(fast_ids) == list(ref_ids) == [1, 2]
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), ref.reset_index(drop=True)
    )
