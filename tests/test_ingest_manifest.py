"""Ingest-manifest checks (VERDICT r2 #8): the prep pipeline's assumptions
about the real Kaggle tables are executable, and schema drift fails loudly
at the door with actionable messages."""

import numpy as np
import pandas as pd
import pytest

from vae_los_angeles_tpu.data import ingest_manifest as im
from vae_los_angeles_tpu.data import prepare_data, prepare_dna


def _rna_frame(n=40):
    rng = np.random.default_rng(0)
    return pd.DataFrame(
        {
            "case_barcode": [f"case-{i % 8}" for i in range(n)],
            "gene_name": [f"GENE{i % 5}" for i in range(n)],
            "tpm_unstranded": rng.random(n).astype(np.float64) * 100,
            "primary_site": ["Lung"] * (n - 1) + [None],
        }
    )


def _dna_frame(n=40, probe_col="probe_id"):
    rng = np.random.default_rng(1)
    return pd.DataFrame(
        {
            "case_barcode": [f"case-{i % 8}" for i in range(n)],
            probe_col: [f"cg{i % 5:08d}" for i in range(n)],
            "beta_value": rng.random(n).astype(np.float64),
        }
    )


def test_valid_frames_pass():
    assert im.verify_table(_rna_frame(), "rna_expression") == []
    assert im.verify_table(_dna_frame(), "dna_methylation") == []
    assert im.verify_table(_dna_frame(), "dna_prep_shards") == []


def test_probe_id_id_alternative_accepted():
    """prepare_data reads probe_id_id when present (reference
    scripts/prepare_data.py:55-66) — the manifest accepts either spelling."""
    assert im.verify_table(
        _dna_frame(probe_col="probe_id_id"), "dna_methylation"
    ) == []


def test_missing_column_reported():
    df = _rna_frame().drop(columns=["tpm_unstranded"])
    issues = im.verify_table(df, "rna_expression")
    assert any("tpm_unstranded" in i and "missing" in i for i in issues)


def test_wrong_dtype_reported():
    df = _rna_frame()
    df["tpm_unstranded"] = df["tpm_unstranded"].astype(str)
    issues = im.verify_table(df, "rna_expression")
    assert any("tpm_unstranded" in i and "dtype" in i for i in issues)


def test_null_key_reported():
    df = _rna_frame()
    df.loc[0, "case_barcode"] = None
    issues = im.verify_table(df, "rna_expression")
    assert any("case_barcode" in i and "null" in i for i in issues)


def test_out_of_range_beta_reported():
    df = _dna_frame()
    df.loc[0, "beta_value"] = 1.7
    issues = im.verify_table(df, "dna_methylation")
    assert any("beta_value" in i and "above" in i for i in issues)


def test_empty_table_reported():
    issues = im.verify_table(_rna_frame().iloc[:0], "rna_expression")
    assert any("empty" in i for i in issues)


def test_integer_satisfies_numeric():
    df = _dna_frame()
    df["beta_value"] = np.zeros(len(df), np.int64)
    assert im.verify_table(df, "dna_methylation") == []


def test_record_roundtrip(tmp_path):
    """A manifest recorded from live tables round-trips through JSON and the
    same tables verify cleanly against it."""
    frames = {"rna_expression": _rna_frame(), "dna_methylation": _dna_frame()}
    manifest = im.record_manifest(frames)
    path = tmp_path / "manifest.json"
    im.save_manifest(manifest, str(path))
    loaded = im.load_manifest(str(path))
    assert im.verify_frames(frames, loaded) == []
    # recorded ranges are tight: a value outside the recorded max now fails
    drifted = _dna_frame()
    drifted.loc[0, "beta_value"] = 5.0
    issues = im.verify_table(drifted, "dna_methylation", loaded)
    assert issues


def test_prepare_data_verify_ingest_cli(tmp_path, capsys):
    """--verify-ingest with local mirrors: exit 0 on a clean schema, exit 2
    with the column-by-column report on drift; never writes artifacts."""
    rna_p = tmp_path / "rna.parquet"
    dna_p = tmp_path / "dna.parquet"
    _rna_frame().to_parquet(rna_p)
    _dna_frame().to_parquet(dna_p)
    with pytest.raises(SystemExit) as e:
        prepare_data.main([
            "--verify-ingest", "--rna-parquet", str(rna_p),
            "--dna-parquet", str(dna_p), "--data_dir", str(tmp_path / "out"),
        ])
    assert e.value.code == 0
    assert "ingest ok" in capsys.readouterr().out
    assert not (tmp_path / "out").exists()

    bad = _dna_frame().rename(columns={"beta_value": "beta"})
    bad.to_parquet(dna_p)
    with pytest.raises(SystemExit) as e:
        prepare_data.main([
            "--verify-ingest", "--rna-parquet", str(rna_p),
            "--dna-parquet", str(dna_p), "--data_dir", str(tmp_path / "out"),
        ])
    assert e.value.code == 2
    assert "beta_value" in capsys.readouterr().out


def test_prepare_data_real_path_gates_on_manifest(tmp_path):
    """A full (non-verify) run against drifted local mirrors aborts before
    any transform — the manifest gate is always on for real data."""
    rna_p = tmp_path / "rna.parquet"
    dna_p = tmp_path / "dna.parquet"
    bad = _rna_frame().drop(columns=["primary_site"])
    bad.to_parquet(rna_p)
    _dna_frame().to_parquet(dna_p)
    with pytest.raises(SystemExit) as e:
        prepare_data.main([
            "--rna-parquet", str(rna_p), "--dna-parquet", str(dna_p),
            "--data_dir", str(tmp_path / "out"),
        ])
    assert "manifest" in str(e.value)


def test_prepare_dna_verify_ingest_cli(tmp_path, capsys):
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    _dna_frame().to_parquet(shard_dir / "shard0.parquet")
    with pytest.raises(SystemExit) as e:
        prepare_dna.main([
            "--verify-ingest", "--input-dir", str(shard_dir),
            "--output", str(tmp_path / "out.parquet"),
        ])
    assert e.value.code == 0
    assert "ingest ok" in capsys.readouterr().out
    assert not (tmp_path / "out.parquet").exists()


def test_prepare_dna_local_input_end_to_end(tmp_path):
    """--input-dir also serves the full offline prep path: shards → imputed
    matrix parquet without any network access."""
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    df = _dna_frame()
    df.loc[2, "beta_value"] = np.nan  # something to impute
    df.to_parquet(shard_dir / "shard0.parquet")
    out = tmp_path / "out.parquet"
    prepare_dna.main(["--input-dir", str(shard_dir), "--output", str(out)])
    got = pd.read_parquet(out)
    assert set(got.columns) == {"case_barcode", "probe_id", "beta_value"}
    assert not got["beta_value"].isna().any()


def test_prepare_data_single_mirror_flag_rejected(tmp_path):
    """One local-mirror flag alone must fail loudly, not silently fall back
    to downloading both tables."""
    rna_p = tmp_path / "rna.parquet"
    _rna_frame().to_parquet(rna_p)
    with pytest.raises(SystemExit, match="together"):
        prepare_data.main(["--rna-parquet", str(rna_p)])


def test_prepare_dna_missing_input_dir_rejected(tmp_path):
    """A typo'd --input-dir (os.walk yields nothing) must name the bad path
    instead of raising pandas' opaque 'No objects to concatenate'."""
    with pytest.raises(SystemExit, match="no parquet shards"):
        prepare_dna.main([
            "--input-dir", str(tmp_path / "nope"),
            "--output", str(tmp_path / "out.parquet"),
        ])
