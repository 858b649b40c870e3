#!/usr/bin/env python
"""Generate the golden raw-data fixture (tests/fixtures/golden_*.parquet).

A few hundred rows shaped like the real Kaggle TCGA tables, with every
real-world quirk the prep layer must survive (reference
scripts/prepare_data.py:38-118, scripts/prepare_dna.py:33):

  * golden_rna.parquet (expression_onko_db.parquet schema:
    case_barcode, gene_name, tpm_unstranded, primary_site):
      - 26 distinct primary sites with skewed case counts, so the top-24
        filter actually drops the 2 rarest sites;
      - duplicate (case_barcode, gene_name) rows with CONFLICTING values
        (first occurrence must win, reference drop_duplicates :41);
      - ragged gene panels: cases with fewer/more than GENES genes must be
        filtered out by the exact-width rule (:44-46);
      - RNA-only cases with no DNA counterpart (unmatched cohort, :75-99);
      - a case whose first expression row has a null primary_site but a
        later row carries it (groupby-first must skip the null).
  * golden_dna.parquet (case_barcode, probe_id, beta_value):
      - null case_barcode keys (the reference's tables contain them; pandas
        groupby drops them — the vectorized path must detect and fall back);
      - duplicate (case, probe) rows (the reference's probe grouping does
        NOT dedup, so duplicates count toward the width — such cases end up
        ragged and excluded);
      - ragged probe panels and DNA-only cases.
  * golden_dna_shards/shard_{0,1}.parquet (prepare_dna's third dataset:
    case_barcode, probe_id, beta_value):
      - duplicate (case, probe) pairs ACROSS shards (dedup keep="first",
        reference prepare_dna.py:33);
      - an incomplete patient×probe grid (missing β-values to per-patient
        mean-impute, :63-65).

Deterministic (seed 2026). Expected post-prep invariants are derived in
tests/test_golden_fixture.py, not hard-coded here.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
GENES = 12  # fixture-scale INPUT_DIM_A
PROBES = 15  # fixture-scale INPUT_DIM_B
N_SITES = 26  # > 24 so the top-24 filter bites
N_MATCHED = 220
N_RNA_ONLY = 18
N_DNA_ONLY = 14
N_RAGGED_RNA = 7  # matched cases with wrong gene-panel width
N_DUP_PROBE = 5  # matched cases with a duplicated probe row (→ ragged DNA)

GENE_NAMES = [f"GENE_{i:03d}" for i in range(GENES + 3)]  # +3 for ragged rows
PROBE_IDS = [f"cg{i:08d}" for i in range(PROBES + 2)]
SITES = [f"Site_{chr(65 + i)}" for i in range(N_SITES)]


def _case(i):
    return f"TCGA-{i:02X}-{1000 + i}"


def main():
    rng = np.random.default_rng(2026)

    # --- site assignment: skewed so top-24 is well-defined -------------
    # sites 24, 25 are the rarest (2 matched cases each) and must be dropped
    site_of = {}
    matched = [_case(i) for i in range(N_MATCHED)]
    for j, c in enumerate(matched[:4]):
        site_of[c] = SITES[24 + j % 2]
    for j, c in enumerate(matched[4:]):
        site_of[c] = SITES[j % 24]

    rna_rows = []

    def rna_case_rows(case, genes, site):
        vals = rng.gamma(2.0, 50.0, size=len(genes))
        for g, v in zip(genes, vals):
            rna_rows.append((case, g, float(v), site))

    # matched cases: exact panels, input order shuffled per case
    for c in matched:
        genes = list(rng.permutation(GENE_NAMES[:GENES]))
        rna_case_rows(c, genes, site_of[c])
    # duplicate (case, gene) rows with conflicting values for 6 cases:
    # appended AFTER the originals → first occurrence must win
    for c in matched[10:16]:
        rna_rows.append((c, GENE_NAMES[0], -999.0, site_of[c]))
    # ragged cases (matched-in-DNA but wrong RNA width → excluded entirely)
    ragged_rna = [_case(1000 + i) for i in range(N_RAGGED_RNA)]
    for k, c in enumerate(ragged_rna):
        width = GENES - 2 if k % 2 == 0 else GENES + 2
        rna_case_rows(c, GENE_NAMES[:width], SITES[k % 24])
    # RNA-only cases (no DNA rows → unmatched cohort)
    rna_only = [_case(2000 + i) for i in range(N_RNA_ONLY)]
    for k, c in enumerate(rna_only):
        rna_case_rows(c, GENE_NAMES[:GENES], SITES[k % 24])
    # null-site first row for one case: its first row's site is None but a
    # later row carries the real site (groupby-first must skip the null)
    null_site_case = matched[20]
    first_row_idx = next(
        i for i, r in enumerate(rna_rows) if r[0] == null_site_case
    )
    r = rna_rows[first_row_idx]
    rna_rows[first_row_idx] = (r[0], r[1], r[2], None)

    rna = pd.DataFrame(
        rna_rows,
        columns=["case_barcode", "gene_name", "tpm_unstranded", "primary_site"],
    )
    rna = rna.sample(frac=1.0, random_state=7).reset_index(drop=True)
    # keep each case's first-occurrence order intact for the dup-conflict
    # cases: move their -999 duplicate rows back to the end
    dup_mask = rna["tpm_unstranded"] == -999.0
    rna = pd.concat([rna[~dup_mask], rna[dup_mask]], ignore_index=True)

    dna_rows = []

    def dna_case_rows(case, probes):
        vals = rng.beta(2.0, 2.0, size=len(probes))
        for p, v in zip(probes, vals):
            dna_rows.append((case, p, float(v)))

    for c in matched:
        dna_case_rows(c, list(rng.permutation(PROBE_IDS[:PROBES])))
    # duplicated probe rows: width becomes PROBES+1 → case excluded (the
    # reference's probe grouping has no dedup, prepare_data.py:60-65)
    for c in matched[30:30 + N_DUP_PROBE]:
        dna_rows.append((c, PROBE_IDS[0], 0.5))
    for c in ragged_rna:  # ragged-RNA cases have VALID DNA
        dna_case_rows(c, PROBE_IDS[:PROBES])
    dna_only = [_case(3000 + i) for i in range(N_DNA_ONLY)]
    for c in dna_only:
        dna_case_rows(c, PROBE_IDS[:PROBES])
    # null case keys (reference tables contain them; vectorized grouping
    # must fall back to the pandas path, which drops NaN group keys)
    for k in range(6):
        dna_rows.append((None, PROBE_IDS[k % PROBES], 0.25))

    dna = pd.DataFrame(
        dna_rows, columns=["case_barcode", "probe_id", "beta_value"]
    )
    dna = dna.sample(frac=1.0, random_state=8).reset_index(drop=True)
    dup_mask = (
        dna.duplicated(subset=["case_barcode", "probe_id"], keep="first")
        & dna["case_barcode"].notna()
    )
    dna = pd.concat([dna[~dup_mask], dna[dup_mask]], ignore_index=True)

    # --- prepare_dna shard fixture -------------------------------------
    shard_cases = [_case(4000 + i) for i in range(12)]
    shard_rows = []
    for i, c in enumerate(shard_cases):
        # incomplete grid: each patient is missing a couple of probes
        keep = [p for j, p in enumerate(PROBE_IDS[:PROBES]) if (i + j) % 7]
        for p in keep:
            shard_rows.append((c, p, float(rng.beta(2.0, 5.0))))
    shard_df = pd.DataFrame(
        shard_rows, columns=["case_barcode", "probe_id", "beta_value"]
    )
    half = len(shard_df) // 2
    shard0 = shard_df.iloc[:half].reset_index(drop=True)
    shard1 = shard_df.iloc[half:].reset_index(drop=True)
    # cross-shard duplicate (case, probe) pairs with conflicting values:
    # shard0's value must win (keep="first" after in-order concat)
    shard1 = pd.concat(
        [shard1, shard0.iloc[:4].assign(beta_value=-1.0)], ignore_index=True
    )

    os.makedirs(os.path.join(HERE, "golden_dna_shards"), exist_ok=True)
    rna.to_parquet(os.path.join(HERE, "golden_rna.parquet"), index=False)
    dna.to_parquet(os.path.join(HERE, "golden_dna.parquet"), index=False)
    shard0.to_parquet(
        os.path.join(HERE, "golden_dna_shards", "shard_0.parquet"), index=False
    )
    shard1.to_parquet(
        os.path.join(HERE, "golden_dna_shards", "shard_1.parquet"), index=False
    )
    print(f"rna rows: {len(rna)}  dna rows: {len(dna)}  "
          f"shards: {len(shard0)}+{len(shard1)}")


if __name__ == "__main__":
    main()
