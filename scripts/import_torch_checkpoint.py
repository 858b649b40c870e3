#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pt state_dict) to this
framework's .npz format — migrate trained models without retraining.

    python scripts/import_torch_checkpoint.py checkpoints/best_rna2dna_20240101_120000.pt
    python scripts/import_torch_checkpoint.py best_multivae_optimized.pt --model multivae
    python scripts/import_torch_checkpoint.py /backup/old.pt --model dna2rna --write-run-id

The model type is inferred from the reference's checkpoint naming
(``best_<model>_<run_id>.pt``, train_rna2dna.py:228-231) when not given.
``--write-run-id`` registers the checkpoint under the run-id protocol (the
.npz is written to the exact path consumers resolve and
``latest_<model>_run_id.txt`` is updated). Implementation + mapping:
`vae_los_angeles_tpu/utils/torch_import.py` (installed wheels expose this
as the ``vla-import-checkpoint`` command).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_los_angeles_tpu.utils.torch_import import import_main as main

if __name__ == "__main__":
    main()
