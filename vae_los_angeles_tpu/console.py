"""Console-script shims for every ``[project.scripts]`` entry point.

Setuptools-generated command wrappers execute ``sys.exit(entry_point())``.
Our ``main`` functions deliberately return their results (the test suite and
notebook users compose them), and ``sys.exit(<truthy non-int>)`` prints the
object's repr to stderr and exits with status 1 — so pointing a console
script straight at ``main`` turns every SUCCESSFUL run into a shell failure
(`vla-hpo && vla-evaluate` would never reach the second command). Each shim
here calls the underlying ``main`` and returns None, which ``sys.exit`` maps
to status 0; exceptions still propagate as a traceback + nonzero status.

Imports are deferred into each shim so that ``vla-prepare-data --help``
doesn't pay for (or require) jax/plotly/optuna imports pulled in by
unrelated tools.
"""

from __future__ import annotations

from importlib import import_module


def _run(module: str, attr: str = "main") -> None:
    getattr(import_module(f"vae_los_angeles_tpu.{module}"), attr)()


def train_rna2dna() -> None:
    _run("training.cli", "main_rna2dna")


def train_dna2rna() -> None:
    _run("training.cli", "main_dna2rna")


def train_multimodal() -> None:
    _run("training.cli", "main_multimodal")


def evaluate() -> None:
    _run("evaluation.evaluate")


def import_checkpoint() -> None:
    _run("utils.torch_import", "import_main")


def export_checkpoint() -> None:
    _run("utils.torch_import", "export_main")


def prepare_data() -> None:
    _run("data.prepare_data")


def prepare_dna() -> None:
    _run("data.prepare_dna")


def hpo() -> None:
    _run("evaluation.hpo")


def cross_modality_cv() -> None:
    _run("evaluation.cross_modality_cv")


def compare_imputation() -> None:
    _run("evaluation.compare_directional_imputation")


def knn_comparison() -> None:
    _run("evaluation.knn_comparison")


def downstream() -> None:
    _run("evaluation.downstream")


def downstream_directional() -> None:
    _run("evaluation.downstream_directional")


def reconstruct_unmatched() -> None:
    _run("evaluation.reconstruct_unmatched")


def cluster_reconstructed() -> None:
    _run("evaluation.clustering.cluster_reconstructed")


def cluster_imputation() -> None:
    _run("evaluation.clustering.cluster_imputation_methods")


def boxplots() -> None:
    _run("evaluation.create_boxplots")
