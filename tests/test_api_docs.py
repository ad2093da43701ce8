"""Generated API reference: coverage and freshness.

The reference ships a Sphinx ``docs/api.rst`` (``/root/reference/docs/api.rst``)
documenting modelWE, optimization, fpt/ensembles/nmm/utils, and the four
WESTPA plugins; this repo's equivalent is the committed markdown tree under
``docs/api/`` produced by ``scripts/gen_api_docs.py``. These tests pin (a)
that every section of the reference's inventory is covered and (b) that the
committed tree is regenerated after docstring/signature changes.
"""
import runpy
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DOCS = REPO / "docs" / "api"


def _generator():
    mod = runpy.run_path(str(REPO / "scripts" / "gen_api_docs.py"))
    return mod["generate"]


def test_reference_api_inventory_covered():
    """Every module the reference's api.rst documents has a counterpart page."""
    index = (DOCS / "index.md").read_text()
    for mod in [
        "msm_we_tpu.model",  # msm_we.modelWE
        "msm_we_tpu.optimization",
        "msm_we_tpu.msm.fpt",
        "msm_we_tpu.msm.ensembles",
        "msm_we_tpu.msm.nmm",
        "msm_we_tpu.utils",
        "msm_we_tpu.westpa_plugins.augmentation_driver",
        "msm_we_tpu.westpa_plugins.hamsm_driver",
        "msm_we_tpu.westpa_plugins.restart_driver",
        "msm_we_tpu.westpa_plugins.optimization_driver",
    ]:
        assert f"`{mod}`" in index, f"{mod} missing from docs/api/index.md"


def test_modelwe_construction_methods_documented():
    """The api.rst 'Construction'/'Analysis'/'Plotting' method groups."""
    page = (DOCS / "msm_we_tpu_model.md").read_text()
    for meth in [
        "build_analyze_model",
        "initialize",
        "get_coordSet",
        "dimReduce",
        "cluster_coordinates",
        "get_fluxMatrix",
        "organize_fluxMatrix",
        "do_block_validation",
        "get_Tmatrix",
        "get_steady_state",
        "get_steady_state_target_flux",
        "get_committor",
        "get_flux",
        "get_cluster_centers",
        "update_cluster_structures",
        "plot_flux",
        "plot_flux_committor",
        "plot_flux_committor_pcoordcolor",
    ]:
        assert f"modelWE.{meth}" in page, f"modelWE.{meth} undocumented"


def test_committed_docs_are_fresh(tmp_path):
    """docs/api must match a fresh regeneration (run scripts/gen_api_docs.py
    after changing public docstrings or signatures)."""
    generate = _generator()
    files = generate(tmp_path)
    committed = sorted(p.name for p in DOCS.glob("*.md"))
    assert committed == sorted(files)
    for name in files:
        fresh = (tmp_path / name).read_text()
        assert (DOCS / name).read_text() == fresh, (
            f"docs/api/{name} is stale -- regenerate with "
            "`python scripts/gen_api_docs.py`"
        )


def test_generator_cli(tmp_path, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["gen_api_docs.py", str(tmp_path)])
    runpy.run_path(str(REPO / "scripts" / "gen_api_docs.py"), run_name="__main__")
    assert (tmp_path / "index.md").exists()
