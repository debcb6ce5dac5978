"""MvNMF model-layer parity (objective, W line-search step, H step vs
goldens with gamma=1) and given-signature freezing through fit."""

import numpy as np
import pandas as pd
import pytest

from salamander_tpu.containers import AnnData
from salamander_tpu.models import MvNMF


@pytest.fixture(scope="module")
def data_dir(reference_data_path):
    return reference_data_path / "models" / "mvnmf"


@pytest.fixture
def adata(data_dir):
    counts = pd.read_csv(data_dir / "counts.csv", index_col=0)
    return AnnData(counts.T)


@pytest.fixture(params=[1, 2])
def nsigs(request):
    return request.param


@pytest.fixture
def model_init(data_dir, adata, nsigs):
    W = np.load(data_dir / f"W_init_nsigs{nsigs}.npy")
    H = np.load(data_dir / f"H_init_nsigs{nsigs}.npy")
    asignatures = AnnData(W.T)
    asignatures.var_names = adata.var_names
    model = MvNMF(n_signatures=nsigs)
    model.adata = adata
    model.asignatures = asignatures
    model.adata.obsm["exposures"] = H.T
    model._gamma = 1.0
    return model


def test_objective_function(data_dir, model_init, nsigs):
    expected = np.load(data_dir / f"objective_init_nsigs{nsigs}.npy")
    assert np.allclose(model_init.objective_function(), expected)


def test_update_W(data_dir, model_init, nsigs):
    expected = np.load(data_dir / f"W_updated_nsigs{nsigs}.npy")
    model_init._update_W()
    assert np.allclose(model_init.asignatures.X, expected.T)


def test_update_H(data_dir, model_init, nsigs):
    expected = np.load(data_dir / f"H_updated_nsigs{nsigs}.npy")
    model_init._update_H()
    assert np.allclose(model_init.adata.obsm["exposures"], expected.T)


def test_given_signatures_through_fit(adata, nsigs):
    for n_given in range(1, nsigs + 1):
        given = adata[:n_given, :].copy()
        given.X = given.X / np.sum(given.X, axis=1, keepdims=True)
        model = MvNMF(n_signatures=nsigs, min_iterations=3, max_iterations=3)
        model.fit(adata, given_parameters={"asignatures": given})
        assert np.allclose(given.X, model.asignatures.X[:n_given, :])


def test_fit_monotone_and_gamma_carried(adata):
    model = MvNMF(
        n_signatures=2, init_method="random",
        min_iterations=20, max_iterations=100, conv_test_freq=10,
    )
    model.fit(adata, init_kwargs={"seed": 5})
    trace = model.history["objective_function"]
    diffs = np.diff(trace)
    assert np.all(diffs <= np.abs(np.asarray(trace[:-1])) * 1e-6 + 1e-8)
    assert 0.0 < model._gamma <= 1.0
