"""Dataset loaders (skipped when the reference data mount is absent) and the
synthetic benchmark-catalog generator."""

import numpy as np
import pytest

from salamander_tpu import datasets


@pytest.fixture(scope="module", autouse=True)
def _need_reference_data(reference_data_path):
    return reference_data_path


def test_pcawg_loaders():
    sbs = datasets.load_pcawg_sbs()
    assert sbs.shape == (192, 96)
    indel = datasets.load_pcawg_indel()
    assert indel.shape == (192, 83)
    sv = datasets.load_pcawg_sv()
    assert sv.shape == (192, 32)
    assert list(sbs.index) == list(indel.index) == list(sv.index)
    # the shipped SV catalog uses the standard SV-32 channel vocabulary,
    # so barplots on it auto-detect the grouped SV palette
    from salamander_tpu.consts import SV_TYPES_32

    assert list(sv.columns) == SV_TYPES_32


def test_cosmic_catalogs():
    sbs_catalog = datasets.load_cosmic_sbs_catalog()
    assert sbs_catalog.shape[1] == 96
    assert sbs_catalog.shape[0] > 50
    np.testing.assert_allclose(sbs_catalog.sum(axis=1), 1.0, rtol=1e-3)
    indel_catalog = datasets.load_cosmic_indel_catalog()
    assert indel_catalog.shape[1] == 83


def test_hrdetect():
    counts, labels = datasets.load_hrdetect()
    assert counts.shape == (311, 96)
    assert len(labels) == 311


def test_synthetic_catalog():
    X, signatures, exposures = datasets.synthetic_catalog(
        n_features=96, n_samples=500, n_signatures=6, seed=1, return_truth=True
    )
    assert X.shape == (96, 500)
    assert signatures.shape == (96, 6)
    assert exposures.shape == (6, 500)
    assert np.all(X > 0)
    np.testing.assert_allclose(signatures.sum(0), 1.0, rtol=1e-9)
    # reproducible
    X2 = datasets.synthetic_catalog(n_features=96, n_samples=500,
                                    n_signatures=6, seed=1)
    assert np.array_equal(X, X2)


def test_missing_file_error(monkeypatch):
    monkeypatch.setattr(datasets, "_SEARCH_PATHS", ["/nonexistent"])
    with pytest.raises(FileNotFoundError):
        datasets.load_pcawg_sbs()
