"""Catalog annotation of de novo signatures (tools.annotate_signatures).

Beyond-reference: the reference's utils.match_to_catalog (utils.py:148-170)
returns only the matched catalog rows; here we pin the similarity table,
Hungarian uniqueness, the novelty flag and in-place model renaming.
"""

import numpy as np
import pandas as pd
import pytest

import salamander_tpu as sal
from salamander_tpu import tools as tl
from salamander_tpu.containers import AnnData


@pytest.fixture(scope="module")
def catalog():
    rng = np.random.default_rng(0)
    n_features, n_entries = 24, 8
    C = np.full((n_entries, n_features), 0.01)
    block = n_features // n_entries
    for k in range(n_entries):
        C[k, k * block:(k + 1) * block] += 1.0
    C = C / C.sum(axis=1, keepdims=True)
    return pd.DataFrame(
        C, index=[f"SBS{k+1}" for k in range(n_entries)],
        columns=[f"f{v}" for v in range(n_features)],
    )


def _perturbed(catalog, rows, scale, seed=1):
    rng = np.random.default_rng(seed)
    S = catalog.to_numpy()[rows] + scale * rng.random(
        (len(rows), catalog.shape[1])
    )
    S = S / S.sum(axis=1, keepdims=True)
    return pd.DataFrame(
        S, index=[f"denovo{i}" for i in range(len(rows))],
        columns=catalog.columns,
    )


def test_recovers_identity_matches(catalog):
    rows = [3, 0, 5]
    table = tl.annotate_signatures(_perturbed(catalog, rows, 0.02), catalog)
    assert list(table["matched"]) == ["SBS4", "SBS1", "SBS6"]
    assert (table["similarity"] > 0.99).all()
    assert not table["novel"].any()
    assert (table["runner_up_similarity"] < table["similarity"]).all()
    assert list(table.index) == ["denovo0", "denovo1", "denovo2"]


def test_novel_flag_below_threshold(catalog):
    rng = np.random.default_rng(7)
    flat = rng.random((1, catalog.shape[1]))
    flat = flat / flat.sum()
    sigs = pd.DataFrame(flat, index=["weird"], columns=catalog.columns)
    table = tl.annotate_signatures(sigs, catalog, min_similarity=0.95)
    assert bool(table["novel"].iloc[0])


def test_unique_prevents_double_claim(catalog):
    # two noisy copies of the SAME catalog entry: independent argmax gives
    # both to SBS3, Hungarian must split them
    sigs = _perturbed(catalog, [2, 2], 0.15, seed=3)
    plain = tl.annotate_signatures(sigs, catalog)
    assert list(plain["matched"]) == ["SBS3", "SBS3"]
    uniq = tl.annotate_signatures(sigs, catalog, unique=True)
    assert sorted(uniq["matched"]) != ["SBS3", "SBS3"]
    assert "SBS3" in list(uniq["matched"])
    with pytest.raises(ValueError, match="catalog size"):
        tl.annotate_signatures(
            _perturbed(catalog, list(range(8)) + [0], 0.05), catalog,
            unique=True,
        )


def test_feature_order_and_orientation_invariance(catalog):
    sigs = _perturbed(catalog, [1, 4], 0.02)
    base = tl.annotate_signatures(sigs, catalog)
    shuffled = catalog.iloc[:, ::-1].T  # features x signatures, reversed
    other = tl.annotate_signatures(sigs, shuffled)
    pd.testing.assert_frame_equal(base, other)
    with pytest.raises(ValueError, match="do not match"):
        tl.annotate_signatures(sigs, catalog.iloc[:, :-1])
    with pytest.raises(TypeError, match="DataFrame"):
        tl.annotate_signatures(sigs, catalog.to_numpy())


def test_model_rename_propagates(catalog):
    # plant exactly two catalog signatures, fit at k=2, rename
    rng = np.random.default_rng(5)
    W = catalog.to_numpy()[[2, 6]].T  # (V, 2)
    H = rng.gamma(2.0, 500.0, size=(2, 40))
    X = np.maximum(np.round(W @ H).T, 1.0)  # samples x features
    adata = AnnData(pd.DataFrame(
        X, index=[f"s{d}" for d in range(40)], columns=catalog.columns
    ))
    model = sal.models.KLNMF(n_signatures=2, min_iterations=200,
                             max_iterations=2000)
    model.fit(adata, init_kwargs={"seed": 0})
    table = tl.annotate_signatures(model, catalog, rename=True)
    assert sorted(table["matched"]) == ["SBS3", "SBS7"]
    assert sorted(model.signature_names) == sorted(table.index)
    # renames propagate to the exposures surface
    assert sorted(model.exposures.columns) == sorted(table.index)


def test_rename_requires_model(catalog):
    sigs = _perturbed(catalog, [0], 0.02)
    with pytest.raises(ValueError, match="fitted model"):
        tl.annotate_signatures(sigs, catalog, rename=True)


def test_duplicate_rename_suffixes(catalog):
    sigs = _perturbed(catalog, [2, 2], 0.1, seed=9)
    # force both onto SBS3 via plain argmax with a fitted-model-like shim
    class Shim:
        pass

    # build a tiny real model instead: fit k=2 on data planted from ONE
    # catalog signature twice is degenerate; test the suffix logic through
    # the table path by monkey-free means: model with 2 sigs both near SBS3
    adata_frame = pd.DataFrame(
        np.maximum(np.round(
            sigs.to_numpy().T @ np.random.default_rng(2).gamma(
                2.0, 500.0, size=(2, 30))).T, 1.0),
        columns=catalog.columns,
    )
    model = sal.models.KLNMF(n_signatures=2, min_iterations=100,
                             max_iterations=500)
    model.fit(AnnData(adata_frame), init_kwargs={"seed": 1})
    table = tl.annotate_signatures(model, catalog, rename=True)
    names = list(table.index)
    assert len(set(names)) == 2  # deduplicated even if both match SBS3


# ---------------------------------------------------------------------- #
# decompose_signatures
# ---------------------------------------------------------------------- #

def test_decompose_recovers_planted_mixtures(catalog):
    """De novo signatures built as known sparse catalog mixtures decompose
    back to the planted supports and weights."""
    C = catalog.to_numpy()
    mixtures = np.stack([
        0.7 * C[0] + 0.3 * C[3],
        1.0 * C[5],
        0.5 * C[1] + 0.3 * C[2] + 0.2 * C[7],
    ])
    sigs = pd.DataFrame(
        mixtures, index=["Sig1", "Sig2", "Sig3"], columns=catalog.columns
    )
    result = tl.decompose_signatures(sigs, catalog)

    planted = {
        "Sig1": {"SBS1": 0.7, "SBS4": 0.3},
        "Sig2": {"SBS6": 1.0},
        "Sig3": {"SBS2": 0.5, "SBS3": 0.3, "SBS8": 0.2},
    }
    for name, expected in planted.items():
        active = set(result.active.columns[result.active.loc[name]])
        assert active == set(expected), (name, active)
        for component, weight in expected.items():
            np.testing.assert_allclose(
                result.weights.loc[name, component], weight, atol=0.02
            )
    # rows renormalized to exactly one; off-support exactly zero
    np.testing.assert_allclose(result.weights.sum(axis=1), 1.0, rtol=1e-12)
    assert (result.weights.to_numpy()[~result.active.to_numpy()] == 0).all()
    assert (result.cosine > 0.999).all()
    # table is long-form, weights descending within each signature
    sub = result.table[result.table["signature"] == "Sig3"]
    assert list(sub["weight"]) == sorted(sub["weight"], reverse=True)
    assert set(sub["component"]) == {"SBS2", "SBS3", "SBS8"}


def test_decompose_min_weight_prunes_trace_components(catalog):
    """Sub-threshold contamination is pruned and the support refit; with
    min_weight=0 it survives."""
    C = catalog.to_numpy()
    sig = 0.7 * C[0] + 0.295 * C[3] + 0.005 * C[6]
    sigs = pd.DataFrame([sig], index=["Sig1"], columns=catalog.columns)
    pruned = tl.decompose_signatures(sigs, catalog)  # min_weight=0.01
    assert set(pruned.active.columns[pruned.active.loc["Sig1"]]) == {
        "SBS1", "SBS4"
    }
    np.testing.assert_allclose(pruned.weights.sum(axis=1), 1.0, rtol=1e-12)
    assert pruned.cosine["Sig1"] > 0.999

    raw = tl.decompose_signatures(sigs, catalog, min_weight=0.0)
    assert "SBS7" in set(raw.active.columns[raw.active.loc["Sig1"]])


def test_decompose_novel_signature_keeps_support_with_low_cosine(catalog):
    """A signature far from the catalog's cone still decomposes (dense or
    not) but its reconstruction cosine exposes the misfit."""
    rng = np.random.default_rng(3)
    novel = rng.dirichlet(np.full(catalog.shape[1], 0.05))
    sigs = pd.DataFrame(
        [novel], index=["Weird"], columns=catalog.columns
    )
    result = tl.decompose_signatures(sigs, catalog)
    assert result.cosine["Weird"] < 0.99
    np.testing.assert_allclose(result.weights.sum(axis=1), 1.0, rtol=1e-12)


def test_decompose_validates(catalog):
    sigs = pd.DataFrame(
        np.zeros((1, catalog.shape[1])), index=["Z"], columns=catalog.columns
    )
    with pytest.raises(ValueError, match="positive total mass"):
        tl.decompose_signatures(sigs, catalog)
