"""MultimodalCorrNMF model-layer parity: aux recomputed from the saved full
p tensors, each joint-EM sub-update vs goldens, modality-prefixed signature
naming, and per-modality given-parameter isolation."""

import numpy as np
import pandas as pd
import pytest

from salamander_tpu.containers import AnnData, MuData
from salamander_tpu.models import MultimodalCorrNMF

N_MOD = 2
NS_SIGNATURES = [2, 3]
DIM_EMBEDDINGS = 2


@pytest.fixture(scope="module")
def data_dir(reference_data_path):
    return reference_data_path / "models" / "multimodal_corrnmf"


@pytest.fixture(scope="module")
def counts(data_dir):
    return {
        f"mod{n}": pd.read_csv(data_dir / f"model{n}_counts.csv", index_col=0).T
        for n in range(N_MOD)
    }


@pytest.fixture
def mdata(data_dir, counts):
    adatas = {name: AnnData(data) for name, data in counts.items()}
    mdata = MuData(adatas)
    mdata.obsm["embeddings"] = np.load(
        data_dir / "sample_embeddings_init.npy"
    ).T
    for n in range(N_MOD):
        mdata[f"mod{n}"].obs["scalings"] = np.load(
            data_dir / f"model{n}_sample_scalings_init.npy"
        )
    return mdata


@pytest.fixture
def model_init(data_dir, mdata):
    asignatures = {}
    for n in range(N_MOD):
        name = f"mod{n}"
        asigs = AnnData(np.load(data_dir / f"model{n}_signatures_mat_init.npy").T)
        asigs.var_names = mdata[name].var_names
        asigs.obs["scalings"] = np.load(
            data_dir / f"model{n}_signature_scalings_init.npy"
        )
        asigs.obsm["embeddings"] = np.load(
            data_dir / f"model{n}_signature_embeddings_init.npy"
        ).T
        asignatures[name] = asigs

    model = MultimodalCorrNMF(
        ns_signatures=NS_SIGNATURES, dim_embeddings=DIM_EMBEDDINGS
    )
    model.mdata = mdata
    model.asignatures = asignatures
    model.compute_exposures()
    model.variance = float(np.load(data_dir / "variance_init.npy"))
    return model


@pytest.fixture
def auxs(data_dir, counts):
    """Recompute aux from the saved full posterior tensors p (k x d sums)."""
    return {
        f"mod{n}": np.einsum(
            "vd,vkd->kd",
            counts[f"mod{n}"].T.values,
            np.load(data_dir / f"model{n}_p.npy"),
        )
        for n in range(N_MOD)
    }


def test_compute_aux_matches_full_p(model_init, auxs):
    computed = model_init._compute_auxs()
    for name, aux in computed.items():
        assert np.allclose(aux, auxs[name])


def test_objective_function(data_dir, model_init):
    expected = np.load(data_dir / "objective_init.npy")
    assert np.allclose(model_init.objective_function(), expected)


def test_init_signature_names(model_init):
    given_parameters = {}
    for name, adata in model_init.mdata.mod.items():
        asigs = AnnData(np.zeros((1, adata.n_vars)))
        asigs.obs_names = ["A"]
        asigs.var_names = adata.var_names
        given_parameters[name] = {"asignatures": asigs}
    model_init._initialize(given_parameters)
    for name, asigs in model_init.asignatures.items():
        names = list(asigs.obs_names)
        assert names[0] == "A"
        assert names[1:] == [f"{name} Sig{k}" for k in range(1, len(names))]


class TestUpdates:
    def test_update_signatures(self, data_dir, model_init):
        model_init.update_signatures()
        for n in range(N_MOD):
            expected = np.load(
                data_dir / f"model{n}_signatures_mat_updated.npy"
            ).T
            assert np.allclose(model_init.asignatures[f"mod{n}"].X, expected)

    def test_update_sample_scalings(self, data_dir, model_init):
        model_init.update_sample_scalings()
        for n in range(N_MOD):
            expected = np.load(data_dir / f"model{n}_sample_scalings_updated.npy")
            assert np.allclose(
                np.asarray(model_init.mdata[f"mod{n}"].obs["scalings"]), expected
            )

    def test_update_signature_scalings(self, data_dir, model_init, auxs):
        model_init.update_signature_scalings(auxs)
        for n in range(N_MOD):
            expected = np.load(
                data_dir / f"model{n}_signature_scalings_updated.npy"
            )
            assert np.allclose(
                np.asarray(model_init.asignatures[f"mod{n}"].obs["scalings"]),
                expected,
            )

    def test_update_signature_embeddings(self, data_dir, model_init, auxs):
        # scipy's Newton-CG stops at sum|update| < dim*1e-5, so the fixture
        # itself carries ~1e-6 optimizer slack: compare with matching atol.
        model_init.update_signature_embeddings(auxs)
        for n in range(N_MOD):
            expected = np.load(
                data_dir / f"model{n}_signature_embeddings_updated.npy"
            ).T
            assert np.allclose(
                model_init.asignatures[f"mod{n}"].obsm["embeddings"],
                expected,
                atol=1e-5,
            )

    def test_update_sample_embeddings_dominates_golden(
        self, data_dir, model_init, auxs
    ):
        """The joint sample M-step is a 3-step Newton cap, where exact-Newton
        (ours) and scipy's truncated Newton-CG (the fixture) legitimately take
        different paths on this badly-scaled problem. Generalized EM only
        requires the M-step to improve the surrogate, so the contract pinned
        here is per-row objective DOMINANCE over the golden iterate (ours is
        at least as converged), not path equality."""
        from salamander_tpu.ops import corrnmf as ops

        sig_embs = np.concatenate(
            [
                model_init.asignatures[f"mod{n}"].obsm["embeddings"]
                for n in range(N_MOD)
            ]
        )
        sig_scals = np.concatenate(
            [
                np.asarray(model_init.asignatures[f"mod{n}"].obs["scalings"])
                for n in range(N_MOD)
            ]
        )
        aux_all = np.concatenate([auxs[f"mod{n}"] for n in range(N_MOD)])
        scalings_mat = np.concatenate(
            [
                np.tile(
                    np.asarray(model_init.mdata[f"mod{n}"].obs["scalings"])[:, None],
                    (1, k),
                )
                for n, k in zip(range(N_MOD), NS_SIGNATURES)
            ],
            axis=1,
        )
        variance = model_init.variance
        expected = np.load(data_dir / "sample_embeddings_updated.npy").T

        model_init.update_sample_embeddings(auxs)
        result = model_init.mdata.obsm["embeddings"]

        for row in range(expected.shape[0]):
            ours = float(
                ops.embedding_objective(
                    result[row], sig_embs, scalings_mat[row], sig_scals,
                    variance, aux_all.T[row],
                )
            )
            golden = float(
                ops.embedding_objective(
                    expected[row], sig_embs, scalings_mat[row], sig_scals,
                    variance, aux_all.T[row],
                )
            )
            assert ours <= golden + 1e-8 * abs(golden)

    def test_update_sample_embeddings_newton_cg_compat_equals_golden(
        self, data_dir, model_init, auxs
    ):
        """Under the opt-in Newton-CG compatibility mode the joint sample
        M-step runs the reference's exact scipy truncated Newton-CG
        (maxiter=3), so the golden iterate is reproduced EXACTLY - the
        auditable-trace counterpart of the dominance pin above."""
        expected = np.load(data_dir / "sample_embeddings_updated.npy").T
        model_init.newton_cg_compat = True
        model_init.update_sample_embeddings(auxs)
        np.testing.assert_allclose(
            model_init.mdata.obsm["embeddings"], expected, rtol=1e-6,
            atol=1e-9,
        )

    def test_update_signature_embeddings_newton_cg_compat_equals_golden(
        self, data_dir, model_init, auxs
    ):
        model_init.newton_cg_compat = True
        model_init.update_signature_embeddings(auxs)
        for n in range(N_MOD):
            expected = np.load(
                data_dir / f"model{n}_signature_embeddings_updated.npy"
            ).T
            np.testing.assert_allclose(
                model_init.asignatures[f"mod{n}"].obsm["embeddings"],
                expected, rtol=1e-5, atol=1e-8,
            )

    def test_update_variance(self, data_dir, model_init):
        model_init.update_variance()
        expected = np.load(data_dir / "variance_updated.npy")
        assert np.allclose(model_init.variance, expected)


def test_transform_projects_new_multimodal_cohort(counts):
    mdata = MuData({name: AnnData(data.copy()) for name, data in counts.items()})
    model = MultimodalCorrNMF(
        ns_signatures=NS_SIGNATURES, dim_embeddings=2,
        min_iterations=20, max_iterations=40,
    )
    np.random.seed(7)
    model.fit(mdata)
    frozen = {
        name: {
            "signatures": model.asignatures[name].X.copy(),
            "scalings": np.asarray(
                model.asignatures[name].obs["scalings"]
            ).copy(),
            "embeddings": model.asignatures[name].obsm["embeddings"].copy(),
        }
        for name in model.mod_names
    }
    variance = model.variance

    n_new = 4
    new_mdata = MuData(
        {name: AnnData(data[:n_new].copy()) for name, data in counts.items()}
    )
    np.random.seed(8)
    projected = model.transform(new_mdata)
    assert np.isclose(projected.variance, variance)
    for name in model.mod_names:
        # signature side frozen exactly; sample side learned for new cohort
        assert np.allclose(
            projected.asignatures[name].X, frozen[name]["signatures"]
        )
        assert np.allclose(
            np.asarray(projected.asignatures[name].obs["scalings"]),
            frozen[name]["scalings"],
        )
        assert np.allclose(
            projected.asignatures[name].obsm["embeddings"],
            frozen[name]["embeddings"],
        )
        k = len(frozen[name]["scalings"])
        assert projected.mdata[name].obsm["exposures"].shape == (n_new, k)
    assert projected.mdata.obsm["embeddings"].shape == (n_new, 2)
    # original untouched
    for name in model.mod_names:
        assert np.allclose(
            model.asignatures[name].X, frozen[name]["signatures"]
        )


def test_per_modality_update_methods_match_aggregates(model_init, auxs):
    """The reference-named update_*_mod methods (one modality at a time)
    compose to the aggregate updates (reference mmcorrnmf.py:249-345)."""
    import copy

    model_a = model_init
    model_b = copy.deepcopy(model_init)

    model_a.update_sample_scalings()
    for name in model_b.mod_names:
        model_b.update_sample_scalings_mod(name, {})
    for name in model_a.mod_names:
        np.testing.assert_array_equal(
            np.asarray(model_a.mdata[name].obs["scalings"], float),
            np.asarray(model_b.mdata[name].obs["scalings"], float),
        )

    model_a.update_signature_scalings(auxs)
    for name in model_b.mod_names:
        model_b.update_signature_scalings_mod(name, auxs[name], {})
    for name in model_a.mod_names:
        np.testing.assert_array_equal(
            np.asarray(model_a.asignatures[name].obs["scalings"], float),
            np.asarray(model_b.asignatures[name].obs["scalings"], float),
        )

    model_a.update_signature_embeddings(auxs)
    for name in model_b.mod_names:
        model_b.update_signature_embeddings_mod(name, auxs[name])
    for name in model_a.mod_names:
        np.testing.assert_array_equal(
            model_a.asignatures[name].obsm["embeddings"],
            model_b.asignatures[name].obsm["embeddings"],
        )

    model_a.update_signatures()
    for name in model_b.mod_names:
        model_b.update_signatures_mod(name, {})
    for name in model_a.mod_names:
        np.testing.assert_array_equal(
            model_a.asignatures[name].X, model_b.asignatures[name].X
        )

    # frozen flag short-circuits the single-modality method
    before = np.asarray(model_b.mdata[model_b.mod_names[0]].obs["scalings"],
                        float).copy()
    model_b.update_sample_scalings_mod(
        model_b.mod_names[0], {"sample_scalings": before}
    )
    np.testing.assert_array_equal(
        np.asarray(model_b.mdata[model_b.mod_names[0]].obs["scalings"],
                   float),
        before,
    )


def test_transform_preserves_hyperparameters(counts):
    """transform's projector must carry ALL constructor hyperparameters -
    notably dtype and newton_cg_compat (an audit-mode model must project
    with audit-mode numerics)."""
    mdata = MuData({name: AnnData(data.copy()) for name, data in counts.items()})
    model = MultimodalCorrNMF(
        ns_signatures=NS_SIGNATURES, dim_embeddings=2,
        min_iterations=5, max_iterations=10, newton_cg_compat=True,
    )
    np.random.seed(2)
    model.fit(mdata)
    new_mdata = MuData(
        {name: AnnData(data[:3].copy()) for name, data in counts.items()}
    )
    np.random.seed(3)
    projected = model.transform(new_mdata)
    assert projected.newton_cg_compat is True
    assert projected.dtype == model.dtype
    assert projected.tol == model.tol


def test_transform_requires_fitted_and_rejects_given(counts):
    model = MultimodalCorrNMF(ns_signatures=NS_SIGNATURES, dim_embeddings=2)
    mdata = MuData({name: AnnData(data.copy()) for name, data in counts.items()})
    with pytest.raises(ValueError, match="fitted"):
        model.transform(mdata)
    model._is_fitted = True
    with pytest.raises(ValueError, match="given_parameters"):
        model.transform(mdata, given_parameters={})


def test_fit_elbo_increases(counts):
    mdata = MuData({name: AnnData(data.copy()) for name, data in counts.items()})
    model = MultimodalCorrNMF(
        ns_signatures=NS_SIGNATURES, dim_embeddings=2,
        min_iterations=20, max_iterations=40, conv_test_freq=10,
    )
    np.random.seed(4)
    model.fit(mdata)
    trace = model.history["objective_function"]
    diffs = np.diff(trace)
    assert np.all(diffs >= -np.abs(np.asarray(trace[:-1])) * 1e-8 - 1e-8)
    assert model.reconstruction_error > 0
    # exposures per modality with prefixed signature names
    for name, expos in model.exposures.items():
        assert list(expos.columns) == list(model.asignatures[name].obs_names)


@pytest.mark.parametrize(
    "ns_signatures,dim_embeddings", [([1, 2], 1), ([2, 2], 1), ([2, 2], 2)]
)
class TestGivenParameters:
    @pytest.fixture
    def model(self, ns_signatures, dim_embeddings):
        return MultimodalCorrNMF(
            ns_signatures=ns_signatures,
            dim_embeddings=dim_embeddings,
            max_iterations=3,
        )

    def test_given_asignatures_isolated(self, model, mdata):
        name0, name1 = list(mdata.mod.keys())
        n_sigs0 = model.ns_signatures[0]
        for n_given in range(1, n_sigs0 + 1):
            given0 = mdata.mod[name0][:n_given, :].copy()
            given0.X = given0.X.astype(float)
            given0.X = given0.X / np.sum(given0.X, axis=1, keepdims=True)
            given_parameters = {name0: {"asignatures": given0}}
            model.fit(mdata, given_parameters=given_parameters)
            assert np.allclose(
                given0.X, model.asignatures[name0].X[:n_given, :]
            )
            assert not np.allclose(
                given0.X, model.asignatures[name1].X[:n_given, :]
            )
            if n_given < n_sigs0:
                free = model.asignatures[name0].X[n_given:, :].copy()
                model._update_parameters(given_parameters)
                assert not np.allclose(
                    free, model.asignatures[name0].X[n_given:, :]
                )

    def test_given_signature_scalings_isolated(self, model, mdata):
        name0, name1 = list(mdata.mod.keys())
        n_sigs0 = model.ns_signatures[0]
        given0 = np.random.uniform(size=n_sigs0)
        model.fit(mdata, given_parameters={name0: {"signature_scalings": given0}})
        assert np.allclose(
            given0, np.asarray(model.asignatures[name0].obs["scalings"])
        )
        assert not np.allclose(
            given0,
            np.asarray(model.asignatures[name1].obs["scalings"])[:n_sigs0],
        )

    def test_given_signature_embeddings_isolated(self, model, mdata):
        name0, name1 = list(mdata.mod.keys())
        n_sigs0 = model.ns_signatures[0]
        given0 = np.random.uniform(size=(n_sigs0, model.dim_embeddings))
        model.fit(mdata, given_parameters={name0: {"signature_embeddings": given0}})
        assert np.allclose(given0, model.asignatures[name0].obsm["embeddings"])
        assert not np.allclose(
            given0, model.asignatures[name1].obsm["embeddings"][:n_sigs0, :]
        )

    def test_given_sample_scalings_isolated(self, model, mdata):
        name0, name1 = list(mdata.mod.keys())
        given0 = np.random.uniform(size=mdata.n_obs)
        model.fit(mdata, given_parameters={name0: {"sample_scalings": given0}})
        assert np.allclose(
            given0, np.asarray(model.mdata.mod[name0].obs["scalings"])
        )
        assert not np.allclose(
            given0, np.asarray(model.mdata.mod[name1].obs["scalings"])
        )

    def test_given_sample_embeddings(self, model, mdata):
        given = np.random.uniform(size=(mdata.n_obs, model.dim_embeddings))
        model.fit(mdata, given_parameters={"sample_embeddings": given})
        assert np.allclose(given, model.mdata.obsm["embeddings"])

    def test_given_variance(self, model, mdata):
        model.fit(mdata, given_parameters={"variance": 3.0})
        assert np.allclose(3.0, model.variance)


def test_warm_start_continues_multimodal(counts):
    """warm_start=True resumes the joint EM from the containers' state
    (ELBO not worse); an unfitted model is rejected."""
    def mdata():
        return MuData({
            name: AnnData(np.asarray(frame, dtype=float).copy())
            for name, frame in counts.items()
        })

    model = MultimodalCorrNMF(ns_signatures=NS_SIGNATURES,
                              dim_embeddings=DIM_EMBEDDINGS,
                              min_iterations=10, max_iterations=30)
    container = mdata()
    model.fit(container, init_kwargs={"seed": 1})
    elbo_cold = model.objective_function()
    model.fit(container, warm_start=True)
    assert model.objective_function() >= elbo_cold - 1e-9 * abs(elbo_cold)

    fresh = MultimodalCorrNMF(ns_signatures=NS_SIGNATURES,
                              dim_embeddings=DIM_EMBEDDINGS)
    with pytest.raises(ValueError, match="warm_start"):
        fresh.fit(mdata(), warm_start=True)
