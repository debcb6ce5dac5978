"""Parity of the CorrNMF kernels against the reference goldens: exposures,
aux sufficient statistic, ELBO, closed-form scalings, the vmap-batched Newton
embedding updates (vs scipy Newton-CG, incl. the maxiter=3 sample cap), and
the variance M-step."""

import numpy as np
import pandas as pd
import pytest

from salamander_tpu.ops import corrnmf, klnmf


@pytest.fixture(scope="module")
def data_dir(reference_data_path):
    return reference_data_path / "models" / "corrnmf"


@pytest.fixture(params=[(1, 1), (2, 2)], ids=["nsigs1_dim1", "nsigs2_dim2"])
def state(request, data_dir):
    nsigs, dim = request.param
    sfx = f"nsigs{nsigs}_dim{dim}.npy"

    def load(name):
        return np.load(data_dir / f"{name}_{sfx}")

    counts = pd.read_csv(data_dir / "counts.csv", index_col=0).T
    return {
        "sfx": sfx,
        "load": load,
        "X": counts.values.astype(float),                # (D, V)
        "signatures": load("signatures_mat_init").T,     # (K, V)
        "signature_scalings": load("signature_scalings_init"),
        "sample_scalings": load("sample_scalings_init"),
        "signature_embeddings": load("signature_embeddings_init").T,  # (K, m)
        "sample_embeddings": load("sample_embeddings_init").T,        # (D, m)
        "variance": float(load("variance_init")),
        "aux": load("aux"),
    }


def exposures_of(state):
    return np.asarray(
        corrnmf.compute_exposures(
            state["signature_scalings"],
            state["sample_scalings"],
            state["signature_embeddings"],
            state["sample_embeddings"],
        )
    )


def test_compute_aux(state):
    aux = corrnmf.compute_aux(state["X"], state["signatures"], exposures_of(state))
    assert np.allclose(aux, state["aux"])


def test_elbo(state):
    expected = state["load"]("objective_init")
    elbo = corrnmf.elbo_corrnmf(
        state["X"],
        state["signatures"],
        exposures_of(state),
        state["signature_embeddings"],
        state["sample_embeddings"],
        state["variance"],
    )
    assert np.allclose(elbo, expected)


def test_update_signature_scalings(state):
    expected = state["load"]("signature_scalings_updated")
    result = corrnmf.update_signature_scalings(
        state["aux"],
        state["sample_scalings"],
        state["signature_embeddings"],
        state["sample_embeddings"],
    )
    assert np.allclose(result, expected)


def test_update_sample_scalings(state):
    expected = state["load"]("sample_scalings_updated")
    result = corrnmf.update_sample_scalings(
        state["X"],
        state["signature_scalings"],
        state["signature_embeddings"],
        state["sample_embeddings"],
    )
    assert np.allclose(result, expected)


def test_update_signature_embeddings(state):
    """Full-convergence Newton must land on scipy Newton-CG's optimum."""
    expected = state["load"]("signature_embeddings_updated").T
    result = corrnmf.update_embeddings(
        state["signature_embeddings"],
        state["sample_embeddings"],
        state["signature_scalings"],
        state["sample_scalings"],
        state["variance"],
        state["aux"],
        max_iter=100,
    )
    assert np.allclose(result, expected)


def test_update_sample_embeddings_maxiter3(state):
    """Three batched Newton steps reproduce scipy Newton-CG with maxiter=3."""
    expected = state["load"]("sample_embeddings_updated").T
    result = corrnmf.update_embeddings(
        state["sample_embeddings"],
        state["signature_embeddings"],
        state["sample_scalings"],
        state["signature_scalings"],
        state["variance"],
        state["aux"].T,
        max_iter=3,
    )
    assert np.allclose(result, expected)


def test_update_variance(state):
    expected = state["load"]("variance_updated")
    result = corrnmf.update_variance(
        state["signature_embeddings"], state["sample_embeddings"]
    )
    assert np.allclose(result, expected)


def test_update_signatures(state):
    expected = state["load"]("signatures_mat_updated").T
    W_new = klnmf.update_W(state["X"].T, state["signatures"].T, exposures_of(state).T)
    assert np.allclose(np.asarray(W_new).T, expected)


def test_embedding_update_improves_surrogate(state):
    """Each updated embedding must not worsen its own surrogate objective."""
    aux = state["aux"]
    updated = np.asarray(
        corrnmf.update_embeddings(
            state["signature_embeddings"],
            state["sample_embeddings"],
            state["signature_scalings"],
            state["sample_scalings"],
            state["variance"],
            aux,
            max_iter=50,
        )
    )
    for k in range(updated.shape[0]):
        before = float(
            corrnmf.embedding_objective(
                state["signature_embeddings"][k],
                state["sample_embeddings"],
                state["signature_scalings"][k],
                state["sample_scalings"],
                state["variance"],
                aux[k],
            )
        )
        after = float(
            corrnmf.embedding_objective(
                updated[k],
                state["sample_embeddings"],
                state["signature_scalings"][k],
                state["sample_scalings"],
                state["variance"],
                aux[k],
            )
        )
        assert after <= before + 1e-10 * abs(before)


def test_multimodal_vector_scalings_shape():
    """The joint sample update accepts per-row scaling VECTORS (multimodal)."""
    rng = np.random.default_rng(0)
    n, m, dim = 5, 4, 2
    emb0 = rng.normal(size=(n, dim))
    others = rng.normal(size=(m, dim))
    scalings_vec = rng.normal(size=(n, m)) * 0.1
    scalings_other = rng.normal(size=m) * 0.1
    aux = np.abs(rng.normal(size=(n, m))) + 0.5
    out = corrnmf.update_embeddings(
        emb0, others, scalings_vec, scalings_other, 1.0, aux, max_iter=10
    )
    assert np.asarray(out).shape == (n, dim)
    assert np.all(np.isfinite(np.asarray(out)))


def test_embedding_gradient_and_hessian_consistency():
    """Public gradient/Hessian kernels agree with autodiff of the objective."""
    import jax

    rng = np.random.default_rng(3)
    m, M = 3, 7
    embedding = rng.normal(size=m)
    others = rng.normal(size=(M, m)) * 0.5
    scaling = 0.2
    scalings_other = rng.normal(size=M) * 0.1
    aux_vec = np.abs(rng.normal(size=M)) + 0.5
    variance = 1.5

    def objective(b):
        return corrnmf.embedding_objective(
            b, others, scaling, scalings_other, variance, aux_vec
        )

    grad_auto = jax.grad(objective)(embedding)
    grad_kernel = corrnmf.embedding_gradient(
        embedding, others, scaling, scalings_other, variance, aux_vec
    )
    np.testing.assert_allclose(grad_kernel, grad_auto, rtol=1e-8)

    hess_auto = jax.hessian(objective)(embedding)
    hess_kernel = corrnmf.embedding_hessian(
        embedding, others, scaling, scalings_other, variance
    )
    np.testing.assert_allclose(hess_kernel, hess_auto, rtol=1e-8)
    # SPD: all eigenvalues positive
    assert np.all(np.linalg.eigvalsh(np.asarray(hess_kernel)) > 0)
