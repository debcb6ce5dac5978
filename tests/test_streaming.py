"""Beyond-HBM streaming fits: host-resident X with per-step minibatch
uploads (ops/svi.py run_svi_streaming) must be BITWISE-equal to the
device-resident minibatch path at the same seed - same index sequence
(host replica of the on-device epoch sampler), same epoch-boundary
statistic refreshes, same core step math. The streamed chunked objective
evaluation must match the full-data evaluation up to reduction order.

The reference cannot do any of this: it loads the full count matrix up
front (/root/reference/src/salamander/models/signature_nmf.py:269-281).
"""

import numpy as np
import pytest

from salamander_tpu.containers import AnnData, MuData
from salamander_tpu.models import CorrNMFDet, KLNMF, MultimodalCorrNMF


def make_counts(seed, shape=(57, 12), lam=30.0):
    return np.random.default_rng(seed).poisson(lam, shape).astype(float)


@pytest.mark.parametrize("batch_size", [10, 19])  # 19 divides neither epoch
def test_corrnmf_streaming_equals_resident_bitwise(batch_size):
    X = make_counts(0)

    def fit(streaming):
        model = CorrNMFDet(n_signatures=3, dim_embeddings=2)
        model.fit_minibatch(
            AnnData(X.copy()), batch_size=batch_size, n_steps=37,
            eval_freq=10, seed=3, init_kwargs={"seed": 5},
            streaming=streaming,
        )
        return model

    resident, streamed = fit(False), fit(True)
    np.testing.assert_array_equal(
        resident.asignatures.X, streamed.asignatures.X
    )
    for key in ("exposures", "embeddings"):
        np.testing.assert_array_equal(
            resident.adata.obsm[key], streamed.adata.obsm[key]
        )
    np.testing.assert_array_equal(
        resident.asignatures.obsm["embeddings"],
        streamed.asignatures.obsm["embeddings"],
    )
    assert resident.variance == streamed.variance
    # streamed chunked ELBO trace == full-data trace (reduction order only)
    np.testing.assert_allclose(
        np.asarray(resident.history["objective_function"]),
        np.asarray(streamed.history["objective_function"]),
        rtol=1e-9,
    )


def test_corrnmf_streaming_small_eval_chunk_padding():
    """eval_chunk smaller than (and not dividing) n_samples exercises the
    chunk loop and the index-padded final chunk."""
    X = make_counts(2, shape=(23, 8))
    model = CorrNMFDet(n_signatures=2, dim_embeddings=2)
    model.fit_minibatch(
        AnnData(X.copy()), batch_size=7, n_steps=10, eval_freq=5, seed=1,
        init_kwargs={"seed": 2}, streaming=True, eval_chunk=9,
    )
    reference = CorrNMFDet(n_signatures=2, dim_embeddings=2)
    reference.fit_minibatch(
        AnnData(X.copy()), batch_size=7, n_steps=10, eval_freq=5, seed=1,
        init_kwargs={"seed": 2},
    )
    np.testing.assert_allclose(
        np.asarray(model.history["objective_function"]),
        np.asarray(reference.history["objective_function"]),
        rtol=1e-9,
    )


def test_klnmf_streaming_equals_resident_bitwise_weighted():
    X = make_counts(1)
    weights = np.random.default_rng(9).uniform(0.5, 2.0, X.shape[0])

    def fit(streaming):
        model = KLNMF(n_signatures=3)
        model.fit_minibatch(
            AnnData(X.copy()), batch_size=10, n_steps=25, eval_freq=5,
            seed=2, init_kwargs={"seed": 7}, streaming=streaming,
            fitting_kwargs={"weights_kl": weights.copy(),
                            "weights_lhalf": 0.1},
        )
        return model

    resident, streamed = fit(False), fit(True)
    np.testing.assert_array_equal(
        resident.asignatures.X, streamed.asignatures.X
    )
    np.testing.assert_array_equal(
        resident.adata.obsm["exposures"], streamed.adata.obsm["exposures"]
    )
    np.testing.assert_allclose(
        np.asarray(resident.history["objective_function"]),
        np.asarray(streamed.history["objective_function"]),
        rtol=1e-9,
    )


def test_mm_streaming_equals_resident_bitwise():
    def make_mdata(seed):
        rng = np.random.default_rng(seed)
        return MuData({
            "sbs": AnnData(rng.poisson(30.0, (41, 10)).astype(float)),
            "indel": AnnData(rng.poisson(10.0, (41, 7)).astype(float)),
        })

    def fit(streaming):
        model = MultimodalCorrNMF(ns_signatures=[2, 3], dim_embeddings=2)
        model.fit_minibatch(
            make_mdata(4), batch_size=8, n_steps=23, eval_freq=7, seed=9,
            init_kwargs={"seed": 6}, streaming=streaming,
        )
        return model

    resident, streamed = fit(False), fit(True)
    np.testing.assert_array_equal(
        resident.mdata.obsm["embeddings"], streamed.mdata.obsm["embeddings"]
    )
    for name in ("sbs", "indel"):
        np.testing.assert_array_equal(
            resident.asignatures[name].X, streamed.asignatures[name].X
        )
        np.testing.assert_array_equal(
            resident.mdata[name].obsm["exposures"],
            streamed.mdata[name].obsm["exposures"],
        )
    np.testing.assert_allclose(
        np.asarray(resident.history["objective_function"]),
        np.asarray(streamed.history["objective_function"]),
        rtol=1e-9,
    )


def test_streaming_integer_host_storage_stays_compact():
    """Integer count matrices must NOT be clipped/promoted in place (a
    uint16 cohort at beyond-HBM scale would 4-8x its host footprint);
    the EPSILON clip applies per uploaded batch instead."""
    X = np.random.default_rng(1).poisson(5.0, (33, 9)).astype(np.uint16)
    adata = AnnData(X)
    model = CorrNMFDet(n_signatures=2, dim_embeddings=2,
                       init_method="random")
    model.fit_minibatch(
        adata, batch_size=8, n_steps=11, eval_freq=5, seed=0,
        init_kwargs={"seed": 1}, streaming=True,
    )
    assert adata.X.dtype == np.uint16
    assert adata.X.min() == 0  # zeros NOT lifted on the host
    assert np.all(np.isfinite(model.adata.obsm["exposures"]))
    assert np.all(np.isfinite(model.history["objective_function"]))


def test_streaming_reuses_compiled_programs():
    """A second identical streaming fit must not re-trace the step or the
    chunked objective (the builders and their jit wrappers are cached)."""
    from salamander_tpu.ops import svi

    X = make_counts(5, shape=(30, 8))

    def run():
        model = CorrNMFDet(n_signatures=2, dim_embeddings=2)
        model.fit_minibatch(
            AnnData(X.copy()), batch_size=10, n_steps=8, eval_freq=4,
            seed=1, init_kwargs={"seed": 2}, streaming=True,
        )
        return model

    run()
    # the exact builder call CorrNMFDet.fit_minibatch makes (lru_cache keys
    # include which arguments arrived as keywords)
    step_fn = svi.make_svi_batch_step(
        n_samples=30,
        config=svi.SVIConfig(
            batch_size=10, forgetting=0.7, delay=1.0,
            signature_newton_iters=4, sample_newton_iters=3,
        ),
        n_given_signatures=0,
        fix_signature_scalings=False,
        fix_sample_scalings=False,
        fix_signature_embeddings=False,
        fix_sample_embeddings=False,
        fix_variance=False,
    )
    jitted = svi._jitted(step_fn)
    size_after_first = jitted._cache_size()
    assert size_after_first >= 1
    run()
    assert jitted._cache_size() == size_after_first
