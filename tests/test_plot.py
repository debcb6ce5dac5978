"""Plotting: sample-ordering logic (reference-pinned semantics) plus figure
smoke tests for the full plot family on a fitted model."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from salamander_tpu import plot
from salamander_tpu.consts import (
    CN_TYPES_48,
    DBS_TYPES_78,
    INDEL_TYPES_83,
    SBS_TYPES_96,
    SV_TYPES_32,
)
from salamander_tpu.containers import AnnData


@pytest.fixture
def data():
    counts = np.array([[1, 1], [2, 3], [3, 2], [4, 4]])
    return pd.DataFrame(counts, index=["a", "b", "c", "d"])


def positions(order):
    return {name: int(np.where(order == name)[0][0]) for name in "abcd"}


def test_get_obs_order_normalized(data):
    pos = positions(plot.get_obs_order(data, normalize=True))
    # relative values: a == d (uniform rows), b and c are mirrored extremes
    assert abs(pos["a"] - pos["d"]) == 1
    assert abs(pos["b"] - pos["c"]) == 3


def test_get_obs_order_unnormalized(data):
    pos = positions(plot.get_obs_order(data, normalize=False))
    # absolute values: a and d are the extremes, b and c adjacent
    assert abs(pos["a"] - pos["d"]) == 3
    assert abs(pos["b"] - pos["c"]) == 1


def test_reorder_data_uses_relative_values(data):
    reordered = plot._reorder_data(data)
    pos = positions(reordered.index.to_numpy())
    assert abs(pos["a"] - pos["d"]) == 1
    assert abs(pos["b"] - pos["c"]) == 3


def test_reorder_data_custom_order(data):
    custom = ["b", "a", "c", "d"]
    reordered = plot._reorder_data(data, obs_order=custom)
    assert list(reordered.index) == custom


def test_barplot_colors_resolution():
    assert plot._get_colors_barplot(SBS_TYPES_96) == plot._get_colors_barplot(
        ["x"] * 96, "SBS96"
    )
    assert len(plot._get_colors_barplot(INDEL_TYPES_83)) == 83
    assert plot._get_colors_barplot(DBS_TYPES_78) == plot._get_colors_barplot(
        ["x"] * 78, "DBS78"
    )
    # 10 reference-doublet groups, contiguous group coloring
    assert len(set(plot._get_colors_barplot(DBS_TYPES_78))) == 10
    assert plot._get_colors_barplot(["a", "b"], "red") == ["red", "red"]
    assert plot._get_colors_barplot(["a", "b"]) == ["gray", "gray"]
    with pytest.raises(ValueError):
        plot._get_colors_barplot(["a", "b"], ["red"])
    with pytest.raises(ValueError):
        plot._get_colors_barplot(["a"] * 5, "SBS96")
    with pytest.raises(ValueError):
        plot._get_colors_barplot(["a"] * 5, "DBS78")


def test_barplot_colors_cn48_sv32():
    assert plot._get_colors_barplot(CN_TYPES_48) == plot._get_colors_barplot(
        ["x"] * 48, "CN48"
    )
    # 10 (total copy number, zygosity) groups, contiguous group coloring
    assert len(set(plot._get_colors_barplot(CN_TYPES_48))) == 10
    assert plot._get_colors_barplot(SV_TYPES_32) == plot._get_colors_barplot(
        ["x"] * 32, "SV32"
    )
    # 8 (cluster status, SV class) groups
    assert len(set(plot._get_colors_barplot(SV_TYPES_32))) == 8
    with pytest.raises(ValueError):
        plot._get_colors_barplot(["a"] * 5, "CN48")
    with pytest.raises(ValueError):
        plot._get_colors_barplot(["a"] * 5, "SV32")


def test_barplot_draws_resolved_channel_colors():
    """Drawn-artist regression: a one-signature SBS-96 barplot must draw 96
    bars whose facecolors are exactly the auto-resolved trinucleotide
    palette and whose heights are the row-normalized values."""
    from matplotlib.colors import to_rgba

    rng = np.random.default_rng(0)
    values = rng.uniform(0.5, 2.0, size=96)
    frame = pd.DataFrame([values], index=["SigX"], columns=SBS_TYPES_96)
    ax = plot._barplot_single(frame)
    bars = ax.patches
    assert len(bars) == 96
    expected_colors = [to_rgba(c) for c in plot._get_colors_barplot(SBS_TYPES_96)]
    drawn = [bar.get_facecolor() for bar in bars]
    assert drawn == expected_colors
    heights = np.array([bar.get_height() for bar in bars])
    np.testing.assert_allclose(heights, values / values.sum(), rtol=1e-12)
    assert ax.get_title() == "SigX"
    plt.close("all")


def test_stacked_barplot_layout():
    """Drawn-artist regression: stacked exposure bars are row-normalized
    (per-sample stacks reach exactly 1) and signatures stack in total-
    contribution order (largest at the bottom)."""
    rng = np.random.default_rng(1)
    exposures = pd.DataFrame(
        rng.gamma(2.0, 10.0, size=(6, 3)),
        index=[f"s{i}" for i in range(6)],
        columns=["SigA", "SigB", "SigC"],
    )
    # make SigC dominate, SigA smallest
    exposures["SigC"] *= 10.0
    exposures["SigA"] *= 0.1
    ax = plot.stacked_barplot(exposures, annotate_obs=False)
    bars = ax.patches
    n_samples, n_sigs = exposures.shape
    assert len(bars) == n_samples * n_sigs
    # per-sample stacked heights reach exactly 1 (row normalization)
    tops = {}
    for bar in bars:
        x = round(bar.get_x(), 6)
        tops[x] = max(tops.get(x, 0.0), bar.get_y() + bar.get_height())
    np.testing.assert_allclose(sorted(tops.values()), np.ones(n_samples),
                               rtol=1e-9)
    # the legend lists signatures in contribution order, biggest first
    legend = ax.get_legend()
    labels = [t.get_text() for t in legend.get_texts()]
    assert labels == ["SigC", "SigB", "SigA"]
    # and the bottom layer of each stack is the dominant signature
    bottom_heights = [b.get_height() for b in bars if abs(b.get_y()) < 1e-12]
    normalized = exposures.div(exposures.sum(axis=1), axis=0)
    np.testing.assert_allclose(
        sorted(bottom_heights), sorted(normalized["SigC"]), rtol=1e-9
    )
    plt.close("all")


def test_history_plot_x_grid():
    """history() plots the objective against the conv_test_freq iteration
    grid (the reference's x axis semantics, plot.py:45-72)."""
    values = [5.0, 4.0, 3.5, 3.3]
    ax = plot.history(values=values, conv_test_freq=10)
    line = ax.get_lines()[0]
    np.testing.assert_array_equal(line.get_xdata(), [10, 20, 30, 40])
    np.testing.assert_array_equal(line.get_ydata(), values)
    plt.close("all")


def test_cn48_sv32_vocabulary_structure():
    # homdel carries 3 coarse length bins; every other CN group carries 5
    assert len(CN_TYPES_48) == len(set(CN_TYPES_48)) == 48
    homdel = [c for c in CN_TYPES_48 if c.split(":")[1] == "homdel"]
    assert len(homdel) == 3 and homdel[0] == "0:homdel:0-100kb"
    assert sum(c.split(":")[1] == "LOH" for c in CN_TYPES_48) == 25
    assert sum(c.split(":")[1] == "het" for c in CN_TYPES_48) == 20
    # translocations carry no length bin; the other SV classes carry 5
    assert len(SV_TYPES_32) == len(set(SV_TYPES_32)) == 32
    assert "clustered_trans" in SV_TYPES_32
    assert "non-clustered_trans" in SV_TYPES_32
    assert sum(c.endswith("_trans") for c in SV_TYPES_32) == 2
    assert SV_TYPES_32[0] == "clustered_del_1-10Kb"
    assert sum(c.startswith("clustered_") for c in SV_TYPES_32) == 16


@pytest.fixture(scope="module")
def fitted_model(reference_data_path):
    from salamander_tpu.models import KLNMF

    counts = pd.read_csv(
        reference_data_path / "models" / "klnmf" / "counts.csv", index_col=0
    )
    model = KLNMF(n_signatures=3, min_iterations=30, max_iterations=30)
    model.fit(AnnData(counts.T))
    return model


def test_history_plot(fitted_model):
    ax = fitted_model.plot_history()
    assert ax.get_xlabel() == "n_iteration"
    lines = ax.get_lines()
    assert len(lines) == 1
    assert len(lines[0].get_xdata()) == len(
        fitted_model.history["objective_function"]
    )
    plt.close("all")


def test_history_min_iteration_guard(fitted_model):
    with pytest.raises(ValueError):
        fitted_model.plot_history(min_iteration=10_000_000)
    plt.close("all")


def test_signature_barplots(fitted_model):
    axes = fitted_model.plot_signatures()
    assert len(axes) == 3
    assert axes[0].get_title() == "Sig1"
    plt.close("all")


def test_stacked_exposures(fitted_model):
    ax = fitted_model.plot_exposures()
    # all bars stack to one
    assert ax is not None
    plt.close("all")


def test_correlation_plot(fitted_model):
    grid = fitted_model.plot_correlation()
    assert grid is not None
    plt.close("all")


def test_embedding_plot(fitted_model):
    # 3 signatures -> reduce_dimension over exposures, pca path
    ax = fitted_model.plot_embeddings(method="pca")
    assert ax is not None
    plt.close("all")


def test_embedding_plot_low_rank_warns(reference_data_path):
    from salamander_tpu.models import KLNMF

    counts = pd.read_csv(
        reference_data_path / "models" / "klnmf" / "counts.csv", index_col=0
    )
    model = KLNMF(n_signatures=2, min_iterations=5, max_iterations=5)
    model.fit(AnnData(counts.T))
    with pytest.warns(UserWarning):
        ax = model.plot_embeddings(method="pca")
    assert ax is not None
    plt.close("all")


def test_scatter_numpy_1d_and_2d():
    ax = plot.scatter_numpy(np.arange(5.0), annotations=[str(i) for i in range(5)])
    assert ax is not None
    ax2 = plot.scatter_numpy(np.random.default_rng(0).normal(size=(6, 2)))
    assert ax2 is not None
    with pytest.raises(ValueError):
        plot.scatter_numpy(np.zeros((4, 3)))
    plt.close("all")


def test_barplot_with_catalog_matching(fitted_model):
    catalog = pd.DataFrame(
        np.random.default_rng(0).dirichlet(
            np.ones(fitted_model.adata.n_vars), size=7
        ),
        index=[f"CAT{i}" for i in range(7)],
        columns=fitted_model.adata.var_names,
    )
    axes = plot.barplot_pandas(fitted_model.signatures, catalog=catalog)
    assert axes.shape == (3, 2)  # each signature next to its best match
    plt.close("all")


def test_exposure_uncertainty_plot():
    import pandas as pd

    from salamander_tpu import plot as pl
    from salamander_tpu.assign import BootstrapExposuresResult

    rng = np.random.default_rng(0)
    samples = [f"s{d}" for d in range(3)]
    sigs = [f"Sig{k}" for k in range(5)]
    point = pd.DataFrame(rng.gamma(2.0, 100.0, (3, 5)), index=samples,
                         columns=sigs)
    spread = 0.15 * point
    boot = BootstrapExposuresResult(
        point=point,
        mean=point,
        std=spread,
        quantiles={0.05: point - spread, 0.95: point + spread},
        presence=pd.DataFrame(rng.random((3, 5)), index=samples,
                              columns=sigs),
    )
    ax = pl.exposure_uncertainty(boot, "s1", top=4)
    assert len(ax.get_yticklabels()) == 4
    labels = {t.get_text() for t in ax.get_yticklabels()}
    assert labels <= set(sigs)
    import matplotlib.pyplot as plt

    plt.close("all")


def test_decomposition_plot():
    import matplotlib.pyplot as plt
    import pandas as pd

    from salamander_tpu import plot as pl
    from salamander_tpu import tools as tl

    C = np.full((6, 18), 0.01)
    for k in range(6):
        C[k, k * 3:(k + 1) * 3] += 1.0
    C = C / C.sum(axis=1, keepdims=True)
    catalog = pd.DataFrame(
        C, index=[f"SBS{k+1}" for k in range(6)],
        columns=[f"f{v}" for v in range(18)],
    )
    sigs = pd.DataFrame(
        [0.6 * C[0] + 0.4 * C[2], C[4]],
        index=["Sig1", "Sig2"], columns=catalog.columns,
    )
    decomp = tl.decompose_signatures(sigs, catalog)
    ax = pl.decomposition(decomp)
    assert [t.get_text() for t in ax.get_yticklabels()] == ["Sig1", "Sig2"]
    # stacked segments cover the unit interval per signature
    widths = [p.get_width() for p in ax.patches]
    np.testing.assert_allclose(sum(widths), 2.0, rtol=1e-6)
    plt.close("all")
