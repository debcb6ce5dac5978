"""CLI (python -m salamander_tpu) end-to-end on tiny synthetic cohorts.

The reference ships no console entry points; these tests pin the
beyond-reference driver surface: every subcommand runs in-process via
cli.main on CSVs in a temp directory and its outputs round-trip through
the corresponding Python API objects.
"""

import json

import numpy as np
import pandas as pd
import pytest

from salamander_tpu import cli


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    """A planted 3-signature cohort: counts CSV (features x samples, the
    reference data layout) + the true signatures as a catalog CSV."""
    rng = np.random.default_rng(7)
    V, D, K = 12, 24, 3
    W = rng.dirichlet(np.ones(V) * 0.4, size=K)        # (K, V) rows
    H = rng.gamma(2.0, 50.0, size=(D, K))
    X = rng.poisson(H @ W).astype(float) + 1.0
    root = tmp_path_factory.mktemp("cli_cohort")
    counts = pd.DataFrame(
        X,
        index=[f"s{d}" for d in range(D)],
        columns=[f"f{v}" for v in range(V)],
    )
    counts.T.to_csv(root / "counts.csv")               # features x samples
    catalog = pd.DataFrame(
        W,
        index=[f"Cat{k}" for k in range(K)],
        columns=counts.columns,
    )
    catalog.to_csv(root / "catalog.csv")
    return {"root": root, "counts": counts, "catalog": catalog}


def test_parse_ranks():
    assert cli._parse_ranks("2-5") == [2, 3, 4, 5]
    assert cli._parse_ranks("2,4,3,4") == [2, 3, 4]
    assert cli._parse_ranks("7") == [7]
    with pytest.raises(SystemExit):
        cli._parse_ranks("0-2")


def test_read_counts_orientations(cohort):
    by_cols = cli._read_counts(str(cohort["root"] / "counts.csv"), "columns")
    pd.testing.assert_frame_equal(by_cols, cohort["counts"])
    # the transposed layout with --samples-as rows
    (cohort["root"] / "counts_rows.csv").write_text(
        cohort["counts"].to_csv()
    )
    by_rows = cli._read_counts(
        str(cohort["root"] / "counts_rows.csv"), "rows"
    )
    pd.testing.assert_frame_equal(by_rows, cohort["counts"])


def test_cli_fit_saves_model(cohort, tmp_path, capsys):
    rc = cli.main([
        "fit", str(cohort["root"] / "counts.csv"),
        "--model", "klnmf", "-k", "3", "--seed", "1",
        "--min-iterations", "30", "--max-iterations", "60",
        "--export-h5ad",
        "-o", str(tmp_path),
    ])
    assert rc == 0
    assert "fit: klnmf k=3" in capsys.readouterr().out

    from salamander_tpu.io import load_model

    model = load_model(str(tmp_path / "model.npz"))
    sigs = pd.read_csv(tmp_path / "signatures.csv", index_col=0)
    np.testing.assert_allclose(
        sigs.to_numpy(), np.asarray(model.asignatures.X), rtol=1e-6
    )
    exposures = pd.read_csv(tmp_path / "exposures.csv", index_col=0)
    assert exposures.shape == (24, 3)
    assert (tmp_path / "fitted.h5ad").exists()


def test_cli_fit_minibatch_streaming(cohort, tmp_path, capsys):
    rc = cli.main([
        "fit", str(cohort["root"] / "counts.csv"),
        "--model", "klnmf", "-k", "3", "--seed", "1",
        "--batch-size", "8", "--n-steps", "40", "--eval-freq", "10",
        "--streaming",
        "-o", str(tmp_path),
    ])
    assert rc == 0
    assert "fit: klnmf k=3" in capsys.readouterr().out
    sigs = pd.read_csv(tmp_path / "signatures.csv", index_col=0)
    assert sigs.shape == (3, 12)
    np.testing.assert_allclose(sigs.sum(axis=1), 1.0, rtol=1e-4)

    from salamander_tpu.io import load_model

    model = load_model(str(tmp_path / "model.npz"))
    assert model.history["n_iterations"] == 40


def test_cli_fit_minibatch_eval_freq_zero(cohort, tmp_path, capsys):
    """eval_freq=0 disables objective evaluation; the summary must not
    index an empty trace (rc 0, '<not evaluated>' in the message)."""
    rc = cli.main([
        "fit", str(cohort["root"] / "counts.csv"),
        "--model", "klnmf", "-k", "3", "--seed", "1",
        "--batch-size", "8", "--n-steps", "20", "--eval-freq", "0",
        "-o", str(tmp_path),
    ])
    assert rc == 0
    assert "<not evaluated>" in capsys.readouterr().out
    assert (tmp_path / "model.npz").exists()


def test_cli_scan_corrnmf_requires_dim_embeddings(cohort, tmp_path):
    with pytest.raises(SystemExit, match="dim-embeddings"):
        cli.main([
            "scan", str(cohort["root"] / "counts.csv"),
            "--model", "corrnmf", "--ranks", "2", "-r", "2",
            "-o", str(tmp_path),
        ])


def test_cli_fit_minibatch_rejects_mvnmf(cohort, tmp_path):
    with pytest.raises(SystemExit):
        cli.main([
            "fit", str(cohort["root"] / "counts.csv"),
            "--model", "mvnmf", "-k", "2", "--batch-size", "8",
            "-o", str(tmp_path),
        ])


def test_cli_scan_writes_table_and_winners(cohort, tmp_path, capsys):
    rc = cli.main([
        "scan", str(cohort["root"] / "counts.csv"),
        "--ranks", "2-3", "-r", "4", "--seed", "0",
        "--min-iterations", "30", "--max-iterations", "60",
        "-o", str(tmp_path),
    ])
    assert rc == 0
    assert "scan: klnmf ranks 2..3 x 4 restarts" in capsys.readouterr().out
    table = pd.read_csv(tmp_path / "rank_selection.csv", index_col=0)
    assert list(table.index) == [2, 3]
    assert "best_loss" in table.columns and "min_stability" in table.columns
    meta = json.loads((tmp_path / "suggested_rank.json").read_text())
    assert meta["ranks"] == [2, 3]
    for rank in (2, 3):
        sigs = pd.read_csv(tmp_path / f"signatures_k{rank}.csv", index_col=0)
        assert sigs.shape == (12, rank)
        np.testing.assert_allclose(sigs.sum(axis=0), 1.0, rtol=1e-4)
        exposures = pd.read_csv(
            tmp_path / f"exposures_k{rank}.csv", index_col=0
        )
        assert exposures.shape == (24, rank)
        assert list(exposures.index) == list(cohort["counts"].index)


def test_cli_scan_corrnmf(cohort, tmp_path, capsys):
    rc = cli.main([
        "scan", str(cohort["root"] / "counts.csv"),
        "--model", "corrnmf", "--ranks", "2", "-r", "2",
        "--dim-embeddings", "2",
        "--min-iterations", "5", "--max-iterations", "10",
        "-o", str(tmp_path),
    ])
    assert rc == 0
    assert "scan: corrnmf" in capsys.readouterr().out
    sigs = pd.read_csv(tmp_path / "signatures_k2.csv", index_col=0)
    assert sigs.shape == (12, 2)
    exposures = pd.read_csv(tmp_path / "exposures_k2.csv", index_col=0)
    assert exposures.shape == (24, 2)
    assert (pd.read_csv(tmp_path / "rank_selection.csv", index_col=0)
            .shape[0] == 1)


def test_cli_extract_writes_result(cohort, tmp_path, capsys):
    rc = cli.main([
        "extract", str(cohort["root"] / "counts.csv"),
        "--ranks", "2-3", "--n-bootstraps", "3", "--seed", "0",
        "--min-iterations", "30", "--max-iterations", "60",
        "-o", str(tmp_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "suggested rank" in out

    from salamander_tpu.io import load_extraction

    result = load_extraction(str(tmp_path / "extraction.npz"))
    table = pd.read_csv(tmp_path / "rank_table.csv", index_col=0)
    assert list(table.index) == [2, 3] == list(result.table.index)
    for rank in (2, 3):
        sigs = pd.read_csv(
            tmp_path / f"consensus_signatures_rank{rank}.csv", index_col=0
        )
        assert sigs.shape == (rank, 12)


def test_cli_assign_sparse_and_dense(cohort, tmp_path, capsys):
    sparse_dir = tmp_path / "sparse"
    rc = cli.main([
        "assign", str(cohort["root"] / "counts.csv"),
        str(cohort["root"] / "catalog.csv"),
        "--max-iterations", "300",
        "-o", str(sparse_dir),
    ])
    assert rc == 0
    assert "assign (sparse)" in capsys.readouterr().out
    active = pd.read_csv(sparse_dir / "active.csv", index_col=0)
    exposures = pd.read_csv(sparse_dir / "exposures.csv", index_col=0)
    assert active.shape == exposures.shape == (24, 3)
    # off-support exposures are exact zeros
    assert (exposures.to_numpy()[~active.to_numpy().astype(bool)] == 0).all()
    summary = pd.read_csv(sparse_dir / "summary.csv", index_col=0)
    assert list(summary.columns) == ["kl_dense", "kl_sparse", "n_active"]

    dense_dir = tmp_path / "dense"
    rc = cli.main([
        "assign", str(cohort["root"] / "counts.csv"),
        str(cohort["root"] / "catalog.csv"),
        "--dense", "--max-iterations", "300",
        "-o", str(dense_dir),
    ])
    assert rc == 0
    dense = pd.read_csv(dense_dir / "exposures.csv", index_col=0)
    assert dense.shape == (24, 3)
    # the dense refit keeps every signature active
    assert (dense.to_numpy() > 0).all()


def test_cli_bootstrap_uses_active_support(cohort, tmp_path):
    assign_dir = tmp_path / "assign"
    cli.main([
        "assign", str(cohort["root"] / "counts.csv"),
        str(cohort["root"] / "catalog.csv"),
        "--max-iterations", "300", "-o", str(assign_dir),
    ])
    boot_dir = tmp_path / "boot"
    rc = cli.main([
        "bootstrap", str(cohort["root"] / "counts.csv"),
        str(cohort["root"] / "catalog.csv"),
        "--n-replicates", "5", "--max-iterations", "200",
        "--quantiles", "0.5",
        "--active", str(assign_dir / "active.csv"),
        "-o", str(boot_dir),
    ])
    assert rc == 0
    active = pd.read_csv(assign_dir / "active.csv", index_col=0)
    mean = pd.read_csv(boot_dir / "exposures_mean.csv", index_col=0)
    assert (mean.to_numpy()[~active.to_numpy().astype(bool)] == 0).all()
    assert (boot_dir / "exposures_q0.5.csv").exists()
    presence = pd.read_csv(boot_dir / "presence.csv", index_col=0)
    assert ((presence.to_numpy() >= 0) & (presence.to_numpy() <= 1)).all()


def test_cli_extract_checkpoint_resume(cohort, tmp_path):
    """A second identical invocation resumes from the store (same result)."""
    kwargs = [
        "extract", str(cohort["root"] / "counts.csv"),
        "--ranks", "2", "--n-bootstraps", "3",
        "--min-iterations", "30", "--max-iterations", "60",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ]
    assert cli.main(kwargs + ["-o", str(tmp_path / "first")]) == 0
    assert cli.main(kwargs + ["-o", str(tmp_path / "second")]) == 0
    first = pd.read_csv(
        tmp_path / "first" / "consensus_signatures_rank2.csv", index_col=0
    )
    second = pd.read_csv(
        tmp_path / "second" / "consensus_signatures_rank2.csv", index_col=0
    )
    pd.testing.assert_frame_equal(first, second)


def test_cli_fit_multimodal(cohort, tmp_path, capsys):
    root = cohort["root"]
    # second modality: fewer features, same samples
    rng = np.random.default_rng(3)
    other = pd.DataFrame(
        rng.poisson(40.0, size=(24, 7)).astype(float) + 1.0,
        index=cohort["counts"].index,
        columns=[f"g{v}" for v in range(7)],
    )
    other.T.to_csv(root / "counts_other.csv")
    rc = cli.main([
        "fit", str(root / "counts.csv"), str(root / "counts_other.csv"),
        "--model", "mmcorrnmf", "-k", "2,2", "--names", "sbs,other",
        "--seed", "0", "--min-iterations", "10", "--max-iterations", "20",
        "--export-h5ad",
        "-o", str(tmp_path),
    ])
    assert rc == 0
    assert "fit: mmcorrnmf" in capsys.readouterr().out
    for name, n_feat in [("sbs", 12), ("other", 7)]:
        sigs = pd.read_csv(tmp_path / f"signatures_{name}.csv", index_col=0)
        assert sigs.shape == (2, n_feat)
        exposures = pd.read_csv(
            tmp_path / f"exposures_{name}.csv", index_col=0
        )
        assert exposures.shape == (24, 2)
    assert (tmp_path / "fitted.h5mu").exists()

    from salamander_tpu.io import load_model

    model = load_model(str(tmp_path / "model.npz"))
    assert model.ns_signatures == [2, 2]


def test_cli_fit_multi_counts_requires_mm(cohort, tmp_path):
    with pytest.raises(SystemExit):
        cli.main([
            "fit", str(cohort["root"] / "counts.csv"),
            str(cohort["root"] / "counts.csv"),
            "--model", "klnmf", "-k", "2", "-o", str(tmp_path),
        ])


def test_cli_fit_under_mesh(cohort, tmp_path):
    """fit --mesh samples=N shards the single fit over the virtual CPU
    devices and matches the unsharded fit."""
    plain_dir, mesh_dir = tmp_path / "plain", tmp_path / "mesh"
    base = [
        "fit", str(cohort["root"] / "counts.csv"),
        "--model", "klnmf", "-k", "3", "--seed", "1",
        "--min-iterations", "30", "--max-iterations", "60",
        # f64: at the CLI's f32 default, partitioned reduction order
        # shifts results by ~2e-6 relative (cross-layout f32 ulps)
        "--dtype", "float64",
    ]
    assert cli.main(base + ["-o", str(plain_dir)]) == 0
    assert cli.main(base + ["--mesh", "samples=4", "-o", str(mesh_dir)]) == 0
    plain = pd.read_csv(plain_dir / "signatures.csv", index_col=0)
    sharded = pd.read_csv(mesh_dir / "signatures.csv", index_col=0)
    np.testing.assert_allclose(sharded.to_numpy(), plain.to_numpy(),
                               rtol=1e-7)


def test_cli_fit_mesh_rejects_streaming(cohort, tmp_path):
    with pytest.raises(SystemExit, match="streaming"):
        cli.main([
            "fit", str(cohort["root"] / "counts.csv"),
            "--model", "klnmf", "-k", "3", "--batch-size", "8",
            "--streaming", "--mesh", "samples=4", "-o", str(tmp_path),
        ])


def test_cli_fit_resume_continues(cohort, tmp_path, capsys):
    """fit --resume model.npz warm-starts from the checkpoint; the
    objective keeps improving and outputs are rewritten."""
    first_dir = tmp_path / "first"
    rc = cli.main([
        "fit", str(cohort["root"] / "counts.csv"),
        "--model", "klnmf", "-k", "3", "--seed", "1",
        "--min-iterations", "20", "--max-iterations", "40",
        "-o", str(first_dir),
    ])
    assert rc == 0
    capsys.readouterr()
    resume_dir = tmp_path / "resumed"
    rc = cli.main([
        "fit", str(cohort["root"] / "counts.csv"),
        "--model", "klnmf", "-k", "3",
        "--min-iterations", "20", "--max-iterations", "60",
        "--resume", str(first_dir / "model.npz"),
        "-o", str(resume_dir),
    ])
    assert rc == 0
    assert "resumed klnmf" in capsys.readouterr().out

    from salamander_tpu.io import load_model

    first = load_model(str(first_dir / "model.npz"))
    resumed = load_model(str(resume_dir / "model.npz"))
    assert (resumed.history["objective_function"][-1]
            <= first.history["objective_function"][-1])
    assert (resume_dir / "exposures.csv").exists()

    # wrong model family and minibatch combinations exit cleanly
    with pytest.raises(SystemExit, match="--model"):
        cli.main([
            "fit", str(cohort["root"] / "counts.csv"),
            "--model", "mvnmf", "-k", "3",
            "--resume", str(first_dir / "model.npz"),
            "-o", str(tmp_path),
        ])
    with pytest.raises(SystemExit, match="batch-size"):
        cli.main([
            "fit", str(cohort["root"] / "counts.csv"),
            "--model", "klnmf", "-k", "3", "--batch-size", "8",
            "--resume", str(first_dir / "model.npz"),
            "-o", str(tmp_path),
        ])


# Negative-path sweep: each subcommand x missing/zero/contradictory flags
# must exit with a clean SystemExit message, never a raw traceback.
# Placeholders: C = counts CSV, CAT = catalog CSV (substituted per-test).
# match=None marks argparse-level failures (SystemExit code 2, message on
# stderr); a string matches our explicit SystemExit message.
NEGATIVE_CASES = [
    # fit
    (["fit", "C", "-k", "abc"], "invalid -k"),
    (["fit", "C", "-k", "0"], ">= 1"),
    (["fit", "C", "-k", "2,3"], "-k lists 2 signature counts"),
    (["fit", "C", "-k", "3", "--min-iterations", "100",
      "--max-iterations", "50"], "exceeds"),
    (["fit", "C", "-k", "3", "--max-iterations", "0"], "--max-iterations"),
    (["fit", "C", "-k", "3", "--conv-test-freq", "0"], "--conv-test-freq"),
    (["fit", "C", "-k", "3", "--tol", "-1"], "--tol"),
    (["fit", "C", "-k", "3", "--batch-size", "0"], "--batch-size"),
    (["fit", "C", "-k", "3", "--batch-size", "8", "--n-steps", "0"],
     "--n-steps"),
    (["fit", "C", "-k", "3", "--streaming"], "--batch-size"),
    (["fit", "C", "-k", "3", "--mesh", "bogus"], "invalid mesh spec"),
    (["fit", "C", "-k", "3", "--mesh", "samples=x"], "integer"),
    (["fit", "C", "-k", "3", "--mesh", "samples=0"], ">= 1"),
    (["fit", "/nonexistent/counts.csv", "-k", "3"], "file not found"),
    (["fit", "C"], None),                       # missing -k
    (["fit", "C", "-k", "3", "--model", "nope"], None),
    # scan
    (["scan", "C", "--ranks", "abc"], "invalid rank spec"),
    (["scan", "C", "--ranks", "0"], "invalid rank spec"),
    (["scan", "C", "--ranks", "5-2"], "selects nothing"),
    (["scan", "C", "--ranks", "2", "-r", "0"], "--n-restarts"),
    (["scan", "C", "--ranks", "2", "--min-iterations", "10",
      "--max-iterations", "5"], "exceeds"),
    (["scan", "C"], None),                      # missing --ranks
    # extract
    (["extract", "C", "--ranks", "x"], "invalid rank spec"),
    (["extract", "C", "--ranks", "2", "--n-bootstraps", "0"],
     "--n-bootstraps"),
    (["extract", "C", "--ranks", "2", "--min-stability", "1.5"],
     "[0, 1]"),
    (["extract", "C"], None),                   # missing --ranks
    # assign
    (["assign", "C", "CAT", "--rel-tol", "-0.1"], ">= 0"),
    (["assign", "C", "CAT", "--candidate-iters", "0"],
     "--candidate-iters"),
    (["assign", "C", "CAT", "--batch-size", "0"], "--batch-size"),
    (["assign", "C", "/nonexistent/catalog.csv"], "file not found"),
    (["assign", "C"], None),                    # missing catalog
    # bootstrap
    (["bootstrap", "C", "CAT", "--n-replicates", "0"], "--n-replicates"),
    (["bootstrap", "C", "CAT", "--quantiles", "abc"], "--quantiles"),
    (["bootstrap", "C", "CAT", "--quantiles", "1.5"], "(0, 1)"),
    (["bootstrap", "C", "CAT", "--min-fraction", "2"], "[0, 1]"),
    (["bootstrap", "C", "CAT", "--replicate-batch", "0"],
     "--replicate-batch"),
    # top level
    (["frobnicate"], None),                     # unknown subcommand
]


@pytest.mark.parametrize(
    "argv,match", NEGATIVE_CASES,
    ids=["-".join(case[0][:1] + [str(i)])
         for i, case in enumerate(NEGATIVE_CASES)],
)
def test_cli_negative_paths(cohort, tmp_path, argv, match):
    """Bad flag lattices exit cleanly (SystemExit, message, no traceback)."""
    sub = {
        "C": str(cohort["root"] / "counts.csv"),
        "CAT": str(cohort["root"] / "catalog.csv"),
    }
    argv = [sub.get(token, token) for token in argv] + ["-o", str(tmp_path)]
    with pytest.raises(SystemExit) as excinfo:
        cli.main(argv)
    assert excinfo.value.code not in (0, None)
    if match is not None:
        assert match in str(excinfo.value)


def test_cli_assign_under_mesh(cohort, tmp_path):
    """--mesh samples=N shards the cohort over the virtual CPU devices and
    matches the unsharded supports."""
    plain_dir, mesh_dir = tmp_path / "plain", tmp_path / "mesh"
    base = [
        "assign", str(cohort["root"] / "counts.csv"),
        str(cohort["root"] / "catalog.csv"), "--max-iterations", "300",
    ]
    assert cli.main(base + ["-o", str(plain_dir)]) == 0
    assert cli.main(base + ["--mesh", "samples=4", "-o", str(mesh_dir)]) == 0
    plain = pd.read_csv(plain_dir / "active.csv", index_col=0)
    sharded = pd.read_csv(mesh_dir / "active.csv", index_col=0)
    pd.testing.assert_frame_equal(plain, sharded)
