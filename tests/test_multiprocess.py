"""Real multi-process jax.distributed rendezvous test.

Launches tests/multiprocess_worker.py twice (coordinator + one peer over
localhost, 2 virtual CPU devices each) and checks that a multi-start KLNMF
fit whose restart axis is sharded ACROSS the two processes reproduces the
single-process result. This drives salamander_tpu.parallel.init_distributed
through an actual jax.distributed.initialize rendezvous - the runtime layer
the single-process reference lacks (SURVEY.md section 5.8)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "multiprocess_worker.py")

# must match the constants in multiprocess_worker.py
N_FEATURES, N_SAMPLES, RANK, N_RESTARTS, SEED = 12, 16, 3, 4, 7


def _free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


@pytest.fixture(scope="module")
def multiprocess_result(tmp_path_factory):
    out_path = tmp_path_factory.mktemp("mp") / "result.npz"
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins its own platform
    workers = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), str(out_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    for worker in workers:
        try:
            out, _ = worker.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for other in workers:
                other.kill()
            raise
        outputs.append(out)
    for worker, out in zip(workers, outputs):
        assert worker.returncode == 0, (
            f"worker {worker.args} failed:\n{out[-4000:]}"
        )
    assert os.path.exists(out_path), outputs[0][-4000:]
    return np.load(out_path)


def test_two_process_rendezvous(multiprocess_result):
    assert int(multiprocess_result["n_processes"]) == 2
    assert int(multiprocess_result["n_devices"]) == 4


def test_cross_process_restart_fit_matches_single_process(multiprocess_result):
    from salamander_tpu.engine import FitConfig
    from salamander_tpu.parallel.restarts import fit_klnmf_restarts

    rng = np.random.default_rng(123)
    X = rng.poisson(5.0, size=(N_FEATURES, N_SAMPLES)).astype(np.float32)
    X[X == 0] = 1.0

    config = FitConfig(min_iterations=40, max_iterations=40, conv_test_freq=10)
    with pytest.warns(UserWarning, match="convergence resolution"):
        single = fit_klnmf_restarts(
            X, RANK, N_RESTARTS, seed=SEED, config=config, dtype=jnp.float32
        )

    losses_mp = np.asarray(multiprocess_result["losses"], np.float64)
    losses_sp = np.asarray(single.losses, np.float64)
    np.testing.assert_allclose(losses_mp, losses_sp, rtol=1e-5)

    best_mp = np.asarray(multiprocess_result["best_W"], np.float64)
    best_sp = np.asarray(single.best_W, np.float64)
    assert int(np.argmin(losses_mp)) == single.best_index
    np.testing.assert_allclose(best_mp, best_sp, rtol=1e-4, atol=1e-7)
