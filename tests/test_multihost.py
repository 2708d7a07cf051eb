"""Multi-process (simulated multi-host) chain sharding over jax.distributed.

The reference has no distributed execution at all; this tier launches two
coordinated CPU processes (the SURVEY.md §4 recommendation for testing
chain-sharding + collectives without a pod) and checks that a sharded MCMC
run completes with consistent pooled statistics on every process.
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax

jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)
import numpy as np
import pandas as pd

import causalgpslc_tpu as cg
from causalgpslc_tpu.models.spec import make_model_data
from causalgpslc_tpu.parallel import pooled_chain_stats, run_mcmc_sharded
from causalgpslc_tpu.parallel.multihost import global_chain_mesh

rng = np.random.default_rng(0)
n = 12
df = pd.DataFrame({"T": rng.normal(size=n), "Y": rng.normal(size=n),
                   "obj": np.repeat(np.arange(3), 4)})
prepared = cg.prepare_data(df)
hp = cg.default_hyperparameters(n_outer=2, n_mh_inner=1, n_es_inner=1,
                                n_burn_in=1, n_u=1, n_chains=len(jax.devices()) * 2)
pp = cg.default_prior_parameters()
spec, data = make_model_data(prepared, n_u=hp.n_u)
mesh = global_chain_mesh()
samples, stats, _ = run_mcmc_sharded(jax.random.PRNGKey(0), spec, pp, data, hp, mesh)
pooled = {k: float(v) for k, v in pooled_chain_stats(stats).items()}
assert np.isfinite(pooled["mean_mh_accept_rate"])
print(f"RANK{sys.argv[3]} OK devices={len(jax.devices())} "
      f"local={len(jax.local_devices())} accept={pooled['mean_mh_accept_rate']:.6f}")
"""


@pytest.mark.slow
def test_two_process_chain_sharding(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    repo_root = str(pathlib.Path(__file__).parent.parent)
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, "2", str(rank)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env_base,
            cwd=str(pathlib.Path(__file__).parent.parent),
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} OK devices=4 local=2" in out, out
    # pooled statistics agree across processes (same collective result)
    acc = [line for out in outs for line in out.splitlines() if "accept=" in line]
    vals = {line.split("accept=")[1] for line in acc}
    assert len(vals) == 1, f"pooled stats diverged: {acc}"


@pytest.mark.slow
def test_bench_pod_two_process_smoke(tmp_path):
    """bench_pod.py (the pod ESS/s scaling artifact, VERDICT r3 item 5) must
    be known-runnable before pod hardware exists: launch it as 2 coordinated
    CPU processes (2 virtual devices each) at a tiny budget and check both
    ranks print a consistent JSON result for the 4-device job."""
    import json

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    repo_root = str(pathlib.Path(__file__).parent.parent)
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "BENCH_POD_COORD": coord,
        "BENCH_POD_NPROCS": "2",
        "BENCH_N": "24",
        "BENCH_CHAINS_PER_DEV": "2",
        "BENCH_OUTER": "4",
        "BENCH_CHUNK": "2",
        "BENCH_MH_INNER": "1",
        "BENCH_ES_INNER": "1",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(pathlib.Path(repo_root) / "bench_pod.py")],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env={**env_base, "BENCH_POD_RANK": str(rank)},
            cwd=repo_root,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    results = []
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        lines = [l for l in out.splitlines() if l.startswith("{")]
        assert lines, f"rank {rank} printed no JSON:\n{out}"
        results.append(json.loads(lines[-1]))
    for r in results:
        assert r["hosts"] == 2 and r["devices"] == 4 and r["chains"] == 8
        assert r["min_ess"] > 0
    # both ranks computed the same global ESS from the allgathered traces
    assert results[0]["min_ess"] == results[1]["min_ess"]


LARGE_N_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)
import numpy as np

from causalgpslc_tpu.hyperparameters import default_hyperparameters
from causalgpslc_tpu.ops.kernels import process_cov, rbf_kernel_log
from causalgpslc_tpu.ops.linalg import mvn_logpdf
from causalgpslc_tpu.parallel.large_n import n_mesh, run_mcmc_large_n, sharded_gp_logpdf

# N x N covariance row-sharded over FOUR devices spanning TWO processes:
# the distributed Cholesky's psum/all_gather cross the process boundary.
rng = np.random.default_rng(0)
n = 24
f = rng.normal(size=(n, 2))
y = rng.normal(size=n)
mesh = n_mesh()  # all 4 global devices
got = float(sharded_gp_logpdf(f, y, 1.2, 0.4, mesh=mesh, block=2))
want = float(mvn_logpdf(jax.numpy.asarray(y), process_cov(rbf_kernel_log(f, f, 1.0), 1.2, 0.4)))
assert abs(got - want) < 1e-8 * max(1.0, abs(want)), (got, want)

counts = [6, 6, 6, 6]
t = rng.normal(size=n)
yy = 0.5 * t + rng.normal(size=n) * 0.4
hp = default_hyperparameters().replace(n_outer=2, n_mh_inner=1, n_es_inner=1, n_burn_in=1)
_, stats, _ = run_mcmc_large_n(jax.random.key(1), t, yy, counts, hp=hp, mesh=mesh, block=2)
lj = np.asarray(stats.log_joint)
assert np.all(np.isfinite(lj))
print(f"RANK{sys.argv[3]} OK devices={len(jax.devices())} "
      f"local={len(jax.local_devices())} gp={got:.9f} lj={float(lj[-1]):.6f}")
"""


@pytest.mark.slow
def test_two_process_large_n_sharding(tmp_path):
    """Row-sharded covariances over a 4-device n-mesh spanning two processes
    (the DCN analog): the distributed Cholesky's collectives cross the
    process boundary, the log-density matches the dense value exactly, and a
    sharded MCMC step completes identically on both ranks."""
    worker = tmp_path / "worker_ln.py"
    worker.write_text(LARGE_N_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    repo_root = str(pathlib.Path(__file__).parent.parent)
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, "2", str(rank)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env_base,
            cwd=repo_root,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} OK devices=4 local=2" in out, out
    # collective results agree bitwise across processes
    vals = {line.split("gp=")[1] for out in outs for line in out.splitlines() if "gp=" in line}
    assert len(vals) == 1, f"cross-process results diverged: {vals}"


ELASTIC_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)
import numpy as np
import pandas as pd

import causalgpslc_tpu as cg
from causalgpslc_tpu.models.spec import make_model_data
from causalgpslc_tpu.parallel.checkpoint import run_mcmc_checkpointed
from causalgpslc_tpu.parallel.multihost import global_chain_mesh

rng = np.random.default_rng(7)
n = 12
df = pd.DataFrame({"T": rng.normal(size=n), "Y": rng.normal(size=n),
                   "obj": np.repeat(np.arange(3), 4)})
prepared = cg.prepare_data(df)
hp = cg.default_hyperparameters(n_outer=6, n_mh_inner=1, n_es_inner=1,
                                n_burn_in=1, n_u=1, n_chains=4)
pp = cg.default_prior_parameters()
spec, data = make_model_data(prepared, n_u=hp.n_u)


class Crash(Exception):
    pass


def cb(done, total):
    if done >= 2:
        raise Crash


try:
    run_mcmc_checkpointed(
        jax.random.PRNGKey(3), spec, pp, data, hp, sys.argv[4],
        checkpoint_every=2, mesh=global_chain_mesh(), progress_callback=cb,
    )
except Crash:
    print(f"RANK{sys.argv[3]} CRASHED OK")
"""


@pytest.mark.slow
def test_elastic_resume_two_process_to_one(tmp_path):
    """Elastic recovery (VERDICT r4 item 6, the 'pod loses a host' story):
    a 2-process sharded run crashes mid-way leaving one snapshot per rank;
    a SINGLE process then resumes from those rank files — the elastic loader
    reassembles the global chain state from the recorded layouts — and
    matches the uninterrupted single-process run per chain."""
    import jax
    import numpy as np
    import pandas as pd

    import causalgpslc_tpu as cg
    from causalgpslc_tpu.models.spec import make_model_data
    from causalgpslc_tpu.parallel.checkpoint import run_mcmc_checkpointed
    from causalgpslc_tpu.parallel.mesh import chain_mesh

    worker = tmp_path / "worker_el.py"
    worker.write_text(ELASTIC_WORKER)
    ckpt = str(tmp_path / "el.npz")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    repo_root = str(pathlib.Path(__file__).parent.parent)
    env_base = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, "2", str(rank), ckpt],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env_base, cwd=repo_root,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} CRASHED OK" in out, out
    assert os.path.exists(f"{ckpt}.rank0") and os.path.exists(f"{ckpt}.rank1")

    # identical problem setup in THIS (single) process
    rng = np.random.default_rng(7)
    n = 12
    df = pd.DataFrame({"T": rng.normal(size=n), "Y": rng.normal(size=n),
                       "obj": np.repeat(np.arange(3), 4)})
    prepared = cg.prepare_data(df)
    hp = cg.default_hyperparameters(n_outer=6, n_mh_inner=1, n_es_inner=1,
                                    n_burn_in=1, n_u=1, n_chains=4)
    pp = cg.default_prior_parameters()
    spec, data = make_model_data(prepared, n_u=hp.n_u)
    key = jax.random.PRNGKey(3)

    full, _, _ = run_mcmc_checkpointed(
        key, spec, pp, data, hp, None, checkpoint_every=2, mesh=chain_mesh(4)
    )
    resumed, stats, _ = run_mcmc_checkpointed(
        key, spec, pp, data, hp, ckpt, checkpoint_every=2, mesh=chain_mesh(4)
    )
    for f in full._fields:
        a = getattr(full, f)
        if a is None:
            continue
        np.testing.assert_allclose(
            np.asarray(getattr(resumed, f)), np.asarray(a),
            rtol=1e-12, atol=1e-13, err_msg=f,
        )
    assert stats.mh_accept_rate.shape == (hp.n_chains, hp.n_outer)


def test_bench_pod_single_process_smoke(tmp_path):
    """bench_pod.py without a process group: single host, virtual 2-device
    chain mesh, tiny budgets — the fast-tier guard that the pod artifact
    keeps importing/running as the library evolves."""
    import json

    repo_root = str(pathlib.Path(__file__).parent.parent)
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "BENCH_N": "24",
        "BENCH_CHAINS_PER_DEV": "2",
        "BENCH_OUTER": "4",
        "BENCH_CHUNK": "2",
        "BENCH_MH_INNER": "1",
        "BENCH_ES_INNER": "1",
    }
    out = subprocess.run(
        [sys.executable, str(pathlib.Path(repo_root) / "bench_pod.py")],
        capture_output=True, text=True, env=env, cwd=repo_root, timeout=420,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    assert r["hosts"] == 1 and r["devices"] == 2 and r["chains"] == 4
    assert r["min_ess"] > 0 and r["value"] > 0
