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
