"""Real multi-process jax.distributed test for parallel/multihost.py
(VERDICT r1 item 5): two OS processes, each contributing 4 virtual CPU
devices to one 8-slot global replica mesh, run parallel tempering and
must reproduce the single-process 8-device result.

The child runs in a subprocess because jax.distributed must be
initialized before the backend comes up (the parent's JAX is already
live with its own 8-device CPU config, conftest.py)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from mpmc_tpu.parallel import multihost, replica
from mpmc_tpu.models import systems

pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
out = sys.argv[4]
multihost.initialize(coordinator=coord, num_processes=nproc,
                     process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

params, state, cfg, thermo = systems.lj_fluid(n=24, dtype="float64",
                                              seed=3)
temps = replica.geometric_ladder(100.0, 200.0, 8)
states, thermos, history = multihost.run_parallel_tempering(
    params, state, cfg, thermo, temps, n_rounds=3, steps_per_round=20,
    seed=5)
if pid == 0:
    # under jax.distributed only this process's shards are addressable:
    # collect the local slice of the final temperature ladder
    t = thermos.temperature
    shards = sorted(t.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    temps_local = [float(v) for s in shards
                   for v in np.asarray(s.data).ravel()]
    with open(out, "w") as f:
        json.dump({"history": history, "temps": temps_local}, f)
jax.distributed.shutdown()
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_pt_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    out2 = tmp_path / "two_proc.json"
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(child), str(pid), "2", coord, str(out2)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost child timed out")
        outs.append((p.returncode, so.decode(), se.decode()))
    for rc, so, se in outs:
        assert rc == 0, se[-2000:]
    two = json.loads(out2.read_text())

    # single-process reference on the parent's own 8-device CPU mesh
    out1 = tmp_path / "one_proc.json"
    env1 = dict(env)
    env1["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    p = subprocess.run(
        [sys.executable, str(child), "0", "1", coord, str(out1)],
        env=env1, capture_output=True, timeout=600)
    assert p.returncode == 0, p.stderr.decode()[-2000:]
    one = json.loads(out1.read_text())

    assert len(two["history"]) == 3
    for a, b in zip(two["history"], one["history"]):
        # identical replica programs + identical seeds -> identical
        # trajectories; collectives may reorder f64 sums at the last ulp
        assert a["mean_energy"] == pytest.approx(b["mean_energy"],
                                                 rel=1e-12)
        assert a["swap_acceptance"] == pytest.approx(
            b["swap_acceptance"], abs=1e-12)
    # process 0 owns the first half of the ladder in the 2-process run
    assert two["temps"] == pytest.approx(one["temps"][:len(two["temps"])])
    # the ladder actually mixed (some swap accepted over 3 rounds) or at
    # least the PT machinery ran: acceptance values are well-defined
    assert all(0.0 <= h["swap_acceptance"] <= 1.0 for h in two["history"])
