"""Dipole-change stopping-rule tolerance sweep (r3 verdict item 1c):
max carried-dipole / carried-polar-energy drift vs exactly-converged
solves over a polar GCMC chain, on the ~1k-framework system where RMS
dilution bites (test_dipole_mode_drift_bounded_larger_system), for
polar_precision in {1e-3 (reference-typical), 3e-4, 1e-4, 3e-5} Debye
plus the residual-1e-6 default as control.

    JAX_PLATFORMS=cpu python tools/measure_dipole_tol.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

# pin the CPU/f64 backend: the image's sitecustomize imports jax and
# registers the axon TPU platform before any script runs, so env vars
# alone don't switch backends (see tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_thole import _polar_gcmc_chain_stats

    from mpmc_tpu.models import systems

    bench_size = "--bench-size" in sys.argv
    if bench_size:
        # the BENCH system itself (10.8k sites): the coherent-sum /
        # RMS-dilution drift scaling measured, not extrapolated
        params, state, cfg0, thermo_ = systems.mof_h2_gcmc(
            n_side=21, spacing=4.0, n_h2=256, capacity=512,
            polarization=True, dtype="float64", corrtime=40)
        blocks, blk = 2, 40
        tols = ((1e-4,) if "--tol-1e-4" in sys.argv
                else (1e-3, 3e-4))
        sysname = "mof_h2_gcmc n_side=21 (bench size, 9261 framework)"
        fname = ("MEASURE_DIPOLE_TOL_BENCH2.json"
                 if "--tol-1e-4" in sys.argv
                 else "MEASURE_DIPOLE_TOL_BENCH.json")
    else:
        params, state, cfg0, thermo_ = systems.mof_h2_gcmc(
            n_side=10, n_h2=24, capacity=48, polarization=True,
            dtype="float64", corrtime=100)
        blocks, blk = 4, 100
        tols = (1e-3, 3e-4, 1e-4, 3e-5)
        sysname = "mof_h2_gcmc n_side=10 (1000 framework sites)"
        fname = "MEASURE_DIPOLE_TOL.json"
    cfg0 = dataclasses.replace(cfg0, use_pallas=False,
                               polar_delayed=True)
    tight = dataclasses.replace(cfg0, polar_precision_mode="residual",
                                polar_precision=1e-10)
    out = {"system": sysname,
           "chain": f"{blocks} blocks x {blk} steps, drift at each "
                    "block end"}

    def run(tag, cfg):
        _, _, _, mu_d, u_d = _polar_gcmc_chain_stats(
            cfg, state, params, thermo_, n_blocks=blocks, block=blk,
            drift_cfg=tight)
        out[tag] = {"max_mu_drift_debye_rms": round(mu_d, 8),
                    "max_u_pol_drift_K": round(u_d, 6)}
        print(json.dumps({tag: out[tag]}), flush=True)

    run("residual_1e-6", dataclasses.replace(cfg0,
                                             polar_precision=1e-6))
    for tol in tols:
        run(f"dipole_{tol:g}", dataclasses.replace(
            cfg0, polar_precision_mode="dipole", polar_precision=tol))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), fname)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
