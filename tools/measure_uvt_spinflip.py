"""Measure the fused µVT kernel WITH quantum-rotation spinflips on the
flagship 10.8k-atom MOF+H2 GCMC+Ewald shape (real TPU) — the reference's
hallmark quantum-H2 sorption workload now runs fused end to end.

Interleaves the spinflip-on and spinflip-off variants in ONE process
(benchmark-order landmine, CLAUDE.md 2026-08-18) so the reported delta is
the spinflip lane's true cost, not chip ramp.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from mpmc_tpu.mc import metropolis
from mpmc_tpu.models import systems
from mpmc_tpu.ops.pallas import mc_kernel
from mpmc_tpu.parallel import multichain


def build(sf: bool):
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg = dataclasses.replace(cfg, fused_mc=True, quantum_rotation=sf)
    if sf:
        thermo = thermo.replace(
            spinflip_probability=jnp.asarray(0.1, jnp.float32))
    state = metropolis.initialize(state, params, cfg, thermo)
    if sf:
        assert mc_kernel.supported_uvt(cfg, params)
        M = int(params.n_mols_max)
        rot_f = np.zeros((M, 2), np.float32)
        rot_f[:, 1] = 170.0 - 77.0 * np.log(3.0)   # free-rotor H2 dF
        state = state.replace(rot_f=jnp.asarray(rot_f),
                              spin=jnp.zeros(M, jnp.int32))
    return params, state, cfg, thermo


def single(params, state, cfg, thermo, K=8192, reps=3):
    st, _ = metropolis.run_chunk_fused_uvt(state, params, cfg, thermo, K)
    np.asarray(st.pos)
    t0 = time.perf_counter()
    for _ in range(reps):
        st, _ = metropolis.run_chunk_fused_uvt(st, params, cfg, thermo, K)
    np.asarray(st.pos)
    return reps * K / (time.perf_counter() - t0)


def multi(params, state, cfg, thermo, C=32, K=4096, reps=3):
    states = multichain.stack_states(state, C)
    states, _ = metropolis.run_chunk_fused_uvt_multi(
        states, params, cfg, thermo, K)
    np.asarray(states.pos)
    t0 = time.perf_counter()
    for _ in range(reps):
        states, _ = metropolis.run_chunk_fused_uvt_multi(
            states, params, cfg, thermo, K)
    np.asarray(states.pos)
    return reps * K * C / (time.perf_counter() - t0)


def main():
    sys_off = build(False)
    sys_on = build(True)
    out = {}
    # warm both variants fully, then interleave the timed windows
    single(*sys_off)
    single(*sys_on)
    for r in range(2):
        out.setdefault("single_off", []).append(single(*sys_off))
        out.setdefault("single_sf", []).append(single(*sys_on))
    multi(*sys_off)
    multi(*sys_on)
    for r in range(2):
        out.setdefault("multi32_off", []).append(multi(*sys_off))
        out.setdefault("multi32_sf", []).append(multi(*sys_on))
    print(json.dumps({k: [round(v, 1) for v in vs]
                      for k, vs in out.items()}))


if __name__ == "__main__":
    main()
