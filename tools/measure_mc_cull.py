"""Column-tile culling in the fused µVT kernel on real TPU (r6): at an
explicit production cutoff (rc=14 A) most frozen column blocks sit
beyond rc of the moved molecule, and the kernel skips them whole via
the per-step AABB gap test (mc_kernel.cull_gate/_pack_cull + the
lax.cond wrap in _kernel_uvt).  Interleaved mc_cull auto vs off at
10.8k and (with --large) 54k, single fused chain + chain-interleaved.

Writes MEASURE_MC_CULL.json (10.8k) / merges large_54k (--large).
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax

from mpmc_tpu.mc import metropolis
from mpmc_tpu.models import systems
from mpmc_tpu.parallel import multichain
from mpmc_tpu.ops.pallas import mc_kernel

RC = 14.0


def build(n_side, n_h2, capacity):
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=n_side, spacing=4.0, n_h2=n_h2, capacity=capacity)
    cfg = dataclasses.replace(cfg, cutoff=RC, fused_mc=True)
    assert mc_kernel.supported_uvt(cfg, params)
    return params, state, cfg, thermo


def single_rates(params, state, cfg, thermo, K, reps):
    st0 = metropolis.initialize(state, params, cfg, thermo)
    warm = {}
    for mode in ("auto", "off"):
        c = dataclasses.replace(cfg, mc_cull=mode)
        st, _ = metropolis.run_chunk_fused_uvt(st0, params, c, thermo, K)
        np.asarray(st.pos)
        warm[mode] = (c, st)
    rates = {"auto": [], "off": []}
    for _ in range(reps):
        for mode in ("auto", "off"):
            c, st = warm[mode]
            t0 = time.perf_counter()
            for _ in range(2):
                st, _ = metropolis.run_chunk_fused_uvt(st, params, c,
                                                       thermo, K)
            np.asarray(st.pos)
            rates[mode].append(2 * K / (time.perf_counter() - t0))
            warm[mode] = (c, st)
    return {m: [round(r, 1) for r in v] for m, v in rates.items()}


def multi_rates(params, state, cfg, thermo, C, K, reps):
    st0 = metropolis.initialize(state, params, cfg, thermo)
    warm = {}
    for mode in ("auto", "off"):
        c = dataclasses.replace(cfg, mc_cull=mode)
        sts = multichain.stack_states(st0, C)
        sts, _ = metropolis.run_chunk_fused_uvt_multi(sts, params, c,
                                                      thermo, K)
        np.asarray(sts.pos)
        warm[mode] = (c, sts)
    rates = {"auto": [], "off": []}
    for _ in range(reps):
        for mode in ("auto", "off"):
            c, sts = warm[mode]
            t0 = time.perf_counter()
            for _ in range(2):
                sts, _ = metropolis.run_chunk_fused_uvt_multi(
                    sts, params, c, thermo, K)
            np.asarray(sts.pos)
            rates[mode].append(2 * K * C
                               / (time.perf_counter() - t0))
            warm[mode] = (c, sts)
    return {m: [round(r, 1) for r in v] for m, v in rates.items()}


def main():
    large = "--large" in sys.argv
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_MC_CULL.json")
    if large:
        params, state, cfg, thermo = build(37, 512, 1024)
        out = {"cutoff_A": RC,
               "single_fused": single_rates(params, state, cfg, thermo,
                                            K=4096, reps=2),
               "interleaved_c12": multi_rates(params, state, cfg,
                                              thermo, C=12, K=4096,
                                              reps=2)}
        with open(path) as f:
            full = json.load(f)
        full["large_54k"] = out
        with open(path, "w") as f:
            json.dump(full, f, indent=1)
        print(json.dumps(out, indent=1))
        return
    params, state, cfg, thermo = build(21, 256, 512)
    out = {"system": "mof_h2_gcmc (10.8k / with --large 54k)",
           "cutoff_A": RC, "backend": jax.default_backend(),
           "single_fused": single_rates(params, state, cfg, thermo,
                                        K=8192, reps=3),
           "interleaved_c32": multi_rates(params, state, cfg, thermo,
                                          C=32, K=4096, reps=2)}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
