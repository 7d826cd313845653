"""Fused-PDA throughput for the wolf / full-Ewald static-field variants
(r5; r4 verdict item 1 'Done' criterion) plus the first polar number at
the 53.7k scale point (item 4).

Method per CLAUDE.md benchmark rules: every variant warmed with a real
full-length chunk before any timing, variants interleaved within ONE
process across repeats, D2H sync via np.asarray fetches.  All runs use
the fused PDA path at the validated default stopping rule
(residual 1e-6).

Writes MEASURE_POLAR_VARIANTS.json.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def make(variant, **kw):
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops.pallas import mc_kernel

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        polarization=True, **kw)
    v = {"direct": {}, "wolf": {"polar_wolf": True},
         "ewald": {"polar_ewald": True}}[variant]
    cfg = dataclasses.replace(cfg, polar_delayed=True, fused_mc=True,
                              **v)
    assert mc_kernel.supported_uvt_polar_da(cfg, params), variant
    st = metropolis.initialize(state, params, cfg, thermo)
    return params, st, cfg, thermo


def time_pda(params, st, cfg, thermo, K=512, chunks=3):
    from mpmc_tpu.mc import metropolis

    t0 = time.perf_counter()
    n = 0
    for _ in range(chunks):
        st, stats = metropolis.run_chunk_fused_uvt_polar_da(
            st, params, cfg, thermo, K)
        n += int(np.asarray(stats.attempts).sum())
    np.asarray(st.energy.rd)
    return n / (time.perf_counter() - t0), st


def main():
    out = {"system": "mof_h2_gcmc n_side=21 (10.8k) fused PDA, "
                     "residual 1e-6", "steps_per_s": {}}
    bench_kw = dict(n_side=21, spacing=4.0, n_h2=256, capacity=512)
    variants = ("direct", "wolf", "ewald")
    sysd = {}
    for v in variants:
        sysd[v] = make(v, **bench_kw)
    # warm every variant (compile + chip ramp) before any timing window
    for v in variants:
        params, st, cfg, thermo = sysd[v]
        _, st = time_pda(params, st, cfg, thermo, K=512, chunks=1)
        sysd[v] = (params, st, cfg, thermo)
    reps = {v: [] for v in variants}
    for _ in range(2):
        for v in variants:
            params, st, cfg, thermo = sysd[v]
            sps, st = time_pda(params, st, cfg, thermo)
            sysd[v] = (params, st, cfg, thermo)
            reps[v].append(round(sps, 2))
    out["steps_per_s"] = reps
    out["n_repeats"] = 2

    # ---- 53.7k polar scale point (r4 verdict item 4) -----------------
    try:
        params, st, cfg, thermo = make("direct", n_side=37,
                                       spacing=4.0, n_h2=512,
                                       capacity=1024)
        _, st = time_pda(params, st, cfg, thermo, K=64, chunks=1)
        vals = []
        for _ in range(2):
            sps, st = time_pda(params, st, cfg, thermo, K=64, chunks=2)
            vals.append(round(sps, 2))
        out["polar_54k"] = {"steps_per_s": vals,
                            "n_atoms": int(params.n_atoms_max),
                            "method": "fused_pda_residual_1e-6"}
    except Exception as e:  # noqa: BLE001 — record the cap, don't die
        out["polar_54k"] = {"error": repr(e)[:400]}

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_POLAR_VARIANTS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
