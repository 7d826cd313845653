"""Decompose fused-kernel per-step cost: pair-block share vs S(k) share
vs fixed overhead, on the north-star MOF+H2 shape (TPU).

Method: same geometry at two framework sizes (n_side 15 / 21 => n_blk
~5 / ~11) x {ewald, cutoff} x {NVT single, NVT C=16 interleaved, uVT
single}.  The n_side slope gives the per-block pair cost; ewald-cutoff
gives the S(k) cost; the remainder is fixed per-step overhead.  All
variants interleaved in ONE process with per-variant warmup
(benchmark-order landmine, CLAUDE.md).

    python tools/measure_step_split.py
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def build(n_side, coulomb):
    from mpmc_tpu.models import systems
    from mpmc_tpu.mc import metropolis

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=n_side, spacing=4.0, n_h2=256, capacity=512,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg = dataclasses.replace(cfg, fused_mc=True, coulomb=coulomb)
    state = metropolis.initialize(state, params, cfg, thermo)
    return params, state, cfg, thermo


def main():
    import jax
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.parallel import multichain

    K = 8192
    C = 16
    variants = {}
    for n_side in (15, 21):
        for coulomb in ("ewald", "cutoff"):
            params, state, cfg, thermo = build(n_side, coulomb)

            def mk_nvt(params=params, state=state, cfg=cfg,
                       thermo=thermo):
                c = dataclasses.replace(cfg, ensemble="nvt")
                st = [state]

                def fn():
                    st[0], _ = metropolis.run_chunk_fused(
                        st[0], params, c, thermo, K)
                    return st[0].pos
                return fn, 1

            def mk_nvt_multi(params=params, state=state, cfg=cfg,
                             thermo=thermo):
                c = dataclasses.replace(cfg, ensemble="nvt")
                sts = [multichain.stack_states(state, C)]

                def fn():
                    sts[0], _ = metropolis.run_chunk_fused_multi(
                        sts[0], params, c, thermo, K)
                    return sts[0].pos
                return fn, C

            def mk_uvt(params=params, state=state, cfg=cfg,
                       thermo=thermo):
                st = [state]

                def fn():
                    st[0], _ = metropolis.run_chunk_fused_uvt(
                        st[0], params, cfg, thermo, K)
                    return st[0].pos
                return fn, 1

            variants[f"nvt_{coulomb}_n{n_side}"] = mk_nvt()
            variants[f"nvt_c{C}_{coulomb}_n{n_side}"] = mk_nvt_multi()
            variants[f"uvt_{coulomb}_n{n_side}"] = mk_uvt()

    # warm every variant with a full-length launch (compile + ramp)
    for name, (fn, _) in variants.items():
        np.asarray(fn())
        np.asarray(fn())
        print(f"warmed {name}", flush=True)

    results = {name: [] for name in variants}
    for rep in range(4):
        for name, (fn, nch) in variants.items():
            t0 = time.perf_counter()
            for _ in range(3):
                r = fn()
            np.asarray(r)
            dt = (time.perf_counter() - t0) / 3
            us_per_step = dt / (K * nch) * 1e6
            results[name].append(us_per_step)
        print(json.dumps({k: round(min(v), 3)
                          for k, v in results.items()}), flush=True)

    out = {k: {"us_per_step_min": round(min(v), 4),
               "all": [round(x, 4) for x in v]}
           for k, v in results.items()}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_STEP_SPLIT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
