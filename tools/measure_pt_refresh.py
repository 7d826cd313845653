"""Fused-PT per-round overhead breakdown on the real TPU.

CLAUDE.md flags fused PT at 78k agg steps/s vs the 274k interleaved-NVT
ceiling with the per-round overhead unresolved.  The suspect is the
per-corrtime full refresh (~53 ms/round at corrtime=1000, spr=1024).
This measures, in ONE process:

  1. pt_one_launch agg steps/s with the frozen-reuse fast refresh
     (the committed default for this config),
  2. the same with the fast refresh disabled (frozen_rows=0 forced),
  3. the same with refresh effectively off (corrtime huge) — the
     kernel+swap ceiling,
  4. the refresh calls in isolation (fast vs full, ms per call).

Sync discipline per CLAUDE.md: np.asarray fetches, warmup with the
same static args that get timed.

    python tools/measure_pt_refresh.py
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


def main():
    import jax
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.parallel import multichain, replica

    out = {}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512)
    cfg = dataclasses.replace(cfg, fused_mc=True, ensemble="nvt")
    R, spr, rounds = 8, 1024, 8
    temps = replica.geometric_ladder(77.0, 250.0, R)

    # --- isolated refresh cost (batched, R states) -----------------------
    state0 = metropolis.initialize(state, params, cfg, thermo)
    states = multichain.stack_states(state0, R, seed=2)
    thermos = replica.stack_thermo(thermo, temps, cfg.jdtype)
    fr = metropolis.frozen_refresh_rows(params, cfg)
    emit("frozen_refresh_rows", int(fr))
    for name, f in (("refresh_full_ms", 0), ("refresh_fast_ms", fr)):
        r = multichain.initialize_batched(states, params, cfg, thermos,
                                          thermo_batched=True,
                                          frozen_rows=f)
        np.asarray(r.energy)          # warm + sync
        t0 = time.perf_counter()
        for _ in range(4):
            r = multichain.initialize_batched(r, params, cfg, thermos,
                                              thermo_batched=True,
                                              frozen_rows=f)
        np.asarray(r.energy)
        emit(name, 1e3 * (time.perf_counter() - t0) / 4)

    # --- PT end-to-end variants ------------------------------------------
    def run_pt(cfg_t, n_rounds):
        t0 = time.perf_counter()
        sts, ts, acc = replica.run_parallel_tempering_fused_multi(
            params, state, cfg_t, thermo, temps, n_rounds=n_rounds,
            steps_per_round=spr, seed=2)
        np.asarray(sts.energy)
        return R * n_rounds * spr / (time.perf_counter() - t0)

    for name, corr in (("pt_one_launch_fast_refresh", 1000),
                       ("pt_one_launch_no_refresh", 1 << 30)):
        cfg_t = dataclasses.replace(cfg, corrtime=corr)
        run_pt(cfg_t, 2)              # warm (compiles kernel+swap+refresh)
        emit(name + "_agg_sps", run_pt(cfg_t, rounds))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_PT_REFRESH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
