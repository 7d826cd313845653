"""Corrected fused-PT measurements.  Previous numbers (62k fast-refresh
vs 202k no-refresh, MEASURE_PT_REFRESH.json) synced with
``np.asarray(states.energy)`` — but ``energy`` is an EnergyBreakdown
PYTREE, so np.asarray built a dtype=object array WITHOUT fetching:
those were dispatch-time measurements.  This re-measures with a real
sync (fetch one array leaf of the pytree).

    python tools/measure_pt_refresh4.py
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

    def sync(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf)

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512)
    cfg = dataclasses.replace(cfg, fused_mc=True, ensemble="nvt",
                              corrtime=1000)
    R, spr, rounds = 8, 1024, 8
    temps = replica.geometric_ladder(77.0, 250.0, R)
    fr = metropolis.frozen_refresh_rows(params, cfg)

    state0 = metropolis.initialize(state, params, cfg, thermo)
    states0 = multichain.stack_states(state0, R, seed=2)
    thermos0 = replica.stack_thermo(thermo, temps, cfg.jdtype)

    def kernel(states, thermos):
        s, _ = metropolis.run_chunk_fused_multi(
            states, params, cfg, thermos, spr, thermo_batched=True)
        return s

    def refresh(states, thermos):
        return multichain.initialize_batched(
            states, params, cfg, thermos, thermo_batched=True,
            frozen_rows=fr)

    keys = jax.random.split(jax.random.PRNGKey(9), rounds)

    # warm all paths
    states, thermos = states0, thermos0
    states = kernel(states, thermos)
    states = refresh(states, thermos)
    states = kernel(states, thermos)
    for p in (0, 1):
        nt, _ = replica.ladder_swap_batched(
            thermos.temperature, states.energy, keys[p], p)
    sync(states); np.asarray(nt)

    # kernel-only cost, properly synced
    t0 = time.perf_counter()
    for _ in range(4):
        states = kernel(states, thermos)
    sync(states.energy)
    emit("kernel_only_ms_per_round", 1e3 * (time.perf_counter() - t0) / 4)

    def loop(feedback: bool, do_refresh: bool, n_rounds: int):
        states, thermos = states0, thermos0
        for r in range(n_rounds):
            states = kernel(states, thermos)
            if do_refresh:
                ref = refresh(states, thermos)
                if feedback:
                    states = ref
            nt, _ = replica.ladder_swap_batched(
                thermos.temperature, states.energy, keys[r % rounds],
                r % 2)
            thermos = dataclasses.replace(thermos, temperature=nt)
        sync(states.energy)
        return states

    for name, fb, dr in (("none", False, False),
                         ("discard", False, True),
                         ("feedback", True, True)):
        loop(fb, dr, 2)                        # warm
        t0 = time.perf_counter()
        loop(fb, dr, rounds)
        dt = time.perf_counter() - t0
        emit(f"pt_{name}_agg_sps", R * rounds * spr / dt)
        emit(f"pt_{name}_ms_per_round", 1e3 * dt / rounds)

    # committed driver end-to-end, for the record
    def run_pt(corr, n_rounds):
        cfg_t = dataclasses.replace(cfg, corrtime=corr)
        t0 = time.perf_counter()
        sts, ts, acc = replica.run_parallel_tempering_fused_multi(
            params, state, cfg_t, thermo, temps, n_rounds=n_rounds,
            steps_per_round=spr, seed=2)
        sync(sts.energy)
        return R * n_rounds * spr / (time.perf_counter() - t0)

    for name, corr in (("driver_fast_refresh", 1000),
                       ("driver_no_refresh", 1 << 30)):
        run_pt(corr, 2)
        emit(name + "_agg_sps", run_pt(corr, rounds))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_PT_REFRESH4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
