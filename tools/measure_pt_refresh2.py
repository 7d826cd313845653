"""Localize the fused-PT refresh overhead (MEASURE_PT_REFRESH.json shows
62k agg with per-round refresh vs 202k without, yet the batched refresh
costs 0.66 ms in isolation).

Three experiments, one process:

  A. per-op sync timing inside the PT round loop (kernel / refresh /
     swap separately, np.asarray sync after each) — where do the ms go?
  B. refresh-compute-only: run the no-refresh loop but ALSO dispatch the
     refresh each round and discard its output — isolates "refresh
     compute in context" from "refresh output slows the next kernel".
  C. refresh-feedback: feed the refresh output into the next round
     (the committed behavior) — if C >> B, the refresh OUTPUT (layouts /
     copies) is what poisons the kernel launch.

    python tools/measure_pt_refresh2.py
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
    import jax.numpy as jnp
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.parallel import multichain, replica

    out = {}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

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

    keys = jax.random.split(jax.random.PRNGKey(9), rounds + 2)

    # ---- A: per-op sync timing --------------------------------------
    states, thermos = states0, thermos0
    # warm every path (incl. kernel-after-refresh)
    states = kernel(states, thermos)
    states = refresh(states, thermos)
    states = kernel(states, thermos)
    nt, acc = replica.ladder_swap_batched(
        thermos.temperature, states.energy, keys[-1], 0)
    _ = replica.ladder_swap_batched(
        thermos.temperature, states.energy, keys[-2], 1)
    np.asarray(states.energy); np.asarray(nt)

    tk = tr = ts = 0.0
    for r in range(rounds):
        t0 = time.perf_counter()
        states = kernel(states, thermos)
        np.asarray(states.energy)
        t1 = time.perf_counter()
        states = refresh(states, thermos)
        np.asarray(states.energy)
        t2 = time.perf_counter()
        nt, _ = replica.ladder_swap_batched(
            thermos.temperature, states.energy, keys[r], r % 2)
        thermos = dataclasses.replace(thermos, temperature=nt)
        np.asarray(thermos.temperature)
        t3 = time.perf_counter()
        tk += t1 - t0; tr += t2 - t1; ts += t3 - t2
    emit("A_kernel_ms_per_round", 1e3 * tk / rounds)
    emit("A_refresh_ms_per_round", 1e3 * tr / rounds)
    emit("A_swap_ms_per_round", 1e3 * ts / rounds)

    # ---- B/C: pipelined loops ---------------------------------------
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
        np.asarray(states.energy)
        return states

    for name, fb, dr in (("none", False, False),
                         ("discard", False, True),
                         ("feedback", True, True)):
        loop(fb, dr, 2)                        # warm
        t0 = time.perf_counter()
        loop(fb, dr, rounds)
        dt = time.perf_counter() - t0
        emit(f"pipelined_{name}_agg_sps", R * rounds * spr / dt)
        emit(f"pipelined_{name}_ms_per_round", 1e3 * dt / rounds)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_PT_REFRESH2.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
