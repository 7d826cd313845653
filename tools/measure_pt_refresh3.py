"""Decisive fused-PT refresh-overhead test: per-op HOST dispatch times
(no syncs) + jax_log_compiles in the feedback loop.  If a round's
dispatch stalls ~75 ms on the kernel after a refresh, the cost is
host-side retrace/recompile; if all dispatches are sub-ms, it's device
or tunnel.

    python tools/measure_pt_refresh3.py
"""
from __future__ import annotations

import dataclasses
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_log_compiles", True)
    logging.basicConfig(level=logging.WARNING)
    logging.getLogger("jax._src.interpreters.pxla").setLevel(logging.INFO)
    logging.getLogger("jax._src.dispatch").setLevel(logging.INFO)

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.parallel import multichain, replica

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
    print("== warmup ==", flush=True)
    states, thermos = states0, thermos0
    states = kernel(states, thermos)
    states = refresh(states, thermos)
    states = kernel(states, thermos)
    for p in (0, 1):
        nt, _ = replica.ladder_swap_batched(
            thermos.temperature, states.energy, keys[p], p)
    np.asarray(states.energy); np.asarray(nt)

    print("== timed feedback loop (dispatch times only) ==", flush=True)
    states, thermos = states0, thermos0
    t_loop0 = time.perf_counter()
    for r in range(rounds):
        t0 = time.perf_counter()
        states = kernel(states, thermos)
        t1 = time.perf_counter()
        states = refresh(states, thermos)
        t2 = time.perf_counter()
        nt, _ = replica.ladder_swap_batched(
            thermos.temperature, states.energy, keys[r], r % 2)
        thermos = dataclasses.replace(thermos, temperature=nt)
        t3 = time.perf_counter()
        print(f"r{r}: kernel_disp={1e3*(t1-t0):.1f}ms "
              f"refresh_disp={1e3*(t2-t1):.1f}ms "
              f"swap_disp={1e3*(t3-t2):.1f}ms", flush=True)
    t_sync0 = time.perf_counter()
    np.asarray(states.energy)
    t_end = time.perf_counter()
    print(f"total={1e3*(t_end-t_loop0):.1f}ms "
          f"final_sync={1e3*(t_end-t_sync0):.1f}ms "
          f"agg_sps={R*rounds*spr/(t_end-t_loop0):.0f}", flush=True)


if __name__ == "__main__":
    main()
