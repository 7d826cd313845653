"""Decompose the batched per-corrtime refresh cost on TPU: raw pair
kernel (full vs row-restricted), full initialize_batched with
frozen_rows=F vs 0, to find where the fast-refresh time actually goes.

    python tools/measure_refresh_parts.py
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
    from mpmc_tpu.models import systems
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.ops import pairs
    from mpmc_tpu.ops.pallas import pair_kernel as pk
    from mpmc_tpu.parallel import replica, multichain

    out = {}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    def sync(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf)

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512)
    cfg = dataclasses.replace(cfg, fused_mc=True, ensemble="nvt")
    F = metropolis.frozen_refresh_rows(params, cfg)
    emit("frozen_rows", int(F))
    alive = state.atom_alive(params)
    rc = pairs.derived_cutoff(state.box, cfg)
    alpha = pairs.derived_alpha(rc, cfg)

    def timeit(fn, n=20):
        sync(fn())   # warm
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        sync(r)
        return (time.perf_counter() - t0) / n * 1e3   # ms

    # raw kernel, single system
    emit("kernel_full_ms", timeit(lambda: pk.pair_pass_pallas(
        state.pos, state.box, alive, params, cfg, rc, alpha)))
    emit("kernel_restricted_ms", timeit(lambda: pk.pair_pass_pallas(
        state.pos, state.box, alive, params, cfg, rc, alpha,
        row_start=F)))
    # jnp restricted scan for comparison
    cfg_nopl = dataclasses.replace(cfg, use_pallas=False)
    emit("jnp_restricted_ms", timeit(lambda: pairs.pair_pass(
        state.pos, state.box, alive, params, cfg_nopl,
        thermo.temperature, row_start=F)))

    # batched (8 replicas) initialize
    R = 8
    temps = replica.geometric_ladder(77.0, 250.0, R)
    states = replica.stack_states(state, R)
    thermos = replica.stack_thermo(thermo, temps, cfg.jdtype)

    for name, fr in (("init_batched_full_ms", 0),
                     ("init_batched_fast_ms", F)):
        emit(name, timeit(lambda fr=fr: multichain.initialize_batched(
            states, params, cfg, thermos, thermo_batched=True,
            frozen_rows=fr), n=10))

    # single-system initialize for reference
    st1 = metropolis.initialize(state, params, cfg, thermo)
    sync(st1)
    for name, fr in (("init_single_full_ms", 0),
                     ("init_single_fast_ms", F)):
        emit(name, timeit(lambda fr=fr: metropolis.initialize(
            st1, params, cfg, thermo, frozen_rows=fr), n=10))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_REFRESH_PARTS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
