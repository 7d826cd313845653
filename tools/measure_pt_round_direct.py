"""Time _pt_fused_round (kernel + refresh + swap, one jit) directly:
do_refresh in {False, True} x frozen_rows in {0, F}, on a properly
initialized stacked state.

    python tools/measure_pt_round_direct.py
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
    from mpmc_tpu.ops.pallas import mc_kernel
    from mpmc_tpu.parallel import replica, multichain

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512)
    cfg = dataclasses.replace(cfg, fused_mc=True, ensemble="nvt")
    F = metropolis.frozen_refresh_rows(params, cfg)
    state = metropolis.initialize(state, params, cfg, thermo)
    R, spr = 8, 1024
    temps = replica.geometric_ladder(77.0, 250.0, R)
    states = multichain.stack_states(state, R, seed=0)
    thermos = replica.stack_thermo(thermo, temps, cfg.jdtype)
    mv, mva, a_max, _ = mc_kernel.movable_mols(
        params, np.asarray(states.mol_alive[0]))
    mv_start, mv_natoms = jnp.asarray(mv), jnp.asarray(mva)
    key = jax.random.PRNGKey(3)

    out = {}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    def t(fr, do_refresh, n=10):
        fn = lambda: replica._pt_fused_round(
            states, params, thermos, mv_start, mv_natoms, key, cfg,
            spr, int(a_max), 0, fr, do_refresh, False)
        r = fn()
        for leaf in jax.tree_util.tree_leaves(r):
            np.asarray(leaf)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        for leaf in jax.tree_util.tree_leaves(r):
            np.asarray(leaf)
        return (time.perf_counter() - t0) / n * 1e3

    emit("round_norefresh_ms", t(F, False))
    emit("round_fast_refresh_ms", t(F, True))
    emit("round_full_refresh_ms", t(0, True))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_PT_ROUND_DIRECT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()

def feedback():
    """Round-chained variant: feed output states back like the driver."""
    import jax
    import jax.numpy as jnp
    from mpmc_tpu.models import systems
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.ops.pallas import mc_kernel
    from mpmc_tpu.parallel import replica, multichain
    import dataclasses as dc

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512)
    cfg = dc.replace(cfg, fused_mc=True, ensemble="nvt")
    F = metropolis.frozen_refresh_rows(params, cfg)
    state = metropolis.initialize(state, params, cfg, thermo)
    R, spr = 8, 1024
    temps = replica.geometric_ladder(77.0, 250.0, R)
    states0 = multichain.stack_states(state, R, seed=0)
    thermos = replica.stack_thermo(thermo, temps, cfg.jdtype)
    mv, mva, a_max, _ = mc_kernel.movable_mols(
        params, np.asarray(states0.mol_alive[0]))
    mv_start, mv_natoms = jnp.asarray(mv), jnp.asarray(mva)
    key = jax.random.PRNGKey(3)
    mol_alive = states0.mol_alive

    def run(fr, rounds=8):
        states = states0
        for r in range(rounds):
            states, ts, acc = replica._pt_fused_round(
                states, params, thermos, mv_start, mv_natoms, key, cfg,
                spr, int(a_max), r % 2, fr, r + 1 < rounds, False)
            states = dc.replace(states, mol_alive=mol_alive)
        for leaf in jax.tree_util.tree_leaves(states.energy):
            np.asarray(leaf)
        return states

    results = {}
    for name, fr in (("fb_fast", F), ("fb_full", 0)):
        run(fr, rounds=3)   # warm all parity/do_refresh variants
        run(fr, rounds=2)
        t0 = time.perf_counter()
        run(fr, rounds=8)
        dt = time.perf_counter() - t0
        results[name + "_agg_sps"] = R * 8 * spr / dt
        print(json.dumps({name + "_agg_sps": results[name + "_agg_sps"]}),
              flush=True)
    # interleave a second repetition to expose drift
    for name, fr in (("fb_fast2", F), ("fb_full2", 0)):
        t0 = time.perf_counter()
        run(fr, rounds=8)
        dt = time.perf_counter() - t0
        print(json.dumps({name + "_agg_sps": R * 8 * spr / dt}),
              flush=True)


if __name__ == "__main__" and os.environ.get("FEEDBACK"):
    feedback()
