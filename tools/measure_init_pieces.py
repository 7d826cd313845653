"""Time the batched refresh pieces as single jitted dispatches:
vmapped pair kernel, vmapped Ewald recip, the alive-gather, and
full initialize_batched for reference.

    python tools/measure_init_pieces.py
"""
from __future__ import annotations

import dataclasses
import functools
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
    from mpmc_tpu.ops import pairs, ewald
    from mpmc_tpu.parallel import replica, multichain

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512)
    cfg = dataclasses.replace(cfg, fused_mc=True, ensemble="nvt")
    F = metropolis.frozen_refresh_rows(params, cfg)
    R = 8
    temps = replica.geometric_ladder(77.0, 250.0, R)
    states = replica.stack_states(state, R)
    thermos = replica.stack_thermo(thermo, temps, cfg.jdtype)

    out = {}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    def t(fn, *args, n=10):
        r = fn(*args)
        for leaf in jax.tree_util.tree_leaves(r):
            np.asarray(leaf)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        for leaf in jax.tree_util.tree_leaves(r):
            np.asarray(leaf)
        return (time.perf_counter() - t0) / n * 1e3

    rc = pairs.derived_cutoff(state.box, cfg)
    alpha = pairs.derived_alpha(rc, cfg)
    alive1 = state.atom_alive(params)
    alive_b = jnp.broadcast_to(alive1, (R,) + alive1.shape)

    @functools.partial(jax.jit, static_argnames=("row_start",))
    def pair_b(pos_b, box_b, alive_b, row_start):
        return jax.vmap(
            lambda p, b, a: pairs.pair_pass(p, b, a, params, cfg,
                                            thermos.temperature[0],
                                            row_start=row_start)
        )(pos_b, box_b, alive_b)

    emit("pair_batched_full_ms",
         t(pair_b, states.pos, states.box, alive_b, 0))
    emit("pair_batched_restricted_ms",
         t(pair_b, states.pos, states.box, alive_b, F))

    @jax.jit
    def recip_b(pos_b, box_b, alive_b):
        return jax.vmap(
            lambda p, b, a: ewald.recip_energy(p, params.charge, a, b,
                                               alpha, cfg))(
            pos_b, box_b, alive_b)

    emit("recip_batched_ms", t(recip_b, states.pos, states.box, alive_b))

    @jax.jit
    def alive_gather(mol_alive_b):
        return jax.vmap(lambda ma: ma[params.mol_id]
                        & params.atom_ok)(mol_alive_b)

    emit("alive_gather_ms", t(alive_gather, states.mol_alive))

    emit("init_batched_full_ms",
         t(lambda: multichain.initialize_batched(
             states, params, cfg, thermos, thermo_batched=True,
             frozen_rows=0)))
    emit("init_batched_fast_ms",
         t(lambda: multichain.initialize_batched(
             states, params, cfg, thermos, thermo_batched=True,
             frozen_rows=F)))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_INIT_PIECES.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
