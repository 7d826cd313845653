"""Time initialize_batched with a PROPERLY initialized state (e_frozen
set), so frozen_rows=F actually takes the reuse/restricted branch —
prior measurements silently fell back to the full pass.

    python tools/measure_init_reuse.py
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
    from mpmc_tpu.models import systems
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.parallel import replica, multichain

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512)
    cfg = dataclasses.replace(cfg, fused_mc=True, ensemble="nvt")
    F = metropolis.frozen_refresh_rows(params, cfg)
    state = metropolis.initialize(state, params, cfg, thermo)
    R = 8
    temps = replica.geometric_ladder(77.0, 250.0, R)
    states = multichain.stack_states(state, R, seed=0)
    thermos = replica.stack_thermo(thermo, temps, cfg.jdtype)
    assert states.e_frozen is not None

    out = {}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    def t(fn, n=10):
        r = fn()
        for leaf in jax.tree_util.tree_leaves(r):
            np.asarray(leaf)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        for leaf in jax.tree_util.tree_leaves(r):
            np.asarray(leaf)
        return (time.perf_counter() - t0) / n * 1e3

    for name, fr in (("init_reuse_fast_ms", F), ("init_full_ms", 0)):
        emit(name, t(lambda fr=fr: multichain.initialize_batched(
            states, params, cfg, thermos, thermo_batched=True,
            frozen_rows=fr)))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_INIT_REUSE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
