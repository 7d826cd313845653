"""Ablate the batched per-corrtime refresh (initialize_batched) to find
the ~85 ms: pair pass vs Ewald recip vs the rest.  All timings are one
jitted dispatch per call (no eager-op pollution).

    python tools/measure_init_ablate.py
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
    R = 8
    temps = replica.geometric_ladder(77.0, 250.0, R)
    states = replica.stack_states(state, R)
    thermos = replica.stack_thermo(thermo, temps, cfg.jdtype)

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

    variants = [
        ("base_ewald", cfg, F),
        ("base_ewald_fullrefresh", cfg, 0),
        ("coulomb_cutoff", dataclasses.replace(cfg, coulomb="cutoff"), F),
        ("ewald_no_mxu", dataclasses.replace(cfg, ewald_mxu=False)
         if hasattr(cfg, "ewald_mxu") else None, F),
        ("rd_none_ewald", dataclasses.replace(cfg, rd_potential="none",
                                              rd_lrc=False), F),
    ]
    for name, c, fr in variants:
        if c is None:
            continue
        try:
            emit(name + "_ms", t(lambda c=c, fr=fr:
                                 multichain.initialize_batched(
                                     states, params, c, thermos,
                                     thermo_batched=True,
                                     frozen_rows=fr)))
        except Exception as e:   # noqa: BLE001
            emit(name + "_error", repr(e)[:200])

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_INIT_ABLATE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
