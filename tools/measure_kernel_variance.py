"""Variance check: alternate full vs restricted pair-kernel timings in
one process to separate real speed from tunnel/chip-state noise.

    python tools/measure_kernel_variance.py
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
    from mpmc_tpu.ops import pairs
    from mpmc_tpu.ops.pallas import pair_kernel as pk

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512)
    cfg = dataclasses.replace(cfg, fused_mc=True, ensemble="nvt")
    F = metropolis.frozen_refresh_rows(params, cfg)
    alive = state.atom_alive(params)
    rc = pairs.derived_cutoff(state.box, cfg)
    alpha = pairs.derived_alpha(rc, cfg)

    def t(fn, n=30):
        fn()
        np.asarray(jax.tree_util.tree_leaves(fn())[0])
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        for leaf in jax.tree_util.tree_leaves(r):
            np.asarray(leaf)
        return (time.perf_counter() - t0) / n * 1e3

    full = lambda: pk.pair_pass_pallas(state.pos, state.box, alive,
                                       params, cfg, rc, alpha)
    rest = lambda: pk.pair_pass_pallas(state.pos, state.box, alive,
                                       params, cfg, rc, alpha,
                                       row_start=F)
    rows = []
    for rep in range(5):
        a = t(full)
        b = t(rest)
        rows.append((a, b))
        print(json.dumps({"rep": rep, "full_ms": a, "rest_ms": b}),
              flush=True)
    out = {"full_ms": [r[0] for r in rows],
           "rest_ms": [r[1] for r in rows]}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_KERNEL_VARIANCE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
