"""Fused-PT driver throughput after the single-jit round
(_pt_fused_round: kernel + per-corrtime refresh + ladder swap in ONE
XLA program).  Proper pytree-leaf syncs (the MEASURE_PT_REFRESH.json
numbers synced on np.asarray(EnergyBreakdown) == no sync at all).

    python tools/measure_pt_refresh5.py
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
    from mpmc_tpu.parallel import replica

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
    R, spr, rounds = 8, 1024, 8
    temps = replica.geometric_ladder(77.0, 250.0, R)

    from mpmc_tpu.mc import metropolis
    real_frr = metropolis.frozen_refresh_rows

    def run_pt(corr, n_rounds):
        cfg_t = dataclasses.replace(cfg, corrtime=corr)
        t0 = time.perf_counter()
        sts, ts, acc = replica.run_parallel_tempering_fused_multi(
            params, state, cfg_t, thermo, temps, n_rounds=n_rounds,
            steps_per_round=spr, seed=2)
        sync(sts.energy)
        return R * n_rounds * spr / (time.perf_counter() - t0)

    # full refresh = frozen_rows 0 = the Pallas-tiled full pair pass;
    # fast refresh = row-restricted jnp scan (pairs.pair_pass skips the
    # Pallas kernel when row_start > 0)
    # order: no_refresh first (also serves as chip warm-up), then full,
    # then fast LAST — the original fast-first ordering measured fast 2x
    # slow (chip-state ramp), contradicted by interleaved feedback runs
    for name, corr, frr in (("onejit_no_refresh", 1 << 30, real_frr),
                            ("onejit_full_refresh", 1000,
                             lambda *a, **k: 0),
                            ("onejit_fast_refresh", 1000, real_frr)):
        metropolis.frozen_refresh_rows = frr
        replica.metropolis.frozen_refresh_rows = frr
        # warm ALL 4 _pt_fused_round jit variants (parity x do_refresh):
        # a 3-round run covers (T,0),(T,1),(F,0); a 2-round run adds
        # (F,1) — the last round always skips the refresh
        run_pt(corr, 3)
        run_pt(corr, 2)
        emit(name + "_agg_sps", run_pt(corr, rounds))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_PT_REFRESH5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
