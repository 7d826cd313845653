"""µVT (GCMC) PT on the 10.8k MOF+H2 system: per-replica fused
launches vs the new one-launch chain-interleaved driver with per-chain
betas.  Warm each variant with full-length runs (chip-ramp landmine).

    python tools/measure_pt_uvt.py
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

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg = dataclasses.replace(cfg, fused_mc=True)   # ensemble uvt
    R, spr, rounds = 8, 1024, 8
    temps = replica.geometric_ladder(77.0, 250.0, R)

    out = {}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    def sync(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf)

    def t_multi(nr):
        t0 = time.perf_counter()
        sts, ts, acc = replica.run_parallel_tempering_fused_multi(
            params, state, cfg, thermo, temps, n_rounds=nr,
            steps_per_round=spr, seed=2)
        sync(sts.energy)
        return R * nr * spr / (time.perf_counter() - t0), int(acc)

    def t_seq(nr):
        t0 = time.perf_counter()
        sts, ts, acc = replica.run_parallel_tempering_fused(
            params, state, cfg, thermo, temps, n_rounds=nr,
            steps_per_round=spr, seed=2)
        sync(sts[0].energy)
        return R * nr * spr / (time.perf_counter() - t0), int(acc)

    # warm both fully, then interleave the timings
    t_multi(3); t_multi(2)
    t_seq(3); t_seq(2)
    for rep in range(2):
        sps, acc = t_multi(rounds)
        emit(f"uvt_pt_onelaunch_rep{rep}_agg_sps", sps)
        emit(f"uvt_pt_onelaunch_rep{rep}_swaps", acc)
        sps, acc = t_seq(rounds)
        emit(f"uvt_pt_perreplica_rep{rep}_agg_sps", sps)
        emit(f"uvt_pt_perreplica_rep{rep}_swaps", acc)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_PT_UVT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
