"""Measure the chunk+refresh composition on the headline µVT C=16
interleaved path: per-block throughput with (a) separate dispatches,
(b) the composed one-jit block, (c) no refresh (kernel ceiling).
Feedback-chained like the real driver; interleaved + repeated to dodge
the chip-ramp landmine.

    python tools/measure_block_compose.py
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
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.parallel import multichain

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg = dataclasses.replace(cfg, fused_mc=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    F = metropolis.frozen_refresh_rows(params, cfg)
    C, K, blocks = 16, 1024, 8
    states0 = multichain.stack_states(state, C)

    def sync(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf)

    def run_sep(nb):
        states = states0
        for _ in range(nb):
            states, _ = metropolis.run_chunk_fused_uvt_multi(
                states, params, cfg, thermo, K)
            states = multichain.initialize_batched(
                states, params, cfg, thermo, frozen_rows=F)
        sync(states.energy)
        return states

    def run_comp(nb):
        states = states0
        for _ in range(nb):
            states, _ = metropolis.run_chunk_fused_uvt_multi(
                states, params, cfg, thermo, K, refresh_rows=F)
        sync(states.energy)
        return states

    def run_none(nb):
        states = states0
        for _ in range(nb):
            states, _ = metropolis.run_chunk_fused_uvt_multi(
                states, params, cfg, thermo, K)
        sync(states.energy)
        return states

    out = {}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    variants = (("separate", run_sep), ("composed", run_comp),
                ("norefresh", run_none))
    # warm: full-length runs of every variant (chip ramp + compiles)
    for _, fn in variants:
        fn(blocks)
    for rep in range(2):
        for name, fn in variants:
            t0 = time.perf_counter()
            fn(blocks)
            dt = time.perf_counter() - t0
            emit(f"{name}_rep{rep}_agg_sps", C * K * blocks / dt)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_BLOCK_COMPOSE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
