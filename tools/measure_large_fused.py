"""Large-system (~53.7k atoms) fused-path measurement: single fused
GCMC chain, and chain-interleaved C in {4, 8} if VMEM admits it.
Previous recorded number is the r1 SCAN path: 1181 steps/s.

    python tools/measure_large_fused.py
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
    from mpmc_tpu.ops.pallas import mc_kernel

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=37, spacing=4.0, n_h2=512, capacity=1024,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg = dataclasses.replace(cfg, fused_mc=True)
    print(json.dumps({"n_atoms": int(params.n_atoms_max)}), flush=True)
    assert mc_kernel.supported_uvt(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)

    out = {"n_atoms": int(params.n_atoms_max)}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    def sync(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf)

    K = 2048
    # chip warm + compile
    st, _ = metropolis.run_chunk_fused_uvt(state, params, cfg, thermo, K)
    sync(st.energy)
    for _ in range(3):
        st, _ = metropolis.run_chunk_fused_uvt(st, params, cfg, thermo, K)
    sync(st.energy)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        st, _ = metropolis.run_chunk_fused_uvt(st, params, cfg, thermo, K)
    sync(st.energy)
    emit("fused_uvt_single_sps", reps * K / (time.perf_counter() - t0))

    for C in (4, 8):
        try:
            states = multichain.stack_states(state, C)
            states, _ = metropolis.run_chunk_fused_uvt_multi(
                states, params, cfg, thermo, K)
            sync(states.energy)
            for _ in range(2):
                states, _ = metropolis.run_chunk_fused_uvt_multi(
                    states, params, cfg, thermo, K)
            sync(states.energy)
            t0 = time.perf_counter()
            for _ in range(3):
                states, _ = metropolis.run_chunk_fused_uvt_multi(
                    states, params, cfg, thermo, K)
            sync(states.energy)
            emit(f"fused_uvt_interleaved_c{C}_agg_sps",
                 3 * K * C / (time.perf_counter() - t0))
        except Exception as e:   # noqa: BLE001
            emit(f"fused_uvt_interleaved_c{C}_error", repr(e)[:200])
            break

    # per-corrtime refresh cost at this size (restricted pallas)
    F = metropolis.frozen_refresh_rows(params, cfg)
    st2 = metropolis.initialize(st, params, cfg, thermo, frozen_rows=F)
    sync(st2.energy)
    t0 = time.perf_counter()
    for _ in range(5):
        st2 = metropolis.initialize(st, params, cfg, thermo,
                                    frozen_rows=F)
    sync(st2.energy)
    emit("refresh_restricted_ms", (time.perf_counter() - t0) / 5 * 1e3)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_LARGE_FUSED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
