"""53.7k-atom fused µVT chain-interleave width probe beyond C=16.

C=16 measured 55 MB of VMEM planes (MEASURE_LARGE_FUSED.json) against
the 110 MB vmem_limit_bytes the multi pallas_calls request, so C=24
(~82 MB) should fit and C=32 (~110 MB) is borderline.  A clean
"Used X of Y vmem" RESOURCE_EXHAUSTED is a capacity fact (stop); a
compile-helper crash is flakiness (retry once).

    python tools/measure_large_c.py [C ...]
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

    widths = [int(a) for a in sys.argv[1:]] or [20, 24]
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=37, spacing=4.0, n_h2=512, capacity=1024,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg = dataclasses.replace(cfg, fused_mc=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    out = {"n_atoms": int(params.n_atoms_max)}
    print(json.dumps(out), flush=True)

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    def sync(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(leaf)

    K = 2048
    for C in widths:
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
            emit(f"fused_uvt_interleaved_c{C}_error", repr(e)[:300])
            break

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_LARGE_C.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
