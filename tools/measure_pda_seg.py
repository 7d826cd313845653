"""PDA_SEG sensitivity on the NVT all-displace polar path (r3 verdict
item 9): NVT survival (~acceptance) is higher than µVT's 0.15-0.19, so
the first-survivor freeze wastes more of each launch and the µVT-tuned
PDA_SEG=16 may be wrong.  Sweeps PDA_SEG in {4,8,16,32} for BOTH
ensembles on the bench-size polar system (the r3 µVT scan was
8/16/32 -> 1244/1387/1389 at residual tolerance).

PDA_SEG is a module constant read at trace time: each point rebinds it
and clears the jit caches (fresh trace), so one process can sweep.

    python tools/measure_pda_seg.py   (real TPU)
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import numpy as np


def main():
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops.pallas import mc_kernel

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        polarization=True)
    out = {}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    def time_cfg(c, K=512):
        st = metropolis.initialize(state, params, c, thermo)
        st, _ = metropolis.run_chunk_fused_uvt_polar_da(
            st, params, c, thermo, K)
        np.asarray(st.energy.rd)
        t0 = time.perf_counter()
        n = acc = 0
        for _ in range(3):
            st, stats = metropolis.run_chunk_fused_uvt_polar_da(
                st, params, c, thermo, K)
            n += int(np.asarray(stats.attempts).sum())
            acc += int(np.asarray(stats.accepts).sum())
        np.asarray(st.energy.rd)
        return n / (time.perf_counter() - t0), acc / max(n, 1)

    cfg_uvt = dataclasses.replace(cfg, polar_delayed=True,
                                  fused_mc=True)
    cfg_nvt = dataclasses.replace(cfg_uvt, ensemble="nvt")
    # two passes (ramp-proof ordering): sweep segs, then sweep again
    for rep in (1, 2):
        for seg in (4, 8, 16, 32):
            mc_kernel.PDA_SEG = seg
            jax.clear_caches()
            sps_n, ar_n = time_cfg(cfg_nvt)
            sps_u, ar_u = time_cfg(cfg_uvt)
            emit(f"seg{seg}_rep{rep}",
                 {"nvt_steps_per_s": round(sps_n, 1),
                  "nvt_accept": round(ar_n, 3),
                  "uvt_steps_per_s": round(sps_u, 1),
                  "uvt_accept": round(ar_u, 3)})

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_PDA_SEG.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
