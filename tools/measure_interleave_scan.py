"""Re-derive the chain-interleave width doctrine on the current
kernels (r5; r4 verdict item 5 / weak #2): r4 BENCH_FULL showed the
optimum has moved INSIDE the VMEM envelope (c32 beat c48 by ~6% on the
10.8k µVT config), but the race grid {16,32,48} brackets it coarsely.

One process, finer grid, every width warmed before ANY timing window,
widths interleaved across repeats (CLAUDE.md benchmark-order landmine).
Grids: 10.8k µVT and NVT-Ewald at C in {8,16,24,32,40,48}; 53.7k µVT
at C in {4,6,8,12,16}.

Writes MEASURE_INTERLEAVE_SCAN.json.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def build(n_side, n_h2, capacity, ensemble):
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=n_side, spacing=4.0, n_h2=n_h2, capacity=capacity,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg = dataclasses.replace(cfg, ensemble=ensemble, fused_mc=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    return params, state, cfg, thermo


PATH_OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "MEASURE_INTERLEAVE_SCAN.json")


def _flush(out):
    with open(PATH_OUT, "w") as f:
        json.dump(out, f, indent=1)


def scan(tag, n_side, n_h2, capacity, ensemble, widths, K, out):
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.parallel import multichain

    params, state, cfg, thermo = build(n_side, n_h2, capacity, ensemble)
    runner = (metropolis.run_chunk_fused_uvt_multi
              if ensemble == "uvt"
              else metropolis.run_chunk_fused_multi)
    stacked = {}
    for C in widths:
        t0 = time.perf_counter()
        try:
            states = multichain.stack_states(state, C)
            states, _ = runner(states, params, cfg, thermo, K)
            np.asarray(states.pos)      # warm compile + chip
            stacked[C] = states
            print(f"{tag} c{C} warm in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — record width failure
            out.setdefault(tag, {})[f"c{C}"] = {"error": repr(e)[:200]}
            print(f"{tag} c{C} FAILED: {e!r}"[:150], flush=True)
        _flush(out)
    res = {C: [] for C in stacked}
    for _ in range(2):
        for C, states in stacked.items():
            t0 = time.perf_counter()
            for _ in range(3):
                states, _ = runner(states, params, cfg, thermo, K)
            np.asarray(states.pos)
            stacked[C] = states
            res[C].append(round(3 * K * C
                                / (time.perf_counter() - t0), 1))
        for C, vals in res.items():
            out.setdefault(tag, {})[f"c{C}"] = {
                "agg_steps_per_s": vals, "best": max(vals)}
        _flush(out)
        print(f"{tag} rep done: "
              + " ".join(f"c{C}={max(v)}" for C, v in res.items()),
              flush=True)
    return out


def main():
    out = {"method": "in-process interleaved, 2 reps x 3 chunks, all "
                     "widths warmed first"}
    scan("uvt_10k", 21, 256, 512, "uvt",
         (8, 16, 24, 32, 40, 48), 2048, out)
    scan("nvt_ewald_10k", 21, 256, 512, "nvt",
         (8, 16, 24, 32, 40, 48), 2048, out)
    scan("uvt_54k", 37, 512, 1024, "uvt", (4, 6, 8, 12, 16), 1024, out)
    _flush(out)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
