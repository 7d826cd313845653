"""Headline benchmark: MC steps/sec on the north-star system
(~10k-atom synthetic MOF framework + H2 GCMC with Ewald electrostatics,
BASELINE.md / BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.json
``published: {}``); ``vs_baseline`` is therefore computed against the
documented single-core-C algorithmic estimate of 10 steps/s for an
O(N^2)-resum Ewald GCMC at this scale (BASELINE.md) — the most
conservative (fastest) end of the estimate band.
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_STEPS_PER_SEC = 10.0


def main():
    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.parallel import multichain

    # ~9.3k framework atoms + up to 512 H2 (x3 sites) = ~10.8k atom slots;
    # independent GCMC chains batched on the one chip (the TPU analog of
    # the reference's replica-per-MPI-rank throughput model).  C=128 is
    # the measured aggregate-throughput optimum on a v5e-class chip
    # (96-128 plateau ~126k agg steps/s; 2026-08-17 scan in CLAUDE.md)
    n_chains = 128
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        temperature=77.0, pressure=1.0)
    state = metropolis.initialize(state, params, cfg, thermo)
    states = multichain.stack_states(state, n_chains)
    states = multichain.initialize_batched(states, params, cfg, thermo)

    chunk = 128
    # warm-up: compile + one chunk.  NOTE: sync via an explicit host fetch,
    # not block_until_ready — on the remote-tunnel TPU platform the latter
    # can return before execution finishes, which silently turns the
    # benchmark into a dispatch-latency meter.
    states, stats = multichain.run_chunk_batched(states, params, cfg,
                                                 thermo, chunk)
    np.asarray(states.energy.rd)

    n_chunks = 4
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        states, stats = multichain.run_chunk_batched(states, params, cfg,
                                                     thermo, chunk)
    np.asarray(states.energy.rd)
    wall = time.perf_counter() - t0

    steps = n_chunks * chunk * n_chains
    sps = steps / wall
    print(json.dumps({
        "metric": "agg_mc_steps_per_sec_10k_mof_h2_gcmc_ewald_batched_chains",
        "value": round(sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
