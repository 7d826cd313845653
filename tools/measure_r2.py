"""One-process round-2 TPU measurement sweep — run when the axon tunnel
is up (it was down for the whole 2026-08-18 build window, so the
chain-interleaved kernels and the PCG polar step are TPU-unmeasured).

Measures, in ONE process (CLAUDE.md: cross-process chip-state variance
makes C-scans incomparable otherwise):

  1. GCMC strategy race on the 10.8k-atom MOF+H2+Ewald system:
     fused single chain (K/launch fit), chain-interleaved fused C-scan
     (C = 2..16), batched scan chains at the C=128 optimum.
  2. NVT Ewald chain-interleaved C-scan.
  3. Polar (Thole PCG) ms/step + mean CG iterations.
  4. Fused single-chip PT round rate (per-replica and one-launch).

Writes MEASURE_R2.json and prints one line per metric.  Sync discipline:
np.asarray fetches, warmup with the same static args that get timed.

    python tools/measure_r2.py [--quick]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def fetch(x):
    import jax
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def rate(fn, state0, n_steps, reps=3):
    """steps/s of fn(state)->state advancing n_steps, after warmup."""
    st = fn(state0)
    fetch(st)
    t0 = time.perf_counter()
    for _ in range(reps):
        st = fn(st)
    fetch(st)
    return reps * n_steps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller K / fewer C points")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (smoke tests; env vars "
                         "alone cannot override the axon plugin)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes + interpret-mode kernels: "
                         "validates every code path end-to-end without "
                         "a TPU (numbers are meaningless)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.parallel import multichain, replica

    out = {}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    K = 2048 if args.quick else 8192
    syskw = dict(n_side=21, spacing=4.0, n_h2=256, capacity=512)
    if args.tiny:
        K = 32
        syskw = dict(n_side=4, spacing=4.0, n_h2=4, capacity=8,
                     ewald_kmax=3)

    # --- 1. GCMC strategies -------------------------------------------------
    params, state, cfg, thermo = systems.mof_h2_gcmc(**syskw)
    cfg = dataclasses.replace(cfg, fused_mc=True)
    state = metropolis.initialize(state, params, cfg, thermo)

    emit("gcmc_fused_single_sps", rate(
        lambda s: metropolis.run_chunk_fused_uvt(s, params, cfg, thermo,
                                                 K)[0], state, K))

    from mpmc_tpu.ops.pallas import mc_kernel
    for C in ((2,) if args.tiny
              else (2, 4, 8) if args.quick else (2, 4, 8, 12, 16)):
        if C > mc_kernel.MAX_MULTI_CHAINS:
            break
        states = multichain.stack_states(state, C, seed=3)
        kc = max(K // C, 512)
        emit(f"gcmc_fused_multi_c{C}_agg_sps", C * rate(
            lambda s: metropolis.run_chunk_fused_uvt_multi(
                s, params, cfg, thermo, kc)[0], states, kc))

    c_scan = 4 if args.tiny else 128
    states128 = multichain.stack_states(state, c_scan, seed=4)
    kb = 8 if args.tiny else 256 if args.quick else 512
    emit(f"gcmc_scan_c{c_scan}_agg_sps", c_scan * rate(
        lambda s: multichain.run_chunk_batched(s, params, cfg, thermo,
                                               kb)[0], states128, kb))

    # --- 2. NVT Ewald interleaved C-scan ------------------------------------
    cfg_n = dataclasses.replace(cfg, ensemble="nvt")
    state_n = metropolis.initialize(state, params, cfg_n, thermo)
    for C in ((2,) if args.tiny
              else (4, 16) if args.quick else (4, 8, 16)):
        if C > mc_kernel.MAX_MULTI_CHAINS:
            break
        states = multichain.stack_states(state_n, C, seed=5)
        kc = max(K // C, 512)
        emit(f"nvt_fused_multi_c{C}_agg_sps", C * rate(
            lambda s: metropolis.run_chunk_fused_multi(
                s, params, cfg_n, thermo, kc)[0], states, kc))

    # --- 3. polar PCG -------------------------------------------------------
    params_p, state_p, cfg_p, thermo_p = systems.mof_h2_gcmc(
        polarization=True, **syskw)
    state_p = metropolis.initialize(state_p, params_p, cfg_p, thermo_p)
    chunk = 2 if args.tiny else 32 if args.quick else 64
    st, stats = metropolis.run_chunk(state_p, params_p, cfg_p, thermo_p,
                                     chunk)
    fetch(st)
    t0 = time.perf_counter()
    st, stats = metropolis.run_chunk(st, params_p, cfg_p, thermo_p,
                                     chunk)
    fetch(st)
    dt = time.perf_counter() - t0
    emit("polar_ms_per_step_pcg", 1e3 * dt / chunk)
    emit("polar_cg_iters_per_step",
         float(np.asarray(stats.polar_iters)) / chunk)

    # --- 4. fused PT --------------------------------------------------------
    R = 2 if args.tiny else 8
    temps = replica.geometric_ladder(77.0, 250.0, R)
    spr = 8 if args.tiny else 256 if args.quick else 1024
    cfg_t = dataclasses.replace(cfg, ensemble="nvt")
    for name, runner in (
            ("pt_fused_per_replica", replica.run_parallel_tempering_fused),
            ("pt_fused_one_launch",
             replica.run_parallel_tempering_fused_multi)):
        t0 = time.perf_counter()
        sts, _, acc = runner(params, state, cfg_t, thermo, temps,
                             n_rounds=4, steps_per_round=spr, seed=2)
        fetch(sts)
        emit(f"{name}_agg_sps",
             R * 4 * spr / (time.perf_counter() - t0))

    if args.tiny:
        print("tiny smoke complete (no MEASURE_R2.json written)")
        return
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MEASURE_R2.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote MEASURE_R2.json")


if __name__ == "__main__":
    main()
