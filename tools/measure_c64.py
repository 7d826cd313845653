"""Retry the C>48 chain-interleave points on the real TPU.

The 2026-08-18 µVT C-scan stopped at C=48 because C=64 crashed the
axon compile helper; CLAUDE.md documents that the compile service has
enormous variance, so a one-off crash is weak evidence of a hard
envelope.  This tool re-measures C = 48 (in-process baseline), 56, 64
on the 10.8k-atom MOF+H2 GCMC+Ewald headline system with
MAX_MULTI_CHAINS monkeypatched up, writing MEASURE_C64.json
INCREMENTALLY so a helper crash preserves the earlier points.

VMEM accounting at C=64 (n_pad=11264, ~10 planes): ~29 MB of per-chain
planes + S(k) + uniforms — far under the 110 MB vmem_limit_bytes, so
any failure is compile-side, not a capacity fact.

    python tools/measure_c64.py [--quick]
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

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "MEASURE_C64.json")


def fetch(x):
    import jax
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cs", type=str, default="48,56,64",
                    help="comma-separated chain counts, measured in order")
    args = ap.parse_args()

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops.pallas import mc_kernel
    from mpmc_tpu.parallel import multichain

    cs = [int(c) for c in args.cs.split(",")]
    mc_kernel.MAX_MULTI_CHAINS = max(48, max(cs))

    out = {}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)

    # K is PER-CHAIN steps per launch — keep it constant across C so the
    # launch-overhead amortization matches bench.py (kc = Ktot//C at
    # C=48 gave 512 steps/launch and measured 156k where bench's K=4096
    # measured 246k — launch-bound, not a kernel fact).
    K = 1024 if args.quick else 4096
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512)
    cfg = dataclasses.replace(cfg, fused_mc=True)
    state = metropolis.initialize(state, params, cfg, thermo)

    for C in cs:
        kc = K
        states = multichain.stack_states(state, C, seed=3)
        t_c0 = time.perf_counter()
        st, _ = metropolis.run_chunk_fused_uvt_multi(
            states, params, cfg, thermo, kc)
        fetch(st)
        emit(f"compile_plus_first_s_c{C}", time.perf_counter() - t_c0)
        # warm full-length repeat, then timing window
        st, _ = metropolis.run_chunk_fused_uvt_multi(
            st, params, cfg, thermo, kc)
        fetch(st)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            st, _ = metropolis.run_chunk_fused_uvt_multi(
                st, params, cfg, thermo, kc)
        fetch(st)
        emit(f"gcmc_fused_multi_c{C}_agg_sps",
             C * reps * kc / (time.perf_counter() - t0))

    print("wrote", OUT)


if __name__ == "__main__":
    main()
