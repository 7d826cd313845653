"""Per-piece timing of the polarizable GCMC step on the bench config
(BASELINE config 4: n_side=21 MOF + H2, Thole SCF) — the r3 decomposition
that motivated the fused stage-1 delayed acceptance.

MEASUREMENT RULES (hard-won, CLAUDE.md):
- time CHAINED in-jit applications (fori_loop over k calls, one
  np.asarray fetch) and difference two k values — a single [10.8k,3]
  D2H costs ~30 ms flat on the tunneled backend and swamps everything;
- warm run_chunk with the SAME n_steps you will time (a mismatch
  compiles inside the window: 54 ms/step artifacts).

r3 numbers (v5e-class, 2026-08-20): dipole matvec 2.46 ms/application
(VPU-bound, ~62% of peak; batch efficiency ~1.0 so chains don't help),
full static field 1.49 ms, non-polar scan µVT step 0.38 ms; full-SCF
1.86 iters/step; delayed acceptance 1.17 ms/step = 0.60 survivor
matvecs + 0.57 scan machinery (the part the fused stage-1 removes);
fused PDA path 0.56-0.66 ms/step = 1,500-1,800 steps/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/measure_polar_parts.py
"""
import dataclasses
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mpmc_tpu.mc import metropolis
from mpmc_tpu.models import systems
from mpmc_tpu.ops import thole


def main():
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        polarization=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    alive = state.atom_alive(params)
    out = {"n_atoms": int(state.pos.shape[0]),
           "n_polar": int(np.asarray(alive & (params.polar > 0)).sum())}
    print("init done", flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def mv_k(mu, k):
        def body(i, m):
            return thole.dipole_matvec(state.pos, state.box, alive,
                                       params, cfg, m) * 0.999
        return jax.lax.fori_loop(0, k, body, mu)

    def wall(fn, x, k, reps=4):
        np.asarray(fn(x, k))
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(fn(x, k))
        return (time.perf_counter() - t0) / reps

    w8, w24 = wall(mv_k, state.mu, 8), wall(mv_k, state.mu, 24)
    out["matvec_ms"] = (w24 - w8) / 16 * 1e3
    print("matvec_ms", out["matvec_ms"], flush=True)

    # full vs delayed vs fused-PDA step costs (warm == timed n_steps)
    chunk = 64

    def step_cost(c, runner, n=chunk, reps=3):
        st, _ = runner(state, c, n)
        np.asarray(st.energy.rd)
        t0 = time.perf_counter()
        stq, stats, att = st, None, 0.0
        for _ in range(reps):
            stq, stats = runner(stq, c, n)
            # MCStats restarts per chunk: accumulate EVERY rep's
            # attempts (dividing by only the last chunk's count would
            # inflate ms/step by reps)
            att += float(np.asarray(stats.attempts).sum())
        np.asarray(stq.energy.rd)
        return (time.perf_counter() - t0) / max(att, 1) * 1e3, stats

    scan = lambda st, c, n: metropolis.run_chunk(st, params, c, thermo,
                                                 n)
    out["full_ms_per_step"], st_f = step_cost(cfg, scan)
    out["iters_per_step_full"] = (
        float(np.asarray(st_f.polar_iters)) / chunk)
    cfg_da = dataclasses.replace(cfg, polar_delayed=True)
    out["delayed_ms_per_step"], st_d = step_cost(cfg_da, scan)
    out["iters_per_step_delayed"] = (
        float(np.asarray(st_d.polar_iters)) / chunk)
    cfg_pda = dataclasses.replace(cfg, polar_delayed=True,
                                  fused_mc=True)
    from mpmc_tpu.ops.pallas import mc_kernel
    if mc_kernel.supported_uvt_polar_da(cfg_pda, params):
        pda = lambda st, c, n: metropolis.run_chunk_fused_uvt_polar_da(
            st, params, c, thermo, n)
        out["pda_ms_per_step"], _ = step_cost(cfg_pda, pda, n=512)
        out["pda_steps_per_s"] = 1e3 / out["pda_ms_per_step"]
    print(json.dumps(out, indent=1), flush=True)
    with open("MEASURE_POLAR_PARTS.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
