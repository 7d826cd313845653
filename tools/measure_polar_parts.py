"""Per-piece timing of the polarizable GCMC step on the bench config
(BASELINE config 4: n_side=21 MOF + H2, Thole SCF) — r3 verdict item 1
groundwork: where do the 6.55 ms (full SCF) / 1.2 ms (delayed
acceptance) actually go?

Pieces timed as ONE-dispatch jits, interleaved, synced with
np.asarray fetches (CLAUDE.md benchmark rules):
  - dipole_matvec            (the CG workhorse, O(N'^2) Pallas)
  - static_field (full)      (per-refresh; delta path per step is O(A N))
  - solve_scf cold           (mu0=0: iteration count + time)
  - solve_scf warm           (mu0=mu: the per-step shape)
  - run_chunk full-SCF       (per-step all-in)
  - run_chunk delayed        (per-step all-in)
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpmc_tpu.mc import metropolis
from mpmc_tpu.models import systems
from mpmc_tpu.ops import thole

import dataclasses


def timeit(fn, n=10, warm=3):
    for _ in range(warm):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        polarization=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    alive = state.atom_alive(params)
    n_pol = int(np.asarray(alive & (params.polar > 0)).sum())
    out = {"n_atoms": int(state.pos.shape[0]), "n_polar": n_pol}

    mv = jax.jit(lambda mu: thole.dipole_matvec(
        state.pos, state.box, alive, params, cfg, mu))
    mu = state.mu
    out["matvec_ms"] = timeit(
        lambda: np.asarray(mv(mu))) * 1e3

    sf = jax.jit(lambda p: thole.static_field(
        p, state.box, alive, params, cfg))
    out["static_field_full_ms"] = timeit(
        lambda: np.asarray(sf(state.pos))) * 1e3

    solve_cold = jax.jit(lambda e0: thole.solve_scf(
        state.pos, state.box, alive, params, cfg, e0)[:2])
    solve_warm = jax.jit(lambda e0, m, r: thole.solve_scf(
        state.pos, state.box, alive, params, cfg, e0, mu0=m, r0=r)[:2])
    e0 = state.e0
    mu_c, it_c = solve_cold(e0)
    out["scf_cold_iters"] = int(it_c)
    out["scf_cold_ms"] = timeit(
        lambda: np.asarray(solve_cold(e0)[0])) * 1e3
    r0 = jnp.zeros_like(mu)    # converged seed: near-zero residual
    out["scf_warm_seeded_ms"] = timeit(
        lambda: np.asarray(solve_warm(e0, mu, r0)[0])) * 1e3

    chunk = 64
    for name, c in (("full_scf", cfg),
                    ("delayed", dataclasses.replace(cfg,
                                                    polar_delayed=True))):
        st, _ = metropolis.run_chunk(state, params, c, thermo, chunk)
        np.asarray(st.energy.rd)
        t = timeit(lambda c=c, s0=state: (
            np.asarray(metropolis.run_chunk(s0, params, c, thermo,
                                            chunk)[0].energy.rd)), n=3,
            warm=1)
        out[f"step_{name}_ms"] = t / chunk * 1e3
        out[f"steps_per_s_{name}"] = chunk / t
    # mean iters under the two paths
    st, stats = metropolis.run_chunk(state, params, cfg, thermo, 256)
    out["iters_per_step_full"] = float(np.asarray(stats.polar_iters)
                                       / 256.0)
    cd = dataclasses.replace(cfg, polar_delayed=True)
    st, stats = metropolis.run_chunk(state, params, cd, thermo, 256)
    out["iters_per_step_delayed"] = float(np.asarray(stats.polar_iters)
                                          / 256.0)
    # stage-1 survival proxy: acceptance counts
    out["acc_rate"] = float(np.asarray(stats.accepts).sum()
                            / np.asarray(stats.attempts).sum())
    print(json.dumps(out, indent=1))
    with open("MEASURE_POLAR_PARTS.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
