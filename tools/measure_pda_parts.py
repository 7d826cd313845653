"""Per-survivor cost decomposition of the fused polar delayed-acceptance
path (r4: at the accuracy-validated dipole-3e-4 stopping point the CG
matvec count collapses to ~0.1/attempt, so the stage-2 FIXED overhead —
field_delta + residual_delta tiles + solve setup + XLA glue — becomes
the lever, not the matvec).  Measures each piece with the chained-in-jit
rule (CLAUDE.md).

Run: python tools/measure_pda_parts.py  (real TPU)
"""
import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

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
    base = dataclasses.replace(cfg, polar_delayed=True, fused_mc=True)
    state = metropolis.initialize(state, params, base, thermo)
    alive = state.atom_alive(params)
    out = {"n_atoms": int(state.pos.shape[0])}

    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    # --- end-to-end steps/s + iters/attempt at three stopping points --
    def run_cfg(tag, c):
        K = 512
        st = metropolis.initialize(state, params, c, thermo)
        st, _ = metropolis.run_chunk_fused_uvt_polar_da(
            st, params, c, thermo, K)
        np.asarray(st.energy.rd)
        t0 = time.perf_counter()
        n = it = acc = 0
        for _ in range(3):
            st, stats = metropolis.run_chunk_fused_uvt_polar_da(
                st, params, c, thermo, K)
            n += int(np.asarray(stats.attempts).sum())
            it += int(np.asarray(stats.polar_iters))
            acc += int(np.asarray(stats.accepts).sum())
        np.asarray(st.energy.rd)
        dt = time.perf_counter() - t0
        emit(tag, {"steps_per_s": round(n / dt, 1),
                   "ms_per_step": round(dt / n * 1e3, 4),
                   "iters_per_attempt": round(it / n, 4),
                   "accept_rate": round(acc / n, 4)})

    run_cfg("residual_1e-6", base)
    run_cfg("dipole_3e-4", dataclasses.replace(
        base, polar_precision_mode="dipole", polar_precision=3e-4))
    run_cfg("dipole_1e-3", dataclasses.replace(
        base, polar_precision_mode="dipole", polar_precision=1e-3))

    # --- stage-2 fixed pieces, chained in one jit ---------------------
    mol = jnp.asarray(int(np.asarray(params.mol_frozen).argmin()))
    A = params.max_atoms_per_mol
    from mpmc_tpu.state import mol_rows
    rows0 = mol_rows(state.pos, params, mol)

    @partial(jax.jit, static_argnames=("k",))
    def fd_k(e0, k):
        def body(i, e):
            return thole.field_delta(state.pos, state.box, alive,
                                     params, base, mol, e,
                                     new_rows=rows0 + 0.01) * 0.9999
        return jax.lax.fori_loop(0, k, body, e0)

    @partial(jax.jit, static_argnames=("k",))
    def rd_k(r, k):
        def body(i, rr):
            return thole.residual_delta(
                state.pos, state.box, alive, params, base, mol,
                state.mu, rr, state.e0, state.e0, new_rows=rows0 + 0.01
            ) * 0.9999
        return jax.lax.fori_loop(0, k, body, r)

    @partial(jax.jit, static_argnames=("k",))
    def solve0_k(mu, k):
        # converged warm start (r0 = 0): while_loop exits immediately —
        # measures the solve's fixed setup cost
        z = jnp.zeros_like(mu)

        def body(i, m):
            m2, _, _ = thole.solve_scf(state.pos, state.box, alive,
                                       params, base, state.e0, mu0=m,
                                       r0=z)
            return m2 * 0.9999 + m * 0.0001
        return jax.lax.fori_loop(0, k, body, mu)

    def wall(fn, x, k, reps=4):
        np.asarray(fn(x, k))
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(fn(x, k))
        return (time.perf_counter() - t0) / reps

    for name, fn, x in (("field_delta_ms", fd_k, state.e0),
                        ("residual_delta_ms", rd_k, state.r_pol),
                        ("solve_setup_ms", solve0_k, state.mu)):
        w8, w24 = wall(fn, x, 8), wall(fn, x, 24)
        emit(name, round((w24 - w8) / 16 * 1e3, 4))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_PDA_PARTS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
