"""Tile-culled SCF matvec on real TPU (r6, building the explicit-rc
opportunity recorded in MEASURE_MATVEC_CULL / docs/performance.md r5):
at rc = 14 A on the 10.8k bench lattice ~71% of 128-site block pairs
are cullable after a cell sort.  This measures what the shipped
implementation (thole.cull_perm/cull_visit + the visit-table pallas
kernel) actually buys:

  1. raw dipole matvec, dense vs culled (chained-call timing inside one
     jit — per-call D2H swamps single dispatches, CLAUDE.md), plus the
     per-solve prep cost (argsort + gathers + visit table);
  2. the achieved tile-visit fraction at the (256,1024) kernel
     granularity, and at (256,512)/(256,256) for the tile-size
     trade-off (smaller tiles cull more but cost more per pair —
     the 2026-08-17 tile scan);
  3. end-to-end fused-PDA polar GCMC steps/s at rc=14, polar_cull on
     vs off, interleaved in one process.

Writes MEASURE_POLAR_CULL.json.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

from mpmc_tpu.mc import metropolis
from mpmc_tpu.models import systems
from mpmc_tpu.ops import thole
from mpmc_tpu.ops.pairs import derived_cutoff
from mpmc_tpu.ops.pallas import thole_kernel as tk

RC = 14.0
CHAIN = 32


def build(cutoff):
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        polarization=True)
    cfg = dataclasses.replace(cfg, cutoff=cutoff)
    return params, state, cfg, thermo


def matvec_timings(params, state, cfg):
    alive = state.atom_alive(params)
    pol_ok = alive & (params.polar > 0)
    rc = derived_cutoff(state.box, cfg)
    lam = jnp.asarray(cfg.polar_damp, state.pos.dtype)
    mu0 = jnp.where(pol_ok[:, None],
                    jnp.ones_like(state.pos) * 1e-3, 0.0)

    def chain(pos, ok, visit, ti, tj):
        def body(m, _):
            t = tk.dipole_field(pos, state.box, ok, m, params.mol_id,
                                rc, lam, cfg.polar_damp_type,
                                ortho=True, visit=visit, ti_size=ti,
                                tj_size=tj)
            n = jax.lax.rsqrt(jnp.sum(t * t) + 1e-30)
            return t * n, None
        m, _ = jax.lax.scan(body, mu0, None, length=CHAIN)
        return jnp.sum(m)

    @jax.jit
    def prep():
        perm, invp = thole.cull_perm(state.pos, state.box, pol_ok, rc)
        pos_s = state.pos[perm]
        ok_s = pol_ok[perm]
        n_pad, _, _ = tk.grid_shape(state.pos.shape[0])
        visit = thole.cull_visit(pos_s, ok_s, state.box, rc, tk.TI,
                                 tk.TJ, n_pad)
        return pos_s, ok_s, visit, jnp.sum(invp)

    pos_s, ok_s, visit, _ = prep()
    dense_fn = jax.jit(lambda: chain(state.pos, pol_ok, None,
                                     tk.TI, tk.TJ))
    cull_fn = jax.jit(lambda: chain(pos_s, ok_s, visit, tk.TI, tk.TJ))

    def t_ms(fn, reps=3):
        np.asarray(fn())
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            best = min(best, (time.perf_counter() - t0) / CHAIN)
        return best * 1e3

    out = {"matvec_dense_ms": round(t_ms(dense_fn), 4),
           "matvec_culled_ms": round(t_ms(cull_fn), 4),
           "visit_fraction_256x1024": round(
               float(np.asarray(visit).mean()), 4)}

    # prep (per-solve) cost: argsort + gathers + visit table
    np.asarray(prep()[3])
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(prep()[3])
    out["prep_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 4)

    # visit fractions at smaller column tiles (trade-off map only)
    n = state.pos.shape[0]
    for tjs in (512, 256):
        n_pad, _, _ = tk.grid_shape(n, tk.TI, tjs)
        v = thole.cull_visit(pos_s, ok_s, state.box, rc, tk.TI, tjs,
                             n_pad)
        out[f"visit_fraction_256x{tjs}"] = round(
            float(np.asarray(v).mean()), 4)
        cfn = jax.jit(lambda vv=v, tt=tjs: chain(pos_s, ok_s, vv,
                                                 tk.TI, tt))
        try:
            out[f"matvec_culled_256x{tjs}_ms"] = round(t_ms(cfn), 4)
        except Exception as e:            # compile-service flakiness
            out[f"matvec_culled_256x{tjs}_ms"] = f"failed: {e}"[:120]
    return out


def pda_steps_per_sec(params, state, cfg, thermo, cull, K=512):
    from mpmc_tpu.ops.pallas import mc_kernel
    c = dataclasses.replace(cfg, polar_delayed=True, fused_mc=True,
                            polar_cull=cull)
    assert cull in ("auto", "on", "off")
    assert mc_kernel.supported_uvt_polar_da(c, params)
    st = metropolis.initialize(state, params, c, thermo)
    st, _ = metropolis.run_chunk_fused_uvt_polar_da(st, params, c,
                                                    thermo, K)
    np.asarray(st.energy.rd)
    return c, st


def main_large():
    """54k-atom section (--large): the matvec is ~25x the 10.8k cost
    there and the 148 A box makes rc=14 cull much harder — appended
    into the same artifact."""
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=37, spacing=4.0, n_h2=512, capacity=1024,
        polarization=True)
    cfg = dataclasses.replace(cfg, cutoff=RC)
    out = {"cutoff_A": RC}
    out.update(matvec_timings(params, state, cfg))

    variants = {}
    for cull in ("auto", "off"):
        variants[cull] = pda_steps_per_sec(params, state, cfg, thermo,
                                           cull, K=64)
    rates = {"auto": [], "off": []}
    for _rep in range(2):
        for cull in ("auto", "off"):
            c, st = variants[cull]
            t0 = time.perf_counter()
            n = 0
            for _ in range(2):
                st, stats = metropolis.run_chunk_fused_uvt_polar_da(
                    st, params, c, thermo, 64)
                n += int(np.asarray(stats.attempts).sum())
            np.asarray(st.energy.rd)
            rates[cull].append(n / (time.perf_counter() - t0))
            variants[cull] = (c, st)
    out["pda_steps_per_sec_cull_on"] = [round(r, 1)
                                        for r in rates["auto"]]
    out["pda_steps_per_sec_cull_off"] = [round(r, 1)
                                         for r in rates["off"]]

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_POLAR_CULL.json")
    with open(path) as f:
        full = json.load(f)
    full["large_54k"] = out
    with open(path, "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps(out, indent=1))


def main_large_derived():
    """54k at the DERIVED rc = L/2 = 74 A (--large-derived): the r5
    geometric bound says blocks must be smaller than 0.366 L to be
    separable — at 54k a 256-site block is a ~19 A cube vs the 54 A
    bound, so some culling exists even at the flagship cutoff.
    polar_cull on (forced) vs off on the EXISTING bench-row config."""
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=37, spacing=4.0, n_h2=512, capacity=1024,
        polarization=True)
    out = {"cutoff": "derived L/2"}
    out.update(matvec_timings(params, state, cfg))

    variants = {}
    for cull in ("on", "off"):
        variants[cull] = pda_steps_per_sec(params, state, cfg, thermo,
                                           cull, K=64)
    rates = {"on": [], "off": []}
    for _rep in range(2):
        for cull in ("on", "off"):
            c, st = variants[cull]
            t0 = time.perf_counter()
            n = 0
            for _ in range(2):
                st, stats = metropolis.run_chunk_fused_uvt_polar_da(
                    st, params, c, thermo, 64)
                n += int(np.asarray(stats.attempts).sum())
            np.asarray(st.energy.rd)
            rates[cull].append(n / (time.perf_counter() - t0))
            variants[cull] = (c, st)
    out["pda_steps_per_sec_cull_on"] = [round(r, 1)
                                        for r in rates["on"]]
    out["pda_steps_per_sec_cull_off"] = [round(r, 1)
                                         for r in rates["off"]]

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_POLAR_CULL.json")
    with open(path) as f:
        full = json.load(f)
    full["large_54k_derived_rc"] = out
    with open(path, "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps(out, indent=1))


def main():
    params, state, cfg, thermo = build(RC)
    out = {"system": "mof_h2_gcmc n_side=21 (bench size)",
           "cutoff_A": RC,
           "backend": jax.default_backend()}
    out.update(matvec_timings(params, state, cfg))

    # end-to-end: warm both variants first, then interleave timings
    variants = {}
    for cull in ("auto", "off"):
        variants[cull] = pda_steps_per_sec(params, state, cfg, thermo,
                                           cull)
    K = 512
    rates = {"auto": [], "off": []}
    for _rep in range(3):
        for cull in ("auto", "off"):
            c, st = variants[cull]
            t0 = time.perf_counter()
            n = 0
            for _ in range(2):
                st, stats = metropolis.run_chunk_fused_uvt_polar_da(
                    st, params, c, thermo, K)
                n += int(np.asarray(stats.attempts).sum())
            np.asarray(st.energy.rd)
            rates[cull].append(n / (time.perf_counter() - t0))
            variants[cull] = (c, st)
    out["pda_steps_per_sec_cull_on"] = [round(r, 1)
                                        for r in rates["auto"]]
    out["pda_steps_per_sec_cull_off"] = [round(r, 1)
                                         for r in rates["off"]]

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MEASURE_POLAR_CULL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if "--large-derived" in sys.argv:
        main_large_derived()
    elif "--large" in sys.argv:
        main_large()
    else:
        main()
