"""Surface-scan and force-field-fitting drivers.

Rebuild of the reference's special drivers (SURVEY.md §2 "Surface scan" /
"Surface fit" / "Multi-surface fit", src/mc/surface.c, surface_fit.c,
surface_multi_fit.c [C/M]; call stack §3.4):

- ``ensemble surf``: rigid two-molecule PES scan.  Molecule A sits at the
  origin in its input orientation; molecule B is placed at separation r
  along +x for r in [surf_min, surf_max] step surf_inc.  With
  ``surf_ang`` > 0 the scan additionally sweeps molecule B's orientation
  over a uniform Euler-angle grid with that increment (degrees) and
  reports min/mean over orientations per separation; with
  ``surf_preserve`` (or surf_ang 0) only the input orientations are used.
  ``surf_decomp`` adds the per-term breakdown columns (rd, es, polar).

- ``ensemble surf_fit`` / ``surf_multi_fit``: simulated annealing of
  per-atom-type force-field parameters (LJ eps/sig — log-space walk) to
  one or more ab-initio curves, minimizing the Boltzmann-weighted chi^2
  (options fit_input*, fit_schedule, fit_start_temp, fit_max_energy,
  fit_boltzmann_weight — SURVEY.md §2.9 "Fitting").  Each fit_input file
  holds "r  E_ref" pairs (A, K); '#'/'!' comments allowed.  The whole
  curve is evaluated as one vmapped jitted energy call per SA step, so
  the annealing loop runs thousands of trial parameter sets per second.

The scan geometry/energy path reuses the production total_energy stack
verbatim (§3.4: the fit's objective IS the energy engine).
"""
from __future__ import annotations

import dataclasses
import sys
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpmc_tpu.ops import energy as energy_mod
from mpmc_tpu.state import Params
from mpmc_tpu.utils import quaternion as quat


# ---------------------------------------------------------------------------
# geometry builders
# ---------------------------------------------------------------------------

def _dimer_slots(params: Params, mol_alive) -> Tuple[int, int]:
    alive = np.asarray(mol_alive)
    frozen = np.asarray(params.mol_frozen)
    spec = np.asarray(params.mol_species)
    slots = [m for m in range(len(alive))
             if alive[m] and not frozen[m] and spec[m] >= 0]
    if len(slots) != 2:
        raise ValueError(
            f"surface scan needs exactly 2 movable molecules, got "
            f"{len(slots)}")
    return slots[0], slots[1]


def _euler_quat(a, b, c):
    """z-y-z Euler rotation as a quaternion (host-side, numpy scalars)."""
    qz1 = np.array([np.cos(a / 2), 0.0, 0.0, np.sin(a / 2)])
    qy = np.array([np.cos(b / 2), 0.0, np.sin(b / 2), 0.0])
    qz2 = np.array([np.cos(c / 2), 0.0, 0.0, np.sin(c / 2)])
    return np.asarray(quat.qmul(jnp.asarray(qz1),
                                quat.qmul(jnp.asarray(qy),
                                          jnp.asarray(qz2))))


def dimer_positions(params: Params, pos0, mol_a: int, mol_b: int,
                    r, q_b=None, q_a=None):
    """Place molecule A at the origin and molecule B at (r, 0, 0), each
    optionally re-oriented from its input orientation by a quaternion.
    Returns the full padded pos array (jit-safe in r and the quats)."""
    from mpmc_tpu.state import molecule_com
    pos = jnp.asarray(pos0)
    ia = params.mol_atoms[mol_a]
    ib = params.mol_atoms[mol_b]
    ca = molecule_com(pos, params, mol_a)
    cb = molecule_com(pos, params, mol_b)
    pa = pos[ia] - ca
    pb = pos[ib] - cb
    if q_a is not None:
        pa = quat.rotate(pa, q_a)
    if q_b is not None:
        pb = quat.rotate(pb, q_b)
    offset = jnp.stack([r, jnp.zeros_like(r), jnp.zeros_like(r)])
    return pos.at[ia].set(pa).at[ib].set(pb + offset)


# ---------------------------------------------------------------------------
# ensemble surf
# ---------------------------------------------------------------------------

def run_surface(job, log=None):
    """PES scan; returns a list of result dicts (also written to
    surf_output / the log)."""
    from mpmc_tpu.mc import run as run_mod
    su = run_mod.setup(job)
    params, state, cfg, thermo = su.params, su.state, su.cfg, su.thermo
    mol_a, mol_b = _dimer_slots(params, state.mol_alive)

    rs = np.arange(job.surf_min, job.surf_max + 1e-9, job.surf_inc)
    if len(rs) == 0:
        raise ValueError("empty surface scan range")

    if job.surf_ang > 0 and not job.surf_preserve:
        # both molecules' orientations are swept (the reference scans the
        # dimer's full relative-orientation space, SURVEY.md §2 "Surface
        # scan"): molecule A over its Euler grid x molecule B over its —
        # pruned by the joint grid's symmetry (global rotations about the
        # intermolecular axis are redundant, so A skips its gamma spin
        # only when it is monatomic-symmetric; we keep the full product
        # and let the mean/min absorb redundancy).
        step = np.deg2rad(job.surf_ang)
        als = np.arange(0.0, 2 * np.pi - 1e-9, step)
        bes = np.arange(0.0, np.pi + 1e-9, step)
        gas = np.arange(0.0, 2 * np.pi - 1e-9, step)
        quats_one = np.stack([_euler_quat(a, b, c)
                              for a in als for b in bes for c in gas])
        qa = np.repeat(quats_one, len(quats_one), axis=0)
        qb = np.tile(quats_one, (len(quats_one), 1))
    else:
        qa = qb = np.array([[1.0, 0.0, 0.0, 0.0]])
    qa = jnp.asarray(qa, cfg.jdtype)
    qb = jnp.asarray(qb, cfg.jdtype)

    def one_energy(r, q_a, q_b):
        pos = dimer_positions(params, state.pos, mol_a, mol_b, r, q_b,
                              q_a=q_a)
        e, _ = energy_mod.total_energy(pos, state.box, state.mol_alive,
                                       params, cfg, thermo)
        return e

    # vmap over orientation pairs in memory-bounded batches,
    # lax.map over separations
    v_orient = jax.vmap(one_energy, in_axes=(None, 0, 0))
    f = jax.jit(lambda r, a, b: v_orient(jnp.asarray(r, cfg.jdtype), a, b))

    out = open(job.surf_output, "w") if job.surf_output else (log or
                                                              sys.stdout)
    cols = "# r_A  E_min_K  E_mean_K"
    if job.surf_decomp:
        cols += "  rd  es  polar  vdw   (at E_min orientation)"
    print(cols, file=out)
    results = []
    batch = 512
    for r in rs:
        parts = [f(float(r), qa[i:i + batch], qb[i:i + batch])
                 for i in range(0, qa.shape[0], batch)]
        import jax.tree_util as jtu
        e = jtu.tree_map(lambda *xs: jnp.concatenate(xs), *parts)
        totals = np.asarray(e.total)
        k = int(np.argmin(totals))
        row = {
            "r": float(r),
            "min": float(totals[k]),
            "mean": float(np.mean(totals)),
            "rd": float(np.asarray(e.rd)[k] + np.asarray(e.lrc)[k]),
            "es": float(np.asarray(e.es)[k]),
            "polar": float(np.asarray(e.polar)[k]),
            "vdw": float(np.asarray(e.vdw)[k]),
        }
        results.append(row)
        line = f"{row['r']:10.4f} {row['min']:16.6f} {row['mean']:16.6f}"
        if job.surf_decomp:
            line += (f" {row['rd']:14.6f} {row['es']:14.6f}"
                     f" {row['polar']:14.6f} {row['vdw']:14.6f}")
        print(line, file=out)
    if job.surf_output:
        out.close()
        print(f"surface scan written to {job.surf_output}",
              file=log or sys.stdout)
    return results


# ---------------------------------------------------------------------------
# ensemble surf_fit / surf_multi_fit
# ---------------------------------------------------------------------------

def read_fit_curve(path: str) -> Tuple[np.ndarray, np.ndarray]:
    rs, es = [], []
    with open(path) as fh:
        for raw in fh:
            line = raw.split("#")[0].split("!")[0].strip()
            if not line:
                continue
            t = line.split()
            rs.append(float(t[0]))
            es.append(float(t[1]))
    if not rs:
        raise ValueError(f"no data points in fit input {path}")
    return np.asarray(rs), np.asarray(es)


def _fit_groups(params: Params, mol_a: int, mol_b: int):
    """Group the dimer's atoms by (eps, sig) type; only atoms with eps>0
    participate (massless charge sites keep eps=sig=0)."""
    idx = np.concatenate([np.asarray(params.mol_atoms[mol_a]),
                          np.asarray(params.mol_atoms[mol_b])])
    idx = np.unique(idx)
    eps = np.asarray(params.eps)
    sig = np.asarray(params.sig)
    groups = {}
    for i in idx:
        if eps[i] <= 0:
            continue
        key = (round(float(eps[i]), 8), round(float(sig[i]), 8))
        groups.setdefault(key, []).append(int(i))
    return list(groups.values())


def read_multi_fit_configs(path: str):
    """Parse a surf_multi_fit configuration file: blocks of

        E <target energy in K>
        x y z          (one line per movable atom, PQR slot order)
        ...

    '#'/'!' comments allowed.  Returns (coords [K, n, 3], energies [K]).
    This is the multi-*configuration* fit surface the reference's
    surface_multi_fit.c consumes (SURVEY.md §2 "Multi-surface fit" [M]:
    arbitrary geometries per point, not just separation curves)."""
    configs: List[List[List[float]]] = []
    energies: List[float] = []
    cur: List[List[float]] = []
    with open(path) as fh:
        for raw in fh:
            line = raw.split("#")[0].split("!")[0].strip()
            if not line:
                continue
            t = line.split()
            if t[0].upper() == "E":
                if cur:
                    configs.append(cur)
                    cur = []
                energies.append(float(t[1]))
            else:
                cur.append([float(t[0]), float(t[1]), float(t[2])])
    if cur:
        configs.append(cur)
    if not energies or len(configs) != len(energies):
        raise ValueError(
            f"fit input {path}: expected 'E <energy>' blocks each "
            f"followed by one x-y-z line per movable atom "
            f"(got {len(energies)} energies / {len(configs)} geometry "
            f"blocks)")
    n = len(configs[0])
    if any(len(c) != n for c in configs):
        raise ValueError(f"fit input {path}: inconsistent atom counts "
                         "across configuration blocks")
    return np.asarray(configs, np.float64), np.asarray(energies)


def _movable_atom_rows(params: Params, mol_alive) -> np.ndarray:
    """Atom-slot indices of every alive movable molecule, slot order."""
    alive = np.asarray(mol_alive)
    frozen = np.asarray(params.mol_frozen)
    natoms = np.asarray(params.mol_natoms)
    out = []
    for m in range(len(alive)):
        if alive[m] and not frozen[m]:
            s0 = int(np.asarray(params.mol_start)[m])
            out.extend(range(s0, s0 + int(natoms[m])))
    return np.asarray(out, np.int64)


def _anneal(chi2_j, vec0, job, cfg, out, tag):
    """Shared simulated-annealing loop over a parameter vector."""
    rng = np.random.default_rng(cfg.seed)
    vec = vec0.copy()
    cur = float(chi2_j(jnp.asarray(vec, cfg.jdtype)))
    best_vec, best = vec.copy(), cur
    t_anneal = job.fit_start_temp if job.fit_start_temp > 0 else cur
    n_steps = max(job.cfg.numsteps, 2000)
    print(f"{tag}: chi2_0={cur:.6g}, T0={t_anneal:.4g}", file=out)
    for _ in range(n_steps):
        prop = vec + rng.normal(0.0, 0.02, size=vec.shape)
        c = float(chi2_j(jnp.asarray(prop, cfg.jdtype)))
        if c < cur or rng.random() < np.exp(-(c - cur)
                                            / max(t_anneal, 1e-30)):
            vec, cur = prop, c
            if c < best:
                best_vec, best = prop.copy(), c
        t_anneal *= job.fit_schedule
    return best_vec, best


def run_surface_multi_fit(job, log=None):
    """Simultaneous multi-configuration FF fit (``ensemble
    surf_multi_fit``): every fit_input holds arbitrary dimer/cluster
    geometries with target energies (read_multi_fit_configs); one
    chi^2 spans them all, evaluated through the production energy stack
    per configuration.  Returns (best_params_dict, best_chi2)."""
    from mpmc_tpu.mc import run as run_mod
    out = log or sys.stdout
    if not job.fit_inputs:
        raise ValueError("surf_multi_fit requires at least one fit_input")

    su = run_mod.setup(job)
    params, state, cfg, thermo = su.params, su.state, su.cfg, su.thermo
    rows = _movable_atom_rows(params, state.mol_alive)

    coords, erefs = [], []
    for p in job.fit_inputs:
        c, e = read_multi_fit_configs(p)
        if c.shape[1] != len(rows):
            raise ValueError(
                f"fit input {p}: {c.shape[1]} atoms per configuration, "
                f"but the system has {len(rows)} movable atoms")
        coords.append(c)
        erefs.append(e)
    coords = np.concatenate(coords)           # [K, n, 3]
    erefs = np.concatenate(erefs)             # [K]

    cap = job.fit_max_energy
    e_capped = np.minimum(erefs, cap) if cap > 0 else erefs
    if job.fit_boltzmann_weight > 0:
        w = np.exp(-e_capped / job.fit_boltzmann_weight)
    else:
        w = np.ones_like(e_capped)
    w = w / w.sum()

    groups = _fit_groups_rows(params, rows)
    if not groups:
        raise ValueError("no LJ sites to fit (all eps == 0)")
    group_masks = np.zeros((len(groups), params.n_atoms_max), bool)
    for g, idxs in enumerate(groups):
        group_masks[g, idxs] = True
    masks_j = jnp.asarray(group_masks)
    rows_j = jnp.asarray(rows)
    coords_j = jnp.asarray(coords, cfg.jdtype)
    eref_j = jnp.asarray(e_capped, cfg.jdtype)
    w_j = jnp.asarray(w, cfg.jdtype)

    def with_params(vec):
        g = len(groups)
        eps_g = jnp.exp(vec[:g])
        sig_g = jnp.exp(vec[g:])
        eps, sig = params.eps, params.sig
        for k in range(g):
            eps = jnp.where(masks_j[k], eps_g[k], eps)
            sig = jnp.where(masks_j[k], sig_g[k], sig)
        return dataclasses.replace(params, eps=eps, sig=sig)

    def chi2(vec):
        p = with_params(vec)

        def conf_e(xyz):
            pos = state.pos.at[rows_j].set(xyz)
            e, _ = energy_mod.total_energy(pos, state.box,
                                           state.mol_alive, p, cfg,
                                           thermo)
            return e.total

        e_model = jax.vmap(conf_e)(coords_j)
        e_model = jnp.minimum(e_model, cap) if cap > 0 else e_model
        return jnp.sum(w_j * (e_model - eref_j) ** 2)

    g = len(groups)
    vec0 = np.concatenate([
        np.log([np.asarray(params.eps)[gr[0]] for gr in groups]),
        np.log([np.asarray(params.sig)[gr[0]] for gr in groups])])
    best_vec, best = _anneal(
        jax.jit(chi2), vec0, job, cfg, out,
        f"surf_multi_fit: {g} LJ types, {coords.shape[0]} configurations")
    result = {}
    for k, gr in enumerate(groups):
        result[f"type{k}"] = {
            "atoms": gr,
            "eps": float(np.exp(best_vec[k])),
            "sig": float(np.exp(best_vec[g + k])),
        }
    print(f"surf_multi_fit: best chi2 = {best:.6g}", file=out)
    for k, v in result.items():
        print(f"  {k}: eps = {v['eps']:.6f} K   sig = {v['sig']:.6f} A",
              file=out)
    return result, best


def _fit_groups_rows(params: Params, rows: np.ndarray):
    """Group arbitrary atom rows by (eps, sig) type (eps > 0 only)."""
    eps = np.asarray(params.eps)
    sig = np.asarray(params.sig)
    groups = {}
    for i in rows:
        if eps[i] <= 0:
            continue
        key = (round(float(eps[i]), 8), round(float(sig[i]), 8))
        groups.setdefault(key, []).append(int(i))
    return list(groups.values())


def run_surface_fit(job, log=None):
    """Simulated-annealing FF fit; returns (best_params_dict, best_chi2)."""
    from mpmc_tpu.mc import run as run_mod
    out = log or sys.stdout
    if not job.fit_inputs:
        raise ValueError("surf_fit requires at least one fit_input")
    curves = [read_fit_curve(p) for p in job.fit_inputs]

    su = run_mod.setup(job)
    params, state, cfg, thermo = su.params, su.state, su.cfg, su.thermo
    mol_a, mol_b = _dimer_slots(params, state.mol_alive)
    groups = _fit_groups(params, mol_a, mol_b)
    if not groups:
        raise ValueError("no LJ sites to fit (all eps == 0)")

    # reference-style weighting: w = exp(-E_ref / kT_boltz), with a hard
    # cap at fit_max_energy (SURVEY.md §2 "Surface fit")
    all_r = np.concatenate([c[0] for c in curves])
    all_e = np.concatenate([c[1] for c in curves])
    cap = job.fit_max_energy
    all_e = np.minimum(all_e, cap) if cap > 0 else all_e
    if job.fit_boltzmann_weight > 0:
        w = np.exp(-all_e / job.fit_boltzmann_weight)
    else:
        w = np.ones_like(all_e)
    w = w / w.sum()
    rs_j = jnp.asarray(all_r, cfg.jdtype)
    eref_j = jnp.asarray(all_e, cfg.jdtype)
    w_j = jnp.asarray(w, cfg.jdtype)

    group_masks = np.zeros((len(groups), params.n_atoms_max), bool)
    for g, idxs in enumerate(groups):
        group_masks[g, idxs] = True
    masks_j = jnp.asarray(group_masks)

    def with_params(vec):
        """vec = [log_eps_g..., log_sig_g...] -> Params with substitutions."""
        g = len(groups)
        eps_g = jnp.exp(vec[:g])
        sig_g = jnp.exp(vec[g:])
        eps = params.eps
        sig = params.sig
        for k in range(g):
            eps = jnp.where(masks_j[k], eps_g[k], eps)
            sig = jnp.where(masks_j[k], sig_g[k], sig)
        return dataclasses.replace(params, eps=eps, sig=sig)

    def chi2(vec):
        p = with_params(vec)

        def curve_e(r):
            pos = dimer_positions(p, state.pos, mol_a, mol_b, r)
            e, _ = energy_mod.total_energy(pos, state.box, state.mol_alive,
                                           p, cfg, thermo)
            return e.total

        e_model = jax.vmap(curve_e)(rs_j)
        e_model = jnp.minimum(e_model, cap) if cap > 0 else e_model
        return jnp.sum(w_j * (e_model - eref_j) ** 2)

    chi2_j = jax.jit(chi2)

    g = len(groups)
    vec = np.concatenate([
        np.log([np.asarray(params.eps)[gr[0]] for gr in groups]),
        np.log([np.asarray(params.sig)[gr[0]] for gr in groups])])
    rng = np.random.default_rng(cfg.seed)
    cur = float(chi2_j(jnp.asarray(vec, cfg.jdtype)))
    best_vec, best = vec.copy(), cur
    t_anneal = job.fit_start_temp if job.fit_start_temp > 0 else cur
    n_steps = max(job.cfg.numsteps, 2000)
    print(f"surf_fit: {g} LJ types, {len(all_r)} points, "
          f"chi2_0={cur:.6g}, T0={t_anneal:.4g}", file=out)
    for it in range(n_steps):
        prop = vec + rng.normal(0.0, 0.02, size=vec.shape)
        c = float(chi2_j(jnp.asarray(prop, cfg.jdtype)))
        if c < cur or rng.random() < np.exp(-(c - cur) / max(t_anneal,
                                                             1e-30)):
            vec, cur = prop, c
            if c < best:
                best_vec, best = prop.copy(), c
        t_anneal *= job.fit_schedule
    result = {}
    for k, gr in enumerate(groups):
        result[f"type{k}"] = {
            "atoms": gr,
            "eps": float(np.exp(best_vec[k])),
            "sig": float(np.exp(best_vec[g + k])),
        }
    print(f"surf_fit: best chi2 = {best:.6g}", file=out)
    for k, v in result.items():
        print(f"  {k}: eps = {v['eps']:.6f} K   sig = {v['sig']:.6f} A",
              file=out)
    return result, best
