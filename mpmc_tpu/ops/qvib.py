"""Quantum vibration: stretch eigenspectra of linear sorbates in the
crystal field.

Rebuild of the reference's ``quantum_vibration`` option (SURVEY.md §2.9
"Quantum" [L]; companion of the quantum-rotation module,
src/quantum_rotation/ [M]).  The mount was empty (SURVEY §0), so this is
the framework's documented contract: for each alive linear sorbate the
1D radial stretch Schrödinger equation

    [ -hbar^2/(2 mu) d^2/db^2 + V_intra(b) + V_ext(b) ] psi = E psi

is solved by dense finite differences on a bond-length grid, where

- b is the distance between the two mass-carrying ends; every site's
  signed axial offset scales as b/b0 (massless charge sites ride along),
- mu = m+ m- / (m+ + m-) from the total mass on each side of the COM,
- V_intra(b) = 1/2 k (b - b0)^2 with k = mu (hbar w_e)^2 / hbar^2 from
  the species' spectroscopic fundamental ``vib_omega`` [cm^-1]
  (hc/kB = 1.4388 K cm), b0 the rigid-template bond length,
- V_ext(b) is the molecule's interaction energy with its environment
  when stretched about its COM along its current axis, evaluated with
  the production pair engine (same energy path as MC).

Reported per corrtime (host-level analysis, like the rotational
spectra): zero-point energies and the field-induced fundamental shift
(E1 - E0) - hbar w_e — the observable a spectroscopist compares against
adsorption-induced vibrational red/blue shifts.  Purely diagnostic: like
the reference's spectra printouts it does not feed MC acceptance.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpmc_tpu.constants import HBAR2_KB_AMU_A2
from mpmc_tpu.ops import pairs as pairs_mod
from mpmc_tpu.state import molecule_com

# hc/kB: 1 cm^-1 in Kelvin
CM1_K = 1.43877688


def stretch_geometry(species) -> Tuple[np.ndarray, float, float]:
    """(axial offsets s_i [A], b0 [A], mu [amu]) of a linear species.

    s_i: signed template coordinate of each site along the molecular
    axis (taken from the largest-extent direction of the COM-centered
    template); b0 = end-to-end distance; mu from the summed masses of
    the two sides of the COM."""
    p = np.asarray(species.pos, np.float64)
    m = np.asarray(species.mass, np.float64)
    if species.natoms < 2:
        raise ValueError(f"species {species.name}: not a linear molecule")
    ext = p - p.mean(0)
    # principal axis = direction of the farthest site
    far = np.argmax(np.sum(ext * ext, 1))
    n = ext[far]
    nn = np.linalg.norm(n)
    if nn < 1e-9:
        raise ValueError(f"species {species.name}: degenerate template")
    n = n / nn
    s = p @ n                                # signed axial offsets
    b0 = float(s.max() - s.min())
    m_plus = float(np.sum(m[s > 1e-9]))
    m_minus = float(np.sum(m[s < -1e-9]))
    if b0 < 1e-9 or m_plus <= 0 or m_minus <= 0:
        raise ValueError(f"species {species.name}: no stretchable bond")
    mu = m_plus * m_minus / (m_plus + m_minus)
    return s, b0, mu


def stretch_grid(b0: float, mu: float, hw: float, n_grid: int = 224,
                 n_widths: float = 7.0) -> np.ndarray:
    """Bond-length grid centered on b0 covering +-n_widths ground-state
    widths sqrt(hbar/(mu w)) of the free oscillator (clipped to b > 0)."""
    width = np.sqrt(HBAR2_KB_AMU_A2 / (mu * max(hw, 1e-6)))
    half = n_widths * width
    lo = max(b0 - half, 0.05 * b0)
    return np.linspace(lo, b0 + half, n_grid)


def external_potential_on_grid(pos, box, atom_alive, params, cfg,
                               temperature, mol: int, s_axial,
                               b0: float, b_grid) -> np.ndarray:
    """V_ext(b) [K]: pair energy of molecule ``mol`` with every site's
    axial offset scaled to (b/b0) s_i about its COM along its current
    axis (RD + ES real; the reciprocal-space change is second order at
    fixed COM, as in ops/qrot.potential_on_grid)."""
    idx = params.mol_atoms[mol]
    na = params.mol_natoms[mol]
    ok = jnp.arange(idx.shape[0]) < na
    com = molecule_com(pos, params, mol)
    rel = pos[idx] - com
    # current axis: direction of the site with the largest template |s|
    far = int(np.argmax(np.abs(np.asarray(s_axial))))
    sgn = float(np.sign(np.asarray(s_axial)[far]) or 1.0)
    axis_v = rel[far] * sgn
    axis = axis_v / jnp.maximum(jnp.linalg.norm(axis_v), 1e-9)
    s = jnp.asarray(np.asarray(s_axial), pos.dtype)

    def energy_at(b):
        rows = com + (b / b0) * s[:, None] * axis[None, :]
        rows = jnp.where(ok[:, None], rows, rows[0])
        t = pairs_mod.mol_pair_pass(pos, box, atom_alive, params, cfg,
                                    temperature, mol, row_pos=rows)
        return t.rd + t.es_real

    bg = jnp.asarray(np.asarray(b_grid), pos.dtype)
    return np.asarray(jax.jit(jax.vmap(energy_at))(bg))


def stretch_levels(b_grid, v_total, mu: float,
                   n_levels: int = 4) -> np.ndarray:
    """Lowest eigenvalues [K] of the 1D FD Hamiltonian on ``b_grid``."""
    b_grid = np.asarray(b_grid, np.float64)
    v = np.asarray(v_total, np.float64)
    h_step = b_grid[1] - b_grid[0]
    kin = HBAR2_KB_AMU_A2 / (2.0 * mu * h_step * h_step)
    n = len(b_grid)
    h = (np.diag(v + 2.0 * kin) - kin * np.eye(n, k=1)
         - kin * np.eye(n, k=-1))
    evals = np.linalg.eigvalsh(h)
    return evals[:n_levels]


def vibrational_levels(pos, box, atom_alive, params, cfg, temperature,
                       mol: int, species, n_grid: int = 224,
                       n_levels: int = 4) -> Tuple[np.ndarray, float]:
    """(levels [K], hbar w_e [K]) for one linear sorbate in its
    environment.  Levels are referenced to the molecule's
    current-geometry external energy (V_ext(b) - V_ext(b0)), so a free
    molecule returns the bare oscillator ladder."""
    hw = float(species.vib_omega) * CM1_K
    if hw <= 0.0:
        raise ValueError(f"species {species.name}: vib_omega not set")
    s, b0, mu = stretch_geometry(species)
    k = mu * hw * hw / HBAR2_KB_AMU_A2        # K / A^2
    bg = stretch_grid(b0, mu, hw, n_grid=n_grid)
    v_ext = external_potential_on_grid(pos, box, atom_alive, params, cfg,
                                       temperature, mol, s, b0, bg)
    v_ext0 = external_potential_on_grid(pos, box, atom_alive, params, cfg,
                                        temperature, mol, s, b0,
                                        np.asarray([b0]))[0]
    v = 0.5 * k * (bg - b0) ** 2 + (v_ext - v_ext0)
    return stretch_levels(bg, v, mu, n_levels), hw


def vibration_table(pos, box, atom_alive, mol_alive, params, cfg, thermo,
                    species_list, n_levels: int = 4) -> np.ndarray:
    """[M, n_levels] stretch levels [K] for every alive movable linear
    sorbate with a configured ``vib_omega`` (NaN rows elsewhere)."""
    M = int(params.n_mols_max)
    table = np.full((M, n_levels), np.nan)
    alive_m = np.asarray(mol_alive)
    spec = np.asarray(params.mol_species)
    frozen = np.asarray(params.mol_frozen)
    natoms = np.asarray(params.mol_natoms)
    for m in range(M):
        sidx = int(spec[m])
        if (not alive_m[m] or frozen[m] or sidx < 0 or natoms[m] < 2
                or float(species_list[sidx].vib_omega) <= 0.0):
            continue
        try:
            levels, _ = vibrational_levels(
                pos, box, atom_alive, params, cfg, thermo.temperature, m,
                species_list[sidx], n_levels=n_levels)
        except ValueError:
            continue
        table[m] = levels
    return table
