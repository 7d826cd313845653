"""Canonical model systems: ready-made (params, state, cfg, thermo) builders.

These are the rebuild's stand-ins for the reference's curated example
inputs (MOF + H2 sorption decks driven through the input script,
SURVEY.md §6 north-star "10k-atom MOF+H2 GCMC").  They are used by
bench.py, __graft_entry__.py and the test suite; production runs go
through the input-script/PQR path in io/.

The H2 model is the three-charge-site + single-LJ-site form of the
BSS-family models MPMC ships for hydrogen sorption (center site carrying
the negative charge and the LJ well, two proton sites at +/- the H-H
half-bond; cf. Belof/Stern/Space JCTC 2008).  Parameter values here are
representative, not a fit — the physics paths exercised (rigid rotations,
Ewald charges, LJ mixing, GCMC insertion) are exactly the production ones.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from mpmc_tpu.config import RunConfig, Thermo
from mpmc_tpu.state import Species, build_system


def h2_bss3() -> Species:
    """Rigid 3-site H2: charged quadrupole + one LJ center."""
    d = 0.371  # A, half H-H bond
    return Species(
        name="H2",
        atom_names=("H2G", "H2E", "H2E"),
        pos=np.array([[0.0, 0.0, 0.0], [0.0, 0.0, d], [0.0, 0.0, -d]]),
        mass=np.array([0.0, 1.008, 1.008]),
        charge=np.array([-0.93634, 0.46817, 0.46817]),
        polar=np.array([0.6938, 0.0, 0.0]),
        eps=np.array([34.2, 0.0, 0.0]),
        sig=np.array([2.96, 0.0, 0.0]),
    )


def co2_3site() -> Species:
    """Rigid 3-site CO2 (EPM2-style: Harris & Yung 1995 parameters)."""
    d = 1.149
    return Species(
        name="CO2",
        atom_names=("C", "O", "O"),
        pos=np.array([[0.0, 0.0, 0.0], [0.0, 0.0, d], [0.0, 0.0, -d]]),
        mass=np.array([12.011, 15.999, 15.999]),
        charge=np.array([0.6512, -0.3256, -0.3256]),
        polar=np.zeros(3),
        eps=np.array([28.129, 80.507, 80.507]),
        sig=np.array([2.757, 3.033, 3.033]))


def n2_3site() -> Species:
    """Rigid N2 with a COM charge site (TraPPE-style: Potoff &
    Siepmann 2001)."""
    d = 0.55
    return Species(
        name="N2",
        atom_names=("NCOM", "N", "N"),
        pos=np.array([[0.0, 0.0, 0.0], [0.0, 0.0, d], [0.0, 0.0, -d]]),
        mass=np.array([0.0, 14.007, 14.007]),
        charge=np.array([0.964, -0.482, -0.482]),
        polar=np.zeros(3),
        eps=np.array([0.0, 36.0, 36.0]),
        sig=np.array([0.0, 3.31, 3.31]))


def ch4_united_atom() -> Species:
    """United-atom CH4 (TraPPE-UA: Martin & Siepmann 1998)."""
    return Species(
        name="CH4", atom_names=("CH4",), pos=np.zeros((1, 3)),
        mass=np.array([16.043]), charge=np.zeros(1), polar=np.zeros(1),
        eps=np.array([148.0]), sig=np.array([3.73]))


def lj_atom(name="AR", eps=119.8, sig=3.405, mass=39.948) -> Species:
    """Monatomic LJ species (argon-like); config-#1 NVT fluid."""
    return Species(
        name=name, atom_names=(name,),
        pos=np.zeros((1, 3)), mass=np.array([mass]),
        charge=np.zeros(1), polar=np.zeros(1),
        eps=np.array([eps]), sig=np.array([sig]))


def _framework_lattice(n_side: int, spacing: float, polar: float = 0.0):
    """Synthetic charge-alternating cubic framework (rock-salt pattern,
    net charge zero for even n_side) with MOF-like LJ parameters."""
    ijk = np.stack(np.meshgrid(*[np.arange(n_side)] * 3,
                               indexing="ij"), -1).reshape(-1, 3)
    pos = (ijk + 0.5) * spacing
    sign = (-1.0) ** ijk.sum(axis=1)
    F = len(pos)
    fp = {
        "charge": 0.30 * sign,
        "mass": np.full(F, 60.0),
        "polar": np.full(F, polar),
        "eps": np.full(F, 25.0),
        "sig": np.full(F, 3.0),
    }
    return pos, fp, n_side * spacing


def lj_fluid(n: int = 256, density: float = 0.0212, temperature=120.0,
             dtype="float32", seed=0):
    """NVT LJ fluid (n atoms, number density in A^-3). Returns
    (params, state, cfg, thermo)."""
    box_len = (n / density) ** (1.0 / 3.0)
    sp = lj_atom()
    cfg = RunConfig(ensemble="nvt", rd_potential="lj", coulomb="none",
                    ortho_box=True, dtype=dtype, seed=seed)
    params, state = build_system(
        np.eye(3) * box_len, species=(sp,), capacity=(n,),
        initial_counts=(n,), dtype=cfg.jdtype, seed=seed)
    thermo = Thermo.make(temperature=temperature, move_factor=0.5,
                         rot_factor=0.0, n_species=1, dtype=cfg.jdtype)
    return params, state, cfg, thermo


def mof_h2_ch4_gcmc(n_side: int = 6, spacing: float = 4.0,
                    n_h2: int = 16, n_ch4: int = 16, capacity: int = 64,
                    temperature=150.0, pressures=(1.0, 1.0),
                    dtype="float32", seed=0, ewald_kmax=5,
                    corrtime=1000):
    """Two-sorbate MOF GCMC (rigid 3-site H2 + united-atom CH4): the
    multi-sorbate µVT shape (SURVEY §2 'Moves / checkpoint':
    multi-sorbate uniform species pick; per-species fugacities).
    Mixed per-species site counts (3 and 1) also exercise the fused
    µVT kernel's per-species validity masks.  Returns
    (params, state, cfg, thermo)."""
    fpos, fp, box_len = _framework_lattice(n_side, spacing)
    h2, ch4 = h2_bss3(), ch4_united_atom()
    if n_h2 + n_ch4 > n_side ** 3:
        raise ValueError("initial loading exceeds interstitial sites")
    ijk = np.stack(np.meshgrid(*[np.arange(n_side)] * 3,
                               indexing="ij"), -1).reshape(-1, 3)
    rng = np.random.default_rng(seed)
    sites = (ijk[rng.permutation(len(ijk))[:n_h2 + n_ch4]] + 1.0) * spacing
    initial_pos = {
        0: sites[:n_h2, None, :] + h2.pos[None, :, :],
        1: sites[n_h2:, None, :] + ch4.pos[None, :, :],
    }
    cfg = RunConfig(
        ensemble="uvt", rd_potential="lj", coulomb="ewald",
        ewald_kmax=ewald_kmax, insert_species=(0, 1), ortho_box=True,
        cavity_autoreject_absolute=1.0, corrtime=corrtime, dtype=dtype,
        seed=seed)
    params, state = build_system(
        np.eye(3) * box_len, frozen_pos=fpos, frozen_params=fp,
        species=(h2, ch4), capacity=(capacity, capacity),
        initial_counts=(n_h2, n_ch4), initial_pos=initial_pos,
        dtype=cfg.jdtype, seed=seed)
    thermo = Thermo.make(
        temperature=temperature, pressure=pressures[0],
        fugacity=list(pressures), move_factor=1.0, rot_factor=np.pi,
        insert_probability=0.5, n_species=2, dtype=cfg.jdtype)
    return params, state, cfg, thermo


def mof_h2_gcmc(n_side: int = 8, spacing: float = 4.0, n_h2: int = 64,
                capacity: int = 256, temperature=77.0, pressure=1.0,
                polarization=False, dtype="float32", seed=0,
                ewald_kmax=7, corrtime=1000):
    """Synthetic MOF + H2 GCMC system (the BASELINE north-star shape:
    n_side=21 gives a ~9.3k-atom framework).  Returns
    (params, state, cfg, thermo)."""
    fpos, fp, box_len = _framework_lattice(
        n_side, spacing, polar=0.35 if polarization else 0.0)
    h2 = h2_bss3()
    if n_h2 > n_side ** 3:
        raise ValueError(f"n_h2={n_h2} exceeds {n_side ** 3} interstitial "
                         "sites")
    # initial H2 COMs on the framework's interstitial (body-center) sites —
    # the generic grid in build_system would land exactly on framework
    # atoms (r=0 overlaps whose ~1e7 K LJ terms poison f32 accumulation)
    ijk = np.stack(np.meshgrid(*[np.arange(n_side)] * 3,
                               indexing="ij"), -1).reshape(-1, 3)
    rng = np.random.default_rng(seed)
    sites = (ijk[rng.permutation(len(ijk))[:n_h2]] + 1.0) * spacing
    initial_pos = {0: sites[:, None, :] + h2.pos[None, :, :]}
    cfg = RunConfig(
        ensemble="uvt", rd_potential="lj", coulomb="ewald",
        ewald_kmax=ewald_kmax, polarization=polarization,
        insert_species=(0,), ortho_box=True,
        cavity_autoreject_absolute=1.0,
        corrtime=corrtime, dtype=dtype, seed=seed)
    params, state = build_system(
        np.eye(3) * box_len, frozen_pos=fpos, frozen_params=fp,
        species=(h2,), capacity=(capacity,), initial_counts=(n_h2,),
        initial_pos=initial_pos, dtype=cfg.jdtype, seed=seed)
    thermo = Thermo.make(
        temperature=temperature, pressure=pressure, fugacity=[pressure],
        move_factor=1.0, rot_factor=np.pi, insert_probability=0.5,
        n_species=1, dtype=cfg.jdtype)
    return params, state, cfg, thermo
