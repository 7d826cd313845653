"""Whole-stack integration test: dilute GCMC loading in a rigid framework
must reproduce the Henry's-law configuration integral

    <N> = (f / kT) * Int_V exp(-U(r)/kT) dr,

with U(r) computed by an INDEPENDENT numpy implementation (min-image LJ
against the framework with the same cutoff).  This exercises the PQR-less
build path, the pair engine, GCMC insert/delete acceptance, and the
fugacity plumbing end-to-end against first-principles statistical
mechanics."""
import numpy as np
import pytest

from mpmc_tpu.config import RunConfig, Thermo
from mpmc_tpu.constants import ATM2K_A3
from mpmc_tpu.mc import metropolis
from mpmc_tpu.models import systems
from mpmc_tpu.state import build_system


def _framework(n_side=3, spacing=4.0):
    ijk = np.stack(np.meshgrid(*[np.arange(n_side)] * 3,
                               indexing="ij"), -1).reshape(-1, 3)
    pos = (ijk + 0.5) * spacing
    F = len(pos)
    fp = {"charge": np.zeros(F), "mass": np.full(F, 60.0),
          "polar": np.zeros(F), "eps": np.full(F, 35.0),
          "sig": np.full(F, 3.0)}
    return pos, fp, n_side * spacing


def _henry_integral(fpos, L, eps_sf, sig_sf, rc, T, n_grid=36):
    """V <exp(-U/kT)>: U(r) from min-image LJ vs the framework (numpy)."""
    g = (np.arange(n_grid) + 0.5) / n_grid * L
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    pts = np.stack([X, Y, Z], -1).reshape(-1, 3)
    u = np.zeros(len(pts))
    for fa in fpos:
        d = pts - fa
        d -= L * np.round(d / L)
        r2 = (d * d).sum(1)
        s6 = (sig_sf ** 2 / r2) ** 3
        contrib = 4 * eps_sf * s6 * (s6 - 1)
        u += np.where(r2 < rc * rc, contrib, 0.0)
    return L ** 3 * np.mean(np.exp(-u / T))


@pytest.mark.slow
def test_gcmc_matches_henry_law():
    T = 150.0
    fpos, fp, L = _framework()
    sorb = systems.lj_atom("HE", eps=35.0, sig=3.0, mass=4.0)
    cfg = RunConfig(ensemble="uvt", rd_potential="lj", coulomb="none",
                    rd_lrc=False, insert_species=(0,), dtype="float64")
    params, state = build_system(
        np.eye(3) * L, frozen_pos=fpos, frozen_params=fp,
        species=(sorb,), capacity=(48,), initial_counts=(1,),
        initial_pos={0: np.array([[[2.0, 2.0, 2.0]]])},
        dtype=cfg.jdtype)

    # sorbate-framework mixing = geometric/arithmetic of identical params
    rc = L / 2.0
    zint = _henry_integral(fpos, L, 35.0, 3.0, rc, T)
    # choose f for <N> ~ 1.3 (dilute: sorbate-sorbate corrections small)
    target = 1.3
    f_atm = target * T / zint / ATM2K_A3

    thermo = Thermo.make(temperature=T, fugacity=(f_atm,),
                         insert_probability=0.6, move_factor=1.0,
                         rot_factor=0.1, n_species=1, dtype=cfg.jdtype)
    state = metropolis.initialize(state, params, cfg, thermo)
    state, _ = metropolis.run_chunk(state, params, cfg, thermo, 3000)
    ns = []
    for _ in range(150):
        state, _ = metropolis.run_chunk(state, params, cfg, thermo, 200)
        ns.append(float(state.n_molecules(params)))
    got = np.mean(ns)
    # Poisson-ish sigma ~ sqrt(1.3); ~50 independent samples -> SEM ~ 0.16
    assert got == pytest.approx(target, abs=0.35)
