"""Total-energy dispatcher — the rebuild of the reference's ``energy()``
(SURVEY.md §2 "Energy dispatcher", src/energy/energy.c [C]; call stack
§3.2): pair pass -> reciprocal/self electrostatics -> long-range tail ->
polarization SCF, summed into per-term EnergyBreakdown slots.

``total_energy`` is the full O(N^2) evaluation (used at start, at corrtime
refreshes, and for NPT volume moves); the per-move delta path lives in
mc/moves.py and reuses ops/pairs.mol_pair_pass + cached structure factors.
"""
from __future__ import annotations

import jax.numpy as jnp

from mpmc_tpu.ops import ewald, pairs, thole
from mpmc_tpu.state import EnergyBreakdown


def total_energy(pos, box, mol_alive, params, cfg, thermo, mu0=None):
    """Full-system energy.

    Returns (EnergyBreakdown, aux) where aux is a dict with the cached
    quantities the MC loop carries: structure factor (sk_re, sk_im),
    induced dipoles mu, static field e0, SCF iteration count.
    """
    dtype = pos.dtype
    alive = mol_alive[params.mol_id] & params.atom_ok
    zero = jnp.zeros((), dtype)
    aux = {}

    pt = pairs.pair_pass(pos, box, alive, params, cfg, thermo.temperature)

    rc = pairs.derived_cutoff(box, cfg)
    volume = jnp.abs(jnp.linalg.det(box))

    # LJ long-range tail: U = (1/2V) * [ 2 * (i<j inter sum) + self images ]
    lrc = zero
    if cfg.rd_potential == "lj" and cfg.rd_lrc:
        self_coeff = pairs.lrc_self_coefficient(alive, params, cfg, rc)
        lrc = (pt.lrc_coeff + 0.5 * self_coeff) / volume

    es_recip = zero
    es_self = zero
    if cfg.coulomb == "ewald":
        alpha = pairs.derived_alpha(rc, cfg)
        es_recip, (sk_re, sk_im) = ewald.recip_energy(
            pos, params.charge, alive, box, alpha, cfg.ewald_kmax)
        es_self = ewald.self_energy(params.charge, alive, alpha)
        aux["sk_re"], aux["sk_im"] = sk_re, sk_im
    elif cfg.coulomb == "wolf":
        alpha = pairs.derived_alpha(rc, cfg)
        es_self = ewald.wolf_self_energy(params.charge, alive, alpha, rc)

    polar = zero
    if cfg.polarization:
        e0 = thole.static_field(pos, box, alive, params, cfg)
        mu, n_iter = thole.solve_scf(pos, box, alive, params, cfg, e0, mu0)
        polar = thole.polar_energy(mu, e0)
        aux["mu"], aux["e0"], aux["polar_iters"] = mu, e0, n_iter

    e = EnergyBreakdown(
        rd=pt.rd, lrc=lrc, es_real=pt.es_real, es_recip=es_recip,
        es_self=es_self, es_excl=pt.es_excl, polar=polar, vdw=zero)
    return e, aux
