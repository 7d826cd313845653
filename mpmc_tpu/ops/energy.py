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


def total_energy(pos, box, mol_alive, params, cfg, thermo, mu0=None,
                 split_frozen=False, frozen_cached=None,
                 active_row_start=0):
    """Full-system energy.

    Returns (EnergyBreakdown, aux) — or, with ``split_frozen``,
    (active, frozen, aux): the frozen part holds every term internal to
    the frozen framework (pairwise rd/es_real/es_excl/lrc plus its Ewald
    self-energy), which is constant across MC moves.  Keeping it out of
    the delta accumulators is the rebuild of the reference's
    forever-cached frozen pairs (SURVEY.md §1 "delta energy") and what
    makes f32 accumulation numerically safe: the framework self/exclusion
    terms are orders of magnitude larger than any per-move delta.

    With ``frozen_cached`` (an EnergyBreakdown; implies ``split_frozen``)
    the constant frozen-frozen part is NOT recomputed: the pair pass is
    restricted to rows >= ``active_row_start`` (static; every frozen atom
    must sit below it — metropolis.frozen_refresh_rows validates the
    layout) and ``frozen_cached`` is returned as the frozen part.  This
    is the fast per-corrtime refresh: the huge framework self sums are
    skipped, only sorbate-involving terms re-sum.

    aux carries the cached quantities the MC loop needs: structure factor
    (sk_re, sk_im), induced dipoles mu, static field e0, SCF iterations.
    (The Ewald reciprocal term has irreducible framework-sorbate cross
    terms in |S(k)|^2, so it stays entirely in the active part.)
    """
    dtype = pos.dtype
    alive = mol_alive[params.mol_id] & params.atom_ok
    atom_frozen = params.mol_frozen[params.mol_id]
    zero = jnp.zeros((), dtype)
    aux = {}

    reuse_ff = frozen_cached is not None
    if reuse_ff and not split_frozen:
        raise ValueError("frozen_cached requires split_frozen=True")
    if reuse_ff:
        # rows >= active_row_start triangular vs all columns = exactly
        # the active split (>=1 non-frozen member per pair, once)
        pt = pairs.pair_pass(pos, box, alive, params, cfg,
                             thermo.temperature, split_frozen=False,
                             row_start=active_row_start)
        pt_ff = None
    else:
        pt = pairs.pair_pass(pos, box, alive, params, cfg,
                             thermo.temperature,
                             split_frozen=split_frozen)
        pt, pt_ff = pt if split_frozen else (pt, None)

    rc = pairs.derived_cutoff(box, cfg)
    volume = jnp.abs(jnp.linalg.det(box))

    # LJ long-range tail: U = (1/2V) * [ 2 * (i<j inter sum) + self images ]
    lrc = zero
    lrc_ff = zero
    if cfg.rd_potential in ("lj", "disp_expansion") and cfg.rd_lrc:
        if split_frozen:
            sc_act = pairs.lrc_self_coefficient(alive & ~atom_frozen,
                                                params, cfg, rc)
            lrc = (pt.lrc_coeff + 0.5 * sc_act) / volume
            if not reuse_ff:
                sc_ff = pairs.lrc_self_coefficient(alive & atom_frozen,
                                                   params, cfg, rc)
                lrc_ff = (pt_ff.lrc_coeff + 0.5 * sc_ff) / volume
        else:
            sc = pairs.lrc_self_coefficient(alive, params, cfg, rc)
            lrc = (pt.lrc_coeff + 0.5 * sc) / volume

    es_recip = zero
    es_self = zero
    es_self_ff = zero
    if cfg.coulomb == "ewald":
        alpha = pairs.derived_alpha(rc, cfg)
        es_recip, (sk_re, sk_im) = ewald.recip_energy(
            pos, params.charge, alive, box, alpha, cfg)
        # charged-cell jellium correction (zero when neutral).  Lives in
        # the ACTIVE slot: quadratic in the TOTAL alive charge, so it is
        # not separable into frozen + active parts, and it must be
        # re-evaluated when a charged species' count changes
        bg = ewald.background_correction(params.charge, alive, alpha,
                                         volume)
        if split_frozen:
            es_self = ewald.self_energy(params.charge,
                                        alive & ~atom_frozen, alpha) + bg
            if not reuse_ff:
                es_self_ff = ewald.self_energy(params.charge,
                                               alive & atom_frozen, alpha)
        else:
            es_self = ewald.self_energy(params.charge, alive, alpha) + bg
        aux["sk_re"], aux["sk_im"] = sk_re, sk_im
    elif cfg.coulomb == "wolf":
        alpha = pairs.derived_alpha(rc, cfg)
        if split_frozen:
            es_self = ewald.wolf_self_energy(
                params.charge, alive & ~atom_frozen, alpha, rc)
            if not reuse_ff:
                es_self_ff = ewald.wolf_self_energy(
                    params.charge, alive & atom_frozen, alpha, rc)
        else:
            es_self = ewald.wolf_self_energy(params.charge, alive, alpha, rc)

    polar = zero
    if cfg.polarization:
        e0 = thole.static_field(pos, box, alive, params, cfg)
        mu, n_iter, r_pol = thole.solve_scf(pos, box, alive, params, cfg,
                                            e0, mu0)
        polar = thole.polar_energy(mu, e0)
        aux["mu"], aux["e0"], aux["polar_iters"] = mu, e0, n_iter
        if thole.residual_supported(cfg):
            # re-ground the carried residual exactly (CG's recurrence
            # residual drifts from the true one within a solve); one
            # matvec per corrtime refresh, amortized to noise
            pol_ok = alive & (params.polar > 0)
            mask = pol_ok[:, None]
            inv_a = jnp.where(pol_ok,
                              1.0 / jnp.maximum(params.polar, 1e-30),
                              0.0)[:, None]
            t_mu = thole.dipole_matvec(pos, box, alive, params, cfg, mu)
            aux["r_pol"] = jnp.where(mask, e0 - (inv_a * mu - t_mu), 0.0)

    vdw = zero
    if cfg.cdvdw:
        from mpmc_tpu.ops import vdw as vdw_mod
        vdw = vdw_mod.vdw_energy(pos, box, alive, params, cfg)

    e = EnergyBreakdown(
        rd=pt.rd, lrc=lrc, es_real=pt.es_real, es_recip=es_recip,
        es_self=es_self, es_excl=pt.es_excl, polar=polar, vdw=vdw)
    if not split_frozen:
        return e, aux
    if reuse_ff:
        return e, frozen_cached, aux
    e_frozen = EnergyBreakdown(
        rd=pt_ff.rd, lrc=lrc_ff, es_real=pt_ff.es_real, es_recip=zero,
        es_self=es_self_ff, es_excl=pt_ff.es_excl, polar=zero, vdw=zero)
    return e, e_frozen, aux
