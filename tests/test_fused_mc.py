"""Fused multi-step MC kernel (ops/pallas/mc_kernel.py): correctness in
interpret mode on CPU — the TPU-compiled path shares the same kernel
body (same contract as the other Pallas parity suites)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmc_tpu.config import RunConfig, Thermo
from mpmc_tpu.mc import metropolis
from mpmc_tpu.models import systems
from mpmc_tpu.ops.pallas import mc_kernel


def _fluid(n=64, coulomb="none", charges=False):
    params, state, cfg, thermo = systems.lj_fluid(n=n, dtype="float32")
    cfg = dataclasses.replace(cfg, coulomb=coulomb, fused_mc=True)
    if charges:
        q = np.zeros(params.charge.shape[0])
        na = np.asarray(params.atom_ok)
        # alternate +/- so the cell stays neutral
        idx = np.where(na)[0]
        q[idx[::2]] = 0.1
        q[idx[1::2]] = -0.1
        params = dataclasses.replace(params,
                                     charge=jnp.asarray(q, jnp.float32))
    state = metropolis.initialize(state, params, cfg, thermo)
    return params, state, cfg, thermo


def test_supported_gate():
    params, state, cfg, thermo = _fluid()
    assert mc_kernel.supported(cfg, params)
    assert not mc_kernel.supported(
        dataclasses.replace(cfg, ensemble="uvt"), params)
    assert mc_kernel.supported(
        dataclasses.replace(cfg, coulomb="ewald"), params)
    assert not mc_kernel.supported(
        dataclasses.replace(cfg, polarization=True), params)
    # rigid multi-site species (3-site H2): supported under NVT
    p2, s2, c2, t2 = systems.mof_h2_gcmc(n_side=3, n_h2=4, capacity=8)
    assert mc_kernel.supported(
        dataclasses.replace(c2, ensemble="nvt", coulomb="wolf"), p2)
    assert mc_kernel.supported(
        dataclasses.replace(c2, ensemble="nvt"), p2)    # nvt + ewald
    assert not mc_kernel.supported(c2, p2)      # uvt


def test_ortho_box_min_image_bit_identical():
    """cfg.ortho_box drops the exact-zero triclinic cross terms in the
    kernels' min-image (12 ops vs 36) — trajectories, accumulated
    energies and acceptance counts must be BIT-identical to the general
    path on a diagonal box, even on a jammed fluid whose r^-12 cores
    amplify any ulp-level formula change ~1e7x (a d - L*round(d/L)
    rewrite fails this test by ~K-scale drift)."""
    params, state, cfg, thermo = _fluid(n=48)
    res = {}
    for ortho in (False, True):
        c = dataclasses.replace(cfg, ortho_box=ortho)
        st, stats = metropolis.run_chunk_fused(state, params, c, thermo,
                                               300)
        res[ortho] = (np.asarray(st.pos), float(st.energy.rd),
                      int(stats.accepts[0]))
    np.testing.assert_array_equal(res[False][0], res[True][0])
    assert res[False][1] == res[True][1]
    assert res[False][2] == res[True][2]
    # µVT kernel too (insert/delete paths share the col pass)
    params, state, cfg, thermo = systems.mof_h2_gcmc(n_side=4, n_h2=8,
                                                     capacity=16)
    cfg = dataclasses.replace(cfg, fused_mc=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    res = {}
    for ortho in (False, True):
        c = dataclasses.replace(cfg, ortho_box=ortho)
        st, _ = metropolis.run_chunk_fused_uvt(state, params, c, thermo,
                                               300)
        res[ortho] = (np.asarray(st.pos), float(st.energy.total),
                      int(np.asarray(st.mol_alive).sum()))
    np.testing.assert_array_equal(res[False][0], res[True][0])
    assert res[False][1] == res[True][1]
    assert res[False][2] == res[True][2]


@pytest.mark.parametrize("coulomb,charges", [("none", False),
                                             ("cutoff", True),
                                             ("wolf", True)])
def test_bookkeeping_matches_full_recompute(coulomb, charges):
    """The kernel's accumulated per-term deltas must equal a from-scratch
    energy recompute of its final configuration — any wrong pair mask,
    image, or acceptance would break this."""
    params, state, cfg, thermo = _fluid(n=48, coulomb=coulomb,
                                        charges=charges)
    e0 = state.energy
    st, stats = metropolis.run_chunk_fused(state, params, cfg, thermo,
                                           300)
    assert 0 < int(stats.accepts[0]) < 300
    fresh = metropolis.initialize(st, params, cfg, thermo)
    assert float(st.energy.rd) == pytest.approx(
        float(fresh.energy.rd), rel=2e-4, abs=2e-2)
    if charges:
        assert float(st.energy.es_real) == pytest.approx(
            float(fresh.energy.es_real), rel=2e-4, abs=2e-2)
    # positions actually moved
    assert float(jnp.max(jnp.abs(st.pos - state.pos))) > 0.0


def test_deterministic_for_fixed_key():
    params, state, cfg, thermo = _fluid(n=32)
    a, _ = metropolis.run_chunk_fused(state, params, cfg, thermo, 100)
    b, _ = metropolis.run_chunk_fused(state, params, cfg, thermo, 100)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_composed_block_matches_chunk_plus_refresh():
    """refresh_rows=fr composes chunk + initialize into ONE jitted
    program (run.py per-corrtime path); it must equal the two-dispatch
    sequence."""
    params, state, cfg, thermo = _fluid(n=32)
    fr = metropolis.frozen_refresh_rows(params, cfg)
    st2, stats2 = metropolis.run_chunk_fused(state, params, cfg, thermo,
                                             100)
    st2 = metropolis.initialize(st2, params, cfg, thermo, frozen_rows=fr)
    st1, stats1 = metropolis.run_chunk_fused(state, params, cfg, thermo,
                                             100, refresh_rows=fr)
    np.testing.assert_array_equal(np.asarray(st1.pos), np.asarray(st2.pos))
    assert float(st1.energy.total) == pytest.approx(
        float(st2.energy.total), rel=1e-6, abs=1e-4)
    np.testing.assert_array_equal(np.asarray(stats1.accepts),
                                  np.asarray(stats2.accepts))


def test_matches_jnp_reference_trajectory():
    """Bit-level trajectory check against a pure-jnp reference consuming
    the SAME uniform table (the kernel's pre-drawn-randomness design
    exists exactly to make this testable)."""
    params, state, cfg, thermo = _fluid(n=32)
    from mpmc_tpu.ops import pairs
    rc = pairs.derived_cutoff(state.box, cfg)
    n_steps = 120
    key = jax.random.PRNGKey(7)
    u = np.asarray(mc_kernel.draw_uniforms(key, n_steps))
    mov, mova, a_max, _slots = mc_kernel.movable_mols(
        params, np.asarray(state.mol_alive))
    new_pos, d_rd, d_es, _, n_acc, _, _, _, _, _ = mc_kernel.run_steps(
        state.pos, params.eps, params.sig, params.charge, params.mass,
        state.atom_alive(params), mov, mova, state.box, rc, 0.0,
        1.0 / float(thermo.temperature), float(thermo.move_factor), 0.0,
        0.0, u, cfg, n_steps, state.pos.shape[0], a_max=a_max,
        interpret=True)

    # ---- reference: same arithmetic in f32 numpy -----------------------
    pos = np.asarray(state.pos, np.float32).copy()
    alive = np.asarray(state.atom_alive(params))
    eps = np.asarray(params.eps, np.float32)
    sig = np.asarray(params.sig, np.float32)
    box = np.asarray(state.box, np.float32)
    binv = np.linalg.inv(box)
    beta = np.float32(1.0 / float(thermo.temperature))
    mf = np.float32(thermo.move_factor)
    rcf = np.float32(rc)
    acc_n = 0
    for k in range(n_steps):
        m = min(int(u[k, 0] * len(mov)), len(mov) - 1)
        i = int(mov[m])
        old = pos[i].copy()
        new = old + (2.0 * u[k, 1:4] - 1.0) * mf

        def e_of(center):
            d = center[None, :] - pos
            fr = d @ binv
            fr -= np.round(fr)
            dr = fr @ box
            r2 = np.sum(dr * dr, 1)
            ok = alive & (np.arange(len(pos)) != i) & (r2 < rcf * rcf)
            r2s = np.where(r2 > 1e-12, r2, 1.0)
            s2 = (0.5 * (sig[i] + sig)) ** 2 / r2s
            s6 = s2 ** 3
            e = 4.0 * np.sqrt(eps[i]) * np.sqrt(eps) * s6 * (s6 - 1.0)
            return np.sum(np.where(ok, e, 0.0))

        du = e_of(new) - e_of(old)
        if np.log(max(u[k, 4], 1e-38)) < -beta * du:
            pos[i] = new
            acc_n += 1
    assert int(n_acc) == acc_n
    moved = np.abs(np.asarray(new_pos) - pos)
    assert float(moved.max()) < 1e-4, float(moved.max())


def _mof_h2_nvt(coulomb="wolf"):
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=4, n_h2=12, capacity=24)
    cfg = dataclasses.replace(cfg, ensemble="nvt", coulomb=coulomb,
                              fused_mc=True)
    assert mc_kernel.supported(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    return params, state, cfg, thermo


@pytest.mark.parametrize("coulomb", ["none", "wolf", "ewald"])
def test_multisite_bookkeeping_matches_full_recompute(coulomb):
    """Rigid 3-site H2 in a frozen framework: the fused translate+rotate
    deltas must equal a from-scratch recompute of the final
    configuration (exercises the COM rotation, the multi-atom delta
    pass, the same-molecule column exclusion and — under ewald — the
    in-kernel S(k) delta commit)."""
    params, state, cfg, thermo = _mof_h2_nvt(coulomb)
    st, stats = metropolis.run_chunk_fused(state, params, cfg, thermo,
                                           400)
    assert 0 < int(stats.accepts[0]) < 400
    fresh = metropolis.initialize(st, params, cfg, thermo)
    assert float(st.energy.rd) == pytest.approx(
        float(fresh.energy.rd), rel=2e-4, abs=5e-2)
    if coulomb != "none":
        assert float(st.energy.es_real) == pytest.approx(
            float(fresh.energy.es_real), rel=2e-4, abs=5e-2)
    if coulomb == "ewald":
        # the committed structure factor must track the positions
        np.testing.assert_allclose(np.asarray(st.sk_re),
                                   np.asarray(fresh.sk_re),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(st.sk_im),
                                   np.asarray(fresh.sk_im),
                                   rtol=1e-4, atol=1e-3)
        assert float(st.energy.es_recip) == pytest.approx(
            float(fresh.energy.es_recip), rel=2e-4, abs=5e-2)
        # self/exclusion terms are rigid-move invariant
        assert float(st.energy.es_self) == pytest.approx(
            float(fresh.energy.es_self), rel=1e-6)
        assert float(st.energy.es_excl) == pytest.approx(
            float(fresh.energy.es_excl), rel=1e-4)


def test_multisite_moves_are_rigid():
    """Accepted translate+rotate moves must preserve every
    intramolecular distance (rigid-molecule contract) while actually
    rotating molecules (orientation change, not just translation)."""
    params, state, cfg, thermo = _mof_h2_nvt("none")
    starts = np.asarray(params.mol_start)
    nat = np.asarray(params.mol_natoms)
    mov = (~np.asarray(params.mol_frozen)
           & np.asarray(state.mol_alive)
           & (np.asarray(params.mol_species) >= 0))

    def intra(pos):
        out = []
        for s, a in zip(starts[mov], nat[mov]):
            rows = np.asarray(pos[s:s + a], np.float64)
            out.append(np.linalg.norm(
                rows[:, None, :] - rows[None, :, :], axis=-1))
        return np.stack(out)

    def orient(pos):
        return np.stack([np.asarray(pos[s + 1] - pos[s], np.float64)
                         for s, a in zip(starts[mov], nat[mov])])

    d0, o0 = intra(state.pos), orient(state.pos)
    st, stats = metropolis.run_chunk_fused(state, params, cfg, thermo,
                                           300)
    assert int(stats.accepts[0]) > 0
    d1, o1 = intra(st.pos), orient(st.pos)
    np.testing.assert_allclose(d1, d0, atol=5e-4)
    # at least one molecule's bond direction rotated measurably
    cosang = np.sum(o0 * o1, -1) / (
        np.linalg.norm(o0, axis=-1) * np.linalg.norm(o1, axis=-1))
    assert float(np.min(cosang)) < 0.999


def test_run_dispatch_uses_fused_path(tmp_path):
    """CLI-level: fused_mc on a monatomic NVT deck runs end-to-end and
    keeps energies consistent with the averages machinery."""
    import io

    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    pqr = tmp_path / "ar.pqr"
    lines = []
    rng = np.random.default_rng(0)
    for k in range(20):
        x, y, z = rng.uniform(0.5, 11.5, 3)
        lines.append(f"ATOM {k+1} Ar AR {k+1} M {x:.3f} {y:.3f} {z:.3f}"
                     " 39.948 0.0 0.0 119.8 3.405")
    pqr.write_text("\n".join(lines) + "\nEND\n")
    job = input_script.parse(f"""
ensemble nvt
numsteps 400
corrtime 100
temperature 150
basis1 12 0 0
basis2 0 12 0
basis3 0 0 12
coulomb off
fused_mc on
pqr_input {pqr}
""")
    log = io.StringIO()
    _, avgs = run_mod.run(job, log=log)
    assert "unsupported" not in log.getvalue()
    assert avgs.count() == 4


# ---------------------------------------------------------------- fused µVT

def test_uvt_supported_gate():
    p, s, c, t = systems.mof_h2_gcmc(n_side=3, n_h2=4, capacity=8)
    assert mc_kernel.supported_uvt(c, p)                # uvt + ewald
    assert mc_kernel.supported_uvt(
        dataclasses.replace(c, coulomb="wolf"), p)
    assert not mc_kernel.supported_uvt(
        dataclasses.replace(c, ensemble="nvt"), p)
    # cavity bias rides into the kernel as the open-cell id list
    assert mc_kernel.supported_uvt(
        dataclasses.replace(c, cavity_bias=True), p)
    assert not mc_kernel.supported_uvt(
        dataclasses.replace(c, polarization=True), p)
    assert not mc_kernel.supported_uvt(
        dataclasses.replace(c, insert_species=(0, 1)), p)
    assert not mc_kernel.supported_uvt(
        dataclasses.replace(c, dtype="float64"), p)


def _mof_h2_uvt(coulomb="ewald"):
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=4, n_h2=12, capacity=24)
    cfg = dataclasses.replace(cfg, coulomb=coulomb, fused_mc=True)
    assert mc_kernel.supported_uvt(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    return params, state, cfg, thermo


def test_uvt_composed_block_matches_chunk_plus_refresh():
    """The µVT chunk+refresh composition (single-chain and the C-chain
    interleaved variant) must equal the two-dispatch sequence."""
    from mpmc_tpu.parallel import multichain
    params, state, cfg, thermo = _mof_h2_uvt("ewald")
    fr = metropolis.frozen_refresh_rows(params, cfg)
    st2, _ = metropolis.run_chunk_fused_uvt(state, params, cfg, thermo,
                                            200)
    st2 = metropolis.initialize(st2, params, cfg, thermo, frozen_rows=fr)
    st1, _ = metropolis.run_chunk_fused_uvt(state, params, cfg, thermo,
                                            200, refresh_rows=fr)
    np.testing.assert_array_equal(np.asarray(st1.mol_alive),
                                  np.asarray(st2.mol_alive))
    np.testing.assert_array_equal(np.asarray(st1.pos), np.asarray(st2.pos))
    assert float(st1.energy.total) == pytest.approx(
        float(st2.energy.total), rel=1e-6, abs=1e-4)
    # C-chain interleaved variant
    C = 2
    states = multichain.stack_states(state, C)
    sts2, _ = metropolis.run_chunk_fused_uvt_multi(states, params, cfg,
                                                   thermo, 150)
    sts2 = multichain.initialize_batched(sts2, params, cfg, thermo,
                                         frozen_rows=fr)
    sts1, _ = metropolis.run_chunk_fused_uvt_multi(states, params, cfg,
                                                   thermo, 150,
                                                   refresh_rows=fr)
    np.testing.assert_array_equal(np.asarray(sts1.pos),
                                  np.asarray(sts2.pos))
    np.testing.assert_allclose(np.asarray(sts1.energy.total),
                               np.asarray(sts2.energy.total),
                               rtol=1e-6, atol=1e-4)


@pytest.mark.parametrize("coulomb", ["none", "wolf", "ewald"])
def test_uvt_bookkeeping_matches_full_recompute(coulomb):
    """Fused GCMC on rigid 3-site H2 in a frozen framework: after K
    displace/insert/delete steps every accumulated per-term delta
    (incl. the count-dependent self/exclusion/LRC constants and the
    S(k) commit) must equal a from-scratch recompute of the final
    configuration."""
    params, state, cfg, thermo = _mof_h2_uvt(coulomb)
    n0 = int(np.asarray(state.mol_alive).sum())
    st, stats = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                               thermo, 600)
    att = np.asarray(stats.attempts)
    acc = np.asarray(stats.accepts)
    assert att[metropolis.DISPLACE] > 100
    assert att[metropolis.INSERT] > 50
    assert att[metropolis.DELETE] > 50
    assert att.sum() == 600
    # the chain must actually exchange particles with the reservoir
    assert acc[metropolis.INSERT] + acc[metropolis.DELETE] > 0
    n1 = int(np.asarray(st.mol_alive).sum())
    assert n1 - n0 == (int(acc[metropolis.INSERT])
                       - int(acc[metropolis.DELETE]))
    fresh = metropolis.initialize(st, params, cfg, thermo)
    for term in ("rd", "lrc", "es_real", "es_recip", "es_self",
                 "es_excl"):
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=5e-2), term
    if coulomb == "ewald":
        np.testing.assert_allclose(np.asarray(st.sk_re),
                                   np.asarray(fresh.sk_re),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(st.sk_im),
                                   np.asarray(fresh.sk_im),
                                   rtol=1e-4, atol=1e-3)


def test_uvt_ideal_gas_occupancy():
    """Non-interacting fused GCMC: <N> = f V / kT (Poisson) — the
    acceptance rule, slot bookkeeping, and pick distributions all feed
    this number."""
    from helpers import atom_species

    from mpmc_tpu.constants import ATM2K_A3
    from mpmc_tpu.state import build_system

    L, T, target_n = 20.0, 300.0, 20.0
    f_atm = target_n * T / L ** 3 / ATM2K_A3
    sp = atom_species("He", eps=0.0, sig=0.0, charge=0.0, mass=4.0)
    params, state = build_system(L * np.eye(3), species=(sp,),
                                 capacity=(80,), initial_counts=(10,),
                                 dtype=jnp.float32, seed=3)
    cfg = RunConfig(ensemble="uvt", rd_potential="none", coulomb="none",
                    rd_lrc=False, dtype="float32", insert_species=(0,),
                    fused_mc=True)
    thermo = Thermo.make(temperature=T, fugacity=(f_atm,),
                         insert_probability=0.5, move_factor=1.0,
                         rot_factor=0.1, n_species=1, dtype=jnp.float32)
    assert mc_kernel.supported_uvt(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    state, _ = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                              thermo, 2000)
    samples = []
    for _ in range(60):
        state, _ = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                                  thermo, 100)
        samples.append(int(np.asarray(state.mol_alive).sum()))
    mean_n = np.mean(samples)
    assert mean_n == pytest.approx(target_n, abs=2.0)


def _mof_h2_ch4_uvt(coulomb="ewald"):
    params, state, cfg, thermo = systems.mof_h2_ch4_gcmc(
        n_side=4, n_h2=6, n_ch4=6, capacity=12)
    cfg = dataclasses.replace(cfg, coulomb=coulomb, fused_mc=True)
    assert mc_kernel.supported_uvt(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    return params, state, cfg, thermo


def test_uvt_multisorbate_supported_gate():
    p, s, c, t = systems.mof_h2_ch4_gcmc(n_side=3, n_h2=2, n_ch4=2,
                                         capacity=4)
    assert mc_kernel.supported_uvt(c, p)
    assert not mc_kernel.supported_uvt(
        dataclasses.replace(c, ensemble="nvt"), p)
    assert mc_kernel.supported_uvt(
        dataclasses.replace(c, cavity_bias=True), p)
    # a declared insert species with no movable slot has no capacity
    assert not mc_kernel.supported_uvt(
        dataclasses.replace(c, insert_species=(0, 1, 2)), p)
    # dropping a species from insert_species leaves its movable slots
    # outside the kernel's displace/exchange model
    assert not mc_kernel.supported_uvt(
        dataclasses.replace(c, insert_species=(0,)), p)


@pytest.mark.parametrize("coulomb", ["wolf", "ewald"])
def test_uvt_multisorbate_bookkeeping_matches_full_recompute(coulomb):
    """Fused 2-sorbate GCMC (3-site H2 + 1-site CH4, mixed site counts):
    accumulated per-term deltas must equal a from-scratch recompute —
    exercises the species-first pick, per-species templates/constants,
    the per-site validity masks, and the S x S LRC cross matrix."""
    params, state, cfg, thermo = _mof_h2_ch4_uvt(coulomb)
    n0 = int(np.asarray(state.mol_alive).sum())
    st, stats = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                               thermo, 800)
    att = np.asarray(stats.attempts)
    acc = np.asarray(stats.accepts)
    assert att.sum() == 800
    assert acc[metropolis.INSERT] + acc[metropolis.DELETE] > 0
    n1 = int(np.asarray(st.mol_alive).sum())
    assert n1 - n0 == (int(acc[metropolis.INSERT])
                       - int(acc[metropolis.DELETE]))
    # both species must actually move/exchange over the run
    sp = np.asarray(params.mol_species)
    mov = ~np.asarray(params.mol_frozen) & (sp >= 0)
    pos_moved = np.abs(np.asarray(st.pos) - np.asarray(state.pos))
    starts = np.asarray(params.mol_start)
    nat = np.asarray(params.mol_natoms)
    alive0 = np.asarray(state.mol_alive)
    alive1 = np.asarray(st.mol_alive)
    for si in (0, 1):
        rows = np.concatenate(
            [np.arange(s, s + a) for s, a in
             zip(starts[mov & (sp == si)], nat[mov & (sp == si)])])
        # a species is "active" if it displaced OR exchanged (delete
        # flips mol_alive without touching pos)
        n0 = int((alive0 & (sp == si)).sum())
        n1 = int((alive1 & (sp == si)).sum())
        assert float(pos_moved[rows].max()) > 0.0 or n0 != n1, \
            f"species {si} frozen"
    fresh = metropolis.initialize(st, params, cfg, thermo)
    # abs tolerance: f32 drift scales with the INTERMEDIATE magnitude,
    # not the final one — es_self per H2 exchange is ~3.1e4 K on a
    # ~1.9e5 K running total (ulp ~0.016), so a trajectory that deletes
    # every charged molecule ends near 0 with a few-ulp residual.
    for term in ("rd", "lrc", "es_real", "es_recip", "es_self",
                 "es_excl"):
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=1.0), term
    if coulomb == "ewald":
        np.testing.assert_allclose(np.asarray(st.sk_re),
                                   np.asarray(fresh.sk_re),
                                   rtol=1e-4, atol=1e-3)


def test_uvt_multisorbate_ideal_gas_partial_loadings_fused():
    """Fused-path version of the scan detailed-balance anchor: two
    non-interacting species at different fugacities must each obey
    <N_s> = f_s V / kT — the species-first insert/delete pick and the
    per-species acceptance constants all feed this."""
    from helpers import atom_species

    from mpmc_tpu.constants import ATM2K_A3
    from mpmc_tpu.state import build_system

    L, T = 16.0, 300.0
    targets = np.array([8.0, 24.0])
    f = targets * T / L ** 3 / ATM2K_A3
    spa = atom_species("AA", eps=0.0, sig=0.0, charge=0.0, mass=10.0)
    spb = atom_species("BB", eps=0.0, sig=0.0, charge=0.0, mass=20.0)
    params, state = build_system(L * np.eye(3), species=(spa, spb),
                                 capacity=(64, 96),
                                 initial_counts=(4, 4),
                                 dtype=jnp.float32, seed=5)
    cfg = RunConfig(ensemble="uvt", rd_potential="none", coulomb="none",
                    rd_lrc=False, dtype="float32", insert_species=(0, 1),
                    fused_mc=True)
    thermo = Thermo.make(temperature=T, fugacity=list(f),
                         insert_probability=0.5, move_factor=1.0,
                         rot_factor=0.1, n_species=2, dtype=jnp.float32)
    assert mc_kernel.supported_uvt(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    state, _ = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                              thermo, 2000)
    sp = np.asarray(params.mol_species)
    na, nb = [], []
    for _ in range(60):
        state, _ = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                                  thermo, 100)
        alive = np.asarray(state.mol_alive)
        na.append(int((alive & (sp == 0)).sum()))
        nb.append(int((alive & (sp == 1)).sum()))
    assert np.mean(na) == pytest.approx(targets[0], abs=1.5)
    assert np.mean(nb) == pytest.approx(targets[1], abs=3.0)


def test_uvt_matches_scan_equilibrium():
    """Interacting fused GCMC must equilibrate to the same <N> and <U>
    as the scan path (statistical agreement, not trajectory
    equality)."""
    params, state, cfg, thermo = _mof_h2_uvt("wolf")

    def sample(chunk_fn, st, n_blocks=40, block=100):
        ns, us = [], []
        st, _ = chunk_fn(st, params, cfg, thermo, 1500)
        for _ in range(n_blocks):
            st, _ = chunk_fn(st, params, cfg, thermo, block)
            st = metropolis.initialize(st, params, cfg, thermo)
            ns.append(int(np.asarray(st.mol_alive).sum()))
            us.append(float(st.energy.total))
        return np.mean(ns), np.std(ns), np.mean(us)

    nf, sf, uf = sample(metropolis.run_chunk_fused_uvt, state)
    ns_, ss, us_ = sample(metropolis.run_chunk, state)
    # loose statistical tolerance: a few sigma of the block means
    tol = 4.0 * max(sf, ss, 0.5) / np.sqrt(40.0)
    assert nf == pytest.approx(ns_, abs=max(3.0 * tol, 1.5))


# ---------------------------------------------------------------------------
# Hybrid fused NPT (run_chunk_fused_npt)
# ---------------------------------------------------------------------------

def _npt_fluid(n=24, pv=0.1, dtype="float32"):
    from mpmc_tpu.config import Thermo
    params, state, cfg, thermo = systems.lj_fluid(n=n, dtype=dtype)
    cfg = dataclasses.replace(cfg, ensemble="npt", fused_mc=True)
    thermo = Thermo.make(temperature=150.0, pressure=50.0,
                         volume_probability=pv, volume_change_factor=0.1,
                         move_factor=0.5, rot_factor=0.0, n_species=1,
                         dtype=cfg.jdtype)
    state = metropolis.initialize(state, params, cfg, thermo)
    return params, state, cfg, thermo


def test_npt_supported_gate():
    params, state, cfg, thermo = _npt_fluid()
    assert mc_kernel.supported_npt(cfg, params)
    assert not mc_kernel.supported_npt(
        dataclasses.replace(cfg, ensemble="nvt"), params)
    assert not mc_kernel.supported_npt(
        dataclasses.replace(cfg, polarization=True), params)
    # frozen framework (MOF) -> scale_volume invalid -> gated out
    p2, s2, c2, t2 = systems.mof_h2_gcmc(n_side=3, n_h2=4, capacity=8)
    assert not mc_kernel.supported_npt(
        dataclasses.replace(c2, ensemble="npt"), p2)


def test_npt_attempt_mix_and_bookkeeping():
    """The hybrid chunk must attempt exactly round(pv*K) volume moves
    and K - n_v displacements, advance step by K, and keep the
    delta-accumulated energy consistent with a from-scratch recompute
    (the volume branch re-prices everything; the fused segments add
    per-move deltas on top)."""
    params, state, cfg, thermo = _npt_fluid(n=24, pv=0.1)
    st, stats = metropolis.run_chunk_fused_npt(state, params, cfg,
                                               thermo, 200)
    assert int(np.asarray(st.step)) == 200
    assert int(stats.attempts[metropolis.VOLUME]) == 20
    assert int(stats.attempts[metropolis.DISPLACE]) == 180
    assert int(stats.accepts[metropolis.VOLUME]) > 0
    assert int(stats.accepts[metropolis.DISPLACE]) > 0
    # box actually rescaled at least once
    assert float(np.abs(np.asarray(st.box) - np.asarray(state.box)).max()
                 ) > 0.0
    fresh = metropolis.initialize(st, params, cfg, thermo)
    assert float(st.energy.rd) == pytest.approx(
        float(fresh.energy.rd), rel=2e-4, abs=2e-2)
    assert float(st.energy.lrc) == pytest.approx(
        float(fresh.energy.lrc), rel=2e-4, abs=2e-2)


def test_npt_deterministic_and_pv_zero():
    params, state, cfg, thermo = _npt_fluid(n=16, pv=0.2)
    a, _ = metropolis.run_chunk_fused_npt(state, params, cfg, thermo, 60)
    b, _ = metropolis.run_chunk_fused_npt(state, params, cfg, thermo, 60)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.box), np.asarray(b.box))
    # pv = 0: pure fused displacement chunk (no volume attempts)
    params, state, cfg, thermo = _npt_fluid(n=16, pv=0.0)
    st, stats = metropolis.run_chunk_fused_npt(state, params, cfg,
                                               thermo, 50)
    assert int(stats.attempts[metropolis.VOLUME]) == 0
    assert int(stats.attempts[metropolis.DISPLACE]) == 50


def test_npt_ideal_gas_volume_fused():
    """Ideal-gas NPT through the hybrid path: <V> = (N+1) kT / P —
    the same analytic anchor as the scan path's
    test_npt_ideal_gas_volume, so a bias in the hybrid composition
    (wrong attempt weighting, wrong ln-bias) would show here."""
    from mpmc_tpu.constants import ATM2K_A3
    from mpmc_tpu.config import Thermo
    T, n, p_atm = 300.0, 15, 80.0
    expect_v = (n + 1) * T / (p_atm * ATM2K_A3)
    params, state, cfg, thermo = systems.lj_fluid(n=n, dtype="float32")
    cfg = dataclasses.replace(cfg, ensemble="npt", rd_potential="none",
                              rd_lrc=False, fused_mc=True)
    assert mc_kernel.supported_npt(cfg, params)
    # start at the expected volume
    s = (expect_v / float(np.abs(np.linalg.det(np.asarray(state.box))))
         ) ** (1 / 3)
    state = dataclasses.replace(state, box=state.box * s,
                                pos=state.pos * s)
    thermo = Thermo.make(temperature=T, pressure=p_atm,
                         volume_probability=0.5,
                         volume_change_factor=0.2, move_factor=1.0,
                         rot_factor=0.0, n_species=1, dtype=cfg.jdtype)
    state = metropolis.initialize(state, params, cfg, thermo)
    state, _ = metropolis.run_chunk_fused_npt(state, params, cfg,
                                              thermo, 400)
    vols = []
    for _ in range(120):
        state, _ = metropolis.run_chunk_fused_npt(state, params, cfg,
                                                  thermo, 20)
        vols.append(float(np.abs(np.linalg.det(np.asarray(state.box)))))
    assert np.mean(vols) == pytest.approx(expect_v, rel=0.15)


# ---------------------------------------------------------------------------
# Cavity bias in the fused µVT kernel
# ---------------------------------------------------------------------------

def test_uvt_cavity_bias_bookkeeping():
    """Cavity-biased fused GCMC (radius > 0 closes framework-adjacent
    cells): the per-term delta accumulation must still match a
    from-scratch recompute, inserts must land (the biased proposal
    points into open space), and the grid must have both open and
    closed cells so the correction is non-trivial."""
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=4, n_h2=12, capacity=24)
    cfg = dataclasses.replace(cfg, fused_mc=True, cavity_bias=True,
                              cavity_grid=6, cavity_radius=2.0)
    assert mc_kernel.supported_uvt(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    n_open = int(np.asarray(state.cavity_open).sum())
    assert 0 < n_open < 6 ** 3
    st, stats = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                               thermo, 600)
    att = np.asarray(stats.attempts)
    acc = np.asarray(stats.accepts)
    assert att[metropolis.INSERT] > 50
    assert acc[metropolis.INSERT] + acc[metropolis.DELETE] > 0
    fresh = metropolis.initialize(st, params, cfg, thermo)
    for term in ("rd", "lrc", "es_real", "es_recip", "es_self",
                 "es_excl"):
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=5e-2), term


def test_uvt_cavity_bias_inserts_only_into_open_cells():
    """Every accepted insert's COM must lie in a cell that was open in
    the chunk's grid (the proposal never points into closed cells)."""
    from mpmc_tpu.state import all_molecule_coms
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=4, n_h2=2, capacity=24, pressure=20.0)
    cfg = dataclasses.replace(cfg, fused_mc=True, cavity_bias=True,
                              cavity_grid=5, cavity_radius=2.5)
    state = metropolis.initialize(state, params, cfg, thermo)
    g = cfg.cavity_grid
    open_mask = np.asarray(state.cavity_open)
    alive0 = np.asarray(state.mol_alive).copy()
    st, stats = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                               thermo, 400)
    alive1 = np.asarray(st.mol_alive)
    new_mols = np.where(alive1 & ~alive0)[0]
    assert int(np.asarray(stats.accepts)[metropolis.INSERT]) > 0
    assert len(new_mols) > 0
    coms = np.asarray(all_molecule_coms(st.pos, params))
    binv = np.linalg.inv(np.asarray(st.box))
    for m in new_mols:
        frac = coms[m] @ binv % 1.0
        ijk = np.minimum((frac * g).astype(int), g - 1)
        cell = ijk[0] * g * g + ijk[1] * g + ijk[2]
        assert open_mask[cell], (m, cell)


def test_uvt_cavity_bias_preserves_equilibrium_density():
    """Ideal-gas fused GCMC with cavity bias at radius 0 (every cell
    open): <N> = fV/kT — the plumbing (cell pick, in-cell placement,
    ln f correction with f = 1) must not shift the equilibrium.  Same
    power as test_uvt_ideal_gas_occupancy so a systematic offset from
    lane misuse or a wrong lnf sign would stand out of the noise."""
    from helpers import atom_species

    from mpmc_tpu.constants import ATM2K_A3
    from mpmc_tpu.state import build_system

    L, T, target_n = 20.0, 300.0, 20.0
    f_atm = target_n * T / L ** 3 / ATM2K_A3
    sp = atom_species("He", eps=0.0, sig=0.0, charge=0.0, mass=4.0)
    params, state = build_system(L * np.eye(3), species=(sp,),
                                 capacity=(80,), initial_counts=(10,),
                                 dtype=jnp.float32, seed=3)
    cfg = RunConfig(ensemble="uvt", rd_potential="none", coulomb="none",
                    rd_lrc=False, dtype="float32", insert_species=(0,),
                    fused_mc=True, cavity_bias=True, cavity_grid=4,
                    cavity_radius=0.0)
    thermo = Thermo.make(temperature=T, fugacity=(f_atm,),
                         insert_probability=0.5, move_factor=1.0,
                         rot_factor=0.1, n_species=1, dtype=jnp.float32)
    assert mc_kernel.supported_uvt(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    assert int(np.asarray(state.cavity_open).sum()) == 4 ** 3
    state, _ = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                              thermo, 2000)
    samples = []
    for _ in range(60):
        state, _ = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                                  thermo, 100)
        samples.append(int(np.asarray(state.mol_alive).sum()))
    assert np.mean(samples) == pytest.approx(target_n, abs=2.0)


# ---------------------------------------------------------------------------
# In-kernel spinflip (quantum rotation) in the fused NVT kernel
# ---------------------------------------------------------------------------

def _h2_qrot_nvt(dF=100.0, p_spin=0.5, n_h2=12):
    """Frozen framework + rigid H2 rotors under NVT with a hand-set
    rot_f table (F_para = 0, F_ortho = dF for every molecule) — the
    kernel only consumes the cached table, exactly like the scan
    path's b_spinflip, so the test controls the physics directly."""
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=n_h2, capacity=n_h2)
    cfg = dataclasses.replace(cfg, ensemble="nvt", coulomb="wolf",
                              fused_mc=True, quantum_rotation=True)
    thermo = thermo.replace(
        spinflip_probability=jnp.asarray(p_spin, jnp.float32))
    state = metropolis.initialize(state, params, cfg, thermo)
    M = params.mol_species.shape[0]
    rot_f = np.zeros((M, 2), np.float32)
    rot_f[:, 1] = dF
    state = state.replace(rot_f=jnp.asarray(rot_f),
                          spin=jnp.zeros(M, jnp.int32))
    return params, state, cfg, thermo


def test_spinflip_gate():
    params, state, cfg, thermo = _h2_qrot_nvt()
    assert mc_kernel.supported(cfg, params)
    # monatomic movables are not rotors
    p1, s1, c1, t1 = systems.lj_fluid(n=16, dtype="float32")
    assert not mc_kernel.supported(
        dataclasses.replace(c1, quantum_rotation=True), p1)
    assert not mc_kernel.supported_uvt(
        dataclasses.replace(c1, ensemble="uvt", insert_species=(0,),
                            quantum_rotation=True), p1)
    # the uvt kernel DOES carry a spinflip branch (rotor species)
    assert mc_kernel.supported_uvt(
        dataclasses.replace(cfg, ensemble="uvt",
                            insert_species=(0,)), params)
    # the npt kernel has none
    assert not mc_kernel.supported_npt(
        dataclasses.replace(cfg, ensemble="npt"), params)


def test_spinflip_pure_flip_chunk():
    """p_spin = 1: every step is a spinflip — positions and energies
    must be BIT-identical, only spins and the SPINFLIP stats move."""
    params, state, cfg, thermo = _h2_qrot_nvt(dF=50.0, p_spin=1.0)
    st, stats = metropolis.run_chunk_fused(state, params, cfg, thermo,
                                           200)
    np.testing.assert_array_equal(np.asarray(st.pos),
                                  np.asarray(state.pos))
    assert float(st.energy.total) == float(state.energy.total)
    att = np.asarray(stats.attempts)
    acc = np.asarray(stats.accepts)
    assert att[metropolis.SPINFLIP] == 200
    assert att[metropolis.DISPLACE] == 0
    assert 0 < acc[metropolis.SPINFLIP] < 200
    # some molecules actually flipped to ortho
    mv_slots = mc_kernel.movable_mols(params,
                                      np.asarray(state.mol_alive))[3]
    assert int(np.asarray(st.spin)[mv_slots].sum()) > 0


def test_spinflip_ortho_para_equilibrium():
    """Mixed displace+spinflip chain: the stationary ortho fraction is
    the two-level Boltzmann weight exp(-dF/T)/(1+exp(-dF/T)) per
    molecule (rot_f is position-independent here, so displacements
    do not couple).  Also re-checks the energy bookkeeping with the
    spinflip carve-out active."""
    dF, p_spin = 100.0, 0.5
    params, state, cfg, thermo = _h2_qrot_nvt(dF=dF, p_spin=p_spin)
    T = float(thermo.temperature)
    mv_slots = mc_kernel.movable_mols(params,
                                      np.asarray(state.mol_alive))[3]
    st = state
    fracs = []
    n_acc_disp = 0
    for i in range(40):
        st, stats = metropolis.run_chunk_fused(st, params, cfg, thermo,
                                               100)
        n_acc_disp += int(np.asarray(stats.accepts)[metropolis.DISPLACE])
        if i >= 5:
            fracs.append(np.asarray(st.spin)[mv_slots].mean())
    w = np.exp(-dF / T)
    assert np.mean(fracs) == pytest.approx(w / (1.0 + w), abs=0.08)
    assert n_acc_disp > 0
    fresh = metropolis.initialize(st, params, cfg, thermo)
    assert float(st.energy.rd) == pytest.approx(
        float(fresh.energy.rd), rel=2e-4, abs=5e-2)
    assert float(st.energy.es_real) == pytest.approx(
        float(fresh.energy.es_real), rel=2e-4, abs=5e-2)


# ---------------------------------------------------------------------------
# In-kernel spinflip in the fused µVT kernel
# ---------------------------------------------------------------------------

def _h2_qrot_uvt(dF=100.0, p_spin=0.5, n_h2=8, coulomb="wolf"):
    """GCMC MOF+H2 with a hand-set slot-order rot_f table (F_para = 0,
    F_ortho = dF) — same controlled-physics setup as _h2_qrot_nvt but
    on the µVT surface (insert/delete/displace/spinflip)."""
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=n_h2, capacity=2 * n_h2, ewald_kmax=3)
    cfg = dataclasses.replace(cfg, coulomb=coulomb, fused_mc=True,
                              quantum_rotation=True)
    thermo = thermo.replace(
        spinflip_probability=jnp.asarray(p_spin, jnp.float32))
    state = metropolis.initialize(state, params, cfg, thermo)
    M = params.mol_species.shape[0]
    rot_f = np.zeros((M, 2), np.float32)
    rot_f[:, 1] = dF
    state = state.replace(rot_f=jnp.asarray(rot_f),
                          spin=jnp.zeros(M, jnp.int32))
    return params, state, cfg, thermo


def test_uvt_spinflip_pure_flip_chunk():
    """p_spin = 1: every µVT step is a spinflip — positions, aliveness,
    S(k) and every energy term must be BIT-identical; only spins and
    the SPINFLIP stats move."""
    params, state, cfg, thermo = _h2_qrot_uvt(dF=50.0, p_spin=1.0,
                                              coulomb="ewald")
    assert mc_kernel.supported_uvt(cfg, params)
    slots = np.asarray(metropolis.uvt_fused_tables(params, cfg)[0])
    alive = np.asarray(state.mol_alive)[slots]
    st = state
    flipped_seen = 0
    for _ in range(3):   # a single chunk end can be all-para (~3.5%)
        st, stats = metropolis.run_chunk_fused_uvt(st, params, cfg,
                                                   thermo, 200)
        np.testing.assert_array_equal(np.asarray(st.pos),
                                      np.asarray(state.pos))
        np.testing.assert_array_equal(np.asarray(st.mol_alive),
                                      np.asarray(state.mol_alive))
        np.testing.assert_array_equal(np.asarray(st.sk_re),
                                      np.asarray(state.sk_re))
        assert float(st.energy.total) == float(state.energy.total)
        att = np.asarray(stats.attempts)
        acc = np.asarray(stats.accepts)
        assert att[metropolis.SPINFLIP] == 200
        assert (att[metropolis.DISPLACE] == att[metropolis.INSERT]
                == att[metropolis.DELETE] == 0)
        assert 0 < acc[metropolis.SPINFLIP] < 200
        flipped_seen += int(np.asarray(st.spin)[slots][alive].sum())
    assert flipped_seen > 0


def test_uvt_spinflip_mixed_bookkeeping():
    """Mixed insert/delete/displace/spinflip µVT chain: accumulated
    per-term deltas must match a recompute of the final configuration,
    attempts partition the chunk, and exchanges really happened."""
    params, state, cfg, thermo = _h2_qrot_uvt(dF=80.0, p_spin=0.25)
    assert mc_kernel.supported_uvt(cfg, params)
    K = 500
    st, stats = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                               thermo, K)
    att = np.asarray(stats.attempts)
    acc = np.asarray(stats.accepts)
    assert att.sum() == K
    assert att[metropolis.SPINFLIP] > 0
    assert acc[metropolis.INSERT] + acc[metropolis.DELETE] > 0
    fresh = metropolis.initialize(st, params, cfg, thermo)
    for term in ("rd", "es_real", "lrc"):
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=5e-2), term


def test_multi_chain_uvt_spinflip_bit_equals_single_chain():
    """Each chain of a C=3 interleaved µVT launch with spinflips must
    reproduce BIT-EXACTLY the single-chain fused GCMC run with the same
    key and ITS OWN rot_f/spin tables."""
    from mpmc_tpu.parallel import multichain
    params, state, cfg, thermo = _h2_qrot_uvt(dF=60.0, p_spin=0.3,
                                              n_h2=4)
    assert mc_kernel.supported_uvt_multi(cfg, params)
    C, K = 3, 150
    states = multichain.stack_states(state, C, seed=6)
    M = params.mol_species.shape[0]
    rng = np.random.default_rng(9)
    rot_c = np.zeros((C, M, 2), np.float32)
    rot_c[:, :, 1] = 30.0 + 70.0 * rng.random((C, M))
    spin_c = (rng.random((C, M)) < 0.5).astype(np.int32)
    states = states.replace(rot_f=jnp.asarray(rot_c),
                            spin=jnp.asarray(spin_c))
    keys = np.asarray(states.key).copy()
    out, stats = metropolis.run_chunk_fused_uvt_multi(states, params,
                                                      cfg, thermo, K)
    att = np.asarray(stats.attempts)
    assert int(att[:, metropolis.SPINFLIP].sum()) > 0
    assert int(att.sum()) == C * K
    for c in range(C):
        single = dataclasses.replace(
            state, key=jnp.asarray(keys[c]),
            rot_f=jnp.asarray(rot_c[c]), spin=jnp.asarray(spin_c[c]))
        ref, rstats = metropolis.run_chunk_fused_uvt(single, params,
                                                     cfg, thermo, K)
        np.testing.assert_array_equal(np.asarray(out.pos)[c],
                                      np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(out.mol_alive)[c],
                                      np.asarray(ref.mol_alive))
        np.testing.assert_array_equal(np.asarray(out.spin)[c],
                                      np.asarray(ref.spin))
        np.testing.assert_array_equal(np.asarray(stats.attempts)[c],
                                      np.asarray(rstats.attempts))
        np.testing.assert_array_equal(np.asarray(stats.accepts)[c],
                                      np.asarray(rstats.accepts))
        for term in ("rd", "es_real", "lrc"):
            assert float(getattr(out.energy, term)[c]) == float(
                getattr(ref.energy, term)), (c, term)


# ---------------------------------------------------------------------------
# Feynman-Hibbs quantum correction in the fused kernels
# ---------------------------------------------------------------------------

def test_fh_gate():
    params, state, cfg, thermo = _fluid(n=32)
    assert mc_kernel.supported(
        dataclasses.replace(cfg, feynman_hibbs=True), params)
    assert mc_kernel.supported(
        dataclasses.replace(cfg, feynman_kleinert=True), params)
    # both quantum corrections are defined on the LJ derivatives only
    assert not mc_kernel.supported(
        dataclasses.replace(cfg, feynman_hibbs=True,
                            rd_potential="none"), params)
    assert not mc_kernel.supported(
        dataclasses.replace(cfg, feynman_kleinert=True,
                            rd_potential="none"), params)


def test_fk_bookkeeping_matches_full_recompute():
    """Fused NVT on 3-site H2 at 77 K with the Feynman-Kleinert
    effective potential: the in-kernel unrolled fixed point is the
    scan path's shared lj.feynman_kleinert_from_derivs, so the
    accumulated deltas must match a recompute of the final
    configuration."""
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=4, n_h2=12, capacity=24, temperature=77.0)
    cfg = dataclasses.replace(cfg, ensemble="nvt", coulomb="wolf",
                              fused_mc=True, feynman_kleinert=True)
    assert mc_kernel.supported(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    st, stats = metropolis.run_chunk_fused(state, params, cfg, thermo,
                                           400)
    assert 0 < int(stats.accepts[0]) < 400
    fresh = metropolis.initialize(st, params, cfg, thermo)
    assert float(st.energy.rd) == pytest.approx(
        float(fresh.energy.rd), rel=2e-4, abs=5e-2)
    # FK actually changes the energy scale vs plain LJ on this system
    cfg0 = dataclasses.replace(cfg, feynman_kleinert=False)
    base = metropolis.initialize(st, params, cfg0, thermo)
    assert abs(float(base.energy.rd) - float(fresh.energy.rd)) > 1.0


@pytest.mark.parametrize("order", [2, 4])
def test_fh_bookkeeping_matches_full_recompute(order):
    """Fused NVT on 3-site H2 at 77 K with FH2/FH4: the in-kernel
    derivative series must reproduce ops/lj.feynman_hibbs exactly
    enough that the accumulated deltas match a scan-path recompute
    of the final configuration (reduced mass incl. the huge frozen-
    framework molecule partner)."""
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=4, n_h2=12, capacity=24, temperature=77.0)
    cfg = dataclasses.replace(cfg, ensemble="nvt", coulomb="wolf",
                              fused_mc=True, feynman_hibbs=True,
                              feynman_hibbs_order=order)
    assert mc_kernel.supported(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    st, stats = metropolis.run_chunk_fused(state, params, cfg, thermo,
                                           400)
    assert 0 < int(stats.accepts[0]) < 400
    fresh = metropolis.initialize(st, params, cfg, thermo)
    assert float(st.energy.rd) == pytest.approx(
        float(fresh.energy.rd), rel=2e-4, abs=5e-2)
    # FH actually changes the energy scale vs plain LJ on this system
    cfg0 = dataclasses.replace(cfg, feynman_hibbs=False)
    base = metropolis.initialize(st, params, cfg0, thermo)
    assert abs(float(base.energy.rd) - float(fresh.energy.rd)) > 1.0


def test_fh_uvt_bookkeeping_matches_full_recompute():
    """Fused GCMC with FH4 at 77 K: insert/delete/displace deltas all
    carry the correction."""
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=4, n_h2=12, capacity=24, temperature=77.0)
    cfg = dataclasses.replace(cfg, fused_mc=True, feynman_hibbs=True,
                              feynman_hibbs_order=4)
    assert mc_kernel.supported_uvt(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    st, stats = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                               thermo, 500)
    acc = np.asarray(stats.accepts)
    assert acc[metropolis.INSERT] + acc[metropolis.DELETE] > 0
    fresh = metropolis.initialize(st, params, cfg, thermo)
    for term in ("rd", "lrc", "es_real", "es_recip"):
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=5e-2), term


# ---------------------------------------------------------------------------
# disp_expansion (PHAHST-style Born-Mayer + damped C6/C8/C10) in the
# fused kernels
# ---------------------------------------------------------------------------

def _dispexp_h2(ensemble="nvt"):
    from mpmc_tpu.state import build_system
    sp = systems.h2_bss3()
    sp = dataclasses.replace(
        sp, c6=np.array([12.0, 0, 0]), c8=np.array([215.0, 0, 0]),
        c10=np.array([4813.0, 0, 0]), eps=np.array([1.2e5, 0, 0]),
        sig=np.array([1.8, 0, 0]))
    cfg = RunConfig(ensemble=ensemble, rd_potential="disp_expansion",
                    coulomb="wolf", rd_lrc=True, dtype="float32",
                    insert_species=(0,) if ensemble == "uvt" else (),
                    fused_mc=True)
    rng = np.random.default_rng(4)
    coms = rng.uniform(2.0, 16.0, (12, 3))
    params, state = build_system(
        np.eye(3) * 18.0, species=(sp,), capacity=(16,),
        initial_counts=(12,),
        initial_pos={0: coms[:, None] + np.asarray(sp.pos)[None]},
        dtype=cfg.jdtype, seed=9)
    thermo = Thermo.make(temperature=150.0, fugacity=(20.0,),
                         insert_probability=0.4, move_factor=0.6,
                         rot_factor=1.0, n_species=1, dtype=cfg.jdtype)
    state = metropolis.initialize(state, params, cfg, thermo)
    return params, state, cfg, thermo


def test_dispexp_gate():
    params, state, cfg, thermo = _dispexp_h2()
    assert mc_kernel.supported(cfg, params)
    assert mc_kernel.supported_uvt(
        dataclasses.replace(cfg, ensemble="uvt", insert_species=(0,)),
        params)
    # FH only defined on top of LJ
    assert not mc_kernel.supported(
        dataclasses.replace(cfg, feynman_hibbs=True), params)
    # the other generic RD potentials share the fused surface
    for rd in ("sg", "dreiding", "b14_7"):
        assert mc_kernel.supported(
            dataclasses.replace(cfg, rd_potential=rd), params), rd


def test_dispexp_nvt_bookkeeping_matches_full_recompute():
    """Fused NVT displace on PHAHST-style H2: the in-kernel Born-Mayer
    + TT-damped dispersion (shared ops/potentials formula) must track
    the scan-path recompute."""
    params, state, cfg, thermo = _dispexp_h2("nvt")
    assert abs(float(state.energy.rd)) > 1e-3
    st, stats = metropolis.run_chunk_fused(state, params, cfg, thermo,
                                           400)
    assert 0 < int(stats.accepts[0]) < 400
    fresh = metropolis.initialize(st, params, cfg, thermo)
    assert float(st.energy.rd) == pytest.approx(
        float(fresh.energy.rd), rel=2e-4, abs=5e-2)
    assert float(st.energy.es_real) == pytest.approx(
        float(fresh.energy.es_real), rel=2e-4, abs=5e-2)


def test_dispexp_uvt_bookkeeping_matches_full_recompute():
    """Fused GCMC on the same system: insert/delete carry the damped
    dispersion and its count-dependent LRC."""
    params, state, cfg, thermo = _dispexp_h2("uvt")
    st, stats = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                               thermo, 500)
    acc = np.asarray(stats.accepts)
    assert acc[metropolis.INSERT] + acc[metropolis.DELETE] > 0
    fresh = metropolis.initialize(st, params, cfg, thermo)
    for term in ("rd", "es_real"):
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=5e-2), term
    # the count-dependent dispersion tail is small here — check it at
    # its own scale (this caught _uvt_chunk_consts dropping the
    # disp_expansion branch from lrc_on)
    assert float(st.energy.lrc) != 0.0
    assert float(st.energy.lrc) == pytest.approx(
        float(fresh.energy.lrc), rel=1e-3, abs=1e-4)


# ---------------------------------------------------------------------------
# Silvera-Goldman / Dreiding / buffered 14-7 in the fused kernels
# ---------------------------------------------------------------------------

def _altrd_h2(rd, ensemble="nvt", **sp_over):
    """3-site H2 fluid on one of the alternative RD potentials (shared
    ops/potentials.rd_pair_energy_generic path in the fused kernels).

    coulomb='cutoff' on purpose: its 1/r formula is identical in both
    paths, so the es term checks at accumulation noise and the rd
    assertions isolate the RD surface under test.  (wolf/ewald mix the
    kernel's A&S-7.1.26 erfc against the scan path's exact erfc — a
    documented ~1.5e-7-absolute implementation mismatch that the SG
    fluid's jammed contacts amplify past the usual tolerance.)"""
    from mpmc_tpu.state import build_system
    sp = systems.h2_bss3()
    if sp_over:
        sp = dataclasses.replace(
            sp, **{k: np.asarray(v) for k, v in sp_over.items()})
    cfg = RunConfig(ensemble=ensemble, rd_potential=rd,
                    coulomb="cutoff", rd_lrc=False, dtype="float32",
                    insert_species=(0,) if ensemble == "uvt" else (),
                    fused_mc=True)
    rng = np.random.default_rng(11)
    coms = rng.uniform(2.0, 16.0, (12, 3))
    params, state = build_system(
        np.eye(3) * 18.0, species=(sp,), capacity=(16,),
        initial_counts=(12,),
        initial_pos={0: coms[:, None] + np.asarray(sp.pos)[None]},
        dtype=cfg.jdtype, seed=3)
    thermo = Thermo.make(temperature=80.0, fugacity=(30.0,),
                         insert_probability=0.4, move_factor=0.5,
                         rot_factor=1.0, n_species=1, dtype=cfg.jdtype)
    state = metropolis.initialize(state, params, cfg, thermo)
    return params, state, cfg, thermo


def _assert_bookkeeping(st, fresh, terms=("rd", "es_real")):
    for term in terms:
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=5e-2), term


@pytest.mark.parametrize("rd,over", [
    ("sg", {}),
    ("dreiding", {"eps": [34.2, 0.0, 0.0], "sig": [3.3, 0.0, 0.0]}),
    ("b14_7", {"eps": [34.2, 0.0, 0.0], "sig": [3.3, 0.0, 0.0]}),
])
def test_altrd_nvt_bookkeeping_matches_full_recompute(rd, over):
    """Fused NVT displace under sg/dreiding/b14_7: the in-kernel
    generic RD formulas must track the scan-path recompute."""
    params, state, cfg, thermo = _altrd_h2(rd, "nvt", **over)
    assert mc_kernel.supported(cfg, params)
    assert abs(float(state.energy.rd)) > 1e-3
    st, stats = metropolis.run_chunk_fused(state, params, cfg, thermo,
                                           400)
    assert 0 < int(stats.accepts[0]) < 400
    fresh = metropolis.initialize(st, params, cfg, thermo)
    _assert_bookkeeping(st, fresh)


def test_sg_uvt_bookkeeping_matches_full_recompute():
    """Fused GCMC on Silvera-Goldman H2: insert/delete carry the
    parameter-free SG pair energy (no LRC — pairs.rd_tile_energy)."""
    params, state, cfg, thermo = _altrd_h2("sg", "uvt")
    assert mc_kernel.supported_uvt(cfg, params)
    st, stats = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                               thermo, 500)
    acc = np.asarray(stats.accepts)
    assert acc[metropolis.INSERT] + acc[metropolis.DELETE] > 0
    fresh = metropolis.initialize(st, params, cfg, thermo)
    _assert_bookkeeping(st, fresh)


# ---------------------------------------------------------------------------
# GWP (Gaussian-wave-packet) coulomb in the fused kernels
# ---------------------------------------------------------------------------

def _gwp_h2(ensemble="nvt"):
    """The golden h2_dispexp_gwp family in f32: disp_expansion RD +
    GWP-smeared charges on a 3-site H2 fluid."""
    from mpmc_tpu.state import build_system
    sp = systems.h2_bss3()
    sp = dataclasses.replace(
        sp, c6=np.array([12.0, 0, 0]), c8=np.array([215.0, 0, 0]),
        c10=np.array([4813.0, 0, 0]), eps=np.array([1.2e5, 0, 0]),
        sig=np.array([1.8, 0, 0]),
        gwp_alpha=np.array([0.3, 0.2, 0.2]))
    cfg = RunConfig(ensemble=ensemble, rd_potential="disp_expansion",
                    coulomb="gwp", rd_lrc=False, dtype="float32",
                    insert_species=(0,) if ensemble == "uvt" else (),
                    fused_mc=True)
    rng = np.random.default_rng(4)
    coms = rng.uniform(2.0, 16.0, (12, 3))
    params, state = build_system(
        np.eye(3) * 18.0, species=(sp,), capacity=(16,),
        initial_counts=(12,),
        initial_pos={0: coms[:, None] + np.asarray(sp.pos)[None]},
        dtype=cfg.jdtype, seed=9)
    thermo = Thermo.make(temperature=120.0, fugacity=(20.0,),
                         insert_probability=0.4, move_factor=0.6,
                         rot_factor=1.0, n_species=1, dtype=cfg.jdtype)
    state = metropolis.initialize(state, params, cfg, thermo)
    return params, state, cfg, thermo


def test_gwp_gate_and_nvt_bookkeeping():
    params, state, cfg, thermo = _gwp_h2("nvt")
    assert mc_kernel.supported(cfg, params)
    assert abs(float(state.energy.es_real)) > 1e-3
    st, stats = metropolis.run_chunk_fused(state, params, cfg, thermo,
                                           400)
    assert 0 < int(stats.accepts[0]) < 400
    fresh = metropolis.initialize(st, params, cfg, thermo)
    assert float(st.energy.rd) == pytest.approx(
        float(fresh.energy.rd), rel=2e-4, abs=5e-2)
    assert float(st.energy.es_real) == pytest.approx(
        float(fresh.energy.es_real), rel=2e-4, abs=5e-2)


def test_gwp_uvt_bookkeeping():
    params, state, cfg, thermo = _gwp_h2("uvt")
    assert mc_kernel.supported_uvt(cfg, params)
    st, stats = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                               thermo, 500)
    acc = np.asarray(stats.accepts)
    assert acc[metropolis.INSERT] + acc[metropolis.DELETE] > 0
    fresh = metropolis.initialize(st, params, cfg, thermo)
    for term in ("rd", "es_real"):
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=5e-2), term


# ---------------------------------------------------------------------------
# Chain-interleaved multi-chain fused NVT (run_steps_multi)
# ---------------------------------------------------------------------------

def _multi_states(state, params, cfg, thermo, C, seed=5):
    from mpmc_tpu.parallel import multichain
    states = multichain.stack_states(state, C, seed=seed)
    return states


@pytest.mark.parametrize("coulomb,extra", [
    ("none", {}),
    ("ewald", {}),
    # FK adds the ROW_MOLMASS plane, sg swaps the RD formula — both
    # change the per-chain plane layout/physics the interleave stacks
    ("wolf", {"feynman_kleinert": True}),
    ("none", {"rd_potential": "sg"}),
])
def test_multi_chain_bit_equals_single_chain(coulomb, extra):
    """Each chain of a C=3 interleaved launch must reproduce BIT-EXACTLY
    the single-chain fused path run with the same key — the interleave
    only reorders independent work."""
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=6, capacity=6, ewald_kmax=3)
    cfg = dataclasses.replace(cfg, ensemble="nvt", coulomb=coulomb,
                              fused_mc=True, **extra)
    assert mc_kernel.supported_multi(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    C, K = 3, 80
    states = _multi_states(state, params, cfg, thermo, C)
    keys = np.asarray(states.key).copy()
    out, stats = metropolis.run_chunk_fused_multi(states, params, cfg,
                                                  thermo, K)
    assert int(np.asarray(stats.attempts)[:, metropolis.DISPLACE].sum()
               ) == C * K
    moved = 0
    for c in range(C):
        single = dataclasses.replace(state, key=jnp.asarray(keys[c]))
        ref, rstats = metropolis.run_chunk_fused(single, params, cfg,
                                                 thermo, K)
        np.testing.assert_array_equal(np.asarray(out.pos)[c],
                                      np.asarray(ref.pos)), c
        assert (int(np.asarray(stats.accepts)[c, metropolis.DISPLACE])
                == int(np.asarray(rstats.accepts)[metropolis.DISPLACE]))
        assert float(out.energy.rd[c]) == float(ref.energy.rd)
        if coulomb == "ewald":
            np.testing.assert_array_equal(np.asarray(out.sk_re)[c],
                                          np.asarray(ref.sk_re))
            assert float(out.energy.es_recip[c]) == float(
                ref.energy.es_recip)
        moved += float(np.abs(np.asarray(out.pos)[c]
                              - np.asarray(state.pos)).max())
    assert moved > 0.0


def test_multi_chain_pt_ladder_betas():
    """thermo_batched: per-chain temperatures — each chain must equal a
    single-chain run at ITS temperature (the per-chain beta plumbing)."""
    import dataclasses as dc
    from mpmc_tpu.parallel import replica
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=6, capacity=6)
    cfg = dc.replace(cfg, ensemble="nvt", coulomb="wolf", fused_mc=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    C, K = 4, 60
    temps = replica.geometric_ladder(80.0, 400.0, C)
    states = _multi_states(state, params, cfg, thermo, C, seed=11)
    keys = np.asarray(states.key).copy()
    thermos = replica.stack_thermo(thermo, temps, cfg.jdtype)
    out, stats = metropolis.run_chunk_fused_multi(
        states, params, cfg, thermos, K, thermo_batched=True)
    accs = np.asarray(stats.accepts)[:, metropolis.DISPLACE]
    for c in range(C):
        single = dataclasses.replace(state, key=jnp.asarray(keys[c]))
        th = dc.replace(thermo, temperature=jnp.asarray(temps[c],
                                                        cfg.jdtype))
        ref, _ = metropolis.run_chunk_fused(single, params, cfg, th, K)
        np.testing.assert_array_equal(np.asarray(out.pos)[c],
                                      np.asarray(ref.pos))
    # hotter replicas accept at least as often on average (loose sanity)
    assert accs.sum() > 0


def test_multi_chain_spinflip_bit_equals_single_chain():
    """Each chain of a C=3 interleaved launch with quantum-rotation
    spinflips must reproduce BIT-EXACTLY the single-chain fused path
    run with the same key and ITS OWN rot_f/spin tables — the
    per-chain 3-row rot groups are chain state like S(k)."""
    params, state, cfg, thermo = _h2_qrot_nvt(dF=80.0, p_spin=0.3)
    assert mc_kernel.supported_multi(cfg, params)
    C, K = 3, 120
    states = _multi_states(state, params, cfg, thermo, C)
    M = params.mol_species.shape[0]
    rng = np.random.default_rng(3)
    rot_c = np.zeros((C, M, 2), np.float32)
    rot_c[:, :, 1] = 40.0 + 60.0 * rng.random((C, M))
    spin_c = (rng.random((C, M)) < 0.5).astype(np.int32)
    states = states.replace(rot_f=jnp.asarray(rot_c),
                            spin=jnp.asarray(spin_c))
    keys = np.asarray(states.key).copy()
    out, stats = metropolis.run_chunk_fused_multi(states, params, cfg,
                                                  thermo, K)
    att = np.asarray(stats.attempts)
    acc = np.asarray(stats.accepts)
    assert int(att[:, metropolis.SPINFLIP].sum()) > 0
    assert (att[:, metropolis.DISPLACE]
            + att[:, metropolis.SPINFLIP] == K).all()
    for c in range(C):
        single = dataclasses.replace(
            state, key=jnp.asarray(keys[c]),
            rot_f=jnp.asarray(rot_c[c]), spin=jnp.asarray(spin_c[c]))
        ref, rstats = metropolis.run_chunk_fused(single, params, cfg,
                                                 thermo, K)
        np.testing.assert_array_equal(np.asarray(out.pos)[c],
                                      np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(out.spin)[c],
                                      np.asarray(ref.spin))
        np.testing.assert_array_equal(acc[c], np.asarray(rstats.accepts))
        assert float(out.energy.rd[c]) == float(ref.energy.rd)


@pytest.mark.parametrize("coulomb", ["wolf", "ewald"])
def test_multi_chain_uvt_bit_equals_single_chain(coulomb):
    """Each chain of a C=3 interleaved µVT launch must reproduce
    BIT-EXACTLY the single-chain fused GCMC run with the same key —
    positions, aliveness, per-term energies, stats, and committed
    S(k)."""
    from mpmc_tpu.parallel import multichain
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=4, capacity=8, ewald_kmax=3)
    cfg = dataclasses.replace(cfg, coulomb=coulomb, fused_mc=True)
    assert mc_kernel.supported_uvt_multi(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    C, K = 3, 120
    states = multichain.stack_states(state, C, seed=6)
    keys = np.asarray(states.key).copy()
    out, stats = metropolis.run_chunk_fused_uvt_multi(states, params,
                                                      cfg, thermo, K)
    exch = 0
    for c in range(C):
        single = dataclasses.replace(state, key=jnp.asarray(keys[c]))
        ref, rstats = metropolis.run_chunk_fused_uvt(single, params,
                                                     cfg, thermo, K)
        np.testing.assert_array_equal(np.asarray(out.pos)[c],
                                      np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(out.mol_alive)[c],
                                      np.asarray(ref.mol_alive))
        for term in ("rd", "es_real", "es_recip", "es_self", "es_excl",
                     "lrc"):
            assert float(getattr(out.energy, term)[c]) == float(
                getattr(ref.energy, term)), (c, term)
        np.testing.assert_array_equal(np.asarray(stats.attempts)[c],
                                      np.asarray(rstats.attempts))
        np.testing.assert_array_equal(np.asarray(stats.accepts)[c],
                                      np.asarray(rstats.accepts))
        if coulomb == "ewald":
            np.testing.assert_array_equal(np.asarray(out.sk_re)[c],
                                          np.asarray(ref.sk_re))
        exch += int(np.asarray(rstats.accepts)[metropolis.INSERT]
                    + np.asarray(rstats.accepts)[metropolis.DELETE])
    assert exch > 0     # the comparison actually covered exchanges


def test_multi_chain_uvt_pt_ladder_betas():
    """µVT thermo_batched: per-chain betas — each chain of the
    interleaved GCMC launch must BIT-EXACTLY equal a single-chain fused
    GCMC run at ITS temperature with the same key (beta enters only the
    acceptance and the ln(beta f V/(N+1)) weight; fugacities shared)."""
    import dataclasses as dc
    from mpmc_tpu.parallel import multichain, replica
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=4, capacity=8, ewald_kmax=3)
    cfg = dc.replace(cfg, coulomb="ewald", fused_mc=True)
    assert mc_kernel.supported_uvt_multi(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    C, K = 3, 120
    temps = replica.geometric_ladder(70.0, 220.0, C)
    states = multichain.stack_states(state, C, seed=13)
    keys = np.asarray(states.key).copy()
    thermos = replica.stack_thermo(thermo, temps, cfg.jdtype)
    out, stats = metropolis.run_chunk_fused_uvt_multi(
        states, params, cfg, thermos, K, thermo_batched=True)
    exch = 0
    for c in range(C):
        single = dataclasses.replace(state, key=jnp.asarray(keys[c]))
        th = dc.replace(thermo, temperature=jnp.asarray(temps[c],
                                                        cfg.jdtype))
        ref, rstats = metropolis.run_chunk_fused_uvt(single, params,
                                                     cfg, th, K)
        np.testing.assert_array_equal(np.asarray(out.pos)[c],
                                      np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(out.mol_alive)[c],
                                      np.asarray(ref.mol_alive))
        for term in ("rd", "es_real", "es_recip", "es_self", "es_excl",
                     "lrc"):
            assert float(getattr(out.energy, term)[c]) == float(
                getattr(ref.energy, term)), (c, term)
        exch += int(np.asarray(rstats.accepts)[metropolis.INSERT]
                    + np.asarray(rstats.accepts)[metropolis.DELETE])
    assert exch > 0


def test_multi_chain_uvt_fugacity_ladder_lnfv():
    """µVT thermo_batched with per-chain FUGACITIES (fixed-T fugacity-
    ladder PT): each chain of the interleaved GCMC launch must
    BIT-EXACTLY equal a single-chain fused GCMC run at ITS fugacity
    with the same key — fugacity enters only the insert/delete
    acceptance via the per-chain ln(f_s V) scal rows
    (mc_kernel.run_steps_uvt_multi lnfvs)."""
    import dataclasses as dc
    from mpmc_tpu.parallel import multichain, replica
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=4, capacity=8, ewald_kmax=3)
    cfg = dc.replace(cfg, coulomb="ewald", fused_mc=True)
    assert mc_kernel.supported_uvt_multi(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    C, K = 3, 120
    base = np.asarray(thermo.fugacity, np.float64)
    fug_rows = np.geomspace(1.0, 8.0, C)[:, None] * base[None, :]
    states = multichain.stack_states(state, C, seed=17)
    keys = np.asarray(states.key).copy()
    thermos = replica.stack_thermo_fugacity(thermo, fug_rows, cfg.jdtype)
    out, stats = metropolis.run_chunk_fused_uvt_multi(
        states, params, cfg, thermos, K, thermo_batched=True)
    exch = 0
    n_final = []
    for c in range(C):
        single = dataclasses.replace(state, key=jnp.asarray(keys[c]))
        th = dc.replace(thermo, fugacity=jnp.asarray(fug_rows[c],
                                                     cfg.jdtype))
        ref, rstats = metropolis.run_chunk_fused_uvt(single, params,
                                                     cfg, th, K)
        np.testing.assert_array_equal(np.asarray(out.pos)[c],
                                      np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(out.mol_alive)[c],
                                      np.asarray(ref.mol_alive))
        for term in ("rd", "es_real", "es_recip", "es_self", "es_excl",
                     "lrc"):
            assert float(getattr(out.energy, term)[c]) == float(
                getattr(ref.energy, term)), (c, term)
        exch += int(np.asarray(rstats.accepts)[metropolis.INSERT]
                    + np.asarray(rstats.accepts)[metropolis.DELETE])
        n_final.append(int(np.asarray(ref.mol_alive).sum()))
    assert exch > 0     # the comparison actually covered exchanges
    # the 8x fugacity spread must actually differentiate the chains
    assert len(set(n_final)) > 1 or exch > 0


def test_fused_pt_multi_uvt_round():
    """One-launch µVT PT: the driver runs, swaps temperatures within
    the ladder set, conserves the ladder as a multiset, and leaves every
    replica's accumulated energy equal to a from-scratch recompute."""
    from mpmc_tpu.parallel import multichain, replica
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=4, capacity=8, ewald_kmax=3, corrtime=100)
    cfg = dataclasses.replace(cfg, coulomb="ewald", fused_mc=True)
    R = 4
    temps = replica.geometric_ladder(70.0, 220.0, R)
    states, final_ts, n_acc = replica.run_parallel_tempering_fused_multi(
        params, state, cfg, thermo, temps, n_rounds=3,
        steps_per_round=60, seed=3)
    np.testing.assert_allclose(np.sort(final_ts), np.sort(temps),
                               rtol=1e-6)
    assert n_acc >= 0
    thermos = replica.stack_thermo(
        thermo, np.asarray(final_ts), cfg.jdtype)
    fresh = multichain.initialize_batched(states, params, cfg, thermos,
                                          thermo_batched=True)
    np.testing.assert_allclose(np.asarray(states.energy.total),
                               np.asarray(fresh.energy.total),
                               rtol=2e-4, atol=5e-2)


def test_multi_chain_uvt_cavity_bias_bit_equals_single_chain():
    """Per-chain cavity-bias plumbing: chains whose positions (and
    therefore open-cell grids) have DIVERGED must each reproduce the
    single-chain fused GCMC run from the same per-chain state —
    per-chain cav planes and n_open/ln-correction lanes."""
    from mpmc_tpu.parallel import multichain
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=4, capacity=16)
    # grid 4 / radius 2.0 on the 12 A 4-A-lattice box: the open cells
    # are the genuine pore centers (~40% open) — finer grids put every
    # cell center within 2 A of a framework atom and n_open = 0 would
    # hard-reject every insert, covering nothing
    cfg = dataclasses.replace(cfg, coulomb="wolf", fused_mc=True,
                              cavity_bias=True, cavity_grid=4,
                              cavity_radius=2.0)
    # 10x fugacity: at the builder's 1 atm exchange accepts are ~1%
    # and 3 chains x 120 steps can see none (capacity 16 keeps the
    # pool from saturating, which would also freeze exchanges)
    thermo = dataclasses.replace(thermo,
                                 fugacity=thermo.fugacity * 10.0)
    assert mc_kernel.supported_uvt_multi(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    C = 3
    states = multichain.stack_states(state, C, seed=9)
    # diverge the chains, then refresh per-chain grids at a corrtime
    # boundary exactly like the run loop does
    states, _ = metropolis.run_chunk_fused_uvt_multi(states, params,
                                                     cfg, thermo, 60)
    states = multichain.initialize_batched(states, params, cfg, thermo)
    grids = np.asarray(states.cavity_open)
    assert grids.any(axis=(1,)).all()   # every chain has open cells
    assert not (grids[0] == grids[1]).all() or not (
        grids[0] == grids[2]).all()     # grids actually differ
    K = 120
    out, stats = metropolis.run_chunk_fused_uvt_multi(states, params,
                                                      cfg, thermo, K)
    exch = 0
    for c in range(C):
        single = jax.tree_util.tree_map(lambda x: x[c], states)
        ref, rstats = metropolis.run_chunk_fused_uvt(single, params,
                                                     cfg, thermo, K)
        np.testing.assert_array_equal(np.asarray(out.pos)[c],
                                      np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(out.mol_alive)[c],
                                      np.asarray(ref.mol_alive))
        np.testing.assert_array_equal(np.asarray(stats.accepts)[c],
                                      np.asarray(rstats.accepts))
        exch += int(np.asarray(rstats.accepts)[metropolis.INSERT]
                    + np.asarray(rstats.accepts)[metropolis.DELETE])
    assert exch > 0


def test_multi_chain_uvt_multisorbate_gate_and_run():
    from mpmc_tpu.parallel import multichain
    params, state, cfg, thermo = systems.mof_h2_ch4_gcmc(
        n_side=3, n_h2=2, n_ch4=2, capacity=4)
    cfg = dataclasses.replace(cfg, coulomb="wolf", fused_mc=True)
    assert mc_kernel.supported_uvt_multi(cfg, params)
    # cavity bias is part of the multi surface too (per-chain planes)
    assert mc_kernel.supported_uvt_multi(
        dataclasses.replace(cfg, cavity_bias=True), params)
    state = metropolis.initialize(state, params, cfg, thermo)
    states = multichain.stack_states(state, 2, seed=3)
    keys = np.asarray(states.key).copy()
    out, stats = metropolis.run_chunk_fused_uvt_multi(states, params,
                                                      cfg, thermo, 150)
    for c in range(2):
        single = dataclasses.replace(state, key=jnp.asarray(keys[c]))
        ref, _ = metropolis.run_chunk_fused_uvt(single, params, cfg,
                                                thermo, 150)
        np.testing.assert_array_equal(np.asarray(out.pos)[c],
                                      np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(out.mol_alive)[c],
                                      np.asarray(ref.mol_alive))


def test_run_dispatch_chains_uses_multi_kernel(tmp_path):
    """CLI-level: ``chains N`` + ``fused_mc`` dispatches to the
    chain-interleaved multi kernel (log line) and runs end-to-end."""
    import io

    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    pqr = tmp_path / "ar.pqr"
    lines = []
    rng = np.random.default_rng(0)
    for k in range(20):
        x, y, z = rng.uniform(0.5, 11.5, 3)
        lines.append(f"ATOM {k+1} Ar AR {k+1} M {x:.3f} {y:.3f} {z:.3f}"
                     " 39.948 0.0 0.0 119.8 3.405")
    pqr.write_text("\n".join(lines) + "\nEND\n")
    job = input_script.parse(f"""
ensemble nvt
numsteps 200
corrtime 100
temperature 150
basis1 12 0 0
basis2 0 12 0
basis3 0 0 12
coulomb off
chains 3
fused_mc on
pqr_input {pqr}
""")
    log = io.StringIO()
    _, avgs = run_mod.run(job, log=log)
    out = log.getvalue()
    assert "chain-interleaved multi-chain kernel (C=3)" in out
    assert "WARNING" not in out
    assert avgs.count() == 2


# ---------------------------------------------------------------------------
# NVE (Ray microcanonical) on the fused kernel
# ---------------------------------------------------------------------------

def _nve_fluid(n=48, k0_per_atom=180.0):
    params, state, cfg, thermo = systems.lj_fluid(n=n, dtype="float32")
    cfg = dataclasses.replace(cfg, ensemble="nve", fused_mc=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    e_total = float(state.energy.total) + k0_per_atom * n
    thermo = thermo.replace(
        nve_energy=jnp.asarray(e_total, cfg.jdtype))
    return params, state, cfg, thermo


def test_nve_gate():
    params, state, cfg, thermo = _nve_fluid()
    assert mc_kernel.supported(cfg, params)
    assert not mc_kernel.supported_multi(cfg, params)
    assert not mc_kernel.supported(
        dataclasses.replace(cfg, quantum_rotation=True), params)


def test_nve_matches_jnp_reference_trajectory():
    """Bit-level NVE trajectory check against a numpy reference with
    the kinetic-reservoir bookkeeping — wrong K carry, exponent, or
    positivity guard would desynchronize the acceptances."""
    params, state, cfg, thermo = _nve_fluid(n=32)
    from mpmc_tpu.ops import pairs
    rc = pairs.derived_cutoff(state.box, cfg)
    n_steps = 150
    key = jax.random.PRNGKey(11)
    u = np.asarray(mc_kernel.draw_uniforms(key, n_steps))
    mov, mova, a_max, _slots = mc_kernel.movable_mols(
        params, np.asarray(state.mol_alive))
    k0 = float(thermo.nve_energy) - float(state.energy.total)
    g = 1.5 * 32 - 1.0
    new_pos, d_rd, _, _, n_acc, _, _, _, _, _ = mc_kernel.run_steps(
        state.pos, params.eps, params.sig, params.charge, params.mass,
        state.atom_alive(params), mov, mova, state.box, rc, 0.0,
        1.0 / float(thermo.temperature), float(thermo.move_factor), 0.0,
        0.0, u, cfg, n_steps, state.pos.shape[0], a_max=a_max,
        interpret=True, nve_k0=k0, nve_g=g)

    pos = np.asarray(state.pos, np.float32).copy()
    alive = np.asarray(state.atom_alive(params))
    eps = np.asarray(params.eps, np.float32)
    sig = np.asarray(params.sig, np.float32)
    box = np.asarray(state.box, np.float32)
    binv = np.linalg.inv(box)
    mf = np.float32(thermo.move_factor)
    rcf = np.float32(rc)
    k_cur = np.float32(k0)
    g32 = np.float32(g)
    acc_n = 0
    for k in range(n_steps):
        m = min(int(u[k, 0] * len(mov)), len(mov) - 1)
        i = int(mov[m])
        old = pos[i].copy()
        new = old + (2.0 * u[k, 1:4] - 1.0) * mf

        def e_of(center):
            d = center[None, :] - pos
            fr = d @ binv
            fr -= np.round(fr)
            dr = fr @ box
            r2 = np.sum(dr * dr, 1)
            ok = alive & (np.arange(len(pos)) != i) & (r2 < rcf * rcf)
            r2s = np.where(r2 > 1e-12, r2, 1.0)
            s2 = (0.5 * (sig[i] + sig)) ** 2 / r2s
            s6 = s2 ** 3
            e = 4.0 * np.sqrt(eps[i]) * np.sqrt(eps) * s6 * (s6 - 1.0)
            return np.sum(np.where(ok, e, 0.0))

        du = np.float32(e_of(new) - e_of(old))
        k_new = k_cur - du
        ln_acc = g32 * (np.log(max(k_new, 1e-30))
                        - np.log(max(k_cur, 1e-30)))
        if (k_new > 0 and k_cur > 0
                and np.log(max(u[k, 4], 1e-38)) < ln_acc):
            pos[i] = new
            k_cur = k_new
            acc_n += 1
    assert int(n_acc) == acc_n
    assert float(np.abs(np.asarray(new_pos) - pos).max()) < 1e-4


def test_nve_bookkeeping_and_reservoir_consistency():
    """After a fused NVE chunk the delta-accumulated U must match a
    recompute, so K = E_total - U stays exact by construction; and the
    chain must move without exhausting the reservoir."""
    params, state, cfg, thermo = _nve_fluid(n=48)
    st, stats = metropolis.run_chunk_fused(state, params, cfg, thermo,
                                           400)
    assert 0 < int(stats.accepts[0]) < 400
    fresh = metropolis.initialize(st, params, cfg, thermo)
    assert float(st.energy.rd) == pytest.approx(
        float(fresh.energy.rd), rel=2e-4, abs=2e-2)
    k_end = float(thermo.nve_energy) - float(fresh.energy.total)
    assert k_end > 0.0


# ---------------------------------------------------------------------------
# Overflowing rejected trials must not poison the accumulators
# ---------------------------------------------------------------------------

def test_uvt_overlap_insert_keeps_accumulators_finite():
    """A crafted µVT insert 1e-4 A from an existing atom overflows the
    f32 LJ sum to inf; the step must reject AND the returned energy
    sums must stay finite (the af-multiply form turned 0*inf into NaN
    and poisoned every later step of the chunk)."""
    from mpmc_tpu.state import build_system
    sp = systems.lj_atom()
    cfg = RunConfig(ensemble="uvt", rd_potential="lj", coulomb="none",
                    rd_lrc=False, dtype="float32", insert_species=(0,),
                    fused_mc=True)
    params, state = build_system(
        np.eye(3) * 10.0, species=(sp,), capacity=(2,),
        initial_counts=(1,),
        initial_pos={0: np.array([[[5.0, 5.0, 5.0]]])},
        dtype=cfg.jdtype, seed=0)
    u = np.zeros((1, 16), np.float32)
    u[0, 8] = 0.0                       # < p_half -> insert move
    u[0, 0] = 0.0                       # free-slot rank 0
    u[0, 1:4] = [0.5 + 1e-5, 0.5, 0.5]  # COM 1e-4 A from the atom
    u[0, 4] = 0.5                       # coin (inf du rejects anyway)
    slots, start, spidx, A_list = mc_kernel.movable_slots(params, (0,))
    one = np.zeros((1,), np.float32)
    new_pos, slot_alive, sums, _, _, _, _ = mc_kernel.run_steps_uvt(
        state.pos, params.eps, params.sig, params.charge, params.mass,
        state.atom_alive(params), start, spidx,
        np.asarray(state.mol_alive)[np.asarray(slots)],
        np.zeros((1, 1, 3), np.float32), state.box, 4.9, 0.0,
        1.0 / 120.0, 0.5, 0.0, 0.0, 1.0,
        one + 5.0, one, one, one, np.zeros((1, 1), np.float32),
        jnp.asarray(u), cfg, 1, state.pos.shape[0], A_list=A_list,
        interpret=True)
    s = np.asarray(sums)
    assert np.isfinite(s).all(), s
    assert s[7] == 0.0          # the overlapping insert was rejected
    assert s[10] == 1.0         # and it was attempted


def test_nvt_overlap_trial_keeps_accumulators_finite():
    """Same hazard on the NVT kernel: a crafted displacement landing
    1e-4 A from another atom must reject with finite sums."""
    from mpmc_tpu.state import build_system
    sp = systems.lj_atom()
    cfg = RunConfig(ensemble="nvt", rd_potential="lj", coulomb="none",
                    rd_lrc=False, dtype="float32", fused_mc=True)
    params, state = build_system(
        np.eye(3) * 10.0, species=(sp,), capacity=(2,),
        initial_counts=(2,),
        initial_pos={0: np.array([[[5.0, 5.0, 5.0]],
                                  [[5.0, 5.0, 6.0]]])},
        dtype=cfg.jdtype, seed=0)
    u = np.zeros((1, 8), np.float32)
    u[0, 0] = 0.9                       # pick molecule 1 (at z=6)
    # disp = (2u-1)*mf with mf=1: dz = -(1 - 1e-4) -> lands 1e-4 away
    u[0, 1:4] = [0.5, 0.5, 0.5 * 1e-4]
    u[0, 4] = 0.5
    mov, mova, a_max, _ = mc_kernel.movable_mols(
        params, np.asarray(state.mol_alive))
    out = mc_kernel.run_steps(
        state.pos, params.eps, params.sig, params.charge, params.mass,
        state.atom_alive(params), mov, mova, state.box, 4.9, 0.0,
        1.0 / 120.0, 1.0, 0.0, 0.0, jnp.asarray(u), cfg, 1,
        state.pos.shape[0], a_max=a_max, interpret=True)
    new_pos, d_rd, d_es, d_rec, n_acc = out[0], out[1], out[2], out[3], out[4]
    for v in (d_rd, d_es, d_rec):
        assert np.isfinite(float(v)), (d_rd, d_es, d_rec)
    assert float(n_acc) == 0.0
    np.testing.assert_array_equal(np.asarray(new_pos),
                                  np.asarray(state.pos, np.float32))


# --------------------------------------------------------------------------
# TMMC in the fused µVT kernel (r2 verdict item 2)


def _ideal_gas_uvt_tmmc(target_n=8.0, cap=40, n0=5, bias=False):
    from helpers import atom_species

    from mpmc_tpu.constants import ATM2K_A3
    from mpmc_tpu.state import build_system

    L, T = 20.0, 300.0
    f_atm = target_n * T / L ** 3 / ATM2K_A3
    sp = atom_species("He", eps=0.0, sig=0.0, charge=0.0, mass=4.0)
    params, state = build_system(L * np.eye(3), species=(sp,),
                                 capacity=(cap,), initial_counts=(n0,),
                                 dtype=jnp.float32, seed=11)
    cfg = RunConfig(ensemble="uvt", rd_potential="none", coulomb="none",
                    rd_lrc=False, dtype="float32", insert_species=(0,),
                    fused_mc=True, tmmc=True, tmmc_bias=bias)
    thermo = Thermo.make(temperature=T, fugacity=(f_atm,),
                         insert_probability=0.5, move_factor=1.0,
                         rot_factor=0.1, n_species=1, dtype=jnp.float32)
    state = metropolis.initialize(state, params, cfg, thermo)
    fv_kt = f_atm * ATM2K_A3 * L ** 3 / T
    return params, state, cfg, thermo, fv_kt


def test_uvt_tmmc_fused_gate():
    params, state, cfg, thermo, _ = _ideal_gas_uvt_tmmc()
    assert mc_kernel.supported_uvt(cfg, params)
    # NVT/NPT fused paths still refuse tmmc (µVT-only collection)
    assert not mc_kernel.supported(
        dataclasses.replace(cfg, ensemble="nvt", insert_species=()),
        params)


def test_uvt_tmmc_fused_ideal_gas_rows_exact():
    """In-kernel collection on the ideal gas: each resolved row's mean
    acceptance probability equals the analytic a_ins(N) / a_del(N)
    (deterministic functions of N alone), so the fused collection is
    exact up to f32 accumulation — the scan path's exactness contract
    (test_tmmc_ideal_gas_lnpi_exact) carried onto the kernel."""
    params, state, cfg, thermo, fv_kt = _ideal_gas_uvt_tmmc()
    st, stats = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                               thermo, 3000)
    c = np.asarray(st.tmmc_c, np.float64)
    att = np.asarray(stats.attempts)
    # every insert/delete attempt landed in exactly one counter row
    assert c[:, 0].sum() == att[metropolis.INSERT]
    assert c[:, 2].sum() == att[metropolis.DELETE]
    assert att[metropolis.INSERT] + att[metropolis.DELETE] > 1000
    for n in range(c.shape[0]):
        if c[n, 0] > 0:
            a = min(1.0, fv_kt / (n + 1.0))
            assert c[n, 1] / c[n, 0] == pytest.approx(a, rel=5e-5), n
        if c[n, 2] > 0 and n > 0:
            a = min(1.0, n / fv_kt)
            assert c[n, 3] / c[n, 2] == pytest.approx(a, rel=5e-5), n
    from mpmc_tpu.analyze import tmmc_lnpi
    lnpi = tmmc_lnpi(c)
    idx = np.flatnonzero(np.isfinite(lnpi))
    assert idx.size >= 6
    for i in idx[:-1]:
        expect = np.log(fv_kt / (i + 1.0))
        assert lnpi[i + 1] - lnpi[i] == pytest.approx(expect, abs=1e-4)


def test_uvt_tmmc_fused_multi_bit_equals_single_chain():
    """Each chain of a C=2 interleaved tmmc launch must produce the
    BIT-exact collection delta of the single-chain kernel driven with
    that chain's uniform block."""
    from mpmc_tpu.ops.pallas.mc_kernel import draw_uniforms

    params, state, cfg, thermo, _ = _ideal_gas_uvt_tmmc()
    slots, slot_start, species_idx, tmpl, A_list, rep_slots = (
        metropolis.uvt_fused_tables(params, cfg))
    C, K = 2, 300
    key = jax.random.PRNGKey(7)
    u = jnp.concatenate([draw_uniforms(jax.random.fold_in(key, c), K,
                                       lanes=16) for c in range(C)])
    alive_at = state.atom_alive(params)
    common = dict(cfg=cfg, n_steps=K, n_real=state.pos.shape[0],
                  A_list=A_list, interpret=True)
    singles = []
    for c in range(C):
        out = mc_kernel.run_steps_uvt(
            state.pos, params.eps, params.sig, params.charge,
            params.mass, alive_at, slot_start, species_idx,
            state.mol_alive[slots], tmpl, state.box, 9.0, 0.0,
            1.0 / 300.0, 1.0, 0.1, 0.0, 0.5,
            jnp.log(jnp.asarray([800.0], jnp.float32)),
            jnp.zeros((1,), jnp.float32), jnp.zeros((1,), jnp.float32),
            jnp.zeros((1,), jnp.float32),
            jnp.zeros((1, 1), jnp.float32),
            u[c * K:(c + 1) * K], **common)
        singles.append(np.asarray(out[6]))
    outs = mc_kernel.run_steps_uvt_multi(
        jnp.stack([state.pos] * C), params.eps, params.sig,
        params.charge, params.mass, jnp.stack([alive_at] * C),
        slot_start, species_idx, jnp.stack([state.mol_alive[slots]] * C),
        tmpl, state.box, 9.0, 0.0, 1.0 / 300.0, 1.0, 0.1, 0.0, 0.5,
        jnp.log(jnp.asarray([800.0], jnp.float32)),
        jnp.zeros((1,), jnp.float32), jnp.zeros((1,), jnp.float32),
        jnp.zeros((1,), jnp.float32), jnp.zeros((1, 1), jnp.float32),
        u, **common)
    d_tm = np.asarray(outs[6])
    for c in range(C):
        np.testing.assert_array_equal(d_tm[c], singles[c])
    assert d_tm.sum() > 0


def test_uvt_tmmc_bias_fused_shifts_walker_not_estimator():
    """cfg.tmmc_bias in-kernel: an η table favoring high N must drag
    the walker above the unbiased Poisson mean, while the COLLECTED
    per-row acceptance probabilities stay the unbiased analytic values
    (bias moves the walker, never the estimator)."""
    params, state, cfg, thermo, fv_kt = _ideal_gas_uvt_tmmc(bias=True)
    # acceptance gains η(N') − η(N) (scan-path rule): an η INCREASING
    # in N rewards inserts — tilted stationary dist Π(N)e^{0.9N},
    # a Poisson with λ' = 8·e^0.9 ≈ 19.7
    eta = 0.9 * np.arange(41, dtype=np.float64)
    thermo_b = thermo.replace(
        tmmc_eta=jnp.asarray(eta, cfg.jdtype))
    st, _ = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                           thermo_b, 2500)
    n_end = int(np.asarray(st.mol_alive).sum())
    assert n_end > 13        # unbiased Poisson mean is 8, sd ~2.8
    c = np.asarray(st.tmmc_c, np.float64)
    for n in range(c.shape[0]):
        if c[n, 0] > 0:
            a = min(1.0, fv_kt / (n + 1.0))
            assert c[n, 1] / c[n, 0] == pytest.approx(a, rel=5e-5), n


# --------------------------------------------------------------------------
# Fused polar delayed acceptance (r2 verdict item 1, route b)


def _polar_mof(n_side=3, n_h2=6, capacity=10):
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=n_side, n_h2=n_h2, capacity=capacity, polarization=True)
    cfg = dataclasses.replace(cfg, polar_delayed=True, fused_mc=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    return params, state, cfg, thermo


def test_pda_gate():
    params, state, cfg, thermo = _polar_mof()
    assert mc_kernel.supported_uvt_polar_da(cfg, params)
    # full-SCF (no delayed acceptance) stays on the scan path
    assert not mc_kernel.supported_uvt_polar_da(
        dataclasses.replace(cfg, polar_delayed=False), params)
    # wolf + ewald field variants compose since r5 (verdict item 1):
    # wolf is a complete in-kernel pairwise delta; polar_ewald runs the
    # real-space surrogate (stage 2 corrects with the recorded d_surr)
    assert mc_kernel.supported_uvt_polar_da(
        dataclasses.replace(cfg, polar_wolf=True), params)
    assert mc_kernel.supported_uvt_polar_da(
        dataclasses.replace(cfg, polar_ewald=True), params)
    # ... but polar_ewald needs the energy path's cached S(k)
    assert not mc_kernel.supported_uvt_polar_da(
        dataclasses.replace(cfg, polar_ewald=True, coulomb="cutoff"),
        params)
    # cavity bias IS carried (r3): same open-cell plane as _kernel_uvt
    assert mc_kernel.supported_uvt_polar_da(
        dataclasses.replace(cfg, cavity_bias=True), params)
    # spinflip composes since r4 (lane-11 carve; stage 2 trivial)
    assert mc_kernel.supported_uvt_polar_da(
        dataclasses.replace(cfg, quantum_rotation=True), params)
    # tmmc COLLECTION composes (r4), and tmmc_bias since r5: the eta
    # tilt rides the stage-1 coin as two per-segment scalars
    assert mc_kernel.supported_uvt_polar_da(
        dataclasses.replace(cfg, tmmc=True), params)
    assert mc_kernel.supported_uvt_polar_da(
        dataclasses.replace(cfg, tmmc=True, tmmc_bias=True), params)
    # cdvdw still refuses
    assert not mc_kernel.supported_uvt_polar_da(
        dataclasses.replace(cfg, cdvdw=True), params)


def test_pda_bookkeeping_matches_full_recompute():
    """Fused stage-1 + exact stage-2 chunk: every accumulated per-term
    delta (incl. the SCF polar energy and the S(k) commit) must match a
    from-scratch recompute of the final configuration."""
    params, state, cfg, thermo = _polar_mof()
    st, stats = metropolis.run_chunk_fused_uvt_polar_da(
        state, params, cfg, thermo, 200)
    att = np.asarray(stats.attempts)
    acc = np.asarray(stats.accepts)
    # the chunk may overshoot by < PDA_SEG state-invariant rejections
    assert 200 <= att.sum() < 200 + mc_kernel.PDA_SEG
    assert int(st.step) - int(state.step) == att.sum()
    assert acc.sum() > 0
    assert int(stats.polar_iters) > 0       # stage-2 SCF really ran
    fresh = metropolis.initialize(st, params, cfg, thermo)
    for term in ("rd", "lrc", "es_real", "es_recip", "es_self",
                 "es_excl", "polar"):
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=5e-2), term
    np.testing.assert_allclose(np.asarray(st.sk_re),
                               np.asarray(fresh.sk_re),
                               rtol=1e-4, atol=1e-3)


def test_pda_d_surr_matches_jnp_reference():
    """The in-kernel zodid surrogate delta must match the jnp reference
    (thole.field_delta + zodid_energy) for the exact recorded candidate
    — the sharp parity check on the new in-pass field accumulation."""
    from mpmc_tpu.ops import thole

    params, state, cfg, thermo = _polar_mof()
    slots, slot_start, species_idx, tmpl, A_list, rep_slots = (
        metropolis.uvt_fused_tables(params, cfg))
    d_self, d_excl, c1, cx, lnfv, kv, kcoef = (
        metropolis._uvt_chunk_consts(state.pos, state.box, params,
                                     thermo, cfg, A_list, rep_slots))
    rc = float(np.asarray(
        __import__("mpmc_tpu.ops.pairs", fromlist=["pairs"])
        .derived_cutoff(state.box, cfg)))
    A = max(A_list)
    alive = state.atom_alive(params)
    rng = np.random.default_rng(0)
    for trial in range(6):
        u = np.asarray(rng.uniform(0.0, 1.0, (1, 16)), np.float32)
        u[0, 4] = 1e-30        # stage-1 coin: always survive
        u[0, 8] = [0.1, 0.6, 0.9][trial % 3]   # ins / del / disp
        rec = np.asarray(mc_kernel.run_steps_uvt_pda(
            state.pos, params.eps, params.sig, params.charge,
            params.mass, alive, slot_start, species_idx,
            state.mol_alive[slots], tmpl, state.box, rc, 0.35,
            1.0 / float(thermo.temperature),
            float(thermo.move_factor), float(thermo.rot_factor), 1.0,
            float(thermo.insert_probability), lnfv, d_self, d_excl,
            c1, cx, jnp.asarray(u), cfg, 1, state.pos.shape[0],
            A_list=A_list, e0=state.e0, polar=params.polar,
            polar_damp=cfg.polar_damp, interpret=True,
            kvecs=kv, kcoef=kcoef, sk_re=state.sk_re,
            sk_im=state.sk_im))
        if rec[0, 1] < 0.5:
            continue           # hard reject (overlap/empty pool)
        mt = int(rec[0, 2])
        slot_idx = int(rec[0, 3])
        mol = int(np.asarray(slots)[slot_idx])
        rows = jnp.asarray(rec[2:5, :A].T, cfg.jdtype)
        natoms = int(np.asarray(params.mol_natoms)[mol])
        A_cap = params.max_atoms_per_mol
        rows_full = jnp.broadcast_to(rows[0], (A_cap, 3))
        rows_full = rows_full.at[:A].set(rows)
        rows_full = jnp.where(
            (jnp.arange(A_cap) < natoms)[:, None], rows_full,
            rows_full[0])
        e0n = thole.field_delta(
            state.pos, state.box, alive, params, cfg,
            jnp.asarray(mol), state.e0,
            new_rows=None if mt == 2 else rows_full,
            insert=(mt == 1), delete=(mt == 2))
        alive_new = (state.mol_alive.at[mol].set(mt != 2)
                     if mt else state.mol_alive)
        alive_c = alive_new[params.mol_id] & params.atom_ok
        d_ref = (thole.zodid_energy(e0n, alive_c, params)
                 - thole.zodid_energy(state.e0, alive, params))
        assert float(rec[0, 9]) == pytest.approx(
            float(d_ref), rel=5e-4, abs=5e-3), (trial, mt)


def test_pda_stage1_statistics_match_scan(tmp_path):
    """CLI-level dispatch + coarse statistical agreement: the fused DA
    path's per-move acceptance rates and mean loading track the scan
    delayed-acceptance path on the same system (same target
    distribution; different RNG streams, so generous tolerances)."""
    params, state, cfg, thermo = _polar_mof(n_side=3, n_h2=6,
                                            capacity=12)
    st_f, stats_f = metropolis.run_chunk_fused_uvt_polar_da(
        state, params, cfg, thermo, 700)
    st_s, stats_s = metropolis.run_chunk(state, params, cfg, thermo,
                                         700)
    att_f = np.asarray(stats_f.attempts).astype(float)
    att_s = np.asarray(stats_s.attempts).astype(float)
    acc_f = np.asarray(stats_f.accepts).sum() / att_f.sum()
    acc_s = np.asarray(stats_s.accepts).sum() / att_s.sum()
    assert abs(acc_f - acc_s) < 0.08
    n_f = int(np.asarray(st_f.mol_alive).sum())
    n_s = int(np.asarray(st_s.mol_alive).sum())
    assert abs(n_f - n_s) <= 6


def test_pda_nvt_all_displace_limit():
    """ensemble nvt runs the same stage-1 kernel with
    insert_probability 0 (pda_effective_cfg): attempts are pure
    displacements, bookkeeping matches a recompute, and the SCF stage 2
    really runs for survivors."""
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=6, capacity=10, polarization=True)
    cfg = dataclasses.replace(cfg, ensemble="nvt", polar_delayed=True,
                              fused_mc=True, insert_species=())
    assert mc_kernel.supported_uvt_polar_da(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    st, stats = metropolis.run_chunk_fused_uvt_polar_da(
        state, params, cfg, thermo, 200)
    att = np.asarray(stats.attempts)
    assert att[metropolis.INSERT] == att[metropolis.DELETE] == 0
    assert att[metropolis.DISPLACE] >= 200
    assert np.asarray(stats.accepts).sum() > 0
    assert int(stats.polar_iters) > 0
    np.testing.assert_array_equal(np.asarray(st.mol_alive),
                                  np.asarray(state.mol_alive))
    fresh = metropolis.initialize(st, params, cfg, thermo)
    for term in ("rd", "es_real", "es_recip", "polar"):
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=5e-2), term


def test_pda_cavity_bias_bookkeeping_and_open_cells():
    """Polar delayed acceptance + cavity bias on the stage-1 kernel:
    bookkeeping (incl. polar) matches a recompute, and every accepted
    insert's COM lies in a cell open in the chunk's grid."""
    from mpmc_tpu.state import all_molecule_coms

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=4, capacity=12, polarization=True, pressure=20.0)
    cfg = dataclasses.replace(cfg, polar_delayed=True, fused_mc=True,
                              cavity_bias=True, cavity_grid=5,
                              cavity_radius=2.0)
    assert mc_kernel.supported_uvt_polar_da(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    g = cfg.cavity_grid
    open_mask = np.asarray(state.cavity_open)
    assert 0 < open_mask.sum() < g ** 3
    alive0 = np.asarray(state.mol_alive).copy()
    st, stats = metropolis.run_chunk_fused_uvt_polar_da(
        state, params, cfg, thermo, 400)
    acc = np.asarray(stats.accepts)
    assert acc.sum() > 0
    fresh = metropolis.initialize(st, params, cfg, thermo)
    for term in ("rd", "es_real", "es_recip", "polar"):
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=5e-2), term
    new_mols = np.where(np.asarray(st.mol_alive) & ~alive0)[0]
    if len(new_mols):
        coms = np.asarray(all_molecule_coms(st.pos, params))
        binv = np.linalg.inv(np.asarray(st.box))
        for m in new_mols:
            frac = coms[m] @ binv % 1.0
            ijk = np.minimum((frac * g).astype(int), g - 1)
            cell = ijk[0] * g * g + ijk[1] * g + ijk[2]
            assert open_mask[cell], (m, cell)


def _h2_qrot_polar_pda(dF=50.0, p_spin=1.0, spin0=0):
    """Polarizable GCMC MOF+H2 with quantum_rotation + polar_delayed:
    the r4 PDA x spinflip composition harness (hand-set slot-order
    rot_f so the test controls d_f directly, as _h2_qrot_uvt)."""
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=6, capacity=12, ewald_kmax=3, polarization=True)
    cfg = dataclasses.replace(cfg, fused_mc=True, quantum_rotation=True,
                              polar_delayed=True)
    thermo = thermo.replace(
        spinflip_probability=jnp.asarray(p_spin, jnp.float32))
    state = metropolis.initialize(state, params, cfg, thermo)
    M = params.mol_species.shape[0]
    rot_f = np.zeros((M, 2), np.float32)
    rot_f[:, 1] = dF
    state = state.replace(rot_f=jnp.asarray(rot_f),
                          spin=jnp.full((M,), spin0, jnp.int32))
    return params, state, cfg, thermo


def test_pda_spinflip_pure_flip_chunk():
    """p_spin = 1 through the PDA kernel: every attempt is a spinflip
    survivor-or-reject; positions, aliveness, S(k), dipoles and every
    energy term must be BIT-identical (no geometry moved), only spins
    and SPINFLIP stats change."""
    params, state, cfg, thermo = _h2_qrot_polar_pda(dF=50.0, p_spin=1.0)
    assert mc_kernel.supported_uvt_polar_da(cfg, params)
    st, stats = metropolis.run_chunk_fused_uvt_polar_da(
        state, params, cfg, thermo, 200)
    np.testing.assert_array_equal(np.asarray(st.pos),
                                  np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(st.mol_alive),
                                  np.asarray(state.mol_alive))
    np.testing.assert_array_equal(np.asarray(st.sk_re),
                                  np.asarray(state.sk_re))
    np.testing.assert_array_equal(np.asarray(st.mu),
                                  np.asarray(state.mu))
    assert float(st.energy.total) == float(state.energy.total)
    att = np.asarray(stats.attempts)
    acc = np.asarray(stats.accepts)
    assert att[metropolis.SPINFLIP] >= 200
    assert (att[metropolis.DISPLACE] == att[metropolis.INSERT]
            == att[metropolis.DELETE] == 0)
    assert 0 < acc[metropolis.SPINFLIP] <= att[metropolis.SPINFLIP]
    assert int(np.asarray(st.spin).sum()) != int(
        np.asarray(state.spin).sum())


def test_pda_spinflip_one_way_at_large_dF():
    """dF = 800 K >> T = 77 K: starting all-ortho, every ortho->para
    flip accepts (d_f = -dF) and back-flips are ~exp(-dF/T) ~ 3e-5 —
    the chain must end with every ALIVE rotor para (deterministic up
    to ~1e-2 tail), exercising both the accept and reject spin paths
    in the PDA kernel's stage-1 coin."""
    params, state, cfg, thermo = _h2_qrot_polar_pda(dF=800.0,
                                                    p_spin=1.0, spin0=1)
    assert mc_kernel.supported_uvt_polar_da(cfg, params)
    st, stats = metropolis.run_chunk_fused_uvt_polar_da(
        state, params, cfg, thermo, 300)
    alive = np.asarray(st.mol_alive)
    spins = np.asarray(st.spin)
    mov = ~np.asarray(params.mol_frozen) & (
        np.asarray(params.mol_species) >= 0)
    assert (spins[alive & mov] == 0).all()
    acc = np.asarray(stats.accepts)
    att = np.asarray(stats.attempts)
    # exactly one accepted flip per initially-ortho alive rotor (plus
    # ~0 back-flips at 3e-5 each)
    assert acc[metropolis.SPINFLIP] == (alive & mov).sum()
    assert att[metropolis.SPINFLIP] > acc[metropolis.SPINFLIP]


def test_pda_spinflip_mixed_bookkeeping():
    """Mixed displace/insert/delete/spinflip polar-DA chain: carried
    energies (incl. the SCF polar term) must re-ground to a fresh
    initialize, attempts partition the chunk, and both exchanges and
    flips really happened."""
    params, state, cfg, thermo = _h2_qrot_polar_pda(dF=30.0, p_spin=0.3)
    assert mc_kernel.supported_uvt_polar_da(cfg, params)
    st, stats = metropolis.run_chunk_fused_uvt_polar_da(
        state, params, cfg, thermo, 300)
    att = np.asarray(stats.attempts)
    assert att[metropolis.SPINFLIP] > 0
    assert att[metropolis.INSERT] + att[metropolis.DELETE] > 0
    fresh = metropolis.initialize(st, params, cfg, thermo)
    assert float(st.energy.polar) == pytest.approx(
        float(fresh.energy.polar), rel=2e-4, abs=5e-2)
    for term in ("rd", "es_real", "lrc"):
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=5e-2), term


@pytest.mark.parametrize("variant", ["wolf", "ewald"])
def test_pda_field_variant_bookkeeping(variant):
    """r5 (r4 verdict item 1): the fused PDA path on the wolf /
    full-Ewald static field.  Wolf runs a complete in-kernel pairwise
    field delta; polar_ewald a real-space surrogate anchored on the
    resident full-Ewald e0 planes — either way stage 2 corrects with
    the recorded d_surr, so the committed energies must match a
    from-scratch recompute exactly as on the direct field."""
    from mpmc_tpu.ops import thole

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=3, n_h2=6, capacity=10, polarization=True)
    kw_v = ({"polar_wolf": True} if variant == "wolf"
            else {"polar_ewald": True})
    cfg = dataclasses.replace(cfg, polar_delayed=True, fused_mc=True,
                              **kw_v)
    assert mc_kernel.supported_uvt_polar_da(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    st, stats = metropolis.run_chunk_fused_uvt_polar_da(
        state, params, cfg, thermo, 200)
    att = np.asarray(stats.attempts)
    acc = np.asarray(stats.accepts)
    assert 200 <= att.sum() < 200 + mc_kernel.PDA_SEG
    assert acc.sum() > 0
    assert int(stats.polar_iters) > 0
    # the carried e0 must be the variant's field
    e0_full = thole.static_field(st.pos, st.box, st.atom_alive(params),
                                 params, cfg)
    assert float(jnp.max(jnp.abs(st.e0 - e0_full))) < 5e-4
    fresh = metropolis.initialize(st, params, cfg, thermo)
    for term in ("rd", "lrc", "es_real", "es_recip", "es_self",
                 "es_excl", "polar"):
        assert float(getattr(st.energy, term)) == pytest.approx(
            float(getattr(fresh.energy, term)), rel=2e-4, abs=5e-2), term


# ---------------------------------------------------------------------------
# column-tile culling in the fused µVT kernel (r6, mc_cull)
# ---------------------------------------------------------------------------


def _slab_system(dtype="float32"):
    """Frozen slab at x in [0,2] filling column block 0 entirely, plus
    LJ sorbates around x=20 in a 40 A box: with cutoff 5 every step's
    molecule rows sit >= rc from block 0's AABB, so the culled kernel
    skips that block on EVERY step — any bookkeeping error in the skip
    path shows as a bitwise mismatch against the dense kernel."""
    from mpmc_tpu.state import build_system
    from helpers import atom_species

    rng = np.random.default_rng(11)
    nf = 1100                       # > 1024: block 0 is all-frozen
    fpos = np.stack([rng.uniform(0.0, 2.0, nf),
                     rng.uniform(0.0, 40.0, nf),
                     rng.uniform(0.0, 40.0, nf)], axis=1)
    fp = {"eps": np.full(nf, 30.0), "sig": np.full(nf, 3.0),
          "charge": np.zeros(nf), "mass": np.full(nf, 12.0),
          "polar": np.zeros(nf)}
    sp = atom_species("Ar", eps=80.0, sig=3.2, charge=0.0)
    n_mol = 24
    mpos = np.stack([rng.uniform(15.0, 25.0, n_mol),
                     rng.uniform(0.0, 40.0, n_mol),
                     rng.uniform(0.0, 40.0, n_mol)],
                    axis=1)[:, None, :]
    params, state = build_system(
        np.eye(3) * 40.0, frozen_pos=fpos, frozen_params=fp,
        species=(sp,), capacity=(48,), initial_counts=(n_mol,),
        initial_pos={0: mpos}, dtype=jnp.float32)
    cfg = RunConfig(ensemble="uvt", rd_potential="lj", coulomb="none",
                    insert_species=(0,), ortho_box=True, cutoff=5.0,
                    rd_lrc=False, dtype=dtype, fused_mc=True, seed=3,
                    mc_cull="auto")
    thermo = Thermo.make(temperature=120.0, n_species=1,
                         dtype=jnp.float32)
    # pure displacements keep the sorbates in the x~[14,26] band, far
    # from block 0 at every step
    thermo = dataclasses.replace(
        thermo, insert_probability=jnp.asarray(0.0, jnp.float32),
        move_factor=jnp.asarray(0.6, jnp.float32))
    return params, state, cfg, thermo


def test_mc_cull_gate_and_table():
    params, state, cfg, thermo = _slab_system()
    assert mc_kernel.cull_gate(cfg)
    assert not mc_kernel.cull_gate(
        dataclasses.replace(cfg, mc_cull="off"))
    assert not mc_kernel.cull_gate(
        dataclasses.replace(cfg, ortho_box=False))
    assert not mc_kernel.cull_gate(dataclasses.replace(cfg, cutoff=None))
    assert mc_kernel.cull_gate(
        dataclasses.replace(cfg, cutoff=None, mc_cull="on"))
    # autoreject radius must stay below the cutoff
    assert not mc_kernel.cull_gate(
        dataclasses.replace(cfg, cavity_autoreject_absolute=6.0))

    slots, slot_start, species_idx, tmpl, A_list, rep_slots = (
        metropolis.uvt_fused_tables(params, cfg))
    n_real = state.pos.shape[0]
    n_pad = max(2 * mc_kernel.TJ,
                -(-n_real // mc_kernel.TJ) * mc_kernel.TJ)
    tab, _ = mc_kernel._pack_cull(
        state.pos, jnp.asarray(slot_start),
        jnp.asarray(species_idx, jnp.float32), A_list, n_pad, n_real)
    tab = np.asarray(tab)
    # block 0 is all-frozen (static), block 1 holds the slots
    assert tab[0, 6] == 1.0 and tab[1, 6] == 0.0
    # slab AABB: x within [0,2], y/z spanning the box
    assert tab[0, 0] >= 0.0 and tab[0, 3] <= 2.0


def test_mc_cull_bit_identical_with_guaranteed_skips():
    """Culled vs dense fused µVT over two chunks: bitwise-identical
    positions, energies and acceptance counters, on a geometry where
    the culled kernel provably skips block 0 at every step."""
    params, state, cfg, thermo = _slab_system()
    assert mc_kernel.supported_uvt(cfg, params)
    st0 = metropolis.initialize(state, params, cfg, thermo)
    outs = {}
    for mode in ("auto", "off"):
        c = dataclasses.replace(cfg, mc_cull=mode)
        st, _ = metropolis.run_chunk_fused_uvt(st0, params, c, thermo,
                                               192)
        st, stats = metropolis.run_chunk_fused_uvt(st, params, c,
                                                   thermo, 192)
        outs[mode] = (np.asarray(st.pos), np.asarray(st.energy.rd),
                      np.asarray(stats.accepts),
                      np.asarray(stats.attempts))
    for a, b in zip(outs["auto"], outs["off"]):
        np.testing.assert_array_equal(a, b)
    # the run must actually move molecules (non-trivial trajectories)
    assert outs["auto"][2][0] > 0
