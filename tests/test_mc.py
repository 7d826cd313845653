"""Metropolis engine validation.

Strategy (SURVEY.md §4): statistical parity against exactly-solvable
ensembles (ideal-gas GCMC occupancy = Poisson with mean fV/kT; ideal-gas
NPT <V> = (N+1)kT/P) plus strict delta-energy bookkeeping — the cached
per-term energies carried through the scan must match a from-scratch
recompute at any point.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmc_tpu.config import RunConfig, Thermo
from mpmc_tpu.constants import ATM2K_A3
from mpmc_tpu.mc import metropolis
from mpmc_tpu.state import build_system

from helpers import atom_species, free_atoms


def run_blocks(state, params, cfg, thermo, n_blocks, block):
    samples = []
    stats_all = metropolis.MCStats.zero()
    for _ in range(n_blocks):
        state, stats = metropolis.run_chunk(state, params, cfg, thermo,
                                            block)
        samples.append(int(state.n_molecules(params)))
        stats_all = jax.tree_util.tree_map(lambda a, b: a + b, stats_all,
                                           stats)
    return state, np.array(samples), stats_all


def test_nvt_lj_energy_bookkeeping():
    rng = np.random.default_rng(0)
    L, n = 14.0, 20
    coords = rng.uniform(0, L, (n, 3))
    params, state = free_atoms(L * np.eye(3), coords, eps=120.0, sig=3.4)
    cfg = RunConfig(ensemble="nvt", coulomb="none", dtype="float64",
                    cutoff=6.0, pair_chunk=32)
    thermo = Thermo.make(temperature=150.0, move_factor=0.8, rot_factor=0.5,
                         n_species=1, dtype=jnp.float64)
    state = metropolis.initialize(state, params, cfg, thermo)
    state, stats = metropolis.run_chunk(state, params, cfg, thermo, 400)
    # cached energy vs recompute
    fresh = metropolis.initialize(state, params, cfg, thermo)
    assert float(state.energy.total) == pytest.approx(
        float(fresh.energy.total), rel=1e-9, abs=1e-7)
    acc = int(stats.accepts[0])
    att = int(stats.attempts[0])
    assert att == 400
    assert 0 < acc < 400  # neither frozen nor trivial


def test_nvt_ewald_energy_bookkeeping():
    """Charged system: the cached structure factor + delta recip must agree
    with a full recompute after hundreds of accepted moves."""
    rng = np.random.default_rng(1)
    L = 12.0
    a = rng.uniform(0, L, (6, 3))
    b = rng.uniform(0, L, (6, 3))
    from helpers import two_species_lattice
    params, state = two_species_lattice(L * np.eye(3), a, b, qa=0.4,
                                        qb=-0.4, eps=60.0, sig=3.0)
    cfg = RunConfig(ensemble="nvt", coulomb="ewald", dtype="float64",
                    ewald_kmax=6, pair_chunk=16)
    thermo = Thermo.make(temperature=300.0, move_factor=0.6, rot_factor=0.4,
                         n_species=2, dtype=jnp.float64)
    state = metropolis.initialize(state, params, cfg, thermo)
    state, stats = metropolis.run_chunk(state, params, cfg, thermo, 300)
    fresh = metropolis.initialize(state, params, cfg, thermo)
    for slot in ("rd", "es_real", "es_recip", "es_self", "es_excl", "lrc"):
        assert float(getattr(state.energy, slot)) == pytest.approx(
            float(getattr(fresh.energy, slot)), rel=1e-8, abs=1e-6), slot


def gcmc_system(L=20.0, cap=80, n0=10):
    sp = atom_species("He", eps=0.0, sig=0.0, charge=0.0, mass=4.0)
    return build_system(L * np.eye(3), species=(sp,), capacity=(cap,),
                        initial_counts=(n0,), dtype=jnp.float64, seed=3)


def test_gcmc_ideal_gas_occupancy():
    """Non-interacting GCMC: <N> = f V / kT exactly (Poisson)."""
    L, T = 20.0, 300.0
    target_n = 20.0
    f_k_a3 = target_n * T / L ** 3          # K/A^3
    f_atm = f_k_a3 / ATM2K_A3
    params, state = gcmc_system(L)
    cfg = RunConfig(ensemble="uvt", rd_potential="none", coulomb="none",
                    rd_lrc=False, dtype="float64", insert_species=(0,))
    thermo = Thermo.make(temperature=T, fugacity=(f_atm,),
                         insert_probability=0.5, move_factor=1.0,
                         rot_factor=0.1, n_species=1, dtype=jnp.float64)
    state = metropolis.initialize(state, params, cfg, thermo)
    # equilibrate then sample
    state, _ = metropolis.run_chunk(state, params, cfg, thermo, 2000)
    state, samples, stats = run_blocks(state, params, cfg, thermo,
                                       n_blocks=120, block=50)
    mean_n = samples.mean()
    # Poisson(20): sigma_mean over ~120 weakly-correlated samples ~ 0.6
    assert mean_n == pytest.approx(target_n, abs=2.0)
    assert int(stats.attempts[metropolis.INSERT]) > 500
    assert int(stats.attempts[metropolis.DELETE]) > 500
    # insert and delete acceptance must both be active
    assert int(stats.accepts[metropolis.INSERT]) > 100
    assert int(stats.accepts[metropolis.DELETE]) > 100


def test_gcmc_lj_energy_bookkeeping():
    """Interacting GCMC: per-term cached energies stay consistent through
    insert/delete/displace sequences."""
    L = 14.0
    sp = atom_species("Ar", eps=120.0, sig=3.4, charge=0.0)
    params, state = build_system(L * np.eye(3), species=(sp,),
                                 capacity=(30,), initial_counts=(8,),
                                 dtype=jnp.float64, seed=5)
    cfg = RunConfig(ensemble="uvt", coulomb="none", dtype="float64",
                    cutoff=6.0, insert_species=(0,), pair_chunk=32)
    thermo = Thermo.make(temperature=150.0, fugacity=(30.0,),
                         insert_probability=0.4, move_factor=0.7,
                         rot_factor=0.3, n_species=1, dtype=jnp.float64)
    state = metropolis.initialize(state, params, cfg, thermo)
    state, stats = metropolis.run_chunk(state, params, cfg, thermo, 500)
    fresh = metropolis.initialize(state, params, cfg, thermo)
    assert int(stats.accepts[metropolis.INSERT]) > 0
    assert int(stats.accepts[metropolis.DELETE]) > 0
    for slot in ("rd", "lrc"):
        assert float(getattr(state.energy, slot)) == pytest.approx(
            float(getattr(fresh.energy, slot)), rel=1e-8, abs=1e-6), slot


def test_gcmc_ewald_bookkeeping():
    """GCMC with charges: structure-factor and self/exclusion deltas through
    insert/delete stay consistent with recompute."""
    from mpmc_tpu.state import Species
    L = 12.0
    # neutral 2-site molecule so insert/delete exercise intra + self terms
    sp = Species(name="hcl", atom_names=("H", "Cl"),
                 pos=np.array([[0, 0, 0], [1.3, 0, 0]]),
                 mass=np.array([1.0, 35.5]),
                 charge=np.array([0.2, -0.2]),
                 polar=np.zeros(2), eps=np.array([20.0, 120.0]),
                 sig=np.array([2.5, 3.4]))
    params, state = build_system(L * np.eye(3), species=(sp,),
                                 capacity=(20,), initial_counts=(6,),
                                 dtype=jnp.float64, seed=7)
    cfg = RunConfig(ensemble="uvt", coulomb="ewald", dtype="float64",
                    ewald_kmax=6, insert_species=(0,), pair_chunk=32)
    thermo = Thermo.make(temperature=250.0, fugacity=(50.0,),
                         insert_probability=0.4, move_factor=0.6,
                         rot_factor=0.8, n_species=1, dtype=jnp.float64)
    state = metropolis.initialize(state, params, cfg, thermo)
    state, stats = metropolis.run_chunk(state, params, cfg, thermo, 400)
    fresh = metropolis.initialize(state, params, cfg, thermo)
    assert int(stats.accepts[metropolis.INSERT]) > 0
    for slot in ("rd", "es_real", "es_recip", "es_self", "es_excl", "lrc"):
        assert float(getattr(state.energy, slot)) == pytest.approx(
            float(getattr(fresh.energy, slot)), rel=1e-7, abs=1e-5), slot


def test_npt_ideal_gas_volume():
    """Ideal-gas NPT: <V> = (N+1) kT / P."""
    T, n = 300.0, 15
    p_atm = 80.0
    p_k = p_atm * ATM2K_A3
    expect_v = (n + 1) * T / p_k
    L0 = expect_v ** (1 / 3)
    rng = np.random.default_rng(9)
    coords = rng.uniform(0, L0, (n, 3))
    params, state = free_atoms(L0 * np.eye(3), coords, eps=0.0, sig=0.0)
    cfg = RunConfig(ensemble="npt", rd_potential="none", coulomb="none",
                    rd_lrc=False, dtype="float64")
    thermo = Thermo.make(temperature=T, pressure=p_atm,
                         volume_probability=0.5, volume_change_factor=0.2,
                         move_factor=1.0, rot_factor=0.1, n_species=1,
                         dtype=jnp.float64)
    state = metropolis.initialize(state, params, cfg, thermo)
    state, _ = metropolis.run_chunk(state, params, cfg, thermo, 1500)
    vols = []
    for _ in range(150):
        state, stats = metropolis.run_chunk(state, params, cfg, thermo, 20)
        vols.append(float(jnp.abs(jnp.linalg.det(state.box))))
    mean_v = np.mean(vols)
    # relative std of V ~ 1/sqrt(N+1) ~ 25%; mean over 150 samples
    assert mean_v == pytest.approx(expect_v, rel=0.15)


def test_npt_lj_bookkeeping():
    rng = np.random.default_rng(13)
    L, n = 13.0, 15
    coords = rng.uniform(0, L, (n, 3))
    params, state = free_atoms(L * np.eye(3), coords, eps=100.0, sig=3.2)
    cfg = RunConfig(ensemble="npt", coulomb="none", dtype="float64",
                    pair_chunk=32)
    thermo = Thermo.make(temperature=200.0, pressure=50.0,
                         volume_probability=0.2, volume_change_factor=0.1,
                         move_factor=0.7, rot_factor=0.3, n_species=1,
                         dtype=jnp.float64)
    state = metropolis.initialize(state, params, cfg, thermo)
    state, stats = metropolis.run_chunk(state, params, cfg, thermo, 300)
    assert int(stats.attempts[metropolis.VOLUME]) > 20
    fresh = metropolis.initialize(state, params, cfg, thermo)
    assert float(state.energy.total) == pytest.approx(
        float(fresh.energy.total), rel=1e-9, abs=1e-7)


class TestCavityBias:
    def test_open_grid_geometry(self):
        import jax.numpy as jnp
        from mpmc_tpu.mc import moves
        box = jnp.eye(3) * 10.0
        # one atom at the center of cell (0,0,0) of a 2x2x2 grid
        pos = jnp.array([[2.5, 2.5, 2.5]])
        alive = jnp.array([True])
        open_ = np.asarray(moves.cavity_open_grid(pos, box, alive, 2,
                                                  jnp.asarray(2.0)))
        assert open_.sum() == 7 and not open_[0]
        # radius 5.1 closes the 3 face neighbors (5.0 away); the 3 edge
        # (7.07) and 1 corner (8.66) cells stay open
        open2 = np.asarray(moves.cavity_open_grid(pos, box, alive, 2,
                                                  jnp.asarray(5.1)))
        assert open2.sum() == 4
        open3 = np.asarray(moves.cavity_open_grid(pos, box, alive, 2,
                                                  jnp.asarray(8.7)))
        assert open3.sum() == 0

    def test_gcmc_with_cavity_bias_runs(self):
        import dataclasses
        from mpmc_tpu.models import systems
        params, state, cfg, thermo = systems.mof_h2_gcmc(
            n_side=3, n_h2=4, capacity=12, ewald_kmax=3, dtype="float64")
        cfg = dataclasses.replace(cfg, cavity_bias=True, cavity_grid=6,
                                  cavity_radius=2.0)
        state = metropolis.initialize(state, params, cfg, thermo)
        assert state.cavity_open is not None
        st, stats = metropolis.run_chunk(state, params, cfg, thermo, 300)
        assert int(np.asarray(stats.attempts)[1]) > 0   # inserts attempted
        # accumulated energies stay consistent with full recompute
        st2 = metropolis.initialize(st, params, cfg, thermo)
        assert float(st.energy.total) == pytest.approx(
            float(st2.energy.total), abs=1e-6)

    def test_cavity_bias_preserves_equilibrium_density(self):
        """Ideal-gas GCMC (no interactions): <N> = fV/kT regardless of
        cavity bias — the acceptance correction must exactly cancel the
        proposal bias."""
        import dataclasses
        from mpmc_tpu.models import systems
        params, state, cfg, thermo = systems.lj_fluid(n=4, density=0.002,
                                                      dtype="float64")
        cfg = dataclasses.replace(
            cfg, ensemble="uvt", insert_species=(0,), rd_potential="none",
            rd_lrc=False, cavity_bias=True, cavity_grid=4,
            cavity_radius=0.0)   # radius 0: every cell open (pure plumbing)
        thermo = thermo.replace(
            insert_probability=jnp.asarray(0.6, cfg.jdtype),
            fugacity=jnp.asarray([2.0], cfg.jdtype))
        state = metropolis.initialize(state, params, cfg, thermo)
        ns = []
        for _ in range(30):
            state, _ = metropolis.run_chunk(state, params, cfg, thermo, 200)
            state = metropolis.initialize(state, params, cfg, thermo)
            ns.append(float(state.n_molecules(params)))
        from mpmc_tpu.constants import ATM2K_A3
        expect = (2.0 * ATM2K_A3 * float(jnp.linalg.det(state.box))
                  / float(thermo.temperature))
        got = np.mean(ns[5:])
        assert got == pytest.approx(expect, rel=0.25)


def test_multisorbate_ideal_gas_partial_loadings():
    """Two non-interacting species with different fugacities: each obeys
    <N_s> = f_s V / kT independently (multi-sorbate GCMC, SURVEY §2
    'Moves / checkpoint': multi-sorbate uniform species pick)."""
    import dataclasses
    from mpmc_tpu.config import RunConfig, Thermo
    from mpmc_tpu.constants import ATM2K_A3
    from mpmc_tpu.models import systems
    from mpmc_tpu.state import build_system
    spa = systems.lj_atom("AA", eps=0.0, sig=0.0, mass=10.0)
    spb = systems.lj_atom("BB", eps=0.0, sig=0.0, mass=20.0)
    cfg = RunConfig(ensemble="uvt", rd_potential="none", coulomb="none",
                    rd_lrc=False, insert_species=(0, 1), dtype="float64")
    params, state = build_system(
        np.eye(3) * 14.0, species=(spa, spb), capacity=(64, 64),
        initial_counts=(2, 2), dtype=cfg.jdtype)
    t = 120.0
    f = np.array([30.0, 90.0])
    thermo = Thermo.make(temperature=t, fugacity=list(f),
                         insert_probability=0.7, n_species=2,
                         dtype=cfg.jdtype)
    state = metropolis.initialize(state, params, cfg, thermo)
    na, nb = [], []
    for _ in range(40):
        state, _ = metropolis.run_chunk(state, params, cfg, thermo, 300)
        na.append(float(state.n_molecules_of(params, 0)))
        nb.append(float(state.n_molecules_of(params, 1)))
    v = 14.0 ** 3
    expect = f * ATM2K_A3 * v / t
    got = np.array([np.mean(na[10:]), np.mean(nb[10:])])
    assert got[0] == pytest.approx(expect[0], rel=0.20)
    assert got[1] == pytest.approx(expect[1], rel=0.15)
    # the two loadings must differ roughly by the fugacity ratio
    assert got[1] / got[0] == pytest.approx(3.0, rel=0.25)


def test_seeded_runs_are_deterministic():
    """SURVEY §4: fixed-seed runs give bit-identical trajectories; a
    different seed diverges."""
    from mpmc_tpu.models import systems

    def run(seed):
        params, state, cfg, thermo = systems.lj_fluid(n=20, dtype="float64",
                                                      seed=seed)
        state = metropolis.initialize(state, params, cfg, thermo)
        st, _ = metropolis.run_chunk(state, params, cfg, thermo, 300)
        return np.asarray(st.pos), float(st.energy.total)

    p1, e1 = run(3)
    p2, e2 = run(3)
    p3, e3 = run(4)
    np.testing.assert_array_equal(p1, p2)
    assert e1 == e2
    assert not np.array_equal(p1, p3)


class TestNVE:
    """Ray's microcanonical MC (ensemble nve + total_energy; SURVEY §2
    "MC main loop" NVE [L]; Ray PRA 44, 4061)."""

    def _gas(self, n=24, L=18.0, eps=120.0):
        from tests.helpers import free_atoms
        rng = np.random.default_rng(5)
        g = int(np.ceil(n ** (1 / 3)))
        pts = np.stack(np.meshgrid(*[np.arange(g)] * 3,
                                   indexing="ij"), -1).reshape(-1, 3)
        coords = (pts[:n] + 0.5) * (L / g) \
            + rng.uniform(-0.4, 0.4, (n, 3))
        return free_atoms(L * np.eye(3), coords, eps=eps, sig=3.0)

    def _cfg(self, **kw):
        kw.setdefault("ensemble", "nve")
        kw.setdefault("coulomb", "none")
        kw.setdefault("dtype", "float64")
        kw.setdefault("rd_lrc", False)
        kw.setdefault("cutoff", 7.0)
        return RunConfig(**kw)

    def test_ideal_gas_always_accepts_and_fixed_t_kin(self):
        params, state = self._gas(eps=0.0)
        cfg = self._cfg()
        e_tot = 5000.0
        thermo = Thermo.make(temperature=1.0, move_factor=0.5,
                             rot_factor=0.0, nve_energy=e_tot,
                             n_species=1, dtype=cfg.jdtype)
        state = metropolis.initialize(state, params, cfg, thermo)
        st, stats = metropolis.run_chunk(state, params, cfg, thermo, 300)
        acc = np.asarray(stats.accepts)[0] / np.asarray(stats.attempts)[0]
        assert acc == pytest.approx(1.0)      # dU = 0 -> K unchanged
        # T_kin = 2E/F with F = 3 per point particle
        f_dof = 3.0 * 24
        assert 2 * e_tot / f_dof == pytest.approx(138.888, rel=1e-3)

    def test_bookkeeping_closure(self):
        params, state = self._gas()
        cfg = self._cfg()
        thermo = Thermo.make(temperature=1.0, move_factor=0.4,
                             rot_factor=0.0, nve_energy=4000.0,
                             n_species=1, dtype=cfg.jdtype)
        state = metropolis.initialize(state, params, cfg, thermo)
        st, stats = metropolis.run_chunk(state, params, cfg, thermo, 300)
        st2 = metropolis.initialize(st, params, cfg, thermo)
        assert float(st.energy.total) == pytest.approx(
            float(st2.energy.total), abs=1e-9)
        a = np.asarray(stats.accepts)[0]
        assert 0 < a < 300                    # finite-K rejections happen

    def test_nvt_nve_ensemble_equivalence(self):
        """<T_kin> in NVE at E = <U>_NVT + F T/2 matches the NVT T."""
        params, state = self._gas()
        t_ref = 150.0
        cfg_nvt = self._cfg(ensemble="nvt")
        th_nvt = Thermo.make(temperature=t_ref, move_factor=0.5,
                             rot_factor=0.0, n_species=1,
                             dtype=cfg_nvt.jdtype)
        st = metropolis.initialize(state, params, cfg_nvt, th_nvt)
        us = []
        for _ in range(12):
            st, _ = metropolis.run_chunk(st, params, cfg_nvt, th_nvt, 200)
            us.append(float(st.energy.total))
        u_mean = np.mean(us[4:])
        f_dof = 3.0 * 24
        e_tot = u_mean + 0.5 * f_dof * t_ref
        cfg = self._cfg()
        th = Thermo.make(temperature=1.0, move_factor=0.5,
                         rot_factor=0.0, nve_energy=e_tot, n_species=1,
                         dtype=cfg.jdtype)
        stv = metropolis.initialize(st, params, cfg, th)
        t_kins = []
        for _ in range(12):
            stv, _ = metropolis.run_chunk(stv, params, cfg, th, 200)
            k = e_tot - float(stv.energy.total)
            t_kins.append(2.0 * k / f_dof)
        assert np.mean(t_kins[4:]) == pytest.approx(t_ref, rel=0.15)

    def test_cli_nve_reports_t_kinetic(self, tmp_path):
        import io as _io
        from mpmc_tpu.io import input_script
        from mpmc_tpu.mc import run as run_mod
        pqr = tmp_path / "ar.pqr"
        pqr.write_text(
            "ATOM 1 Ar AR 1 M 5.0 5.0 5.0 39.948 0.0 0.0 119.8 3.405\n"
            "ATOM 2 Ar AR 2 M 9.0 5.0 5.0 39.948 0.0 0.0 119.8 3.405\n"
            "END\n")
        job = input_script.parse(f"""
ensemble nve
numsteps 200
corrtime 100
temperature 100
total_energy 900
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
cutoff 8
coulomb off
rd_lrc off
precision float64
pqr_input {pqr}
""")
        assert job.total_energy == 900.0
        log = _io.StringIO()
        _, avgs = run_mod.run(job, log=log)
        assert "T_kinetic" in avgs.samples
        assert np.all(np.isfinite(avgs.samples["T_kinetic"]))


class TestFrozenReuseRefresh:
    """The per-corrtime fast refresh (initialize(frozen_rows=F)) must
    reproduce the full from-scratch refresh exactly: the row-restricted
    pair pass covers every sorbate-involving pair once and the cached
    e_frozen is the provably-constant remainder."""

    def _system(self, **kw):
        from mpmc_tpu.models import systems
        return systems.mof_h2_gcmc(n_side=5, spacing=4.0, n_h2=12,
                                   capacity=24, dtype="float64",
                                   corrtime=64, **kw)

    def test_matches_full_refresh_after_gcmc(self):
        params, state, cfg, thermo = self._system()
        fr = metropolis.frozen_refresh_rows(params, cfg)
        assert fr > 0     # frozen-prefix layout holds for the MOF system
        state = metropolis.initialize(state, params, cfg, thermo)
        state, _ = metropolis.run_chunk(state, params, cfg, thermo, 64)
        full = metropolis.initialize(state, params, cfg, thermo)
        fast = metropolis.initialize(state, params, cfg, thermo,
                                     frozen_rows=fr)
        for f in ("rd", "lrc", "es_real", "es_recip", "es_self",
                  "es_excl", "polar", "vdw"):
            a, b = getattr(full.energy, f), getattr(fast.energy, f)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-9, err_msg=f)
        # the frozen part is REUSED, not recomputed
        for f in ("rd", "lrc", "es_real", "es_self", "es_excl"):
            np.testing.assert_allclose(
                np.asarray(getattr(full.e_frozen, f)),
                np.asarray(getattr(fast.e_frozen, f)),
                rtol=1e-12, atol=1e-9, err_msg=f)
        np.testing.assert_allclose(np.asarray(full.sk_re),
                                   np.asarray(fast.sk_re), atol=1e-9)

    def test_matches_full_refresh_polar(self):
        params, state, cfg, thermo = self._system(polarization=True)
        fr = metropolis.frozen_refresh_rows(params, cfg)
        assert fr > 0
        state = metropolis.initialize(state, params, cfg, thermo)
        state, _ = metropolis.run_chunk(state, params, cfg, thermo, 32)
        full = metropolis.initialize(state, params, cfg, thermo)
        fast = metropolis.initialize(state, params, cfg, thermo,
                                     frozen_rows=fr)
        np.testing.assert_allclose(np.asarray(full.energy.total),
                                   np.asarray(fast.energy.total),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(full.mu),
                                   np.asarray(fast.mu), atol=1e-10)

    def test_guard_refuses_unsafe_configs(self):
        import dataclasses as dc
        params, state, cfg, thermo = self._system()
        assert metropolis.frozen_refresh_rows(
            params, dc.replace(cfg, ensemble="npt")) == 0
        assert metropolis.frozen_refresh_rows(
            params, dc.replace(cfg, feynman_hibbs=True)) == 0
        assert metropolis.frozen_refresh_rows(
            params, dc.replace(cfg, feynman_kleinert=True)) == 0
        assert metropolis.frozen_refresh_rows(
            params, dc.replace(cfg, spectre=True)) == 0

    def test_guard_refuses_no_frozen(self):
        from mpmc_tpu.models import systems
        params, state, cfg, thermo = systems.lj_fluid(
            n=32, dtype="float64")
        assert metropolis.frozen_refresh_rows(params, cfg) == 0
