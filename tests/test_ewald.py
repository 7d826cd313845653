"""Ewald electrostatics parity against analytic lattice (Madelung) sums
(SURVEY.md §4: "golden per-term energies ... Madelung constants for Ewald").
"""
import jax.numpy as jnp
import numpy as np
import pytest

from mpmc_tpu.config import RunConfig, Thermo
from mpmc_tpu.constants import KE
from mpmc_tpu.ops import energy as energy_mod
from mpmc_tpu.ops import ewald, pairs

from helpers import two_species_lattice, free_atoms

MADELUNG_NACL = 1.747564594633182
MADELUNG_CSCL = 1.762674773070988


def cfg_es(**kw):
    kw.setdefault("rd_potential", "none")
    kw.setdefault("coulomb", "ewald")
    kw.setdefault("dtype", "float64")
    kw.setdefault("rd_lrc", False)
    return RunConfig(**kw)


def thermo():
    return Thermo.make(temperature=300.0, n_species=2, dtype=jnp.float64)


def nacl_cells(ncell=2, a=5.64):
    """Rock-salt supercell: returns (box, na_coords, cl_coords)."""
    base_na = np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                        [0, 0.5, 0.5]])
    base_cl = base_na + np.array([0.5, 0, 0])
    na, cl = [], []
    for i in range(ncell):
        for j in range(ncell):
            for k in range(ncell):
                off = np.array([i, j, k])
                na.append((base_na + off) * a)
                cl.append((base_cl + off) * a)
    box = ncell * a * np.eye(3)
    return box, np.concatenate(na) , np.concatenate(cl)


def test_madelung_nacl():
    a = 5.64
    box, na, cl = nacl_cells(2, a)
    params, state = two_species_lattice(box, na, cl)
    cfg = cfg_es(ewald_kmax=10)
    e, _ = energy_mod.total_energy(state.pos, state.box, state.mol_alive,
                                   params, cfg, thermo())
    n_ions = len(na) + len(cl)
    r_nn = a / 2
    expect = -n_ions * MADELUNG_NACL * KE / (2 * r_nn)
    assert float(e.es) == pytest.approx(expect, rel=1e-6)


def test_madelung_cscl():
    a = 4.11  # CsCl lattice constant; nn distance = a*sqrt(3)/2
    n = 3
    cs, cl = [], []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                cs.append(np.array([i, j, k], float) * a)
                cl.append((np.array([i, j, k], float) + 0.5) * a)
    box = n * a * np.eye(3)
    params, state = two_species_lattice(box, np.array(cs), np.array(cl))
    cfg = cfg_es(ewald_kmax=10)
    e, _ = energy_mod.total_energy(state.pos, state.box, state.mol_alive,
                                   params, cfg, thermo())
    n_ions = 2 * n ** 3
    r_nn = a * np.sqrt(3) / 2
    expect = -n_ions * MADELUNG_CSCL * KE / (2 * r_nn)
    assert float(e.es) == pytest.approx(expect, rel=1e-6)


def test_ewald_alpha_invariance():
    """Total Ewald energy must be independent of the splitting alpha."""
    box, na, cl = nacl_cells(2)
    params, state = two_species_lattice(box, na, cl)
    outs = []
    # alpha*rc must stay >= ~3.5 for the real-space truncation error to be
    # below 1e-6 (rc = 5.64 here); the default is exactly 3.5/rc.
    for alpha in (0.62, 0.7, 0.8):
        cfg = cfg_es(ewald_kmax=12, ewald_alpha=alpha)
        e, _ = energy_mod.total_energy(state.pos, state.box, state.mol_alive,
                                       params, cfg, thermo())
        outs.append(float(e.es))
    np.testing.assert_allclose(outs, outs[0], rtol=2e-6)


def test_intramolecular_exclusion():
    """A rigid 2-charge molecule alone in a box: with the direct
    intramolecular interaction excluded, the only remaining electrostatic
    energy is the interaction with its own periodic images — a dipole
    lattice term that (a) is alpha-invariant, (b) decays ~1/L^3 with box
    size, and (c) is tiny vs the raw intramolecular energy (~1e4 K)."""
    from mpmc_tpu.state import Species, build_system
    sp = Species(name="dip", atom_names=("P", "M"),
                 pos=np.array([[0, 0, 0], [1.1, 0, 0.3]]),
                 mass=np.array([1.0, 1.0]),
                 charge=np.array([0.5, -0.5]),
                 polar=np.zeros(2), eps=np.zeros(2), sig=np.zeros(2))
    es = {}
    for L in (30.0, 60.0):
        box = L * np.eye(3)
        params, state = build_system(box, species=(sp,), capacity=(1,),
                                     initial_counts=(1,), dtype=jnp.float64)
        vals = []
        for alpha in (3.5 / (L / 2), 4.5 / (L / 2)):
            cfg = cfg_es(ewald_kmax=14, ewald_alpha=alpha)
            e, _ = energy_mod.total_energy(
                state.pos, state.box, state.mol_alive, params, cfg, thermo())
            vals.append(float(e.es))
        np.testing.assert_allclose(vals, vals[0], atol=1e-6)
        es[L] = vals[0]
        assert abs(float(e.es_excl)) > 1.0  # the correction is non-zero
    # image interaction decays ~1/L^3 and is small vs intramolecular scale
    assert abs(es[30.0]) < 20.0
    assert abs(es[60.0]) < abs(es[30.0]) / 6.0


def test_structure_factor_delta_update():
    """Moving one molecule: S(k) delta update == recompute from scratch."""
    rng = np.random.default_rng(5)
    L = 14.0
    coords = rng.uniform(0, L, (10, 3))
    box = L * np.eye(3)
    params, state = two_species_lattice(box, coords[:5], coords[5:],
                                        qa=0.3, qb=-0.3)
    alive = state.atom_alive(params)
    kv = ewald.kvectors(state.box, 6)
    sk_re, sk_im = ewald.structure_factor(state.pos, params.charge, alive, kv)
    # move molecule 4 (atom 4)
    new_pos = state.pos.at[4].add(jnp.asarray([1.3, -0.7, 0.2]))
    idx = params.mol_atoms[4]
    ok = jnp.arange(idx.shape[0]) < params.mol_natoms[4]
    old_re, old_im = ewald.mol_structure_factor(
        state.pos[idx], params.charge[idx], ok, kv)
    nre, nim = ewald.mol_structure_factor(
        new_pos[idx], params.charge[idx], ok, kv)
    upd_re = sk_re - old_re + nre
    upd_im = sk_im - old_im + nim
    ref_re, ref_im = ewald.structure_factor(new_pos, params.charge, alive, kv)
    np.testing.assert_allclose(np.asarray(upd_re), np.asarray(ref_re),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(upd_im), np.asarray(ref_im),
                               atol=1e-10)


def test_wolf_approximates_ewald_nacl():
    box, na, cl = nacl_cells(2)
    params, state = two_species_lattice(box, na, cl)
    e_ref, _ = energy_mod.total_energy(
        state.pos, state.box, state.mol_alive, params,
        cfg_es(ewald_kmax=10), thermo())
    e_wolf, _ = energy_mod.total_energy(
        state.pos, state.box, state.mol_alive, params,
        cfg_es(coulomb="wolf"), thermo())
    assert float(e_wolf.es) == pytest.approx(float(e_ref.es), rel=2e-2)


def test_total_es_invariant_under_ewald_parameters():
    """The physical electrostatic energy must be independent of the
    splitting parameter alpha and (converged) kmax — a stringent
    cross-check of real/recip/self/exclusion consistency."""
    import dataclasses
    from mpmc_tpu.config import Thermo
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops import energy as energy_mod
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=4, n_h2=8, capacity=16, dtype="float64")
    cfg = dataclasses.replace(cfg, rd_potential="none", rd_lrc=False,
                              use_pallas=False)
    # alpha*rc >= 3.5 keeps the real-space sum converged; kmax=14 keeps
    # the reciprocal sum converged for every alpha here.  The individual
    # terms shift by ~1e5 K across these parameters and must cancel.
    ref = None
    rc = 8.0
    for alpha in (0.4375, 0.50, 0.55):
        c = dataclasses.replace(cfg, cutoff=rc, ewald_alpha=float(alpha),
                                ewald_kmax=14)
        e, _ = energy_mod.total_energy(state.pos, state.box,
                                       state.mol_alive, params, c, thermo)
        es = float(e.es)
        if ref is None:
            ref = es
        else:
            assert es == pytest.approx(ref, abs=0.5), alpha


class TestMxuStructureFactor:
    """Separable MXU S(k) (ops/ewald.py::structure_factor_mxu):
    identical physics to the half-space path on the same k-sphere."""

    def _random_system(self, seed=0, n=40, triclinic=True):
        rng = np.random.default_rng(seed)
        if triclinic:
            box = jnp.asarray([[14.0, 0.0, 0.0], [2.5, 13.0, 0.0],
                               [-1.5, 3.0, 12.0]], jnp.float64)
        else:
            box = jnp.eye(3, dtype=jnp.float64) * 13.0
        pos = jnp.asarray(rng.uniform(0, 10, (n, 3)), jnp.float64)
        q = rng.uniform(-1, 1, n)
        q = jnp.asarray(q - q.mean(), jnp.float64)
        alive = jnp.asarray(rng.random(n) < 0.9)
        return box, pos, q, alive

    def test_sf_matches_direct_on_rect_table(self):
        box, pos, q, alive = self._random_system()
        kmax = 5
        import dataclasses
        cfg = cfg_es(ewald_mxu=True, ewald_kmax=kmax)
        kv, _ = ewald.ktable(box, cfg)
        d_re, d_im = ewald.structure_factor(pos, q, alive, kv)
        m_re, m_im = ewald.structure_factor_mxu(pos, q, alive, box, kmax)
        np.testing.assert_allclose(np.asarray(m_re), np.asarray(d_re),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(m_im), np.asarray(d_im),
                                   atol=1e-9)

    def test_recip_energy_matches_half_space(self):
        for seed in (0, 3):
            box, pos, q, alive = self._random_system(seed)
            alpha = 0.35
            e_half, _ = ewald.recip_energy(pos, q, alive, box, alpha,
                                           cfg_es(ewald_kmax=6))
            e_mxu, _ = ewald.recip_energy(
                pos, q, alive, box, alpha,
                cfg_es(ewald_mxu=True, ewald_kmax=6))
            assert float(e_mxu) == pytest.approx(float(e_half), rel=1e-12)

    def test_gcmc_bookkeeping_with_mxu(self):
        import dataclasses
        from mpmc_tpu.mc import metropolis
        from mpmc_tpu.models import systems
        params, state, cfg, thermo_ = systems.mof_h2_gcmc(
            n_side=3, n_h2=6, capacity=12, ewald_kmax=4)
        cfg = dataclasses.replace(cfg, dtype="float64", ewald_mxu=True,
                                  use_pallas=False)
        import jax
        to64 = lambda x: (x.astype(jnp.float64)
                          if hasattr(x, "dtype") and x.dtype == jnp.float32
                          else x)
        state = jax.tree_util.tree_map(to64, state)
        params = jax.tree_util.tree_map(to64, params)
        state = metropolis.initialize(state, params, cfg, thermo_)
        assert state.sk_re.shape[0] == (2 * 4 + 1) ** 3
        st, stats = metropolis.run_chunk(state, params, cfg, thermo_, 200)
        st2 = metropolis.initialize(st, params, cfg, thermo_)
        assert float(st.energy.total) == pytest.approx(
            float(st2.energy.total), abs=1e-8)
        assert int(np.asarray(stats.accepts).sum()) > 0
