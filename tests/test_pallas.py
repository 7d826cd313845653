"""Fused Pallas pair kernel vs the jnp reference pass (interpret mode on
CPU; the real-TPU path is exercised by bench.py / __graft_entry__.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpmc_tpu.models import systems
from mpmc_tpu.ops import pairs
from mpmc_tpu.ops.pallas import pair_kernel as pk


def _compare(params, state, cfg, thermo, rtol):
    alive = state.atom_alive(params)
    rc = pairs.derived_cutoff(state.box, cfg)
    alpha = pairs.derived_alpha(rc, cfg)
    rj = pairs.pair_pass(state.pos.astype(jnp.float32),
                         state.box.astype(jnp.float32), alive, params,
                         cfg, thermo.temperature, split_frozen=True)
    rp = pk.pair_pass_pallas(state.pos, state.box, alive, params, cfg,
                             rc, alpha, interpret=True)
    for side in (0, 1):
        for name in ("rd", "es_real", "es_excl", "lrc_coeff", "min_r2"):
            a = float(getattr(rj[side], name))
            b = float(getattr(rp[side], name))
            assert a == pytest.approx(b, rel=rtol, abs=1e-2), (
                f"{name} side={side}: jnp={a} pallas={b}")


def test_pair_kernel_matches_jnp_mof():
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=4, n_h2=8, capacity=16, dtype="float32")
    # f32 params for the jnp pass comparison
    _compare(params, state, cfg, thermo, rtol=5e-4)


def test_pair_kernel_matches_jnp_lj_fluid():
    params, state, cfg, thermo = systems.lj_fluid(n=64, dtype="float32")
    _compare(params, state, cfg, thermo, rtol=1e-5)


def test_pair_kernel_row_restricted_matches_jnp():
    """row_start > 0 (the frozen-reuse fast refresh): kernel rows start
    mid-array (row_tile0 > 0 with n_side=7: 343 frozen rows > TI=256),
    frozen-prefix rows reappear as columns, ff slots come back zero."""
    from mpmc_tpu.mc import metropolis
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=7, n_h2=16, capacity=32, dtype="float32")
    F = metropolis.frozen_refresh_rows(params, cfg)
    assert F > pk.TI   # exercises the row-tile offset arithmetic
    alive = state.atom_alive(params)
    rc = pairs.derived_cutoff(state.box, cfg)
    alpha = pairs.derived_alpha(rc, cfg)
    rj = pairs.pair_pass(state.pos.astype(jnp.float32),
                         state.box.astype(jnp.float32), alive, params,
                         cfg, thermo.temperature, row_start=F)
    act, ff = pk.pair_pass_pallas(state.pos, state.box, alive, params,
                                  cfg, rc, alpha, interpret=True,
                                  row_start=F)
    for name in ("rd", "es_real", "es_excl", "lrc_coeff", "min_r2"):
        a = float(getattr(rj, name))
        b = float(getattr(act, name))
        assert a == pytest.approx(b, rel=5e-4, abs=1e-2), (
            f"{name}: jnp={a} pallas={b}")
        if name != "min_r2":
            assert float(getattr(ff, name)) == 0.0


@pytest.mark.parametrize("rd", ["sg", "dreiding", "b14_7",
                                "disp_expansion"])
def test_pair_kernel_matches_jnp_rd_variants(rd):
    import dataclasses
    import numpy as onp
    from mpmc_tpu.config import RunConfig, Thermo
    from mpmc_tpu.state import Species, build_system
    sp = Species(
        name="X", atom_names=("X",), pos=onp.zeros((1, 3)),
        mass=onp.array([20.0]), charge=onp.array([0.1]),
        polar=onp.zeros(1),
        eps=onp.array([1.0e5 if rd == "disp_expansion" else 80.0]),
        sig=onp.array([1.9 if rd == "disp_expansion" else 3.2]),
        c6=onp.array([900.0]), c8=onp.array([3000.0]),
        c10=onp.array([9000.0]))
    cfg = RunConfig(ensemble="nvt", rd_potential=rd, coulomb="cutoff",
                    rd_lrc=False, dtype="float32")
    rng = onp.random.default_rng(8)
    coms = rng.uniform(1.0, 15.0, (12, 3))
    params, state = build_system(
        onp.eye(3) * 16.0, species=(sp,), capacity=(12,),
        initial_counts=(12,), initial_pos={0: coms[:, None]},
        dtype=cfg.jdtype)
    thermo = Thermo.make(temperature=200.0, n_species=1, dtype=cfg.jdtype)
    _compare(params, state, cfg, thermo, rtol=1e-3)
    # delta kernel too
    alive = state.atom_alive(params)
    rc = pairs.derived_cutoff(state.box, cfg)
    alpha = pairs.derived_alpha(rc, cfg)
    rj = pairs.mol_pair_pass(state.pos, state.box, alive, params, cfg,
                             thermo.temperature, jnp.asarray(2))
    rp = pk.mol_pair_pass_pallas(state.pos, state.box, alive, params,
                                 cfg, jnp.asarray(2), rc, alpha,
                                 interpret=True)
    assert float(rj.rd) == pytest.approx(float(rp.rd), rel=2e-4, abs=1e-3)
    assert float(rj.es_real) == pytest.approx(float(rp.es_real),
                                              rel=2e-4, abs=1e-4)


def test_erfc_accuracy():
    from scipy.special import erfc as s_erfc  # scipy ships with the image
    x = np.linspace(0.0, 6.0, 500)
    ours = np.asarray(pk._erfc(jnp.asarray(x, jnp.float64)))
    assert np.max(np.abs(ours - s_erfc(x))) < 2e-7


def test_erf_small_x_relative_accuracy():
    from scipy.special import erf as s_erf
    x = np.linspace(1e-4, 0.5, 200)
    ours = np.asarray(pk._erf(jnp.asarray(x, jnp.float64)))
    rel = np.abs(ours - s_erf(x)) / s_erf(x)
    assert np.max(rel) < 1e-7


def test_supported_gating():
    _, _, cfg, _ = systems.mof_h2_gcmc(n_side=3, n_h2=2, capacity=4)
    assert pk.supported(cfg)
    import dataclasses
    assert not pk.supported(dataclasses.replace(cfg, dtype="float64"))
    assert not pk.supported(dataclasses.replace(cfg, feynman_hibbs=True))
    assert pk.supported(dataclasses.replace(cfg, rd_potential="sg"))
    assert pk.supported(dataclasses.replace(cfg, rd_potential="disp_expansion"))


class TestTholeKernels:
    def _system(self):
        params, state, cfg, thermo = systems.mof_h2_gcmc(
            n_side=4, n_h2=8, capacity=16, polarization=True,
            dtype="float32")
        return params, state, cfg

    def test_charge_field_matches_jnp(self):
        from mpmc_tpu.ops import thole
        from mpmc_tpu.ops.pallas import thole_kernel as tk
        params, state, cfg = self._system()
        alive = state.atom_alive(params)
        rc = pairs.derived_cutoff(state.box, cfg)
        e_jnp = thole.static_field_direct(state.pos, state.box, alive,
                                          params, cfg)
        e_pal = tk.charge_field(
            state.pos, state.box, alive, params.charge, params.mol_id,
            rc, jnp.asarray(cfg.polar_damp, jnp.float32),
            cfg.polar_damp_type, interpret=True)
        np.testing.assert_allclose(np.asarray(e_pal), np.asarray(e_jnp),
                                   rtol=2e-4, atol=2e-6)

    def test_dipole_field_matches_jnp(self):
        from mpmc_tpu.ops import thole
        from mpmc_tpu.ops.pallas import thole_kernel as tk
        params, state, cfg = self._system()
        alive = state.atom_alive(params)
        pol_ok = alive & (params.polar > 0)
        rc = pairs.derived_cutoff(state.box, cfg)
        key = jax.random.PRNGKey(0)
        mu = jnp.where(pol_ok[:, None],
                       jax.random.normal(key, state.pos.shape,
                                         jnp.float32) * 0.05, 0.0)
        e_jnp = thole.dipole_matvec(state.pos, state.box, alive, params,
                                    cfg, mu)
        e_pal = tk.dipole_field(
            state.pos, state.box, pol_ok, mu, params.mol_id, rc,
            jnp.asarray(cfg.polar_damp, jnp.float32),
            cfg.polar_damp_type, interpret=True)
        np.testing.assert_allclose(np.asarray(e_pal), np.asarray(e_jnp),
                                   rtol=2e-4, atol=2e-6)


def test_thole_kernel_ortho_fast_path_exact():
    """cfg.ortho_box min-image in the Thole kernels: the per-pair
    displacements are bit-identical on a diagonal box (IEEE
    x + 0.0 == x), so the summed fields must agree to reduction-
    reassociation ulps only (the branch changes the HLO ahead of the
    tile sum, and the compiler may fuse that reduction differently —
    measured <=1e-7 relative on this system, far below the f32 SCF
    tolerance)."""
    from mpmc_tpu.ops.pallas import thole_kernel as tk
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=4, n_h2=8, capacity=16, polarization=True,
        dtype="float32")
    alive = state.atom_alive(params)
    pol_ok = alive & (params.polar > 0)
    rc = pairs.derived_cutoff(state.box, cfg)
    lam = jnp.asarray(cfg.polar_damp, jnp.float32)
    mu = jnp.where(pol_ok[:, None],
                   jax.random.normal(jax.random.PRNGKey(2),
                                     state.pos.shape, jnp.float32) * 0.05,
                   0.0)
    for fn, src, okr in ((tk.charge_field, params.charge, alive),
                         (tk.dipole_field, mu, pol_ok)):
        gen = fn(state.pos, state.box, okr, src, params.mol_id, rc, lam,
                 cfg.polar_damp_type, interpret=True, ortho=False)
        fast = fn(state.pos, state.box, okr, src, params.mol_id, rc, lam,
                  cfg.polar_damp_type, interpret=True, ortho=True)
        np.testing.assert_allclose(np.asarray(gen), np.asarray(fast),
                                   rtol=5e-7, atol=1e-9)


def test_mol_pair_kernel_matches_jnp():
    """Delta-pass kernel vs the jnp mol_pair_pass for several molecules."""
    from mpmc_tpu.ops.pallas import pair_kernel as pk
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=4, n_h2=8, capacity=16, dtype="float32")
    alive = state.atom_alive(params)
    rc = pairs.derived_cutoff(state.box, cfg)
    alpha = pairs.derived_alpha(rc, cfg)
    for mol in (1, 3, 7):
        rj = pairs.mol_pair_pass(state.pos, state.box, alive, params, cfg,
                                 thermo.temperature, jnp.asarray(mol))
        rp = pk.mol_pair_pass_pallas(state.pos, state.box, alive, params,
                                     cfg, jnp.asarray(mol), rc, alpha,
                                     interpret=True)
        for name in ("rd", "es_real", "lrc_coeff", "min_r2"):
            a, b = float(getattr(rj, name)), float(getattr(rp, name))
            assert a == pytest.approx(b, rel=5e-4, abs=1e-2), (mol, name)


def test_thole_kernels_linear_damping():
    import dataclasses
    from mpmc_tpu.ops import thole
    from mpmc_tpu.ops.pallas import thole_kernel as tk
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=4, n_h2=8, capacity=16, polarization=True, dtype="float32")
    cfg = dataclasses.replace(cfg, polar_damp_type="linear",
                              polar_damp=2.0)
    alive = state.atom_alive(params)
    rc = pairs.derived_cutoff(state.box, cfg)
    e_jnp = thole.static_field_direct(state.pos, state.box, alive, params,
                                      cfg)
    e_pal = tk.charge_field(
        state.pos, state.box, alive, params.charge, params.mol_id, rc,
        jnp.asarray(cfg.polar_damp, jnp.float32), cfg.polar_damp_type,
        interpret=True)
    np.testing.assert_allclose(np.asarray(e_pal), np.asarray(e_jnp),
                               rtol=2e-4, atol=2e-6)
