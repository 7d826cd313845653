import jax.numpy as jnp
import numpy as np
import pytest

from mpmc_tpu.ops import pbc


def test_cubic_volume_and_reciprocal():
    box = 10.0 * jnp.eye(3)
    assert float(pbc.cell_volume(box)) == pytest.approx(1000.0)
    rb = pbc.reciprocal_basis(box)
    np.testing.assert_allclose(np.asarray(rb), 2 * np.pi / 10.0 * np.eye(3),
                               atol=1e-12)


def test_reciprocal_orthogonality_triclinic():
    box = jnp.array([[10.0, 0.0, 0.0],
                     [3.0, 9.0, 0.0],
                     [1.0, 2.0, 8.0]])
    rb = pbc.reciprocal_basis(box)
    # b_i . k_j = 2 pi delta_ij
    dots = np.asarray(box @ np.asarray(rb).T)
    np.testing.assert_allclose(dots, 2 * np.pi * np.eye(3), atol=1e-10)


def test_min_image_cubic():
    box = 10.0 * jnp.eye(3)
    dr = jnp.array([9.0, -9.0, 4.9])
    out = pbc.min_image(dr, box)
    np.testing.assert_allclose(np.asarray(out), [-1.0, 1.0, 4.9], atol=1e-12)


def test_min_image_triclinic_shortest():
    box = jnp.array([[10.0, 0.0, 0.0],
                     [5.0, 9.0, 0.0],
                     [0.0, 0.0, 12.0]])
    rng = np.random.default_rng(0)
    pts = rng.uniform(-30, 30, size=(50, 3))
    out = np.asarray(pbc.min_image(jnp.asarray(pts), box))
    # brute force over neighbor images
    shifts = np.array([[i, j, k] for i in range(-2, 3)
                       for j in range(-2, 3) for k in range(-2, 3)])
    imgs = shifts @ np.asarray(box)
    half_width = 0.5 * float(pbc.min_perpendicular_width(box))
    for p, o in zip(pts, out):
        d = np.linalg.norm(p + imgs, axis=1).min()
        # The fractional round-trip is exact whenever the true shortest
        # distance is below half the min perpendicular width — the regime in
        # which all cutoff-limited interactions live (SURVEY.md §2 PBC/cell).
        if d < half_width:
            assert np.linalg.norm(o) == pytest.approx(d, abs=1e-9)


def test_min_perpendicular_width_cubic():
    box = 10.0 * jnp.eye(3)
    assert float(pbc.min_perpendicular_width(box)) == pytest.approx(10.0)
    assert float(pbc.default_cutoff(box)) == pytest.approx(5.0)


def test_wrap_positions():
    box = 10.0 * jnp.eye(3)
    pos = jnp.array([[11.0, -0.5, 25.0]])
    out = np.asarray(pbc.wrap_positions(pos, box))
    np.testing.assert_allclose(out, [[1.0, 9.5, 5.0]], atol=1e-12)


def test_cell_from_abc_cubic():
    box = np.asarray(pbc.cell_from_abc(10.0, 10.0, 10.0, 90.0, 90.0, 90.0))
    np.testing.assert_allclose(box, 10.0 * np.eye(3), atol=1e-9)


def test_cell_from_abc_volume():
    # V = abc sqrt(1 - cos^2 a - cos^2 b - cos^2 g + 2 cos a cos b cos g)
    a, b, c, al, be, ga = 8.0, 9.0, 10.0, 80.0, 95.0, 100.0
    box = pbc.cell_from_abc(a, b, c, al, be, ga)
    ca, cb, cg = (np.cos(np.deg2rad(x)) for x in (al, be, ga))
    vref = a * b * c * np.sqrt(
        1 - ca**2 - cb**2 - cg**2 + 2 * ca * cb * cg)
    assert float(pbc.cell_volume(box)) == pytest.approx(vref, rel=1e-10)


def test_triclinic_energy_invariance():
    """A dimer's LJ energy must be identical in a cubic cell and in a
    sheared triclinic cell large enough that images don't contribute."""
    import jax.numpy as jnp
    from mpmc_tpu.config import RunConfig, Thermo
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops import energy as energy_mod
    from mpmc_tpu.state import build_system
    sp = systems.lj_atom()
    cfg = RunConfig(ensemble="nvt", coulomb="none", rd_lrc=False,
                    dtype="float64", cutoff=8.0)
    thermo = Thermo.make(n_species=1, dtype=cfg.jdtype)
    pos0 = np.array([[[10.0, 10.0, 10.0]], [[13.7, 10.0, 10.0]]])
    cubic = np.eye(3) * 30.0
    tric = np.array([[30.0, 0.0, 0.0],
                     [9.0, 28.0, 0.0],
                     [6.0, 5.0, 27.0]])
    es = []
    for box in (cubic, tric):
        params, state = build_system(box, species=(sp,), capacity=(2,),
                                     initial_counts=(2,),
                                     initial_pos={0: pos0},
                                     dtype=cfg.jdtype)
        e, _ = energy_mod.total_energy(state.pos, state.box,
                                       state.mol_alive, params, cfg,
                                       thermo)
        es.append(float(e.total))
    assert es[0] == pytest.approx(es[1], rel=1e-12)


def test_abcbasis_grammar_roundtrip():
    from mpmc_tpu.io import input_script
    job = input_script.parse(
        "abcbasis 10 12 14 90 90 90\nensemble te\n")
    np.testing.assert_allclose(job.basis, np.diag([10.0, 12.0, 14.0]),
                               atol=1e-12)
    job2 = input_script.parse(
        "abcbasis 10 10 10 60 60 60\nensemble te\n")
    # cell volume of a rhombohedral 60-degree cell: a^3 sqrt(1-3c^2+2c^3)
    c = np.cos(np.deg2rad(60.0))
    v = 1000.0 * np.sqrt(1 - 3 * c * c + 2 * c ** 3)
    assert abs(np.linalg.det(job2.basis)) == pytest.approx(v, rel=1e-10)
