"""Framework cell lists (ops/celllist.py): the culled per-move delta pass
must be EXACT — same pairs as the dense O(A*N) pass, no skin — and the MC
bookkeeping invariant must hold against dense full recomputes."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from mpmc_tpu.config import RunConfig, Thermo
from mpmc_tpu.mc import metropolis
from mpmc_tpu.models import systems
from mpmc_tpu.ops import celllist, pairs


def _mof(cutoff=6.0, polar=False, n_side=6, n_h2=12, capacity=24):
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=n_side, spacing=4.0, n_h2=n_h2, capacity=capacity,
        temperature=77.0, pressure=2.0, dtype="float64",
        polarization=polar)
    cfg = dataclasses.replace(cfg, cutoff=cutoff, cell_list=True,
                              use_pallas=False)
    # min_reduction=None: force the index even on this deliberately tiny
    # test system (profitability is a production concern, exactness isn't)
    params = celllist.attach(params, state.pos, state.box, cfg,
                             min_reduction=None)
    assert params.cell_index is not None
    return params, state, cfg, thermo


def test_culled_equals_dense():
    """Every alive molecule's culled delta terms match the dense pass to
    summation rounding (rd, es_real, lrc are pair-for-pair identical)."""
    params, state, cfg, thermo = _mof()
    cfg_dense = dataclasses.replace(cfg, cell_list=False)
    alive = state.atom_alive(params)
    for mol in range(1, int(params.n_mols_max)):
        if not bool(state.mol_alive[mol]):
            continue
        culled = pairs.mol_pair_pass(state.pos, state.box, alive, params,
                                     cfg, thermo.temperature, mol)
        dense = pairs.mol_pair_pass(state.pos, state.box, alive, params,
                                    cfg_dense, thermo.temperature, mol)
        for slot in ("rd", "es_real", "lrc_coeff"):
            a, b = float(getattr(culled, slot)), float(getattr(dense, slot))
            assert a == pytest.approx(b, rel=1e-12, abs=1e-10), (mol, slot)


def test_culled_covers_boundary_molecules():
    """Molecules straddling the periodic boundary gather wrapped cells."""
    params, state, cfg, thermo = _mof()
    cfg_dense = dataclasses.replace(cfg, cell_list=False)
    # move the first sorbate to a cell corner (worst case for wrapping)
    idx = np.asarray(params.mol_atoms[1])
    na = int(params.mol_natoms[1])
    pos = np.asarray(state.pos).copy()
    tmpl = np.asarray(params.species_pos[0])[:na]
    pos[idx[:na]] = tmpl + np.array([0.05, 0.02, -0.03])
    pos_j = jnp.asarray(pos)
    alive = state.atom_alive(params)
    culled = pairs.mol_pair_pass(pos_j, state.box, alive, params, cfg,
                                 thermo.temperature, 1)
    dense = pairs.mol_pair_pass(pos_j, state.box, alive, params, cfg_dense,
                                thermo.temperature, 1)
    assert float(culled.rd) == pytest.approx(float(dense.rd), rel=1e-12)
    assert float(culled.es_real) == pytest.approx(float(dense.es_real),
                                                  rel=1e-12, abs=1e-10)


def test_gcmc_bookkeeping_with_cell_list():
    """Hundreds of culled-delta GCMC steps agree with a dense full-pass
    recompute — proves the culled pair set is exact through inserts,
    deletes, displacements and rotations."""
    params, state, cfg, thermo = _mof()
    state = metropolis.initialize(state, params, cfg, thermo)
    state, stats = metropolis.run_chunk(state, params, cfg, thermo, 300)
    fresh = metropolis.initialize(state, params, cfg, thermo)
    for slot in ("rd", "es_real", "es_recip", "es_self", "es_excl", "lrc"):
        assert float(getattr(state.energy, slot)) == pytest.approx(
            float(getattr(fresh.energy, slot)), rel=1e-8, abs=1e-6), slot
    assert int(stats.attempts[1]) > 0 and int(stats.attempts[2]) > 0
    assert int(stats.accepts.sum()) > 0


def test_attach_refuses_npt_and_degrades_gracefully():
    params, state, cfg, thermo = systems.lj_fluid(n=32, dtype="float64")
    # no frozen framework -> attach is a no-op
    cfg2 = dataclasses.replace(cfg, cutoff=4.0, cell_list=True)
    p2 = celllist.attach(params, state.pos, state.box, cfg2)
    assert p2.cell_index is None
    with pytest.raises(ValueError):
        celllist.build_cell_index(
            params, state.pos, state.box,
            dataclasses.replace(cfg2, ensemble="npt"))
