"""Golden per-term energy regression suite (SURVEY.md §4: "create the
parity suite the reference lacks").

Five canonical configurations with their exact f64 per-term energies
pinned.  These protect every physics path against silent regressions
across rounds; any intentional physics change must regenerate the
numbers and say why in the commit."""
import dataclasses
import numpy as np
import pytest

from mpmc_tpu.config import RunConfig, Thermo
from mpmc_tpu.models import systems
from mpmc_tpu.ops import energy as energy_mod
from mpmc_tpu.state import build_system

GOLDEN = {
    "lj_fluid": {
        "rd": 176717.24181822757,
        "lrc": -5541.861160006125,
        "es_real": 0.0, "es_recip": 0.0, "es_self": 0.0, "es_excl": 0.0,
        "polar": 0.0, "vdw": 0.0,
    },
    "mof_h2_ewald": {
        "rd": -2053.7646227351684,
        "lrc": -94.22273302761286,
        "es_real": 4.394874477117243,
        "es_recip": 36599.01152755946,
        "es_self": -671517.8123299055,
        "es_excl": 635427.6186025969,
        "polar": 0.0, "vdw": 0.0,
    },
    "mof_h2_polar_fh": {
        "rd": -1377.6380869302736,
        "lrc": -177.65717627845785,
        "es_real": 77.45832899430759,
        "es_recip": 67689.2952006656,
        # es_self regenerated r3: the n_side=3 framework has an ODD
        # alternating-charge count (net Q = -0.3 e), and the charged-
        # cell jellium correction -ke pi Q^2/(2 a^2 V) = -40.176 K now
        # rides in es_self (ops/ewald.background_correction) — the
        # pre-r3 value was the gauge-dependent bare sum
        "es_self": -567618.0215387235,
        "es_excl": 495824.93506123725,
        "polar": -2.041417681448245,
        "vdw": 0.0,
    },
    "mof_h2_wolf_wh": {
        "rd": -2052.6644285375055,
        "lrc": -94.21137396271862,
        "es_real": 6.085689627599173,
        "es_recip": 0.0,
        "es_self": -384519.8357274294,
        "es_excl": 0.0, "polar": 0.0, "vdw": 0.0,
    },
    "h2_dispexp_gwp": {
        "rd": 1711.760727551071,
        "lrc": 0.0,
        "es_real": 20401.723839375438,
        "es_recip": 0.0, "es_self": 0.0, "es_excl": 0.0,
        "polar": 0.0, "vdw": 0.0,
    },
}


def _build(name):
    if name == "lj_fluid":
        return systems.lj_fluid(n=32, dtype="float64", seed=3)
    if name == "mof_h2_ewald":
        return systems.mof_h2_gcmc(n_side=4, n_h2=8, capacity=16,
                                   dtype="float64")
    if name == "mof_h2_polar_fh":
        p, s, c, t = systems.mof_h2_gcmc(n_side=3, n_h2=6, capacity=8,
                                         polarization=True,
                                         dtype="float64")
        c = dataclasses.replace(c, feynman_hibbs=True,
                                polar_solver="direct")
        return p, s, c, t
    if name == "mof_h2_wolf_wh":
        p, s, c, t = systems.mof_h2_gcmc(n_side=4, n_h2=8, capacity=16,
                                         dtype="float64")
        c = dataclasses.replace(c, coulomb="wolf",
                                mixing_rule="waldman_hagler")
        return p, s, c, t
    if name == "h2_dispexp_gwp":
        sp = systems.h2_bss3()
        sp = dataclasses.replace(
            sp, c6=np.array([12.0, 0, 0]), c8=np.array([215.0, 0, 0]),
            c10=np.array([4813.0, 0, 0]), eps=np.array([1.2e5, 0, 0]),
            sig=np.array([1.8, 0, 0]), gwp_alpha=np.array([0.3, 0.2, 0.2]))
        c = RunConfig(ensemble="nvt", rd_potential="disp_expansion",
                      coulomb="gwp", rd_lrc=False, dtype="float64")
        rng = np.random.default_rng(4)
        coms = rng.uniform(3.0, 15.0, (6, 3))
        p, s = build_system(np.eye(3) * 18.0, species=(sp,), capacity=(6,),
                            initial_counts=(6,),
                            initial_pos={0: coms[:, None] + sp.pos[None]},
                            dtype=c.jdtype, seed=9)
        t = Thermo.make(temperature=100.0, n_species=1, dtype=c.jdtype)
        return p, s, c, t
    raise KeyError(name)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_per_term_energies(name):
    params, state, cfg, thermo = _build(name)
    e, _ = energy_mod.total_energy(state.pos, state.box, state.mol_alive,
                                   params, cfg, thermo)
    for term, want in GOLDEN[name].items():
        got = float(getattr(e, term))
        assert got == pytest.approx(want, rel=1e-10, abs=1e-9), (
            f"{name}.{term}: got {got!r}, golden {want!r}")
