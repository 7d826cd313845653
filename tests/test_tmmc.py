"""Transition-matrix MC (RunConfig.tmmc — our documented single-run
isotherm extension to the reference's µVT driver, SURVEY §2 "MC main
loop" family).

The ideal gas is the exactness anchor: its insert/delete acceptance
probabilities are deterministic functions of the macrostate alone
(a_ins = min(1, fV/kT/(N+1)), a_del = min(1, N·kT/fV)), so every
collection-matrix row is an exact multiple of those probabilities and
the TMMC lnΠ links reproduce the Poisson distribution to machine
precision after ANY number of steps — far stronger than a statistical
histogram test.
"""
import io
import os

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import atom_species
from mpmc_tpu.analyze import tmmc_isotherm, tmmc_lnpi, tmmc_load, \
    tmmc_reweight
from mpmc_tpu.config import RunConfig, Thermo
from mpmc_tpu.constants import ATM2K_A3
from mpmc_tpu.mc import metropolis
from mpmc_tpu.state import build_system


def _ideal_gas_tmmc(L=20.0, T=300.0, cap=40, n0=5, target_n=8.0,
                    steps=3000, seed=3):
    f_atm = target_n * T / L ** 3 / ATM2K_A3
    sp = atom_species("He", eps=0.0, sig=0.0, charge=0.0, mass=4.0)
    params, state = build_system(L * np.eye(3), species=(sp,),
                                 capacity=(cap,), initial_counts=(n0,),
                                 dtype=jnp.float64, seed=seed)
    cfg = RunConfig(ensemble="uvt", rd_potential="none", coulomb="none",
                    rd_lrc=False, dtype="float64", insert_species=(0,),
                    tmmc=True)
    thermo = Thermo.make(temperature=T, fugacity=(f_atm,),
                         insert_probability=0.5, move_factor=1.0,
                         rot_factor=0.1, n_species=1, dtype=jnp.float64)
    state = metropolis.initialize(state, params, cfg, thermo)
    state, _ = metropolis.run_chunk(state, params, cfg, thermo, steps)
    return state, params, cfg, thermo, f_atm


def test_tmmc_ideal_gas_lnpi_exact():
    """lnΠ(N+1) − lnΠ(N) = ln(fV/kT/(N+1)) to machine precision: the
    collection matrix stores exact acceptance probabilities, not
    realized accept counts."""
    L, T = 20.0, 300.0
    state, params, cfg, thermo, f_atm = _ideal_gas_tmmc(L=L, T=T)
    c = np.asarray(state.tmmc_c)
    # every insert/delete attempt lands in exactly one counter
    n_att = c[:, 0].sum() + c[:, 2].sum()
    assert 0 < n_att <= 3000 and n_att == int(n_att)
    lnpi = tmmc_lnpi(c)
    idx = np.flatnonzero(np.isfinite(lnpi))
    assert idx.size >= 8       # a real window around <N> = 8
    fv_kt = f_atm * ATM2K_A3 * L ** 3 / T
    d = lnpi[idx[1:]] - lnpi[idx[:-1]]
    np.testing.assert_allclose(d, np.log(fv_kt / idx[1:]),
                               rtol=0, atol=1e-12)


def _poisson_window_moments(lam, window):
    """Exact (mean, var) of a Poisson(lam) truncated to the macrostate
    window — what TMMC reweighting must return when its lnΠ links are
    exact (the resolved window IS the support it can see)."""
    from math import lgamma
    n = np.asarray(window, np.float64)
    w = n * np.log(lam) - np.array([lgamma(v + 1.0) for v in n])
    w -= w.max()
    p = np.exp(w)
    p /= p.sum()
    mean = float((n * p).sum())
    return mean, float((((n - mean) ** 2) * p).sum())


def test_tmmc_reweight_recovers_ideal_isotherm():
    """Reweighting lnΠ to other fugacities reproduces the ideal-gas
    isotherm ⟨N⟩(f') = f'V/kT — to MACHINE precision against the
    window-truncated Poisson (the links are exact, so the only deviation
    from f'V/kT is the tail mass outside the resolved window, which the
    edge diagnostic reports)."""
    L, T = 20.0, 300.0
    state, params, cfg, thermo, f_atm = _ideal_gas_tmmc(
        L=L, T=T, steps=6000)
    c = np.asarray(state.tmmc_c)
    window = np.flatnonzero(np.isfinite(tmmc_lnpi(c)))
    fv_kt = f_atm * ATM2K_A3 * L ** 3 / T
    for ratio in (0.5, 1.0, 1.5):
        rows = tmmc_isotherm(c, f_atm, [ratio * f_atm])
        f, mean, var, edge = rows[0]
        want_m, want_v = _poisson_window_moments(ratio * fv_kt, window)
        assert mean == pytest.approx(want_m, abs=1e-9)
        assert var == pytest.approx(want_v, abs=1e-9)
        if ratio <= 1.0:
            # inside the well-sampled range the window tail is small and
            # the physical isotherm comes back; beyond it the edge
            # diagnostic is the contract (truncation is reported, not
            # hidden)
            assert mean == pytest.approx(ratio * fv_kt, abs=0.5)
        else:
            assert edge > 1e-6 or mean == pytest.approx(ratio * fv_kt,
                                                        abs=0.5)


def test_tmmc_refresh_preserves_collection():
    """Per-corrtime initialize() must not reset the accumulated matrix
    (it is a statistic, not a cache)."""
    state, params, cfg, thermo, _ = _ideal_gas_tmmc(steps=500)
    before = np.asarray(state.tmmc_c).sum()
    assert before > 0
    state = metropolis.initialize(state, params, cfg, thermo)
    assert np.asarray(state.tmmc_c).sum() == pytest.approx(before)
    state, _ = metropolis.run_chunk(state, params, cfg, thermo, 250)
    assert np.asarray(state.tmmc_c).sum() > before


def test_tmmc_gates():
    """Static gates: the fused µVT kernel ACCEPTS single-species tmmc
    (r3) — _ideal_gas_tmmc's f64 config is rejected by the f32 physics
    surface (_supported_physics), not by tmmc, and the same config in
    f32 passes; non-uvt input scripts are rejected at parse.  (tmmc +
    polar_delayed parses since r4 — the DA estimator composition,
    tested above.)"""
    import dataclasses

    from mpmc_tpu.io import input_script
    from mpmc_tpu.ops.pallas import mc_kernel

    state, params, cfg, thermo, _ = _ideal_gas_tmmc(steps=1)
    cfg_f = dataclasses.replace(cfg, fused_mc=True)
    assert not mc_kernel.supported_uvt(cfg_f, params)       # f64
    assert mc_kernel.supported_uvt(
        dataclasses.replace(cfg_f, dtype="float32"), params)
    with pytest.raises(ValueError, match="requires ensemble uvt"):
        input_script.parse("ensemble nvt\ntmmc on\n")


def test_tmmc_cli_roundtrip(tmp_path):
    """tmmc on → tmmc.json → ``analyze tmmc`` CSV isotherm: the ideal-gas
    ⟨N⟩(f) line comes back from one run."""
    from mpmc_tpu.analyze import main as analyze_main
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod

    L, T, target_n = 14.0, 150.0, 6.0
    f_atm = target_n * T / L ** 3 / ATM2K_A3
    pqr = tmp_path / "he.pqr"
    pqr.write_text(
        "ATOM 1 He HE 1 M 3.0 3.0 3.0 4.0 0.0 0.0 0.0 0.0\nEND\n")
    out = tmp_path / "run.tmmc.json"
    job = input_script.parse(f"""
ensemble uvt
numsteps 4000
corrtime 500
temperature {T}
fugacities {f_atm}
basis1 {L} 0 0
basis2 0 {L} 0
basis3 0 0 {L}
insert_probability 0.5
rd_lrc off
coulomb off
precision float64
max_molecules 30
tmmc on
tmmc_output {out}
pqr_input {pqr}
""")
    log = io.StringIO()
    run_mod.run(job, log=log)
    assert "tmmc collection matrix written" in log.getvalue()
    c, meta = tmmc_load([str(out)])
    assert meta["temperature"] == pytest.approx(T)
    assert c[:, 0].sum() + c[:, 2].sum() > 1000   # ~half the 4000 steps
    csv = tmp_path / "iso.csv"
    analyze_main(["tmmc", str(out), "--fugacities",
                  f"{0.5 * f_atm},{f_atm}", "--out", str(csv),
                  "--lnpi-out", str(tmp_path / "lnpi.csv")])
    rows = [ln.split(",") for ln in
            csv.read_text().strip().splitlines()[1:]]
    fv_kt = f_atm * ATM2K_A3 * L ** 3 / T
    window = np.flatnonzero(np.isfinite(tmmc_lnpi(c)))
    for row, ratio in zip(rows, (0.5, 1.0)):
        want_m, _ = _poisson_window_moments(ratio * fv_kt, window)
        assert float(row[1]) == pytest.approx(want_m, abs=1e-6)
    assert float(rows[1][1]) == pytest.approx(fv_kt, abs=0.5)
    assert (tmp_path / "lnpi.csv").exists()


def test_tmmc_bias_widens_window_and_keeps_links_exact(tmp_path):
    """Flat-histogram sampling (tmmc_bias): η = −lnΠ̂ rebuilt each
    corrtime pushes the walker across the macrostate range (window much
    wider than the unbiased Poisson visits), while the collection stays
    UNBIASED — the ideal-gas lnΠ links remain exact to machine
    precision.  This is the defining invariant of the TMMC loop: bias
    changes where the chain walks, never the estimator."""
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod

    L, T, target_n = 14.0, 150.0, 4.0
    f_atm = target_n * T / L ** 3 / ATM2K_A3
    pqr = tmp_path / "he.pqr"
    pqr.write_text(
        "ATOM 1 He HE 1 M 3.0 3.0 3.0 4.0 0.0 0.0 0.0 0.0\nEND\n")
    out = tmp_path / "b.tmmc.json"
    job = input_script.parse(f"""
ensemble uvt
numsteps 8000
corrtime 250
temperature {T}
fugacities {f_atm}
basis1 {L} 0 0
basis2 0 {L} 0
basis3 0 0 {L}
insert_probability 0.6
rd_lrc off
coulomb off
precision float64
max_molecules 24
tmmc_bias on
tmmc_output {out}
pqr_input {pqr}
""")
    assert job.cfg.tmmc     # tmmc_bias implies collection
    log = io.StringIO()
    run_mod.run(job, log=log)
    assert "flat-histogram" in log.getvalue()
    c, _ = tmmc_load([str(out)])
    lnpi = tmmc_lnpi(c)
    idx = np.flatnonzero(np.isfinite(lnpi))
    # Poisson(4) essentially never reaches N=15 unbiased
    # (P ~ 1e-6/attempt); the flat walker must
    assert idx.max() >= 15
    fv_kt = f_atm * ATM2K_A3 * L ** 3 / T
    d = lnpi[idx[1:]] - lnpi[idx[:-1]]
    np.testing.assert_allclose(d, np.log(fv_kt / idx[1:]),
                               rtol=0, atol=1e-12)


def test_tmmc_sum_rejects_mismatched_states(tmp_path):
    from mpmc_tpu.io import output as output_io

    c = np.zeros((5, 4))
    p1 = output_io.write_tmmc(str(tmp_path / "a.json"), c,
                              temperature=100.0, fugacities=[1.0],
                              volume=1000.0, species=["He"],
                              insert_species=0)
    p2 = output_io.write_tmmc(str(tmp_path / "b.json"), c,
                              temperature=120.0, fugacities=[1.0],
                              volume=1000.0, species=["He"],
                              insert_species=0)
    with pytest.raises(ValueError, match="same thermodynamic state"):
        tmmc_load([p1, p2])
    summed, _ = tmmc_load([p1, p1])
    assert summed.shape == (5, 4)


def test_tmmc_lnpi_follows_best_sampled_fragment():
    """Summed matrices from independent runs can carry disconnected
    N-windows; lnΠ must follow the one with the most attempts (r2
    advisor) and warn about the others."""
    c = np.zeros((12, 4))
    # small fragment at N=1..2 (20 attempts), big one at N=6..9 (600)
    for i, att in ((1, 10.0), (6, 100.0), (7, 100.0), (8, 100.0)):
        c[i, 0] = att
        c[i, 1] = 0.5 * att
    for i, att in ((2, 10.0), (7, 100.0), (8, 100.0), (9, 100.0)):
        c[i, 2] = att
        c[i, 3] = 0.25 * att
    with pytest.warns(UserWarning, match="disconnected"):
        lnpi = tmmc_lnpi(c)
    ok = np.flatnonzero(np.isfinite(lnpi))
    assert ok.min() == 6 and ok.max() == 9
    # each link = ln(0.5) - ln(0.25) = ln 2
    assert np.allclose(np.diff(lnpi[6:10]), np.log(2.0), atol=1e-12)


def test_tmmc_f_sim_records_insert_species(tmp_path):
    """write_tmmc records the INSERT species' fugacity as f_sim_atm —
    a co-movable species' fugacity must not shift the reweighting
    activity ratio (r2 advisor)."""
    from mpmc_tpu.io import output as output_io

    c = np.zeros((5, 4))
    p = output_io.write_tmmc(str(tmp_path / "t.json"), c,
                             temperature=100.0, fugacities=[2.0, 5.0],
                             volume=1000.0, species=["H2", "CO2"],
                             insert_species=0)
    _, meta = tmmc_load([p])
    assert meta["f_sim_atm"] == 2.0
    assert meta["insert_species"] == 0


def test_tmmc_rejects_simulated_annealing():
    """tmmc pools one collection matrix at one T; an annealing schedule
    would silently mix temperatures (r2 advisor) — parse-time error."""
    from mpmc_tpu.io.input_script import parse

    with pytest.raises(ValueError, match="simulated_annealing"):
        parse("""
ensemble uvt
temperature 150
pressure 1.0
numsteps 100
corrtime 10
tmmc on
simulated_annealing on
simulated_annealing_schedule 0.99
pqr_input x.pqr
""")


def test_tmmc_run_driver_host_flush(tmp_path):
    """End-to-end run_mc with tmmc: the device collection is flushed to
    a host float64 accumulator every corrtime (r2 advisor — the f32
    device sums would saturate at 2^24 on production runs), so the
    written matrix must equal the sum over all blocks and retain the
    ideal-gas link exactness."""
    import json

    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod

    pqr_p = str(tmp_path / "he.pqr")
    with open(pqr_p, "w") as f:
        f.write("ATOM 1 He HEL 1 M 10.0 10.0 10.0 4.0026 0.0 0.0 "
                "0.0 0.0\nEND\n")
    out_p = str(tmp_path / "tmmc.json")
    job = input_script.parse(f"""
ensemble uvt
temperature 300
free_volume 8000
fugacities 0.3
numsteps 600
corrtime 100
move_factor 1.0
insert_probability 0.5
rd_only off
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
pqr_input {pqr_p}
tmmc on
tmmc_output {out_p}
""")
    job.cfg = __import__("dataclasses").replace(
        job.cfg, rd_potential="none", coulomb="none", rd_lrc=False,
        dtype="float64")
    run_mod.run_mc(job, log=io.StringIO())
    with open(out_p) as f:
        rec = json.load(f)
    c = np.asarray(rec["c"])
    assert rec["f_sim_atm"] == pytest.approx(0.3)
    n_att = c[:, 0].sum() + c[:, 2].sum()
    # ~half of 600 steps are insert/delete attempts; every one must
    # survive the per-corrtime flushes (6 blocks summed exactly)
    assert 150 < n_att < 450 and n_att == int(n_att)
    lnpi = tmmc_lnpi(c)
    assert np.isfinite(lnpi).sum() >= 2


def test_tmmc_fused_run_driver_end_to_end(tmp_path):
    """CLI-level: `tmmc on` + `fused_mc on` runs the FUSED µVT kernel
    (r2 verdict item 2 — tmmc no longer forces the scan path) and the
    written collection matrix keeps the ideal-gas row exactness."""
    import json

    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    from mpmc_tpu.ops.pallas import mc_kernel

    pqr_p = str(tmp_path / "he.pqr")
    with open(pqr_p, "w") as f:
        f.write("ATOM 1 He HEL 1 M 10.0 10.0 10.0 4.0026 0.0 0.0 "
                "0.0 0.0\nEND\n")
    out_p = str(tmp_path / "tmmc.json")
    job = input_script.parse(f"""
ensemble uvt
temperature 300
fugacities 0.3
numsteps 900
corrtime 300
move_factor 1.0
insert_probability 0.5
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
pqr_input {pqr_p}
fused_mc on
tmmc on
tmmc_output {out_p}
""")
    job.cfg = __import__("dataclasses").replace(
        job.cfg, rd_potential="none", coulomb="none", rd_lrc=False)
    log = io.StringIO()
    su, _ = run_mod.run_mc(job, log=log)
    assert mc_kernel.supported_uvt(su.cfg, su.params)
    assert "unsupported" not in log.getvalue()
    with open(out_p) as f:
        rec = json.load(f)
    c = np.asarray(rec["c"])
    n_att = c[:, 0].sum() + c[:, 2].sum()
    assert 250 < n_att < 650 and n_att == int(n_att)
    # ideal-gas exactness through the kernel + host flush:
    # a_ins(N) = min(1, fV/kT/(N+1))
    fv_kt = 0.3 * ATM2K_A3 * 8000.0 / 300.0
    for n in range(c.shape[0]):
        if c[n, 0] > 0:
            a = min(1.0, fv_kt / (n + 1.0))
            assert c[n, 1] / c[n, 0] == pytest.approx(a, rel=5e-5), n


def test_tmmc_checkpoint_resume_exact(tmp_path):
    """The host-side f64 TMMC accumulator rides checkpoints via the
    `extra` dict: a 600-step run checkpointed and resumed for 300 more
    must write the BIT-identical collection matrix of a straight
    900-step run (the exact-resume contract extended to tmmc_host)."""
    import json

    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod

    pqr_p = str(tmp_path / "he.pqr")
    with open(pqr_p, "w") as f:
        f.write("ATOM 1 He HEL 1 M 10.0 10.0 10.0 4.0026 0.0 0.0 "
                "0.0 0.0\nEND\n")

    def deck(n, extra=""):
        return f"""
ensemble uvt
temperature 300
fugacities 0.3
numsteps {n}
corrtime 300
move_factor 1.0
insert_probability 0.5
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
pqr_input {pqr_p}
tmmc on
{extra}
"""

    import dataclasses as _dc

    def fixed(job):
        job.cfg = _dc.replace(job.cfg, rd_potential="none",
                              coulomb="none", rd_lrc=False,
                              dtype="float64")
        return job

    # straight 900
    j = fixed(input_script.parse(deck(
        900, f"tmmc_output {tmp_path}/straight.json")))
    run_mod.run_mc(j, log=io.StringIO())
    # 600 with checkpoint, then resume 300
    j = fixed(input_script.parse(deck(
        600, f"tmmc_output {tmp_path}/part1.json\n"
             f"checkpoint_output {tmp_path}/ck.npz")))
    run_mod.run_mc(j, log=io.StringIO())
    j = fixed(input_script.parse(deck(
        300, f"tmmc_output {tmp_path}/resumed.json\n"
             f"checkpoint_input {tmp_path}/ck.npz")))
    run_mod.run_mc(j, log=io.StringIO())

    c_straight = np.asarray(json.load(
        open(f"{tmp_path}/straight.json"))["c"])
    c_resumed = np.asarray(json.load(
        open(f"{tmp_path}/resumed.json"))["c"])
    assert c_straight[:, 0].sum() + c_straight[:, 2].sum() > 200
    np.testing.assert_array_equal(c_resumed, c_straight)


def _ideal_polar_gas(dtype, capacity=16, fug=30.0):
    """Single-site ideal gas with polarizability but NO charge: the
    zodid surrogate equals the exact polar energy (both zero), so the
    delayed-acceptance stage 2 is min(1, a2) == 1 — the DA estimator's
    deterministic limit used by the r4 composition tests."""
    import dataclasses

    from helpers import atom_species
    from mpmc_tpu.config import RunConfig, Thermo
    from mpmc_tpu.state import build_system

    sp = atom_species("He", eps=0.0, sig=0.0, charge=0.0, polar=0.3,
                      mass=4.0026)
    cfg = RunConfig(
        ensemble="uvt", rd_potential="none", coulomb="none", rd_lrc=False,
        polarization=True, polar_delayed=True, tmmc=True,
        insert_species=(0,), ortho_box=True, dtype=dtype, seed=3)
    params, state = build_system(
        np.eye(3) * 20.0, species=(sp,), capacity=(capacity,),
        initial_counts=(4,), dtype=cfg.jdtype, seed=3)
    thermo = Thermo.make(temperature=300.0, pressure=fug, fugacity=[fug],
                        move_factor=1.0, insert_probability=0.5,
                        n_species=1, dtype=cfg.jdtype)
    return params, state, cfg, thermo


def test_tmmc_polar_delayed_scan_estimator_exact_sums():
    """tmmc + polar_delayed composes on the scan path (r3 verdict item
    5).  On the ideal polar gas a2 == 1 exactly, so the estimator
    X = 1{acc1} * min(1,a2) collapses to the realized stage-1 accept:
    the collection's probability columns must EXACTLY equal the
    per-direction accept counts and the attempt columns the attempt
    counts — a deterministic wiring check, no statistics."""
    import dataclasses

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.mc.metropolis import DELETE, INSERT

    params, state, cfg, thermo = _ideal_polar_gas("float64")
    cfg = dataclasses.replace(cfg, use_pallas=False)
    state = metropolis.initialize(state, params, cfg, thermo)
    st, stats = metropolis.run_chunk(state, params, cfg, thermo, 600)
    c = np.asarray(st.tmmc_c)
    att = np.asarray(stats.attempts)
    acc = np.asarray(stats.accepts)
    assert c[:, 0].sum() == att[INSERT]
    assert c[:, 2].sum() == att[DELETE]
    assert c[:, 1].sum() == pytest.approx(acc[INSERT], abs=1e-9)
    assert c[:, 3].sum() == pytest.approx(acc[DELETE], abs=1e-9)
    assert (c[:, 1] <= c[:, 0] + 1e-12).all()
    assert (c[:, 3] <= c[:, 2] + 1e-12).all()
    assert att[INSERT] + att[DELETE] > 150


def test_tmmc_polar_delayed_bias_collection_unbiased():
    """tmmc_bias + polar_delayed (scan path): the eta tilt enters the
    STAGE-1 filter (the biased chain's target) while the collection's
    importance weight min(1,a1)/min(1,a1*e^dEta) removes it — the
    collected insert ratios must still estimate the UNBIASED ideal-gas
    acceptance min(1, fV/kT/(N+1)) within binomial error."""
    import dataclasses

    import jax.numpy as jnp

    from mpmc_tpu.constants import ATM2K_A3
    from mpmc_tpu.mc import metropolis

    params, state, cfg, thermo = _ideal_polar_gas("float64")
    cfg = dataclasses.replace(cfg, use_pallas=False, tmmc_bias=True)
    # a strong downhill-in-N tilt: the biased walker spreads over N
    eta = -0.6 * np.arange(params.n_mols_max + 1)
    thermo = thermo.replace(tmmc_eta=jnp.asarray(eta, jnp.float64))
    state = metropolis.initialize(state, params, cfg, thermo)
    st, stats = metropolis.run_chunk(state, params, cfg, thermo, 8000)
    c = np.asarray(st.tmmc_c)
    fv_kt = 30.0 * ATM2K_A3 * 20.0 ** 3 / 300.0
    checked = 0
    for n in range(c.shape[0]):
        if c[n, 0] >= 200:
            a = min(1.0, fv_kt / (n + 1.0))
            assert abs(c[n, 1] / c[n, 0] - a) < 0.15, (n, c[n])
            checked += 1
    assert checked >= 2


def test_tmmc_polar_delayed_fused_exact_sums():
    """tmmc + polar_delayed through the FUSED stage-1 kernel
    (run_chunk_fused_uvt_polar_da): same deterministic identities as
    the scan test — segment attempt counters bin the stage-1 rejects,
    the survivor adds min(1,a2) == 1 on the ideal polar gas."""
    import dataclasses

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.mc.metropolis import DELETE, INSERT
    from mpmc_tpu.ops.pallas import mc_kernel

    params, state, cfg, thermo = _ideal_polar_gas("float32")
    cfg = dataclasses.replace(cfg, fused_mc=True)
    assert mc_kernel.supported_uvt_polar_da(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    st, stats = metropolis.run_chunk_fused_uvt_polar_da(
        state, params, cfg, thermo, 256)
    c = np.asarray(st.tmmc_c)
    att = np.asarray(stats.attempts)
    acc = np.asarray(stats.accepts)
    assert c[:, 0].sum() == att[INSERT]
    assert c[:, 2].sum() == att[DELETE]
    assert c[:, 1].sum() == pytest.approx(acc[INSERT], abs=1e-5)
    assert c[:, 3].sum() == pytest.approx(acc[DELETE], abs=1e-5)
    assert (c[:, 1] <= c[:, 0] + 1e-6).all()
    assert (c[:, 3] <= c[:, 2] + 1e-6).all()
    assert att[INSERT] + att[DELETE] > 60


def test_tmmc_polar_delayed_fused_run_driver(tmp_path):
    """CLI-level: polarization + polar_delayed + tmmc + fused_mc runs
    the PDA kernel (not the scan fallback) and writes a collection
    matrix whose insert ratios track the ideal-gas analytic
    probabilities statistically (the polar single-run-isotherm
    composition of r3 verdict item 5)."""
    import json

    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod

    pqr_p = str(tmp_path / "hep.pqr")
    with open(pqr_p, "w") as f:
        f.write("ATOM 1 He HEL 1 M 10.0 10.0 10.0 4.0026 0.0 0.3 "
                "0.0 0.0\nEND\n")
    out_p = str(tmp_path / "tmmc_pda.json")
    job = input_script.parse(f"""
ensemble uvt
temperature 300
fugacities 30.0
numsteps 600
corrtime 200
move_factor 1.0
insert_probability 0.5
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
pqr_input {pqr_p}
fused_mc on
polarization on
polar_delayed on
tmmc on
tmmc_output {out_p}
""")
    job.cfg = __import__("dataclasses").replace(
        job.cfg, rd_potential="none", coulomb="none", rd_lrc=False)
    log = io.StringIO()
    run_mod.run_mc(job, log=log)
    assert "polar delayed-acceptance stage-1 kernel" in log.getvalue()
    with open(out_p) as f:
        rec = json.load(f)
    c = np.asarray(rec["c"])
    n_att = c[:, 0].sum() + c[:, 2].sum()
    assert n_att > 120 and n_att == int(n_att)
    fv_kt = 30.0 * ATM2K_A3 * 8000.0 / 300.0
    for n in range(c.shape[0]):
        if c[n, 0] >= 120:
            a = min(1.0, fv_kt / (n + 1.0))
            # realized stage-1 accepts (a2==1): binomial error
            assert abs(c[n, 1] / c[n, 0] - a) < 0.2, (n, c[n])


def test_tmmc_polar_delayed_fused_bias_collection_unbiased():
    """tmmc_bias + polar_delayed through the FUSED stage-1 kernel (r5,
    r4 verdict item 2): the eta tilt rides the in-kernel stage-1 coin
    as two per-segment scalars, and the driver's IS-weighted collection
    min(1,a1)/min(1,a1 e^dEta) * min(1,a2) must still estimate the
    UNBIASED ideal-gas acceptance min(1, fV/kT/(N+1)) — the fused
    mirror of the scan-path test above."""
    import dataclasses

    import jax.numpy as jnp

    from mpmc_tpu.constants import ATM2K_A3
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.ops.pallas import mc_kernel

    params, state, cfg, thermo = _ideal_polar_gas("float32")
    cfg = dataclasses.replace(cfg, fused_mc=True, tmmc_bias=True)
    assert mc_kernel.supported_uvt_polar_da(cfg, params)
    # a strong downhill-in-N tilt, as in the scan test
    eta = -0.6 * np.arange(params.n_mols_max + 1)
    thermo = thermo.replace(tmmc_eta=jnp.asarray(eta, cfg.jdtype))
    state = metropolis.initialize(state, params, cfg, thermo)
    st, stats = metropolis.run_chunk_fused_uvt_polar_da(
        state, params, cfg, thermo, 6000)
    c = np.asarray(st.tmmc_c, np.float64)
    att = np.asarray(stats.attempts)
    from mpmc_tpu.mc.metropolis import DELETE, INSERT
    assert c[:, 0].sum() == att[INSERT]
    assert c[:, 2].sum() == att[DELETE]
    fv_kt = 30.0 * ATM2K_A3 * 20.0 ** 3 / 300.0
    checked = 0
    for n in range(c.shape[0]):
        if c[n, 0] >= 150:
            a = min(1.0, fv_kt / (n + 1.0))
            assert abs(c[n, 1] / c[n, 0] - a) < 0.15, (n, c[n])
            checked += 1
    assert checked >= 2
    # the tilt really acted on the walker: a -0.6/molecule eta pushes
    # the mean occupation well below the unbiased Poisson mean ~9.7
    n_end = int(np.asarray(st.mol_alive).sum())
    assert n_end <= 6
