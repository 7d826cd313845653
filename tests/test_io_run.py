"""End-to-end: input script + PQR -> setup -> te / short MC runs -> outputs.
Exercises the public API surface the way a reference user would
(SURVEY.md §2.9 grammar, §2 "Single point" te parity path)."""
import io
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mpmc_tpu.io import input_script, pqr
from mpmc_tpu.mc import run as run_mod
from mpmc_tpu.mc.fugacity import fugacity, peng_robinson_fugacity, SPECIES


ARGON_PQR = """\
! two argon atoms plus a frozen wall atom (test fixture)
ATOM 1 Ar AR 1 M 0.0 0.0 0.0 39.948 0.0 0.0 119.8 3.405
ATOM 2 Ar AR 2 M 3.9 0.0 0.0 39.948 0.0 0.0 119.8 3.405
END
"""

H2_3SITE_PQR = """\
ATOM 1 H2G H2Q 1 M 5.0 5.0 5.0  0.0   -0.9658 0.0 36.7 2.958
ATOM 2 H2E H2Q 1 M 5.371 5.0 5.0 1.008  0.4829 0.0 0.0 0.0
ATOM 3 H2E H2Q 1 M 4.629 5.0 5.0 1.008  0.4829 0.0 0.0 0.0
END
"""


def write(tmp, name, text):
    p = os.path.join(tmp, name)
    with open(p, "w") as f:
        f.write(text)
    return p


def test_pqr_roundtrip(tmp_path):
    p = write(str(tmp_path), "ar.pqr", ARGON_PQR)
    fr = pqr.read(p)
    assert len(fr.atoms) == 2
    a = fr.atoms[0]
    assert a.name == "Ar" and a.flag == "M" and a.eps == 119.8
    out = os.path.join(str(tmp_path), "out.pqr")
    pqr.write(out, fr.atoms, remark="t")
    fr2 = pqr.read(out)
    np.testing.assert_allclose(fr2.atoms[1].xyz, [3.9, 0, 0], atol=1e-5)
    assert fr2.atoms[1].sig == pytest.approx(3.405)


def test_parser_full_grammar():
    job = input_script.parse("""
job_name demo
ensemble uvt
numsteps 1000   ! inline comment
corrtime 100
temperature 77.0
pressure 0.5
h2_fugacity on
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
move_factor 1.5
rot_factor 0.7
insert_probability 0.4
feynman_hibbs on
feynman_hibbs_order 4
polarization on
polar_gs_ranked on
polar_max_iter 40
polar_damp 2.1304
ewald_kmax 8
rd_lrc on
cuda on
some_bogus_option 3
precision float64
""")
    cfg = job.cfg
    assert cfg.ensemble == "uvt" and cfg.numsteps == 1000
    assert cfg.feynman_hibbs and cfg.feynman_hibbs_order == 4
    assert cfg.polarization and cfg.polar_solver == "cg"
    assert cfg.polar_max_iter == 40 and cfg.ewald_kmax == 8
    assert cfg.dtype == "float64"
    assert job.temperature == 77.0 and job.fugacity_eos["h2"]
    assert job.move_factor == 1.5
    np.testing.assert_allclose(job.basis, 20 * np.eye(3))
    assert "cuda" in job.ignored_options
    assert "some_bogus_option" in job.unknown_options


def test_te_single_point_lj_dimer(tmp_path):
    """te parity: two Ar at 3.9 A, rd_lrc off -> exactly the LJ dimer."""
    p = write(str(tmp_path), "ar.pqr", ARGON_PQR)
    job = input_script.parse(f"""
ensemble te
temperature 300
basis1 100 0 0
basis2 0 100 0
basis3 0 0 100
cutoff 20.0
rd_lrc off
coulomb off
precision float64
pqr_input {p}
""")
    buf = io.StringIO()
    e = run_mod.run_te(job, log=buf)
    expect = 4 * 119.8 * ((3.405 / 3.9) ** 12 - (3.405 / 3.9) ** 6)
    assert float(e.rd) == pytest.approx(expect, rel=1e-12)
    assert "total" in buf.getvalue()


def test_te_multisite_with_ewald(tmp_path):
    p = write(str(tmp_path), "h2.pqr", H2_3SITE_PQR)
    job = input_script.parse(f"""
ensemble te
temperature 77
basis1 10 0 0
basis2 0 10 0
basis3 0 0 10
ewald_kmax 8
precision float64
pqr_input {p}
""")
    e = run_mod.run_te(job, log=io.StringIO())
    # one neutral molecule alone: es is the (small) image interaction
    assert abs(float(e.es)) < 50.0
    assert float(e.es_self) < 0.0
    assert np.isfinite(float(e.total))


def test_short_uvt_run_with_outputs(tmp_path):
    tmp = str(tmp_path)
    p = write(tmp, "ar.pqr", ARGON_PQR)
    traj = os.path.join(tmp, "traj.pqr")
    restart = os.path.join(tmp, "restart.pqr")
    ecsv = os.path.join(tmp, "energy.csv")
    job = input_script.parse(f"""
job_name short_uvt
ensemble uvt
numsteps 300
corrtime 50
temperature 150
pressure 60.0
basis1 15 0 0
basis2 0 15 0
basis3 0 0 15
cutoff 6.0
coulomb off
move_factor 1.0
insert_probability 0.4
max_molecules 30
precision float64
pqr_input {p}
traj_output {traj}
pqr_restart {restart}
energy_output {ecsv}
""")
    buf = io.StringIO()
    su, avgs = run_mod.run_mc(job, log=buf)
    assert avgs.count() == 6
    assert os.path.exists(traj) and os.path.exists(restart)
    assert os.path.exists(ecsv)
    with open(ecsv) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 7  # header + 6 blocks
    # restart is loadable
    fr = pqr.read(restart)
    assert len(fr.atoms) == int(avgs.samples["N"][-1])
    out = buf.getvalue()
    assert "averages" in out and "steps/sec" in out


def test_replay(tmp_path):
    tmp = str(tmp_path)
    traj_text = ARGON_PQR + ARGON_PQR.replace("3.9", "4.5")
    p = write(tmp, "traj.pqr", traj_text)
    job = input_script.parse(f"""
ensemble replay
temperature 150
basis1 50 0 0
basis2 0 50 0
basis3 0 0 50
cutoff 20
rd_lrc off
coulomb off
precision float64
pqr_input {p}
""")
    avgs = run_mod.run_replay(job, log=io.StringIO())
    assert avgs.count() == 2
    e1 = 4 * 119.8 * ((3.405 / 3.9) ** 12 - (3.405 / 3.9) ** 6)
    e2 = 4 * 119.8 * ((3.405 / 4.5) ** 12 - (3.405 / 4.5) ** 6)
    assert avgs.mean("energy_total") == pytest.approx((e1 + e2) / 2,
                                                      rel=1e-10)


def test_fugacity_peng_robinson():
    # ideal limit: low pressure -> f ~ P
    assert fugacity("h2", 298.0, 0.01) == pytest.approx(0.01, rel=1e-3)
    # CO2 at 300K/50atm is substantially non-ideal (phi ~ 0.8)
    f = fugacity("co2", 300.0, 50.0)
    assert 30.0 < f < 48.0
    # H2 at 77K/100atm: phi ~ 0.8 (B2(77K) ~ -12 cm^3/mol gives
    # ln phi ~ BP/RT ~ -0.19)
    f = fugacity("h2", 77.0, 100.0)
    assert 70.0 < f < 95.0
    # unknown species falls back to ideal
    assert fugacity("xe2", 300.0, 5.0) == 5.0


def test_fugacity_virial_anchors():
    """At 1 atm the truncated virial is essentially exact, so
    ln(f/P) must equal B_lit/RT — the literature anchor values below are
    independent of the implementation's table (VERDICT r1 item 6)."""
    import math
    from mpmc_tpu.mc import fugacity as fg
    R = fg.R_L_ATM_MOL_K
    anchors = [   # (key, T [K], B [L/mol] literature)
        ("h2", 298.15, 14.8e-3), ("h2", 77.0, -11.7e-3),
        ("co2", 298.15, -124.5e-3), ("ch4", 298.15, -42.8e-3),
        ("n2", 300.0, -4.2e-3), ("ar", 298.15, -15.8e-3),
    ]
    for key, T, B in anchors:
        f = fg.fugacity(key, T, 1.0)
        assert math.log(f / 1.0) == pytest.approx(B / (R * T), abs=2e-4), \
            (key, T)
    # the spliced-B construction: PR's own second virial is replaced by
    # the tabulated one, so d ln f/dP at P->0 matches B_lit exactly
    eps = 1e-4
    for key, T, B in anchors:
        slope = math.log(fg.fugacity(key, T, eps) / eps) / eps
        assert slope == pytest.approx(B / (R * T), rel=2e-2), (key, T)
    # outside the tabulated range the correction degrades to pure PR
    assert fg.second_virial("h2", 1000.0) is None
    crit = fg.SPECIES["h2"]
    assert fg.fugacity("h2", 1000.0, 50.0) == pytest.approx(
        fg.peng_robinson_fugacity(1000.0, 50.0, crit))
    # H2 at 77 K / 10 atm: raw PR's B = -23.8 cm^3/mol would give
    # phi ~ 0.963; the spliced fit must sit near the virial value 0.982
    phi = fg.fugacity("h2", 77.0, 10.0) / 10.0
    assert 0.975 < phi < 0.988


def test_adaptive_move_sizes(tmp_path):
    """adapt_moves drives displacement size toward ~50% acceptance."""
    import io
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    pqr = tmp_path / "ar.pqr"
    lines = []
    k = 0
    for i in range(3):
        for j in range(3):
            k += 1
            lines.append(f"ATOM {k} Ar AR {k} M {2+3.5*i} {2+3.5*j} 5.0 "
                         "39.948 0.0 0.0 119.8 3.405")
    pqr.write_text("\n".join(lines) + "\nEND\n")
    job = input_script.parse(f"""
ensemble nvt
numsteps 600
corrtime 100
temperature 100
basis1 11 0 0
basis2 0 11 0
basis3 0 0 11
move_factor 5.0     ! absurdly large -> low acceptance -> must shrink
precision float64
adapt_moves on
pqr_input {pqr}
""")
    su, avgs = run_mod.run(job, log=io.StringIO())
    assert float(su.thermo.move_factor) < 5.0


def test_replay_calc_pressure_ideal_gas(tmp_path):
    """Replay of non-interacting frames: virial P = N kT / V exactly."""
    import io
    from mpmc_tpu.constants import ATM2K_A3
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    rng = np.random.default_rng(0)
    L, n = 12.0, 15
    lines = []
    for f in range(3):
        lines.append(f"REMARK frame {f}")
        for i in range(n):
            x, y, z = rng.uniform(0, L, 3)
            lines.append(f"ATOM {i+1} He HE {i+1} M {x:.4f} {y:.4f} "
                         f"{z:.4f} 4.0 0.0 0.0 0.0 0.0")
        lines.append("END")
    traj = tmp_path / "traj.pqr"
    traj.write_text("\n".join(lines) + "\n")
    job = input_script.parse(f"""
ensemble replay
temperature 200
basis1 {L} 0 0
basis2 0 {L} 0
basis3 0 0 {L}
rd_lrc off
coulomb off
calc_pressure on
precision float64
pqr_input {traj}
""")
    avgs = run_mod.run(job, log=io.StringIO())
    expect = n * 200.0 / L ** 3 / ATM2K_A3
    assert avgs.mean("pressure_atm") == pytest.approx(expect, rel=1e-9)


def test_replay_calc_pressure_lj_virial(tmp_path):
    """Interacting frames: dU/dlnV central difference must match the
    analytic LJ virial sum for a 2-atom frame."""
    import io
    from mpmc_tpu.constants import ATM2K_A3
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    L, r = 30.0, 4.0
    traj = tmp_path / "t.pqr"
    traj.write_text(
        f"ATOM 1 Ar AR 1 M 10.0 10.0 10.0 39.948 0.0 0.0 119.8 3.405\n"
        f"ATOM 2 Ar AR 2 M {10+r} 10.0 10.0 39.948 0.0 0.0 119.8 3.405\n"
        "END\n")
    job = input_script.parse(f"""
ensemble replay
temperature 100
basis1 {L} 0 0
basis2 0 {L} 0
basis3 0 0 {L}
rd_lrc off
coulomb off
calc_pressure on
precision float64
pqr_input {traj}
""")
    avgs = run_mod.run(job, log=io.StringIO())
    # analytic: dU/dlnV = (r/3) dU/dr for pair distance scaling r ~ V^{1/3}
    eps, sig = 119.8, 3.405
    s6 = (sig / r) ** 6
    du_dr = 4 * eps * (-12 * s6 * s6 + 6 * s6) / r
    du_dlnv = r / 3.0 * du_dr
    expect = (2 * 100.0 - du_dlnv) / L ** 3 / ATM2K_A3
    assert avgs.mean("pressure_atm") == pytest.approx(expect, rel=1e-4)


def test_pqr_output_written_at_end(tmp_path):
    import io
    from mpmc_tpu.io import input_script, pqr
    from mpmc_tpu.mc import run as run_mod
    p = tmp_path / "ar.pqr"
    p.write_text(
        "ATOM 1 Ar AR 1 M 3.0 3.0 3.0 39.948 0.0 0.0 119.8 3.405\nEND\n")
    out = tmp_path / "final.pqr"
    job = input_script.parse(f"""
ensemble nvt
numsteps 100
corrtime 100
temperature 150
basis1 10 0 0
basis2 0 10 0
basis3 0 0 10
precision float64
pqr_input {p}
pqr_output {out}
""")
    run_mod.run(job, log=io.StringIO())
    assert out.exists()
    assert len(pqr.read(str(out)).atoms) == 1


def test_per_species_qst_reported(tmp_path):
    import io
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    pqr = tmp_path / "mix.pqr"
    pqr.write_text(
        "ATOM 1 AA AA 1 M 3.0 3.0 3.0 10.0 0.0 0.0 30.0 3.0\n"
        "ATOM 2 BB BB 2 M 9.0 9.0 9.0 20.0 0.0 0.0 60.0 3.2\nEND\n")
    job = input_script.parse(f"""
ensemble uvt
numsteps 600
corrtime 100
temperature 120
fugacities 30 60
basis1 14 0 0
basis2 0 14 0
basis3 0 0 14
insert_probability 0.6
rd_lrc off
precision float64
pqr_input {pqr}
""")
    log = io.StringIO()
    run_mod.run(job, log=log)
    text = log.getvalue()
    assert "Qst_AA (kJ/mol)" in text
    assert "Qst_BB (kJ/mol)" in text


def test_replay_fast_path_matches_full_setup(tmp_path):
    """Same-topology frames take the position-refresh fast path; energies
    must equal frame-by-frame full setup."""
    import io
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    rng = np.random.default_rng(5)
    frames_xyz = [rng.uniform(1, 11, (4, 3)) for _ in range(3)]
    lines = []
    for xyz in frames_xyz:
        for i, p in enumerate(xyz):
            lines.append(f"ATOM {i+1} Ar AR {i+1} M {p[0]:.5f} {p[1]:.5f} "
                         f"{p[2]:.5f} 39.948 0.0 0.0 119.8 3.405")
        lines.append("END")
    traj = tmp_path / "t.pqr"
    traj.write_text("\n".join(lines) + "\n")
    base = """
temperature 150
basis1 12 0 0
basis2 0 12 0
basis3 0 0 12
rd_lrc off
coulomb off
precision float64
"""
    job = input_script.parse(f"ensemble replay\n{base}pqr_input {traj}\n")
    avgs = run_mod.run(job, log=io.StringIO())
    # ground truth: per-frame te via independent single-frame files
    want = []
    for k, xyz in enumerate(frames_xyz):
        single = tmp_path / f"f{k}.pqr"
        single.write_text("\n".join(
            f"ATOM {i+1} Ar AR {i+1} M {p[0]:.5f} {p[1]:.5f} {p[2]:.5f} "
            "39.948 0.0 0.0 119.8 3.405" for i, p in enumerate(xyz))
            + "\nEND\n")
        j2 = input_script.parse(f"ensemble te\n{base}pqr_input {single}\n")
        e = run_mod.run(j2, log=io.StringIO())
        want.append(float(e.total))
    np.testing.assert_allclose(avgs.samples["energy_total"], want,
                               rtol=1e-12)


def test_gcmc_insert_input_template(tmp_path):
    """GCMC with a separate insert_input template: an initially-empty box
    fills with the template species."""
    import io
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    host = tmp_path / "host.pqr"
    # one frozen site only — no movable molecules in the main input
    host.write_text(
        "ATOM 1 X FRZ 1 F 6.0 6.0 6.0 40.0 0.0 0.0 0.0 0.0\nEND\n")
    tmpl = tmp_path / "he.pqr"
    tmpl.write_text(
        "ATOM 1 He HE 1 M 0.0 0.0 0.0 4.0 0.0 0.0 10.22 2.56\nEND\n")
    job = input_script.parse(f"""
ensemble uvt
numsteps 2000
corrtime 500
temperature 150
pressure 50
basis1 12 0 0
basis2 0 12 0
basis3 0 0 12
insert_probability 0.6
rd_lrc off
precision float64
pqr_input {host}
insert_input {tmpl}
""")
    log = io.StringIO()
    su, avgs = run_mod.run(job, log=log)
    assert avgs.samples["N_HE"][-1] >= 1    # box filled from the template
    assert avgs.mean("N") > 0.5


def test_simulated_annealing_decays_temperature(tmp_path):
    import io
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    pqr = tmp_path / "ar.pqr"
    pqr.write_text(
        "ATOM 1 Ar AR 1 M 3.0 3.0 3.0 39.948 0.0 0.0 119.8 3.405\nEND\n")
    job = input_script.parse(f"""
ensemble nvt
numsteps 500
corrtime 100
temperature 300
simulated_annealing on
simulated_annealing_schedule 0.5
simulated_annealing_target 10
basis1 10 0 0
basis2 0 10 0
basis3 0 0 10
precision float64
pqr_input {pqr}
""")
    su, _ = run_mod.run(job, log=io.StringIO())
    # 5 blocks of x0.5 decay from 300, floored at 10
    assert float(su.thermo.temperature) == pytest.approx(
        max(300 * 0.5 ** 5, 10.0), rel=1e-12)


def test_standard_sorbate_models():
    """Library sorbate models: neutral, COM-centered, physical masses."""
    from mpmc_tpu.models import systems
    for build, mass in ((systems.co2_3site, 44.009),
                        (systems.n2_3site, 28.014),
                        (systems.ch4_united_atom, 16.043),
                        (systems.h2_bss3, 2.016)):
        sp = build()
        assert abs(np.sum(sp.charge)) < 1e-9          # neutral
        assert sp.total_mass == pytest.approx(mass, abs=0.01)
        com = (sp.mass[:, None] * sp.pos).sum(0) / sp.total_mass
        np.testing.assert_allclose(com, 0.0, atol=1e-12)


def test_binary_selectivity_reported(tmp_path):
    """Ideal binary GCMC: S_AB = (N_A/N_B)/(f_A/f_B) -> 1 for identical
    non-interacting species; the report must contain the line."""
    import io
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    pqr = tmp_path / "mix.pqr"
    pqr.write_text(
        "ATOM 1 AA AA 1 M 3.0 3.0 3.0 10.0 0.0 0.0 0.0 0.0\n"
        "ATOM 2 BB BB 2 M 9.0 9.0 9.0 10.0 0.0 0.0 0.0 0.0\nEND\n")
    job = input_script.parse(f"""
ensemble uvt
numsteps 4000
corrtime 500
temperature 120
fugacities 40 80
basis1 14 0 0
basis2 0 14 0
basis3 0 0 14
insert_probability 0.7
rd_lrc off
precision float64
pqr_input {pqr}
""")
    log = io.StringIO()
    run_mod.run(job, log=log)
    text = log.getvalue()
    line = [l for l in text.splitlines() if "S_AA/BB" in l]
    assert line, text
    s_ab = float(line[0].split("=")[1])
    assert s_ab == pytest.approx(1.0, abs=0.45)   # ideal: exactly 1


def test_replay_python_fallback_matches_native(tmp_path, monkeypatch):
    """The object-path replay (no native library) gives identical energies
    to the native array path."""
    import io
    from mpmc_tpu.io import input_script, native
    from mpmc_tpu.mc import run as run_mod
    rng = np.random.default_rng(9)
    lines = []
    for _ in range(3):
        for i, p in enumerate(rng.uniform(1, 11, (5, 3))):
            lines.append(f"ATOM {i+1} Ar AR {i+1} M {p[0]:.5f} {p[1]:.5f} "
                         f"{p[2]:.5f} 39.948 0.0 0.0 119.8 3.405")
        lines.append("END")
    traj = tmp_path / "t.pqr"
    traj.write_text("\n".join(lines) + "\n")
    script = f"""
ensemble replay
temperature 150
basis1 12 0 0
basis2 0 12 0
basis3 0 0 12
rd_lrc off
coulomb off
precision float64
pqr_input {traj}
"""
    a1 = run_mod.run(input_script.parse(script), log=io.StringIO())
    monkeypatch.setattr(native, "available", lambda: False)
    a2 = run_mod.run(input_script.parse(script), log=io.StringIO())
    np.testing.assert_allclose(a1.samples["energy_total"],
                               a2.samples["energy_total"], rtol=1e-12)


def test_replay_varying_n_relayout_matches_python(tmp_path,
                                                  monkeypatch):
    """GCMC-style trajectory whose molecule count varies per frame: the
    native path relayouts shrinking frames into the existing padded
    slots (capacity ratchets only on record counts) and must reproduce
    the per-frame energies of the per-frame-setup python path."""
    import io
    from mpmc_tpu.io import input_script, native
    from mpmc_tpu.mc import run as run_mod
    rng = np.random.default_rng(4)
    lines = []
    for n_mol in (1, 3, 2, 3, 1, 2):     # grow, shrink, regrow, shrink
        for i in range(n_mol):
            p = rng.uniform(1, 11, 3)
            lines.append(f"ATOM {i+1} Ar AR {i+1} M {p[0]:.5f} "
                         f"{p[1]:.5f} {p[2]:.5f} 39.948 0.0 0.0 "
                         "119.8 3.405")
        lines.append("END")
    traj = tmp_path / "vary.pqr"
    traj.write_text("\n".join(lines) + "\n")
    script = f"""
ensemble replay
temperature 150
basis1 12 0 0
basis2 0 12 0
basis3 0 0 12
rd_lrc off
coulomb off
precision float64
pqr_input {traj}
"""
    a1 = run_mod.run(input_script.parse(script), log=io.StringIO())
    assert a1.samples["N"] == [1.0, 3.0, 2.0, 3.0, 1.0, 2.0]
    monkeypatch.setattr(native, "available", lambda: False)
    a2 = run_mod.run(input_script.parse(script), log=io.StringIO())
    np.testing.assert_allclose(a1.samples["energy_total"],
                               a2.samples["energy_total"], rtol=1e-12)
    np.testing.assert_allclose(a1.samples["N"], a2.samples["N"])


def test_scale_charge_scales_es_energy(tmp_path):
    """scale_charge x multiplies every charge: ES terms scale by x^2."""
    p = write(str(tmp_path), "h2.pqr", H2_3SITE_PQR)
    base = f"""
ensemble te
temperature 300
basis1 40 0 0
basis2 0 40 0
basis3 0 0 40
cutoff 15.0
rd_lrc off
precision float64
pqr_input {p}
"""
    e1 = run_mod.run_te(input_script.parse(base), log=io.StringIO())
    e2 = run_mod.run_te(input_script.parse(base + "scale_charge 2.0\n"),
                        log=io.StringIO())
    # single molecule: only self/exclusion terms are nonzero; both ~ q^2
    assert float(e2.es_self) == pytest.approx(4 * float(e1.es_self),
                                              rel=1e-12)
    assert float(e2.es_excl) == pytest.approx(4 * float(e1.es_excl),
                                              rel=1e-12)
    assert float(e2.rd) == pytest.approx(float(e1.rd), rel=1e-12)


def test_extrapolate_disp_coeffs_fills_c10(tmp_path):
    """C10 = (49/40) C8^2 / C6 for atoms with C6/C8 but no C10."""
    pqr_text = (
        "ATOM 1 X XX 1 M 5.0 5.0 5.0 10.0 0.0 0.0 40000.0 3.2 "
        "0.0 100.0 900.0 0.0 0.0\n"
        "ATOM 2 X XX 2 M 9.0 5.0 5.0 10.0 0.0 0.0 40000.0 3.2 "
        "0.0 100.0 900.0 0.0 0.0\n"
        "END\n")
    p = write(str(tmp_path), "de.pqr", pqr_text)
    base = f"""
ensemble te
temperature 300
basis1 40 0 0
basis2 0 40 0
basis3 0 0 40
cutoff 15.0
coulomb off
disp_expansion on
rd_lrc off
precision float64
pqr_input {p}
"""
    e1 = run_mod.run_te(input_script.parse(base), log=io.StringIO())
    e2 = run_mod.run_te(
        input_script.parse(base + "extrapolate_disp_coeffs on\n"),
        log=io.StringIO())
    # the added C10 term deepens the dispersion at r=4:
    c10 = 49.0 / 40.0 * 900.0 ** 2 / 100.0
    from mpmc_tpu.ops.potentials import tt_damping
    import jax.numpy as jnp
    x = 3.2 * 4.0
    extra = -float(tt_damping(jnp.float64(x), 10)) * c10 / 4.0 ** 10
    assert float(e2.rd) - float(e1.rd) == pytest.approx(extra, rel=1e-9)


def test_wrapall_wraps_trajectory_coords(tmp_path):
    """A molecule walked outside the cell is written wrapped in-cell."""
    import numpy as np
    from mpmc_tpu.io import pqr as pqr_io
    from mpmc_tpu.mc import run as rn
    p = write(str(tmp_path), "ar.pqr", ARGON_PQR)
    job = input_script.parse(f"""
ensemble nvt
numsteps 0
temperature 300
basis1 100 0 0
basis2 0 100 0
basis3 0 0 100
cutoff 20
coulomb off
precision float64
pqr_input {p}
""")
    su = rn.setup(job)
    st = su.state.replace(pos=su.state.pos + 130.0)   # out of cell
    out = tmp_path / "w.pqr"
    pqr_io.write_state(str(out), su.params, st, su.species_names,
                       wrap=True)
    fr = pqr_io.read(str(out))
    xyz = np.stack([a.xyz for a in fr.atoms])
    assert np.all(xyz >= 0.0) and np.all(xyz < 100.0)
    # and without wrap the raw coordinates survive
    pqr_io.write_state(str(out), su.params, st, su.species_names,
                       wrap=False)
    fr = pqr_io.read(str(out))
    assert np.stack([a.xyz for a in fr.atoms]).max() > 100.0


def test_long_output_more_decimals(tmp_path):
    p = write(str(tmp_path), "ar.pqr", ARGON_PQR)
    job = input_script.parse(f"""
ensemble nvt
numsteps 100
corrtime 100
temperature 300
basis1 100 0 0
basis2 0 100 0
basis3 0 0 100
cutoff 20
coulomb off
precision float64
long_output on
pqr_input {p}
""")
    assert job.long_output
    buf = io.StringIO()
    run_mod.run(job, log=buf)
    import re
    assert re.search(r"E\s+-?\d+\.\d{10} K", buf.getvalue())
