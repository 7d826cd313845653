"""Histogram/.dx output and exact checkpoint/resume."""
import io
import numpy as np

from mpmc_tpu.io import checkpoint as ckpt
from mpmc_tpu.io import input_script
from mpmc_tpu.mc import metropolis
from mpmc_tpu.mc import run as run_mod
from mpmc_tpu.models import systems
from mpmc_tpu.utils.histogram import PopulationHistogram, read_dx


def test_histogram_binning_and_dx_roundtrip(tmp_path):
    box = np.diag([10.0, 10.0, 10.0])
    h = PopulationHistogram(box, resolution=2.5)    # 4x4x4 grid
    assert tuple(h.dims) == (4, 4, 4)
    h.add(np.array([[1.0, 1.0, 1.0], [9.0, 9.0, 9.0],
                    [11.0, 1.0, 1.0]]))            # wraps to (1,1,1)
    assert h.counts[0, 0, 0] == 2.0                # two points in bin 0
    assert h.counts[3, 3, 3] == 1.0
    p = tmp_path / "pop.dx"
    h.write_dx(str(p), normalize=False)
    grid = read_dx(str(p))
    np.testing.assert_allclose(grid, h.counts)


def test_mc_run_writes_histogram(tmp_path):
    pqr = tmp_path / "ar.pqr"
    pqr.write_text(
        "ATOM 1 Ar AR 1 M 2.0 2.0 2.0 39.948 0.0 0.0 119.8 3.405\n"
        "ATOM 2 Ar AR 2 M 7.0 7.0 7.0 39.948 0.0 0.0 119.8 3.405\nEND\n")
    out = tmp_path / "pop.dx"
    job = input_script.parse(f"""
ensemble nvt
numsteps 200
corrtime 50
temperature 120
basis1 12 0 0
basis2 0 12 0
basis3 0 0 12
precision float64
pop_histogram on
histogram_output {out}
pqr_input {pqr}
""")
    run_mod.run(job, log=io.StringIO())
    grid = read_dx(str(out))
    assert grid.sum() > 0        # 2 sorbates x 4 frames, normalized


def test_checkpoint_exact_resume(tmp_path):
    params, state, cfg, thermo = systems.lj_fluid(n=24, dtype="float64")
    state = metropolis.initialize(state, params, cfg, thermo)
    # advance 100 steps, checkpoint, advance 100 more
    st1, _ = metropolis.run_chunk(state, params, cfg, thermo, 100)
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, st1, extra={"note": "mid-run"})
    st2, _ = metropolis.run_chunk(st1, params, cfg, thermo, 100)

    # reload and advance the same 100 steps: bit-identical trajectory
    st1b, avgs, extra = ckpt.load(path, st1)
    assert extra["note"] == "mid-run"
    st2b, _ = metropolis.run_chunk(st1b, params, cfg, thermo, 100)
    np.testing.assert_array_equal(np.asarray(st2.pos), np.asarray(st2b.pos))
    np.testing.assert_array_equal(np.asarray(st2.key), np.asarray(st2b.key))
    assert float(st2.energy.total) == float(st2b.energy.total)


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    params, state, cfg, thermo = systems.lj_fluid(n=24, dtype="float64")
    state = metropolis.initialize(state, params, cfg, thermo)
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, state)
    _, other, cfg2, thermo2 = systems.lj_fluid(n=32, dtype="float64")
    p2, o2 = systems.lj_fluid(n=32, dtype="float64")[:2]
    o2 = metropolis.initialize(o2, p2, cfg2, thermo2)
    import pytest
    with pytest.raises(ValueError):
        ckpt.load(path, o2)


def test_mc_run_checkpoint_resume_cli(tmp_path):
    pqr = tmp_path / "ar.pqr"
    pqr.write_text(
        "ATOM 1 Ar AR 1 M 2.0 2.0 2.0 39.948 0.0 0.0 119.8 3.405\n"
        "ATOM 2 Ar AR 2 M 7.0 7.0 7.0 39.948 0.0 0.0 119.8 3.405\nEND\n")
    ck = tmp_path / "run.ck.npz"
    base = f"""
ensemble nvt
numsteps 200
corrtime 100
temperature 120
basis1 12 0 0
basis2 0 12 0
basis3 0 0 12
precision float64
pqr_input {pqr}
"""
    job = input_script.parse(base + f"checkpoint_output {ck}\n")
    run_mod.run(job, log=io.StringIO())
    assert ck.exists()
    log = io.StringIO()
    job2 = input_script.parse(base + f"checkpoint_input {ck}\n")
    run_mod.run(job2, log=log)
    assert "resumed exactly from" in log.getvalue()


def test_checkpoint_resume_with_quantum_rotation(tmp_path):
    """A checkpoint from a quantum-rotation run (extra spin/rot_f leaves)
    must resume cleanly."""
    import io
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    d = 0.371
    pqr = tmp_path / "h2.pqr"
    pqr.write_text(
        "ATOM 1 H2G H2 1 M 10.0 10.0 10.0 0.0 -0.93634 0.0 34.2 2.96\n"
        f"ATOM 2 H2E H2 1 M 10.0 10.0 {10+d} 1.008 0.46817 0.0 0.0 0.0\n"
        f"ATOM 3 H2E H2 1 M 10.0 10.0 {10-d} 1.008 0.46817 0.0 0.0 0.0\n"
        "END\n")
    ck = tmp_path / "qr.ck.npz"
    base = f"""
ensemble nvt
numsteps 300
corrtime 100
temperature 40
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
coulomb off
rd_lrc off
precision float64
quantum_rotation on
spinflip_probability 0.2
pqr_input {pqr}
"""
    run_mod.run(input_script.parse(base + f"checkpoint_output {ck}\n"),
                log=io.StringIO())
    log = io.StringIO()
    run_mod.run(input_script.parse(base + f"checkpoint_input {ck}\n"),
                log=log)
    assert "resumed exactly from" in log.getvalue()


def test_dipole_and_field_outputs(tmp_path):
    """Polar run writes induced dipoles (Debye) and static fields per
    polarizable site."""
    import io
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    pqr = tmp_path / "pol.pqr"
    pqr.write_text(
        "ATOM 1 A PA 1 M 4.0 5.0 5.0 10.0 0.4 0.8 60.0 3.0\n"
        "ATOM 2 B PB 2 M 8.0 5.0 5.0 10.0 -0.4 0.8 60.0 3.0\nEND\n")
    dip = tmp_path / "dip.dat"
    fld = tmp_path / "fld.dat"
    job = input_script.parse(f"""
ensemble nvt
numsteps 200
corrtime 100
temperature 150
basis1 12 0 0
basis2 0 12 0
basis3 0 0 12
polarization on
coulomb cutoff
rd_lrc off
precision float64
dipole_output {dip}
field_output {fld}
pqr_input {pqr}
""")
    run_mod.run(job, log=io.StringIO())
    d_rows = [l for l in dip.read_text().splitlines()
              if l and not l.startswith("#")]
    f_rows = [l for l in fld.read_text().splitlines()
              if l and not l.startswith("#")]
    assert len(d_rows) == 2 and len(f_rows) == 2
    mu = np.array([[float(x) for x in r.split()[1:]] for r in d_rows])
    assert np.all(np.isfinite(mu)) and np.any(mu != 0.0)


def test_energy_output_csv_columns(tmp_path):
    import io
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    pqr = tmp_path / "ar.pqr"
    pqr.write_text(
        "ATOM 1 Ar AR 1 M 3.0 3.0 3.0 39.948 0.0 0.0 119.8 3.405\nEND\n")
    csvf = tmp_path / "e.csv"
    job = input_script.parse(f"""
ensemble nvt
numsteps 200
corrtime 100
temperature 150
basis1 10 0 0
basis2 0 10 0
basis3 0 0 10
precision float64
energy_output {csvf}
pqr_input {pqr}
""")
    run_mod.run(job, log=io.StringIO())
    lines = csvf.read_text().splitlines()
    header = lines[0].split(",")
    assert header[:4] == ["step", "rd", "lrc", "es_real"]
    assert len(lines) == 3                      # header + 2 corrtimes
    assert all(len(l.split(",")) == len(header) for l in lines[1:])


def test_parallel_restarts_written(tmp_path):
    """parallel_restarts: one restart PQR per replica (reference's
    per-MPI-rank staggered restarts, SURVEY §2 "MPI layer")."""
    import glob
    import io as _io
    from mpmc_tpu.io import input_script, pqr as pqr_io
    from mpmc_tpu.mc import run as run_mod
    pqr = tmp_path / "ar.pqr"
    pqr.write_text(
        "ATOM 1 Ar AR 1 M 5.0 5.0 5.0 39.948 0.0 0.0 119.8 3.405\n"
        "ATOM 2 Ar AR 2 M 9.0 5.0 5.0 39.948 0.0 0.0 119.8 3.405\n"
        "END\n")
    rst = tmp_path / "restart.pqr"
    job = input_script.parse(f"""
ensemble nvt
numsteps 100
corrtime 50
temperature 300
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
cutoff 8
coulomb off
rd_lrc off
chains 3
parallel_restarts on
pqr_restart {rst}
pqr_input {pqr}
""")
    assert job.parallel_restarts
    run_mod.run(job, log=_io.StringIO())
    files = sorted(glob.glob(str(rst) + "-r*"))
    assert [f.rsplit("-", 1)[1] for f in files] == ["r0", "r1", "r2"]
    for f in files:
        fr = pqr_io.read(f)
        assert len(fr.atoms) == 2
