"""Trajectory analysis (mpmc_tpu/analyze.py + native/mpmc_analyze.cpp):
native-vs-numpy cross-validation, ideal-gas g(r) physics check, density
grid conservation, CLI round trip."""
import numpy as np
import pytest

from mpmc_tpu import analyze
from mpmc_tpu.io import native, pqr


def _atom(serial, name, mol_name, mol_id, flag, xyz, mass=1.0):
    return pqr.PqrAtom(serial=serial, name=name, mol_name=mol_name,
                       mol_id=mol_id, flag=flag,
                       xyz=np.asarray(xyz, np.float64), mass=mass,
                       charge=0.0, polar=0.0, eps=10.0, sig=3.0)


def _write_traj(path, frames, box):
    for k, atoms in enumerate(frames):
        pqr.write(str(path), atoms, mode="w" if k == 0 else "a",
                  remark=f"frame {k}", box=box, use_native=False)


def _triclinic_traj(tmp_path, n_frames=4, n_ar=40, n_he=12, seed=3):
    """Mixed Ar/He fluid + a couple of frozen sites, triclinic cell."""
    box = np.array([[14.0, 0.0, 0.0],
                    [2.0, 13.0, 0.0],
                    [1.0, -1.5, 12.0]])
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(n_frames):
        atoms, serial = [], 1
        for i in range(n_ar):
            frac = rng.uniform(0, 1, 3)
            atoms.append(_atom(serial, "AR", "AR", serial, "M",
                               frac @ box, mass=39.9))
            serial += 1
        for i in range(n_he):
            frac = rng.uniform(0, 1, 3)
            atoms.append(_atom(serial, "HE", "HE", serial, "M",
                               frac @ box, mass=4.0))
            serial += 1
        # frozen framework sites named AR too: exercises flag selection
        atoms.append(_atom(serial, "AR", "MOF", serial, "F",
                           [0.5, 0.5, 0.5]))
        frames.append(atoms)
    path = tmp_path / "traj.pqr"
    _write_traj(path, frames, box)
    return str(path), box, frames


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native library unavailable")


@needs_native
@pytest.mark.parametrize("sel", [("AR", "AR", "*", "*"),
                                 ("AR", "HE", "*", "*"),
                                 ("*", "*", "M", "M"),
                                 ("AR", "AR", "M", "F")])
def test_rdf_native_matches_python(tmp_path, sel):
    path, box, _ = _triclinic_traj(tmp_path)
    a, b, fa, fb = sel
    gr_n = native.traj_rdf(path, a, b, fa, fb, rmax=5.5, nbins=64)
    frames = pqr.read_frames(path)
    gr_p = analyze.rdf_python(frames, a, b, fa, fb, rmax=5.5, nbins=64)
    np.testing.assert_allclose(gr_n, gr_p, rtol=1e-12, atol=1e-12)


def test_rdf_ideal_gas_is_unity(tmp_path):
    """Uniform random points -> g(r) = 1 (the normalization contract)."""
    box = np.eye(3) * 16.0
    rng = np.random.default_rng(11)
    frames = []
    for _ in range(24):
        atoms = [_atom(i + 1, "ID", "ID", i + 1, "M",
                       rng.uniform(0, 16, 3)) for i in range(150)]
        frames.append(atoms)
    path = tmp_path / "ideal.pqr"
    _write_traj(path, frames, box)
    r, g = analyze.rdf(str(path), "ID", "ID", rmax=7.0, nbins=14)
    # skip the innermost bins (few counts); the rest must average to 1
    assert abs(np.mean(g[3:]) - 1.0) < 0.03
    assert np.all(np.abs(g[3:] - 1.0) < 0.2)


@needs_native
def test_density_native_matches_python(tmp_path):
    path, box, frames_in = _triclinic_traj(tmp_path)
    dims = (9, 8, 7)
    grid_n, nf_n = native.traj_density(path, "AR", "M", dims, box=box)
    frames = pqr.read_frames(path)
    grid_p, nf_p = analyze.density_python(frames, "AR", "M", dims,
                                          box=box)
    assert nf_n == nf_p == len(frames_in)
    np.testing.assert_allclose(grid_n, grid_p, atol=1e-12)
    # every movable AR molecule lands in exactly one bin
    assert grid_n.sum() == pytest.approx(40 * len(frames_in))


def test_density_multisite_com_binning(tmp_path):
    """A 2-site molecule straddling the boundary bins at its COM (the
    min-image unwrap about atom 0), not at the naive mean."""
    box = np.eye(3) * 10.0
    # heavy site at x=9.8, light at x=0.2 (wrapped): unwrapped COM is
    # 9.9 -> bin 9; the naive in-cell mass mean would be 7.4 -> bin 7.
    # y/z sit at 5.2, OFF the bin boundary — exactly-on-boundary points
    # bin to 4 or 5 depending on the CRYST round-trip's 1e-16 noise.
    atoms = [_atom(1, "A", "D2", 1, "M", [9.8, 5.2, 5.2], mass=3.0),
             _atom(2, "B", "D2", 1, "M", [0.2, 5.2, 5.2], mass=1.0)]
    path = tmp_path / "d.pqr"
    _write_traj(path, [atoms], box)
    frames = pqr.read_frames(str(path))
    grid, nf = analyze.density_python(frames, "D2", "M", (10, 10, 10),
                                      box=box)
    assert nf == 1
    assert grid[9, 5, 5] == 1.0 and grid.sum() == 1.0
    if native.available():
        gn, _ = native.traj_density(str(path), "D2", "M", (10, 10, 10),
                                    box=box)
        np.testing.assert_allclose(gn, grid)


def test_cli_rdf_and_density(tmp_path):
    path, box, _ = _triclinic_traj(tmp_path)
    out_csv = tmp_path / "rdf.csv"
    assert analyze.main(["rdf", path, "--a", "AR", "--b", "AR",
                         "--rmax", "5", "--bins", "40",
                         "--out", str(out_csv)]) == 0
    rows = out_csv.read_text().strip().splitlines()
    assert rows[0] == "r,g" and len(rows) == 41
    out_dx = tmp_path / "dens.dx"
    assert analyze.main(["density", path, "--mol", "AR",
                         "--resolution", "1.5",
                         "--out", str(out_dx)]) == 0
    from mpmc_tpu.utils.histogram import read_dx
    grid = read_dx(str(out_dx))
    assert grid.sum() == pytest.approx(40.0)    # per-frame average count


def test_cli_python_fallback_matches_native(tmp_path):
    path, box, _ = _triclinic_traj(tmp_path)
    r1, g1 = analyze.rdf(path, "AR", "AR", rmax=5.0, nbins=50,
                         use_native=True)
    r2, g2 = analyze.rdf(path, "AR", "AR", rmax=5.0, nbins=50,
                         use_native=False)
    np.testing.assert_allclose(g1, g2, atol=1e-12)


# ---------------------------------------------------------------------------
# MSD + loading
# ---------------------------------------------------------------------------

def _drift_traj(tmp_path, n_frames=6, v=(0.9, 0.0, 0.0)):
    """One molecule drifting v per frame across the boundary (exercises
    the min-image unwrapping), plus a GCMC-style molecule that vanishes
    mid-trajectory and a different mol_id appearing afterwards."""
    box = np.eye(3) * 5.0
    v = np.asarray(v)
    frames = []
    for k in range(n_frames):
        atoms = [_atom(1, "AR", "AR", 1, "M",
                       (np.array([0.5, 2.5, 2.5]) + k * v) % 5.0)]
        if k < 3:
            atoms.append(_atom(2, "HE", "HE", 2, "M", [1.0, 1.0, 1.0]))
        if k >= 4:
            atoms.append(_atom(3, "HE", "HE", 3, "M", [4.0, 4.0, 4.0]))
        frames.append(atoms)
    path = tmp_path / "drift.pqr"
    _write_traj(path, frames, box)
    return str(path), box, frames


def test_msd_drifting_particle_analytic(tmp_path):
    """A particle moving v per frame (crossing the boundary) must give
    msd[t] = |v t|^2 exactly — wrong unwrapping would fold it back."""
    path, box, frames = _drift_traj(tmp_path)
    m, c = analyze.msd(path, mol_name="AR", box=box)
    for t in range(1, 6):
        assert m[t] == pytest.approx((0.9 * t) ** 2, rel=1e-9), t
        assert c[t] == 6 - t


def test_msd_segments_close_on_disappearance(tmp_path):
    """The vanishing HE (frames 0-2) and the late HE (frames 4-5) are
    separate stationary segments: zero MSD, and lag counts only within
    each segment (no cross-segment aliasing through the reused name)."""
    path, box, frames = _drift_traj(tmp_path)
    m, c = analyze.msd(path, mol_name="HE", box=box)
    assert m[1] == pytest.approx(0.0, abs=1e-12)
    assert c[1] == 2 + 1      # lags inside [0,1,2] and [4,5]
    assert c[2] == 1
    assert c[3] == 0


def test_msd_native_matches_python(tmp_path):
    path, box, frames = _triclinic_traj(tmp_path)
    if not native.available():
        pytest.skip("no native library")
    mn, cn = native.traj_msd(path, "AR", "M", box=box)
    mp, cp = analyze.msd_python(pqr.read_frames(path), "AR", "M",
                                box=box)
    np.testing.assert_allclose(mn, mp, rtol=1e-10, atol=1e-12)
    np.testing.assert_array_equal(cn, cp)


def test_loading_series(tmp_path):
    path, box, frames = _drift_traj(tmp_path)
    counts = analyze.loading(path, mol_name="HE")
    np.testing.assert_allclose(counts, [1, 1, 1, 0, 1, 1])
    if native.available():
        cp = analyze.loading_python(pqr.read_frames(path), "HE", "M")
        np.testing.assert_allclose(counts, cp)
    # frozen sites excluded by the default flag
    path2, box2, frames2 = _triclinic_traj(tmp_path)
    np.testing.assert_allclose(analyze.loading(path2, mol_name="AR"),
                               [40] * 4)


def test_msd_cli(tmp_path, capsys):
    path, box, frames = _drift_traj(tmp_path)
    # box must come from CRYST records for the CLI: _write_traj wrote it
    analyze.main(["msd", path, "--mol", "AR"])
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert lines[0] == "lag,msd,samples"
    assert len(lines) == 6 + 1
    analyze.main(["loading", path, "--mol", "HE"])
    out = capsys.readouterr().out
    assert out.strip().splitlines()[0] == "frame,n"


@needs_native
def test_widom_native_matches_python(tmp_path):
    """Same fractional insertion points -> the native Widom kernel and
    the numpy reference must agree to rounding."""
    path, box, frames = _triclinic_traj(tmp_path)
    fp = np.random.default_rng(5).uniform(0, 1, (64, 3))
    en, uen, nf = native.traj_widom(path, eps=30.0, sig=3.1,
                                    temperature=120.0, n_try=64,
                                    frac_pos=fp, rc=5.5)
    ep, uep, npf = analyze.widom_python(pqr.read_frames(path), 30.0,
                                        3.1, 120.0, fp, rc=5.5)
    assert nf == npf == len(frames)
    assert en == pytest.approx(ep, rel=1e-12)
    assert uen == pytest.approx(uep, rel=1e-12)
    assert 0.0 < en < 1.5 and uen != 0.0


def test_widom_empty_framework_is_ideal(tmp_path):
    """No LJ sites (eps=0 everywhere): every insertion has U=0, so
    <exp(-bU)> = 1 and <U e> = 0 in both implementations."""
    box = np.eye(3) * 12.0
    atoms = [pqr.PqrAtom(serial=1, name="X", mol_name="MOF", mol_id=1,
                         flag="F", xyz=np.array([6.0, 6.0, 6.0]),
                         mass=10.0, charge=0.0, polar=0.0, eps=0.0,
                         sig=0.0)]
    path = tmp_path / "empty.pqr"
    _write_traj(path, [atoms], box)
    res = analyze.widom(str(path), eps=30.0, sig=3.0, temperature=100.0,
                        n_try=16, use_native=native.available())
    assert res["boltzmann"] == pytest.approx(1.0)
    assert res["u0"] == pytest.approx(0.0, abs=1e-12)
    # Henry coefficient reduces to the ideal-gas value V/(kT m)
    from mpmc_tpu.constants import ATM2K_A3
    kh_ideal = 1e3 * ATM2K_A3 * 12.0**3 / (100.0 * 10.0)
    assert res["kh_mol_kg_atm"] == pytest.approx(kh_ideal, rel=1e-12)


def test_widom_cli(tmp_path, capsys):
    path, box, frames = _triclinic_traj(tmp_path)
    analyze.main(["widom", path, "--eps", "30", "--sig", "3.1", "-T",
                  "120", "--tries", "32", "--rc", "5.0"])
    out = capsys.readouterr().out
    assert "K_H (mol/kg/atm)" in out and "mu_excess" in out


def test_blocking_ar1_statistical_inefficiency(tmp_path):
    """Blocking analysis on an AR(1) series must recover the known
    statistical inefficiency s = (1+phi)/(1-phi) at the plateau, and
    ~1 for white noise."""
    rng = np.random.default_rng(12)
    phi, n = 0.9, 1 << 15
    x = np.empty(n)
    x[0] = rng.standard_normal()
    eps = rng.standard_normal(n)
    for i in range(1, n):
        x[i] = phi * x[i - 1] + eps[i]
    sizes, sems, errs, tau = analyze.blocking(x)
    s_true = (1 + phi) / (1 - phi)   # 19.0
    assert tau == pytest.approx(s_true, rel=0.3)
    _, _, _, tau_iid = analyze.blocking(rng.standard_normal(4096))
    assert tau_iid == pytest.approx(1.0, abs=0.35)


def test_blocking_cli_csv_and_jsonl(tmp_path, capsys):
    import json
    csv = tmp_path / "energy.csv"
    csv.write_text("step,energy_total\n" + "\n".join(
        f"{i},{np.sin(i)}" for i in range(64)) + "\n")
    analyze.main(["blocking", str(csv), "--column", "energy_total"])
    out = capsys.readouterr().out
    assert out.startswith("block_size,sem,sem_err")
    assert "tau_int" in out
    jl = tmp_path / "obs.jsonl"
    jl.write_text("\n".join(json.dumps({"step": i, "N": float(i % 5)})
                            for i in range(64)) + "\n")
    analyze.main(["blocking", str(jl), "--column", "N"])
    assert "tau_int" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# Orientational autocorrelation + S(q)
# ---------------------------------------------------------------------------

def _dimer_traj(tmp_path, n_frames=12, dtheta=2 * np.pi / 12):
    """One rigid dimer rotating dtheta per frame in the xy plane, plus a
    GCMC-style dimer that vanishes after 3 frames; a lone single-atom
    molecule exercises the <2-axis-atoms skip."""
    box = np.eye(3) * 20.0
    frames = []
    for k in range(n_frames):
        th = k * dtheta
        u = np.array([np.cos(th), np.sin(th), 0.0])
        c = np.array([10.0, 10.0, 10.0])
        atoms = [_atom(1, "H", "H2", 1, "M", c - 0.37 * u),
                 _atom(2, "H", "H2", 1, "M", c + 0.37 * u),
                 _atom(5, "X", "XE", 5, "M", [3.0, 3.0, 3.0])]
        if k < 3:
            atoms += [_atom(3, "H", "H2", 2, "M", [5.0, 5.0, 4.63]),
                      _atom(4, "H", "H2", 2, "M", [5.0, 5.0, 5.37])]
        frames.append(atoms)
    path = tmp_path / "dimer.pqr"
    _write_traj(path, frames, box)
    return str(path), box, frames


def test_orient_rotating_dimer_analytic(tmp_path):
    """A dimer rotating th per frame: C1(t) = cos(t th), C2(t) =
    P2(cos(t th)) exactly, for every implementation."""
    dth = 2 * np.pi / 12
    path, box, frames = _dimer_traj(tmp_path, n_frames=12, dtheta=dth)
    c1, c2, cnt = analyze.orientation(path, mol_name="H2",
                                      use_native=False, max_lag=8)
    # restrict to lags where only the rotor contributes mixed angles:
    # the static second dimer (frames 0-2) also contributes at lags 0-2
    for t in range(3, 9):
        n_rot = 12 - t
        # PQR coordinates round-trip at 1e-5 (%11.5f): direction error
        # ~1.4e-5 rad on the 0.74 A axis bounds the cos error by ~3e-5
        c1_expect = (n_rot * np.cos(t * dth)) / n_rot
        assert c1[t] == pytest.approx(c1_expect, abs=1e-4), t
        p2 = 1.5 * np.cos(t * dth) ** 2 - 0.5
        assert c2[t] == pytest.approx(p2, abs=1e-4), t
        assert cnt[t] == n_rot
    # lag 0 is identically 1 with rotor + static-segment samples
    assert c1[0] == pytest.approx(1.0) and c2[0] == pytest.approx(1.0)
    assert cnt[0] == 12 + 3
    # lag 1 mixes 11 rotor pairs and 2 static (dot=1) pairs
    expect1 = (11 * np.cos(dth) + 2 * 1.0) / 13
    assert c1[1] == pytest.approx(expect1, abs=1e-4)


@needs_native
def test_orient_native_matches_python(tmp_path):
    path, box, frames = _dimer_traj(tmp_path)
    cn = native.traj_orient(path, "H2", "M", "*", max_lag=9)
    cp = analyze.orient_python(pqr.read_frames(path), "H2", "M", "*",
                               max_lag=9)
    np.testing.assert_allclose(cn[0], cp[0], atol=1e-12)
    np.testing.assert_allclose(cn[1], cp[1], atol=1e-12)
    np.testing.assert_array_equal(cn[2], cp[2])
    assert cn[2][0] > 0


def test_orient_axis_name_selection(tmp_path):
    """axis selection by atom name must ignore non-matching sites (a
    3-site model whose first site is a COM ghost)."""
    box = np.eye(3) * 10.0
    atoms = [_atom(1, "COM", "N2", 1, "M", [5.0, 5.0, 5.0], mass=0.0),
             _atom(2, "N", "N2", 1, "M", [5.0, 5.0, 4.45]),
             _atom(3, "N", "N2", 1, "M", [5.0, 5.0, 5.55])]
    path = tmp_path / "n2.pqr"
    _write_traj(path, [atoms, atoms], box)
    c1, c2, cnt = analyze.orientation(str(path), mol_name="N2",
                                      axis_name="N", use_native=False)
    assert cnt[1] == 1 and c1[1] == pytest.approx(1.0)
    if native.available():
        cn = native.traj_orient(str(path), "N2", "M", "N")
        np.testing.assert_allclose(cn[0], c1, atol=1e-12)


def test_sq_two_atom_analytic(tmp_path):
    """Two atoms at separation d: S(q) = 1 + sin(qd)/(qd).  d is placed
    exactly on a bin center so the histogram evaluation is exact."""
    dr = 0.005
    d = (600 + 0.5) * dr            # 3.0025 A
    box = np.eye(3) * 25.0
    atoms = [_atom(1, "AR", "AR", 1, "M", [5.0, 5.0, 5.0]),
             _atom(2, "AR", "AR", 2, "M", [5.0 + d, 5.0, 5.0])]
    path = tmp_path / "two.pqr"
    _write_traj(path, [atoms], box)
    q = np.linspace(0.3, 12.0, 40)
    s, nf = analyze.sq(str(path), q, name="AR", use_native=False,
                       dr_bin=dr)
    assert nf == 1
    np.testing.assert_allclose(s, 1.0 + np.sin(q * d) / (q * d),
                               atol=1e-9)   # PQR %11.5f round-trip ulp


@needs_native
def test_sq_native_matches_python(tmp_path):
    path, box, frames = _triclinic_traj(tmp_path)
    q = np.linspace(0.5, 10.0, 25)
    sn, nfn = native.traj_sq(path, q, "*", "M", dr_bin=0.01)
    sp, nfp = analyze.sq_python(pqr.read_frames(path), q, "*", "M",
                                dr_bin=0.01)
    assert nfn == nfp == len(frames)
    np.testing.assert_allclose(sn, sp, rtol=1e-10, atol=1e-10)


def test_sq_rejects_nonpositive_q(tmp_path):
    path, box, frames = _triclinic_traj(tmp_path, n_frames=1)
    with pytest.raises(ValueError):
        analyze.sq_python(pqr.read_frames(path), [0.0, 1.0])
    if native.available():
        with pytest.raises(ValueError):
            native.traj_sq(path, [0.0, 1.0])


# ---------------------------------------------------------------------------
# Post-hoc Qst + isotherm fitting
# ---------------------------------------------------------------------------

def test_qst_fluctuation_recovery():
    """U = u0 N + white noise gives cov(U,N)/var(N) = u0 exactly in
    expectation, so Qst -> T - u0; the jackknife sem must bracket it."""
    rng = np.random.default_rng(7)
    t, u0, n_s = 77.0, -900.0, 1 << 13
    n = rng.poisson(25.0, n_s).astype(float)
    u = u0 * n + rng.standard_normal(n_s) * 40.0
    res = analyze.qst(n, u, temperature=t)
    assert res["qst"] == pytest.approx(t - u0, rel=0.01)
    assert abs(res["qst"] - (t - u0)) < 5 * res["qst_sem"]
    assert res["n_mean"] == pytest.approx(25.0, rel=0.02)
    with pytest.raises(ValueError):
        analyze.qst(np.full(64, 3.0), np.arange(64.0), 77.0)


@pytest.mark.parametrize("model,params", [
    ("langmuir", {"qm": 12.0, "k": 0.8}),
    ("toth", {"qm": 9.0, "k": 1.4, "t": 0.62}),
    ("dsl", {"qm1": 6.0, "k1": 4.0, "qm2": 10.0, "k2": 0.05}),
])
def test_isofit_parameter_recovery(model, params):
    p = np.geomspace(0.01, 60.0, 24)
    names, fn = analyze._ISO_MODELS[model]
    y = fn(p, *[params[k] for k in names])
    res = analyze.isotherm_fit(p, y, model=model)
    assert res["rmse"] < 1e-8 * y.max()
    for k in names:
        assert res["params"][k] == pytest.approx(params[k], rel=1e-4), k
    henry_true = {"langmuir": params.get("qm", 0) * params.get("k", 0),
                  "toth": params.get("qm", 0) * params.get("k", 0),
                  "dsl": params.get("qm1", 0) * params.get("k1", 0)
                  + params.get("qm2", 0) * params.get("k2", 0)}[model]
    assert res["henry"] == pytest.approx(henry_true, rel=1e-3)


def test_isofit_validates_inputs():
    with pytest.raises(ValueError):
        analyze.isotherm_fit([1.0, 2.0], [1.0, 2.0], model="bogus")
    with pytest.raises(ValueError):
        analyze.isotherm_fit([0.0, 2.0], [1.0, 2.0])
    with pytest.raises(ValueError):
        analyze.isotherm_fit([1.0, 2.0, 3.0], [1.0, 2.0, 2.5],
                             model="dsl")   # 4 params, 3 points


def test_new_cli_commands(tmp_path, capsys):
    import json
    path, box, frames = _dimer_traj(tmp_path)
    out_csv = tmp_path / "c.csv"
    assert analyze.main(["orient", path, "--mol", "H2", "--max-lag",
                         "6", "--out", str(out_csv)]) == 0
    rows = out_csv.read_text().strip().splitlines()
    assert rows[0] == "lag,c1,c2,samples" and len(rows) == 8
    assert analyze.main(["sq", path, "--a", "H", "--qmin", "0.5",
                         "--qmax", "8", "--nq", "16",
                         "--out", str(out_csv)]) == 0
    rows = out_csv.read_text().strip().splitlines()
    assert rows[0] == "q,sq" and len(rows) == 17
    jl = tmp_path / "obs.jsonl"
    rng = np.random.default_rng(1)
    nn = rng.poisson(12.0, 512).astype(float)
    jl.write_text("\n".join(
        json.dumps({"step": i, "N": v, "energy_total": -500.0 * v})
        for i, v in enumerate(nn)) + "\n")
    assert analyze.main(["qst", str(jl), "-T", "77"]) == 0
    out = capsys.readouterr().out
    assert "Qst (K):" in out and "577" in out
    iso = tmp_path / "iso.csv"
    p = np.geomspace(0.1, 30, 12)
    iso.write_text("pressure_atm,n_mean,n_sem\n" + "\n".join(
        f"{pi},{8.0 * 0.5 * pi / (1 + 0.5 * pi)},0.05" for pi in p)
        + "\n")
    assert analyze.main(["isofit", str(iso), "--model", "langmuir",
                         "--sem-column", "n_sem"]) == 0
    out = capsys.readouterr().out
    assert "qm = 8" in out and "henry" in out


# ---------------------------------------------------------------------------
# Multi-site charged Widom
# ---------------------------------------------------------------------------

def _posquat(n, seed=5):
    rng = np.random.default_rng(seed)
    pq = np.empty((n, 7))
    pq[:, :3] = rng.uniform(0, 1, (n, 3))
    q = rng.standard_normal((n, 4))
    pq[:, 3:] = q / np.linalg.norm(q, axis=1, keepdims=True)
    return pq


@needs_native
def test_widom_mol_single_site_reduces_to_widom(tmp_path):
    """A 1-site uncharged template at the origin must reproduce the
    single-site kernel exactly (rotation acts trivially)."""
    path, box, frames = _triclinic_traj(tmp_path)
    pq = _posquat(48)
    en, uen, nf = native.traj_widom(path, eps=30.0, sig=3.1,
                                    temperature=120.0, n_try=48,
                                    frac_pos=pq[:, :3], rc=5.5)
    em, uem, nfm = native.traj_widom_mol(
        path, [[0.0, 0.0, 0.0]], [30.0], [3.1], [0.0], 120.0,
        n_try=48, posquat=pq, rc=5.5)
    assert nf == nfm
    assert em == pytest.approx(en, rel=1e-12)
    assert uem == pytest.approx(uen, rel=1e-12)


def _charged_traj(tmp_path):
    """Frozen framework with LJ + charges (net-neutral pairs)."""
    box = np.eye(3) * 12.0
    rng = np.random.default_rng(9)
    frames = []
    for _ in range(3):
        atoms = []
        for i in range(14):
            a = _atom(i + 1, "O", "MOF", i + 1, "F",
                      rng.uniform(0, 12, 3), mass=16.0)
            a.charge = 0.3 if i % 2 == 0 else -0.3
            atoms.append(a)
        frames.append(atoms)
    path = tmp_path / "charged.pqr"
    _write_traj(path, frames, box)
    return str(path), box


@needs_native
def test_widom_mol_native_matches_python(tmp_path):
    """Shared (position, quaternion) trials -> native and numpy agree
    to rounding on a charged 3-site template."""
    path, box = _charged_traj(tmp_path)
    pq = _posquat(32, seed=7)
    sx = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, -0.74],
                   [0.0, 0.0, 0.74]])
    se = np.array([34.2, 0.0, 0.0])
    ss = np.array([3.0, 0.0, 0.0])
    sq2 = np.array([-0.84, 0.42, 0.42])
    en, uen, nf = native.traj_widom_mol(path, sx, se, ss, sq2, 150.0,
                                        n_try=32, posquat=pq, rc=5.9)
    ep, uep, nfp = analyze.widom_mol_python(
        pqr.read_frames(path), sx, se, ss, sq2, 150.0, pq, rc=5.9)
    assert nf == nfp == 3
    assert en == pytest.approx(ep, rel=1e-12)
    assert uen == pytest.approx(uep, rel=1e-12)
    assert uen != 0.0


def test_widom_mol_charged_analytic(tmp_path):
    """One framework charge Q, a single-site ghost of charge q inserted
    at a known distance with no LJ: U = KE q Q / r exactly, in both
    implementations."""
    from mpmc_tpu.constants import KE
    box = np.eye(3) * 20.0
    a = _atom(1, "Q", "ION", 1, "F", [10.0, 10.0, 10.0], mass=10.0)
    a.charge = 0.5
    a.eps = 0.0
    path = tmp_path / "ion.pqr"
    _write_traj(path, [[a]], box)
    # ghost at (13, 10, 10): r = 3
    pq = np.array([[13.0 / 20.0, 0.5, 0.5, 1.0, 0.0, 0.0, 0.0]])
    u_expect = KE * (-0.2) * 0.5 / 3.0
    ep, uep, _ = analyze.widom_mol_python(
        pqr.read_frames(str(path)), [[0.0, 0.0, 0.0]], [0.0], [0.0],
        [-0.2], 100.0, pq, rc=8.0)
    w = np.exp(-u_expect / 100.0)
    assert ep == pytest.approx(w, rel=1e-9)
    assert uep == pytest.approx(u_expect * w, rel=1e-9)
    if native.available():
        en, uen, _ = native.traj_widom_mol(
            str(path), [[0.0, 0.0, 0.0]], [0.0], [0.0], [-0.2], 100.0,
            n_try=1, posquat=pq, rc=8.0)
        assert en == pytest.approx(ep, rel=1e-12)
        assert uen == pytest.approx(uep, rel=1e-12)


def test_widom_mol_cli(tmp_path, capsys):
    path, box = _charged_traj(tmp_path)
    tpl = tmp_path / "h2.pqr"
    h = _atom(1, "H2G", "H2", 1, "M", [0.0, 0.0, 0.0], mass=0.0)
    h.charge = -0.84
    h.eps = 34.2
    h.sig = 3.0
    h1 = _atom(2, "H2E", "H2", 1, "M", [0.0, 0.0, -0.37], mass=1.008)
    h1.charge = 0.42
    h1.eps = 0.0
    h2 = _atom(3, "H2E", "H2", 1, "M", [0.0, 0.0, 0.37], mass=1.008)
    h2.charge = 0.42
    h2.eps = 0.0
    pqr.write(str(tpl), [h, h1, h2], use_native=False)
    assert analyze.main(["widom", path, "--insert-pqr", str(tpl),
                         "-T", "77", "--tries", "16"]) == 0
    out = capsys.readouterr().out
    assert "mu_excess" in out and "K_H" in out
    with pytest.raises(SystemExit):
        analyze.main(["widom", path, "-T", "77"])


def test_qst_clausius_clapeyron_recovery(tmp_path, capsys):
    """Langmuir isotherms with a van't Hoff K(T) = K0 exp(Qst/T) have a
    loading-independent isosteric heat = Qst exactly; the CC
    construction must recover it at every loading."""
    qst_true, qm, k0 = 1100.0, 10.0, 2e-4
    t1, t2 = 77.0, 97.0

    def iso(t, p):
        k = k0 * np.exp(qst_true / t)
        return qm * k * p / (1 + k * p)

    p = np.geomspace(0.05, 80.0, 30)
    th, qk = analyze.qst_clausius_clapeyron(p, iso(t1, p), t1,
                                            p, iso(t2, p), t2)
    # interp in (ln P, loading) is piecewise-linear: ~0.3%
    np.testing.assert_allclose(qk, qst_true, rtol=5e-3)
    # CLI round trip on campaign-style CSVs
    for name, t in (("i1.csv", t1), ("i2.csv", t2)):
        (tmp_path / name).write_text(
            "pressure_atm,n_mean\n" + "\n".join(
                f"{pi},{iso(t, pi)}" for pi in p) + "\n")
    assert analyze.main(["qst-cc", str(tmp_path / "i1.csv"),
                         str(tmp_path / "i2.csv"), "--t1", "77",
                         "--t2", "97"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("loading,qst_K,qst_kJ_mol")
    vals = [float(r.split(",")[1]) for r in out.strip().splitlines()[1:]]
    assert all(abs(v - qst_true) < 5.0 for v in vals)
    with pytest.raises(ValueError):
        analyze.qst_clausius_clapeyron(p, iso(t1, p), 77.0,
                                       p, iso(t1, p), 77.0)


def test_iast_extended_langmuir_anchor(tmp_path, capsys):
    """Two Langmuir isotherms with EQUAL qm: IAST reduces analytically
    to the extended-Langmuir mixture isotherm
        q_i = qm K_i y_i P / (1 + K1 y1 P + K2 y2 P)
    with x1 = K1 y1 / (K1 y1 + K2 y2) and S12 = K1/K2."""
    qm, k1, k2 = 9.0, 1.3, 0.2
    f1 = {"model": "langmuir", "params": {"qm": qm, "k": k1}}
    f2 = {"model": "langmuir", "params": {"qm": qm, "k": k2}}
    y1, pt = 0.3, 5.0
    r = analyze.iast_binary(f1, f2, y1, pt)
    a = pt * (k1 * y1 + k2 * (1 - y1))
    assert r["x1"] == pytest.approx(k1 * y1 / (k1 * y1 + k2 * (1 - y1)),
                                    abs=1e-10)
    assert r["q1"] == pytest.approx(qm * k1 * y1 * pt / (1 + a),
                                    rel=1e-9)
    assert r["q2"] == pytest.approx(qm * k2 * (1 - y1) * pt / (1 + a),
                                    rel=1e-9)
    assert r["q_total"] == pytest.approx(qm * a / (1 + a), rel=1e-9)
    assert r["selectivity"] == pytest.approx(k1 / k2, rel=1e-9)
    # CLI: fit two synthetic pure isotherms, predict the mixture
    p = np.geomspace(0.01, 50, 20)
    for name, k in (("a.csv", k1), ("b.csv", k2)):
        (tmp_path / name).write_text("pressure_atm,n_mean\n" + "\n".join(
            f"{pi},{qm * k * pi / (1 + k * pi)}" for pi in p) + "\n")
    assert analyze.main(["iast", str(tmp_path / "a.csv"),
                         str(tmp_path / "b.csv"), "--y1", "0.3",
                         "--pressures", "5.0"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "p_total,q1,q2,q_total,selectivity"
    got = [float(v) for v in out[1].split(",")]
    assert got[1] == pytest.approx(qm * k1 * y1 * pt / (1 + a), rel=1e-4)
    assert got[4] == pytest.approx(k1 / k2, rel=1e-4)


def test_iast_toth_numeric_spreading_pressure():
    """A Tóth component exercises the numeric spreading-pressure
    integral; sanity: selectivity falls between the two pure Henry-law
    ratios' bounds and loadings are positive/finite."""
    f1 = {"model": "toth", "params": {"qm": 8.0, "k": 1.1, "t": 0.7}}
    f2 = {"model": "langmuir", "params": {"qm": 6.0, "k": 0.15}}
    r = analyze.iast_binary(f1, f2, 0.5, 2.0)
    assert 0 < r["x1"] < 1
    assert r["q1"] > 0 and r["q2"] > 0
    assert np.isfinite(r["q_total"])
    assert r["selectivity"] > 1.0     # component 1 binds stronger
    with pytest.raises(ValueError):
        analyze.iast_binary(f1, f2, 1.5, 2.0)


def test_isofit_rejects_nonfinite_sem():
    """Single-chain campaigns write n_sem=inf; weighting by it would
    zero every residual and report the starting guess as converged."""
    p = np.geomspace(0.1, 10, 8)
    y = 5.0 * 0.5 * p / (1 + 0.5 * p)
    with pytest.raises(ValueError, match="sem"):
        analyze.isotherm_fit(p, y, sem=np.full_like(p, np.inf))
    with pytest.raises(ValueError, match="sem"):
        analyze.isotherm_fit(p, y, sem=np.zeros_like(p))


def test_qst_cli_reads_energy_output_csv(tmp_path, capsys):
    """The energy_output CSV header is step,...,total,n_molecules,
    volume (io/output.py) — the qst defaults must map onto it."""
    rng = np.random.default_rng(3)
    nn = rng.poisson(10.0, 256).astype(float)
    csv = tmp_path / "energy.csv"
    csv.write_text(
        "step,rd,lrc,es_real,es_recip,es_self,es_excl,polar,vdw,"
        "total,n_molecules,volume\n" + "\n".join(
            f"{i},0,0,0,0,0,0,0,0,{-300.0 * v},{v},8000"
            for i, v in enumerate(nn)) + "\n")
    assert analyze.main(["qst", str(csv), "-T", "77", "--blocks",
                         "8"]) == 0
    out = capsys.readouterr().out
    assert "Qst (K):" in out and "377" in out


def _sphere_struct(tmp_path, atoms_spec, box_edge=20.0,
                   name="struct.pqr"):
    """One-frame structure of frozen hard spheres: atoms_spec =
    [(name, xyz, sig), ...] in a cubic box."""
    box = np.eye(3) * box_edge
    atoms = []
    for k, (nm, xyz, sig) in enumerate(atoms_spec):
        a = _atom(k + 1, nm, "MOF", k + 1, "F", xyz, mass=12.0)
        a.sig = sig
        atoms.append(a)
    path = tmp_path / name
    _write_traj(path, [atoms], box)
    return str(path), box


@needs_native
def test_pore_native_matches_python(tmp_path):
    """Shared sample/center points: the native kernel and the numpy
    reference must agree bitwise-ish on both outputs, triclinic cell."""
    path, box, _ = _triclinic_traj(tmp_path, n_frames=1)
    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 1, (400, 3))
    ctr = rng.uniform(0, 1, (150, 3))
    d_n, r_n = native.traj_pore(path, "*", "*", n_points=400,
                                n_centers=150, frac_pts=pts,
                                frac_ctr=ctr)
    d_p, r_p = analyze.pore_python(pqr.read_frames(path), "*", "*",
                                   frac_pts=pts, frac_ctr=ctr)
    np.testing.assert_allclose(d_n, d_p, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(r_n, r_p, rtol=1e-12, atol=1e-12)
    assert np.all(r_n >= d_n - 1e-12)       # covering sphere only grows


def test_pore_single_sphere_analytic(tmp_path):
    """One sig=3 atom (radius 1.5) in a 20 A cube: the excluded volume
    fraction is (4/3) pi 1.5^3 / 8000 and every surface distance is
    |p - x| - 1.5 capped at 10."""
    path, box = _sphere_struct(tmp_path, [("C", [10.0, 10.0, 10.0],
                                           3.0)])
    res = analyze.pore(path, n_points=20000, n_centers=64, seed=5,
                       use_native=False)
    vf_exact = 1.0 - (4.0 / 3.0) * np.pi * 1.5**3 / 8000.0
    assert abs(res["void_fraction"] - vf_exact) < 5e-3
    assert res["cap"] == pytest.approx(10.0)
    assert res["d_max"] <= 10.0 + 1e-12
    assert res["volume"] == pytest.approx(8000.0)


@needs_native
def test_pore_empty_selection_is_all_void(tmp_path):
    """No frozen atoms selected -> every point sits at the cap and the
    void fraction is exactly 1 (empty-box convention)."""
    path, box, _ = _triclinic_traj(tmp_path, n_frames=1)
    d, r = native.traj_pore(path, "XX", "F", n_points=64, n_centers=8,
                            seed=1)
    # cap from the CRYST1-roundtripped cell (the text record quantizes
    # the triclinic basis slightly vs the exact box)
    cap = analyze._half_min_width(
        analyze._frame_box(pqr.read_first_frame(path), None))
    np.testing.assert_allclose(d, cap, rtol=1e-12)
    np.testing.assert_allclose(r, cap, rtol=1e-12)


@needs_native
def test_asa_isolated_atom_analytic(tmp_path):
    """A single atom's accessible area is exactly 4 pi R^2 with
    R = (sig + probe)/2 — native and numpy, any sample count."""
    path, box = _sphere_struct(tmp_path, [("C", [10.0, 10.0, 10.0],
                                           3.0)])
    area, vol, mass = native.traj_asa(path, probe_sigma=2.0,
                                      n_sphere=128, seed=3)
    assert area == pytest.approx(4.0 * np.pi * 2.5**2, rel=1e-12)
    assert vol == pytest.approx(8000.0)
    assert mass == pytest.approx(12.0)
    res = analyze.asa(path, probe_sigma=2.0, n_sphere=128,
                      use_native=False)
    assert res["area_A2"] == pytest.approx(4.0 * np.pi * 2.5**2,
                                           rel=1e-12)
    # 1 m^2/g sanity: area * 1e-20 / (12 amu * 1.66054e-24 g)
    assert res["area_m2_g"] == pytest.approx(
        res["area_A2"] * 1e-20 / (12.0 * 1.66053906660e-24), rel=1e-9)


@needs_native
def test_asa_native_matches_python(tmp_path):
    """Shared sphere directions: native == numpy on an overlapping
    cluster in a triclinic cell."""
    path, box, _ = _triclinic_traj(tmp_path, n_frames=1)
    rng = np.random.default_rng(7)
    v = rng.normal(size=(96, 3))
    u = v / np.linalg.norm(v, axis=1, keepdims=True)
    a_n = native.traj_asa(path, "*", "*", probe_sigma=1.0, n_sphere=96,
                          unit_pts=u)
    a_p = analyze.asa_python(pqr.read_frames(path), "*", "*",
                             probe_sigma=1.0, unit_pts=u)
    np.testing.assert_allclose(a_n, a_p, rtol=1e-12)


@needs_native
def test_asa_buried_atom_contributes_nothing(tmp_path):
    """An atom fully inside a larger concentric sphere adds zero area;
    the big sphere's own surface stays fully exposed (the small
    blocker cannot reach it)."""
    path, box = _sphere_struct(tmp_path, [("BIG", [10.0, 10.0, 10.0],
                                           10.0),
                                          ("SML", [10.0, 10.0, 10.0],
                                           3.0)])
    area, _, _ = native.traj_asa(path, probe_sigma=0.0, n_sphere=256,
                                 seed=2)
    assert area == pytest.approx(4.0 * np.pi * 5.0**2, rel=1e-12)


def test_pore_asa_cli(tmp_path, capsys):
    path, box = _sphere_struct(tmp_path, [("C", [10.0, 10.0, 10.0],
                                           3.0)])
    out_csv = tmp_path / "psd.csv"
    assert analyze.main(["pore", path, "--points", "2000", "--centers",
                         "64", "--out", str(out_csv)]) == 0
    text = capsys.readouterr().out
    assert "void fraction" in text
    lines = out_csv.read_text().splitlines()
    assert lines[0] == "r,psd,cumulative" and len(lines) > 10
    assert analyze.main(["asa", path, "--probe", "2.0",
                         "--sphere-points", "64"]) == 0
    text = capsys.readouterr().out
    assert "m^2/g" in text and "accessible area" in text


def test_mbar_harmonic_ladder_analytic():
    """1-D harmonic mode U = x^2/2 sampled exactly at each ladder
    state: MBAR must recover the exact dimensionless free energies
    f_i - f_0 = (1/2) ln(beta_i/beta_0) (Z = sqrt(2 pi / beta)) and
    reweight to an UNSAMPLED temperature with <U> = T/2 and
    Cv/kB = 1/2."""
    rng = np.random.default_rng(0)
    betas = np.array([1.25, 1.0, 0.8, 0.64])
    u_by = [0.5 * rng.normal(0.0, 1.0 / np.sqrt(b), 6000) ** 2
            for b in betas]
    fit = analyze.mbar_fit(betas, u_by)
    assert fit["converged"]
    f_exact = 0.5 * np.log(betas / betas[0])
    np.testing.assert_allclose(fit["f"], f_exact, atol=0.03)
    r = analyze.mbar_reweight(fit, 0.9)
    assert abs(r["u_mean"] - 1.0 / (2 * 0.9)) < 0.02
    assert abs(0.9 ** 2 * r["u_var"] - 0.5) < 0.05
    assert r["ess"] > 1000.0     # interpolation keeps most samples


def test_mbar_reweight_reproduces_sampled_state():
    """Reweighting to a sampled beta must agree with that state's own
    sample mean (MBAR consistency)."""
    rng = np.random.default_rng(4)
    betas = np.array([1.0, 0.5])
    u_by = [0.5 * rng.normal(0.0, 1.0 / np.sqrt(b), 8000) ** 2
            for b in betas]
    fit = analyze.mbar_fit(betas, u_by)
    for b, u in zip(betas, u_by):
        r = analyze.mbar_reweight(fit, b)
        assert abs(r["u_mean"] - u.mean()) < 0.02


def test_mbar_validates_inputs():
    with pytest.raises(ValueError, match="lengths"):
        analyze.mbar_fit([1.0, 0.5], [np.ones(4)])
    with pytest.raises(ValueError, match="sample"):
        analyze.mbar_fit([1.0, 0.5], [np.ones(4), np.array([])])


def test_pt_mbar_cli(tmp_path, capsys):
    """End-to-end: synthetic PT ladder records (temps permuted across
    blocks, Gaussian-energy model) -> mbar CLI -> CSV curves."""
    import json
    rng = np.random.default_rng(9)
    ladder = np.array([80.0, 100.0, 125.0, 156.25])
    lines = []
    for blk in range(400):
        perm = rng.permutation(4)
        temps = ladder[perm]
        # harmonic-mode model: U | T ~ (T/2) * chi2_1
        us = 0.5 * temps * rng.normal(0.0, 1.0, 4) ** 2
        lines.append(json.dumps({
            "step": blk, "pt_temps": temps.tolist(),
            "pt_energy": us.tolist(),
            "pt_N": [2.0, 2.0, 2.0, 2.0]}))
    path = tmp_path / "obs.jsonl"
    path.write_text("\n".join(lines) + "\n")
    out_csv = tmp_path / "mbar.csv"
    assert analyze.main(["mbar", str(path), "--nt", "9",
                         "--out", str(out_csv)]) == 0
    text = capsys.readouterr().out
    assert "ladder: 4 states" in text and "delta_f" in text
    rows = out_csv.read_text().splitlines()
    assert rows[0] == "T,u_mean,cv_kb,n_mean,ess" and len(rows) == 10
    t, u = np.array([[float(r.split(",")[0]), float(r.split(",")[1])]
                     for r in rows[1:]]).T
    # harmonic model: <U>(T) = T/2 across the whole grid
    np.testing.assert_allclose(u, t / 2.0, rtol=0.06)
    n_mean = np.array([float(r.split(",")[3]) for r in rows[1:]])
    np.testing.assert_allclose(n_mean, 2.0, atol=1e-9)


def _gc_jsonl(path, temperature, fugacity, n_samples, seed, eps_bind,
              species=("MOF", "H2"), n_chains=None):
    """Synthetic GCMC run stream with a run_meta header: the exactly
    solvable lattice-gas model U = -eps_bind * N, whose grand-canonical
    occupancy is Poisson with lambda(f) = c * f * exp(eps_bind/T)
    (c absorbs the state-independent beta*V/Lambda^3 factors)."""
    import json
    rng = np.random.default_rng(seed)
    lam = 5.0 * fugacity * np.exp(eps_bind / temperature)
    lines = [json.dumps({"run_meta": {
        "species": list(species), "ensemble": "uvt",
        "temperature": temperature, "pressure": fugacity,
        "fugacities": [0.0, fugacity], "volume": 1000.0}})]
    for i in range(n_samples):
        n = int(rng.poisson(lam))
        lines.append(json.dumps({
            "step": (i + 1) * 10, "energy_total": -eps_bind * n,
            "N": float(n), f"N_{species[1]}": float(n)}))
    path.write_text("\n".join(lines) + "\n")
    return lam


def test_gcmc_mbar_lattice_gas_exact(tmp_path):
    """Grand-canonical MBAR over three fugacity states of the
    U = -eps*N lattice gas recovers the analytic <N>(f) = c f e^{eps/T}
    curve, the exact Qst = T + eps, Poisson var(N) = <N>, and the
    grand-potential differences ln(Xi_k/Xi_0) = lambda_k - lambda_0."""
    T, eps = 77.0, 120.0
    fs = [0.05, 0.2, 0.8]
    paths = []
    lams = {}
    for i, f in enumerate(fs):
        p = tmp_path / f"run{i}.jsonl"
        lams[f] = _gc_jsonl(p, T, f, 4000, 100 + i, eps)
        paths.append(str(p))
    res = analyze.gcmc_mbar(paths, n_f=9)
    assert res["converged"] and res["temperature"] == T
    # endpoints + interior of the grid against the analytic isotherm
    lam_exact = 5.0 * res["f_grid"] * np.exp(eps / T)
    np.testing.assert_allclose(res["n_mean"], lam_exact, rtol=0.05)
    # Poisson: var(N) = <N>
    np.testing.assert_allclose(res["var_n"], res["n_mean"], rtol=0.12)
    # fluctuation-formula Qst: U = -eps*N => qst = (T + eps) * R
    np.testing.assert_allclose(
        res["qst_kj_mol"], (T + eps) * 8.314462618e-3, rtol=1e-6)
    # delta_f = -(ln Xi_k - ln Xi_0) = -(lambda_k - lambda_0)
    lam_k = np.array([lams[f] for f in fs])
    np.testing.assert_allclose(res["delta_f"], -(lam_k - lam_k[0]),
                               atol=0.35)
    # per-species curve == total for the single sorbate
    np.testing.assert_allclose(res["n_species"]["H2"], res["n_mean"])


def test_gcmc_mbar_validates_states(tmp_path):
    p1 = tmp_path / "a.jsonl"
    p2 = tmp_path / "b.jsonl"
    _gc_jsonl(p1, 77.0, 0.1, 50, 1, 50.0)
    with pytest.raises(ValueError, match=">= 2 runs"):
        analyze.gcmc_mbar([str(p1)])
    _gc_jsonl(p2, 90.0, 0.4, 50, 2, 50.0)
    with pytest.raises(ValueError, match="different temperatures"):
        analyze.gcmc_mbar([str(p1), str(p2)])
    # no header record at all
    p3 = tmp_path / "c.jsonl"
    p3.write_text('{"step": 1, "energy_total": 0.0, "N": 1.0}\n')
    with pytest.raises(ValueError, match="run_meta"):
        analyze.gcmc_mbar([str(p1), str(p3)])


def test_gcmc_mbar_cli(tmp_path, capsys):
    paths = []
    for i, f in enumerate([0.1, 0.4]):
        p = tmp_path / f"run{i}.jsonl"
        _gc_jsonl(p, 77.0, f, 800, 7 + i, 80.0)
        paths.append(str(p))
    out_csv = tmp_path / "iso.csv"
    assert analyze.main(["gcmc-mbar", *paths, "--nf", "7",
                         "--out", str(out_csv)]) == 0
    text = capsys.readouterr().out
    assert "ladder: 2 states at T=77" in text and "delta_f" in text
    rows = out_csv.read_text().splitlines()
    assert rows[0] == ("f_atm,n_mean,u_mean,var_n,qst_kJ_mol,ess,n_H2"
                       ) and len(rows) == 8
    fcol = np.array([float(r.split(",")[0]) for r in rows[1:]])
    ncol = np.array([float(r.split(",")[1]) for r in rows[1:]])
    # isotherm is linear in f for the lattice gas; check monotone +
    # 4x span between the endpoints (f spans 0.1 -> 0.4)
    assert np.all(np.diff(fcol) > 0) and np.all(np.diff(ncol) > 0)
    np.testing.assert_allclose(ncol[-1] / ncol[0], 4.0, rtol=0.1)


def _cluster_frame(tmp_path, box_l=14.0):
    """Known cluster topology incl. a PBC-straddling pair: molecules
    1+2 bond directly, molecule 3 bonds to 1 ACROSS the boundary
    (min-image 0.8 A), molecule 4 is isolated."""
    atoms = [
        _atom(1, "He", "HE", 1, "M", [0.5, 1.0, 1.0]),
        _atom(2, "He", "HE", 2, "M", [2.0, 1.0, 1.0]),
        _atom(3, "He", "HE", 3, "M", [13.7, 1.0, 1.0]),
        _atom(4, "He", "HE", 4, "M", [8.0, 8.0, 8.0]),
    ]
    path = tmp_path / "clu.pqr"
    _write_traj(path, [atoms], box_l * np.eye(3))
    return str(path)


def test_cluster_analytic_pbc(tmp_path):
    path = _cluster_frame(tmp_path)
    for use_native in (False, True):
        series, hist = analyze.cluster(path, "HE", "M", rc=2.0,
                                       max_size=8,
                                       use_native=use_native)
        assert series.shape == (1, 3), use_native
        n_cl, mean_sz, frac = series[0]
        assert n_cl == 2 and mean_sz == pytest.approx(2.0), use_native
        assert frac == pytest.approx(3.0 / 4.0), use_native
        # one size-3 cluster + one singleton
        assert hist[0] == 1 and hist[2] == 1 and hist.sum() == 2
    # below the bonding cutoff everything is a singleton
    series, hist = analyze.cluster(path, "HE", "M", rc=0.5, max_size=8,
                                   use_native=False)
    assert series[0][0] == 4 and series[0][2] == pytest.approx(0.25)


@needs_native
def test_cluster_native_matches_python(tmp_path):
    path, box, _ = _triclinic_traj(tmp_path)
    for rc in (2.5, 5.0):
        s_py, h_py = analyze.cluster(path, "*", "M", rc=rc,
                                     max_size=16, use_native=False)
        s_nat, h_nat = analyze.cluster(path, "*", "M", rc=rc,
                                       max_size=16, use_native=True)
        np.testing.assert_allclose(s_nat, s_py, rtol=0, atol=1e-12)
        np.testing.assert_array_equal(h_nat, h_py)


def test_cluster_cli(tmp_path, capsys):
    path = _cluster_frame(tmp_path)
    out_csv = tmp_path / "clu.csv"
    assert analyze.main(["cluster", path, "--mol", "HE", "--rc", "2.0",
                         "--max-size", "8", "--out",
                         str(out_csv)]) == 0
    text = capsys.readouterr().out
    assert "pooled cluster-size histogram" in text
    assert "<largest fraction>: 0.75" in text
    rows = out_csv.read_text().splitlines()
    assert rows[0] == "frame,n_clusters,mean_size,largest_fraction"
    assert rows[1].startswith("0,2,2,0.75")
