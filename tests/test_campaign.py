"""Isotherm campaign driver (mpmc_tpu/campaign.py): warm-started
pressure sweeps, uncertainty-targeted stopping, restart manifests."""
import io

import numpy as np
import pytest

from mpmc_tpu import campaign
from mpmc_tpu.constants import ATM2K_A3
from mpmc_tpu.io import input_script

IDEAL_PQR = """\
ATOM 1 He HE 1 M 5.0 5.0 5.0 4.0026 0.0 0.0 0.0 0.0
END
"""


def _job(tmp_path, **opts):
    p = tmp_path / "he.pqr"
    p.write_text(IDEAL_PQR)
    extra = "".join(f"{k} {v}\n" for k, v in opts.items())
    return input_script.parse(f"""
ensemble uvt
numsteps 4000
corrtime 200
temperature 100
pressure 1.0
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
cutoff 8.0
coulomb off
rd_lrc off
insert_probability 0.6
max_molecules 64
pqr_input {p}
{extra}
""")


def test_ideal_gas_isotherm_is_linear(tmp_path):
    job = _job(tmp_path)
    log = io.StringIO()
    rows = campaign.run_isotherm(
        job, pressures=[0.5, 1.0, 2.0], chains=8, target_rel_sem=0.05,
        min_steps=2000, max_steps=12000, equil_blocks=2, log=log)
    assert len(rows) == 3
    v = 20.0 ** 3
    for r in rows:
        expect = r.fugacity_atm * ATM2K_A3 * v / 100.0
        # ideal gas: <N> = f V / k T, within a few chain-SEMs
        assert r.n_mean == pytest.approx(expect,
                                         abs=max(4 * r.n_sem, 0.5)), r
    assert rows[0].n_mean < rows[1].n_mean < rows[2].n_mean


def test_uncertainty_target_controls_length(tmp_path):
    job = _job(tmp_path)
    rows_loose = campaign.run_isotherm(
        job, pressures=[1.0], chains=8, target_rel_sem=0.5,
        min_steps=400, max_steps=20000, equil_blocks=1)
    rows_tight = campaign.run_isotherm(
        job, pressures=[1.0], chains=8, target_rel_sem=1e-6,
        min_steps=400, max_steps=3000, equil_blocks=1)
    assert rows_loose[0].steps < rows_tight[0].steps
    assert rows_tight[0].steps == 3000          # hit the cap


def test_campaign_restart_skips_completed(tmp_path):
    job = _job(tmp_path)
    ck = str(tmp_path / "ckpt")
    rows1 = campaign.run_isotherm(
        job, pressures=[0.5, 1.0], chains=4, target_rel_sem=0.5,
        min_steps=400, max_steps=2000, equil_blocks=1,
        checkpoint_dir=ck)
    assert len(rows1) == 2
    # rerun with an extra pressure: the two finished points come back
    # verbatim from the manifest; only the new one runs
    log = io.StringIO()
    rows2 = campaign.run_isotherm(
        job, pressures=[0.5, 1.0, 2.0], chains=4, target_rel_sem=0.5,
        min_steps=400, max_steps=2000, equil_blocks=1,
        checkpoint_dir=ck, log=log)
    assert len(rows2) == 3
    for a, b in zip(rows2[:2], rows1):
        for k, v in a.row().items():
            np.testing.assert_array_equal(v, b.row()[k], err_msg=k)
    assert "resuming: 2 points done" in log.getvalue()
    assert rows2[2].pressure_atm == 2.0


def test_write_csv(tmp_path):
    r = campaign.PointResult(1.0, 1.0, 5.0, 0.1, 0.5, 4.0, 1000)
    out = tmp_path / "iso.csv"
    campaign.write_csv([r], str(out))
    text = out.read_text()
    assert "pressure_atm" in text and "qst_kj_mol" in text


IDEAL2_PQR = """\
ATOM 1 He HE 1 M 5.0 5.0 5.0 4.0026 0.0 0.0 0.0 0.0
ATOM 2 Ne NE 2 M 15.0 15.0 15.0 20.18 0.0 0.0 0.0 0.0
END
"""


def test_mixture_campaign_per_species_and_selectivity(tmp_path):
    """Two ideal-gas sorbates at equal fugacity: each species loads to
    f V / kT independently and the adsorption selectivity is exactly 1
    in expectation — the mixture-campaign anchor."""
    p = tmp_path / "mix.pqr"
    p.write_text(IDEAL2_PQR)
    job = input_script.parse(f"""
ensemble uvt
numsteps 4000
corrtime 200
temperature 100
pressure 1.0
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
cutoff 8.0
coulomb off
rd_lrc off
insert_probability 0.6
max_molecules 48
pqr_input {p}
""")
    rows = campaign.run_isotherm(
        job, pressures=[1.0, 2.0], chains=8, target_rel_sem=0.04,
        min_steps=2000, max_steps=16000, equil_blocks=2)
    v = 20.0 ** 3
    for r in rows:
        ex = r.extra
        assert set(ex) == {"n_HE", "n_HE_sem", "f_HE", "n_NE",
                           "n_NE_sem", "f_NE", "S_HE_NE"}
        expect = r.pressure_atm * ATM2K_A3 * v / 100.0
        for nm in ("HE", "NE"):
            assert ex[f"f_{nm}"] == pytest.approx(r.pressure_atm)
            assert ex[f"n_{nm}"] == pytest.approx(
                expect, abs=max(4 * ex[f"n_{nm}_sem"], 0.6)), (nm, r)
        assert ex["n_HE"] + ex["n_NE"] == pytest.approx(r.n_mean,
                                                        rel=1e-9)
        # ideal mixture at equal fugacity: S = (n1/n2)/(f1/f2) ~ 1
        rel = np.sqrt((ex["n_HE_sem"] / ex["n_HE"]) ** 2
                      + (ex["n_NE_sem"] / ex["n_NE"]) ** 2)
        assert ex["S_HE_NE"] == pytest.approx(1.0, abs=max(4 * rel, 0.1))
    # row() flattens extras for the CSV/manifest; from_row round-trips
    out = tmp_path / "mix.csv"
    campaign.write_csv(rows, str(out))
    header = out.read_text().splitlines()[0]
    assert "S_HE_NE" in header and "n_HE" in header
    rt = campaign.PointResult.from_row(rows[0].row())
    assert rt == rows[0]


def test_write_csv_mixed_rows_union_header(tmp_path):
    """A campaign resumed from a pre-'extra' manifest mixes rows with
    and without per-species keys: write_csv must union the headers and
    blank the missing cells instead of raising."""
    r_old = campaign.PointResult(1.0, 1.0, 5.0, 0.1, 0.5, 4.0, 1000)
    r_new = campaign.PointResult(2.0, 2.0, 8.0, 0.1, 0.7, 4.0, 1000,
                                 extra={"n_HE": 5.0, "n_NE": 3.0,
                                        "S_HE_NE": 1.1})
    out = tmp_path / "mixed.csv"
    campaign.write_csv([r_old, r_new], str(out))
    lines = out.read_text().strip().splitlines()
    assert "S_HE_NE" in lines[0]
    assert lines[1].endswith(",,,")        # blanks for the old row
    assert lines[2].split(",")[-1] == "1.1"


def test_campaign_samples_feed_gcmc_mbar(tmp_path):
    """samples_dir point streams are directly consumable by
    analyze.gcmc_mbar: the reweighted ideal-gas isotherm is the
    <N> = f V / kT line across the whole continuous-f grid."""
    from mpmc_tpu import analyze

    job = _job(tmp_path)
    sdir = tmp_path / "samples"
    campaign.run_isotherm(
        job, pressures=[2.0, 8.0], chains=8, target_rel_sem=0.03,
        min_steps=6000, max_steps=12000, equil_blocks=2,
        samples_dir=str(sdir))
    files = sorted(str(p) for p in sdir.glob("point_*.jsonl"))
    assert len(files) == 2
    res = analyze.gcmc_mbar(files, n_f=7)
    assert res["converged"]
    v = 20.0 ** 3
    expect = res["f_grid"] * ATM2K_A3 * v / 100.0
    # Tolerance note: batched chains share the move-type schedule (the
    # documented multichain design), so cross-chain fluctuations are
    # positively correlated and the effective sample count is closer to
    # the BLOCK count (~30) than blocks x chains; observed deviations
    # of the pooled mean at these run lengths are up to ~20%.  The
    # MBAR math itself is pinned exactly by the synthetic lattice-gas
    # test above — this is the files-to-curve integration check.
    np.testing.assert_allclose(res["n_mean"], expect, rtol=0.3)
    assert np.all(np.diff(res["n_mean"]) > 0)     # monotone isotherm
    # ideal gas: Poisson occupancy, var(N) ~ <N>
    ratio = res["var_n"] / res["n_mean"]
    assert np.all(ratio > 0.4) and np.all(ratio < 1.8)
