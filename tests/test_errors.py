"""Error-path contract: malformed user input raises clean ValueErrors
(the /verify recipe's error probes, pinned as tests)."""
import pytest

from mpmc_tpu.io import input_script, pqr
from mpmc_tpu.mc import run as run_mod


def test_unknown_ensemble_rejected():
    with pytest.raises(ValueError, match="unknown ensemble"):
        input_script.parse("ensemble nopesemble\n")


def test_missing_basis_rejected(tmp_path):
    p = tmp_path / "a.pqr"
    p.write_text("ATOM 1 Ar AR 1 M 0 0 0 39.9 0 0 100 3.4\nEND\n")
    job = input_script.parse(f"ensemble te\npqr_input {p}\n")
    with pytest.raises(ValueError, match="no cell"):
        run_mod.run(job)


def test_missing_pqr_input_rejected():
    job = input_script.parse(
        "ensemble te\nbasis1 10 0 0\nbasis2 0 10 0\nbasis3 0 0 10\n")
    with pytest.raises(ValueError, match="pqr_input"):
        run_mod.run(job)


def test_malformed_atom_line_rejected(tmp_path):
    p = tmp_path / "bad.pqr"
    p.write_text("ATOM 1 Ar AR 1 M 0 0 0\nEND\n")
    with pytest.raises(ValueError, match=">=14 fields"):
        pqr.read(str(p))


def test_incomplete_basis_rejected():
    with pytest.raises(ValueError, match="basis"):
        input_script.parse("ensemble te\nbasis1 10 0 0\nbasis2 0 10 0\n")


def test_inconsistent_species_atom_count(tmp_path):
    p = tmp_path / "bad.pqr"
    p.write_text(
        "ATOM 1 A XX 1 M 0 0 0 1 0 0 10 3\n"
        "ATOM 2 B XX 1 M 1 0 0 1 0 0 10 3\n"
        "ATOM 3 A XX 2 M 5 5 5 1 0 0 10 3\nEND\n")
    job = input_script.parse(
        f"ensemble te\nbasis1 10 0 0\nbasis2 0 10 0\nbasis3 0 0 10\n"
        f"pqr_input {p}\n")
    with pytest.raises(ValueError, match="atoms; species"):
        run_mod.run(job)


def test_unknown_options_warned_not_fatal(tmp_path):
    job = input_script.parse("ensemble te\nnot_an_option 7\n")
    assert "not_an_option" in job.unknown_options


def test_surf_needs_two_molecules(tmp_path):
    p = tmp_path / "one.pqr"
    p.write_text("ATOM 1 Ar AR 1 M 0 0 0 39.9 0 0 100 3.4\nEND\n")
    job = input_script.parse(
        f"ensemble surf\nbasis1 20 0 0\nbasis2 0 20 0\nbasis3 0 0 20\n"
        f"pqr_input {p}\n")
    with pytest.raises(ValueError, match="exactly 2"):
        run_mod.run(job)


def test_surf_fit_needs_fit_input(tmp_path):
    p = tmp_path / "two.pqr"
    p.write_text(
        "ATOM 1 Ar AR 1 M 0 0 0 39.9 0 0 100 3.4\n"
        "ATOM 2 Ar AR 2 M 4 0 0 39.9 0 0 100 3.4\nEND\n")
    job = input_script.parse(
        f"ensemble surf_fit\nbasis1 20 0 0\nbasis2 0 20 0\nbasis3 0 0 20\n"
        f"pqr_input {p}\n")
    with pytest.raises(ValueError, match="fit_input"):
        run_mod.run(job)


def test_parser_fuzz_random_option_subsets():
    """Random shuffles/subsets of the full option surface must parse
    without crashing (order independence of the grammar)."""
    import numpy as np
    lines = [
        "job_name fuzz", "ensemble uvt", "numsteps 100", "corrtime 10",
        "seed 7",
        "cutoff 4.5", "temperature 77", "pressure 1.5", "free_volume 100",
        "fugacities 1 2", "h2_fugacity on", "move_factor 0.5",
        "rot_factor 1.0", "insert_probability 0.4",
        "volume_probability 0.1", "volume_change_factor 0.1",
        "spinflip_probability 0.1", "cavity_autoreject_absolute 1.0",
        "cavity_bias on", "cavity_grid 8", "cavity_radius 2.2",
        "adapt_moves on", "precision float64", "rd_lrc off", "sg off",
        "waldmanhagler on", "ewald_alpha 0.3", "ewald_kmax 6",
        "polarization on", "polar_max_iter 30", "polar_precision 1e-5",
        "polar_damp 2.1", "polar_damp_type exponential", "polar_ewald on",
        "feynman_hibbs on", "feynman_hibbs_order 4", "cdvdw on",
        "quantum_rotation on", "quantum_rotation_level_max 2",
        "simulated_annealing on", "simulated_annealing_schedule 0.99",
        "parallel_tempering off", "max_temperature 500", "ptemp_freq 10",
        "chains 4", "n_replicas 4", "pqr_input x.pqr",
        "pqr_restart r.pqr", "traj_output t.pqr", "energy_output e.csv",
        "pop_histogram on", "hist_resolution 0.5", "read_pqr_box on",
        "calc_pressure on", "surf_min 2", "surf_max 8", "surf_inc 0.5",
        "fit_input a.dat", "fit_schedule 0.99", "max_molecules 64",
        "cuda on", "spectre on", "! trailing comment", "# another",
    ]
    basis = ["basis1 10 0 0", "basis2 0 10 0", "basis3 0 0 10"]
    rng = np.random.default_rng(11)
    from mpmc_tpu.io import input_script
    for trial in range(25):
        sub = [lines[i] for i in
               rng.permutation(len(lines))[:rng.integers(5, len(lines))]]
        # the basis trio travels together (partial bases raise by design)
        job = input_script.parse("\n".join(basis + sub))
        assert not job.unknown_options, job.unknown_options


def test_ewald_net_charge_guard(tmp_path):
    """A non-neutral cell under Ewald errors at setup (the background
    correction is not implemented); allow_charged_cell downgrades to a
    warning (VERDICT r1 item 8)."""
    import io
    p = tmp_path / "ion.pqr"
    p.write_text("ATOM 1 Na NA 1 M 5 5 5 22.99 1.0 0 50 2.5\nEND\n")
    base = (f"ensemble te\nbasis1 10 0 0\nbasis2 0 10 0\nbasis3 0 0 10\n"
            f"pqr_input {p}\n")
    with pytest.raises(ValueError, match="non-neutral"):
        run_mod.run(input_script.parse(base))
    with pytest.warns(UserWarning, match="non-neutral"):
        run_mod.run(input_script.parse(base + "allow_charged_cell on\n"),
                    log=io.StringIO())
    # a neutral pair sails through
    p2 = tmp_path / "salt.pqr"
    p2.write_text("ATOM 1 Na NA 1 M 4 5 5 22.99 1.0 0 50 2.5\n"
                  "ATOM 2 Cl NA 1 M 7 5 5 35.45 -1.0 0 100 3.5\nEND\n")
    run_mod.run(input_script.parse(
        f"ensemble te\nbasis1 10 0 0\nbasis2 0 10 0\nbasis3 0 0 10\n"
        f"pqr_input {p2}\n"), log=io.StringIO())


def test_jsonl_stream_schema(tmp_path):
    import io
    import json
    from mpmc_tpu.io import input_script
    from mpmc_tpu.mc import run as run_mod
    pqr = tmp_path / "ar.pqr"
    pqr.write_text(
        "ATOM 1 Ar AR 1 M 3.0 3.0 3.0 39.948 0.0 0.0 119.8 3.405\nEND\n")
    out = tmp_path / "obs.jsonl"
    job = input_script.parse(f"""
ensemble nvt
numsteps 300
corrtime 100
temperature 150
basis1 10 0 0
basis2 0 10 0
basis3 0 0 10
precision float64
pqr_input {pqr}
""")
    run_mod.run(job, log=io.StringIO(), jsonl_path=str(out))
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) == 4
    meta = rows.pop(0)["run_meta"]    # self-describing header record
    assert meta["ensemble"] == "nvt"
    assert meta["temperature"] == 150.0
    assert abs(meta["volume"] - 1000.0) < 1e-9
    for r in rows:
        for key in ("step", "energy_total", "energy_rd", "N", "volume",
                    "acc_displace"):
            assert key in r, key
    assert rows[0]["step"] == 100 and rows[-1]["step"] == 300
