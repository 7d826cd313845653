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
