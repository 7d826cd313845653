"""Native C++ I/O runtime vs the pure-Python reference implementations."""
import numpy as np
import pytest

from mpmc_tpu.io import native, pqr
from mpmc_tpu.utils.histogram import PopulationHistogram, read_dx

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native toolchain unavailable (libmpmc_io.so not built)")


def _sample_atoms(n=50, seed=3):
    rng = np.random.default_rng(seed)
    atoms = []
    for i in range(n):
        atoms.append(pqr.PqrAtom(
            serial=i + 1, name=f"A{i % 7}", mol_name=f"M{i % 3}",
            mol_id=i // 3, flag="F" if i % 5 == 0 else "M",
            xyz=rng.normal(size=3) * 10,
            mass=float(rng.uniform(1, 40)),
            charge=float(rng.normal() * 0.5),
            polar=float(rng.uniform(0, 2)), eps=float(rng.uniform(0, 150)),
            sig=float(rng.uniform(2, 4)), omega=float(rng.uniform(0, 1)),
            c6=float(rng.uniform(0, 10)), c8=float(rng.uniform(0, 10)),
            c10=float(rng.uniform(0, 10)),
            gwp_alpha=float(rng.uniform(0, 1))))
    return atoms


def _assert_frames_equal(fa, fb, extended):
    assert len(fa.atoms) == len(fb.atoms)
    for a, b in zip(fa.atoms, fb.atoms):
        assert (a.serial, a.name, a.mol_name, a.mol_id, a.flag) == \
            (b.serial, b.name, b.mol_name, b.mol_id, b.flag)
        np.testing.assert_allclose(a.xyz, b.xyz, atol=1e-5)
        # tolerances follow the PQR column formats (4-6 decimals)
        for f in ("mass", "charge", "polar", "eps", "sig"):
            assert getattr(a, f) == pytest.approx(getattr(b, f), abs=1e-4)
        if extended:
            for f in ("omega", "c6", "c8", "c10", "gwp_alpha"):
                assert getattr(a, f) == pytest.approx(getattr(b, f),
                                                      abs=1e-4)


@pytest.mark.parametrize("extended", [False, True])
def test_native_parser_matches_python(tmp_path, extended):
    atoms = _sample_atoms()
    p = str(tmp_path / "t.pqr")
    # python writer -> both parsers agree
    pqr.write(p, atoms, remark="frame 1", extended=extended,
              use_native=False)
    pqr.write(p, atoms, mode="a", remark="frame 2", extended=extended,
              use_native=False)
    f_py = pqr.read_frames(p, use_native=False)
    f_nat = native.read_frames(p)
    assert len(f_py) == len(f_nat) == 2
    for a, b in zip(f_py, f_nat):
        _assert_frames_equal(a, b, extended)


@pytest.mark.parametrize("extended", [False, True])
def test_native_writer_roundtrip(tmp_path, extended):
    atoms = _sample_atoms()
    p = str(tmp_path / "t.pqr")
    assert native.write_frame(p, atoms, remark="native", extended=extended)
    f_py = pqr.read_frames(p, use_native=False)[0]
    _assert_frames_equal(pqr.PqrFrame(atoms), f_py, extended)


def test_native_dx_matches_python(tmp_path):
    box = np.diag([10.0, 12.0, 14.0])
    h = PopulationHistogram(box, resolution=3.0)
    rng = np.random.default_rng(0)
    h.add(rng.uniform(0, 10, size=(40, 3)))
    p_nat = str(tmp_path / "nat.dx")
    p_py = str(tmp_path / "py.dx")
    h.write_dx(p_nat, use_native=True)
    h.write_dx(p_py, use_native=False)
    np.testing.assert_allclose(read_dx(p_nat), read_dx(p_py), rtol=1e-6)


def test_native_error_on_malformed(tmp_path):
    p = tmp_path / "bad.pqr"
    p.write_text("ATOM 1 X M 1\nEND\n")
    with pytest.raises(ValueError):
        native.read_frames(str(p))


def test_write_state_native_matches_python(tmp_path):
    """The vectorized arrays->C state writer produces the same frame as
    the Python object path, and is faster on a 10k-atom system."""
    import time
    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=8, n_h2=16, capacity=32, ewald_kmax=3, dtype="float64")
    state = metropolis.initialize(state, params, cfg, thermo)
    p_nat = str(tmp_path / "nat.pqr")
    p_py = str(tmp_path / "py.pqr")
    # warm both paths (jax dispatch of atom_alive etc.), then time
    pqr.write_state(p_nat, params, state, ["H2"])
    pqr.write(p_py, pqr.snapshot_atoms(params, state, ["H2"]),
              use_native=False)
    t0 = time.perf_counter()
    for _ in range(3):
        pqr.write_state(p_nat, params, state, ["H2"])
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        pqr.write(p_py, pqr.snapshot_atoms(params, state, ["H2"]),
                  use_native=False)
    t_py = time.perf_counter() - t0
    fa = pqr.read_frames(p_nat)[0]
    fb = pqr.read_frames(p_py)[0]
    _assert_frames_equal(fa, fb, extended=False)
    assert t_nat < t_py


def test_streaming_parse_error_surfaces(tmp_path):
    """The analyzers stream frames (constant memory); a malformed ATOM
    line in a LATER frame must surface as a ValueError with the line
    number, not a silent truncation."""
    import pytest
    from mpmc_tpu.io import native
    if not native.available():
        pytest.skip("no native library")
    p = tmp_path / "bad.pqr"
    p.write_text(
        "CRYST1 10 10 10 90 90 90\n"
        "ATOM 1 Ar AR 1 M 1.0 1.0 1.0 39.9 0.0 0.0 100.0 3.4\n"
        "END\n"
        "CRYST1 10 10 10 90 90 90\n"
        "ATOM 1 Ar AR 1 M 2.0\n"          # truncated
        "END\n")
    with pytest.raises(ValueError, match="line 5"):
        native.traj_rdf(str(p), "AR", "AR", rmax=4.0, nbins=8)
    # eager open surfaces the same error through pqr_error up front
    with pytest.raises(ValueError, match="line 5"):
        native.read_frames_arrays(str(p))


def test_stream_frames_arrays_matches_eager(tmp_path):
    """The streaming generator must yield exactly the eager list."""
    import numpy as np
    import pytest
    from mpmc_tpu.io import native
    if not native.available():
        pytest.skip("no native library")
    p = tmp_path / "t.pqr"
    p.write_text(
        "CRYST1 10 10 10 90 90 90\n"
        "ATOM 1 Ar AR 1 M 1.0 2.0 3.0 39.9 0.1 0.0 100.0 3.4\n"
        "ATOM 2 He HE 2 M 4.0 5.0 6.0 4.0 -0.1 0.0 10.0 2.6\n"
        "END\n"
        "CRYST1 12 12 12 90 90 90\n"
        "ATOM 1 Ar AR 1 M 1.5 2.5 3.5 39.9 0.1 0.0 100.0 3.4\n"
        "END\n")
    eager = native.read_frames_arrays(str(p))
    streamed = list(native.stream_frames_arrays(str(p)))
    assert len(eager) == len(streamed) == 2
    for a, b in zip(eager, streamed):
        np.testing.assert_array_equal(a["num"], b["num"])
        np.testing.assert_array_equal(a["ids"], b["ids"])
        assert a["flags"] == b["flags"]
        assert a["names"] == b["names"]
        assert a["mol_names"] == b["mol_names"]
        np.testing.assert_allclose(a["box"], b["box"])
