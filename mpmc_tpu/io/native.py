"""ctypes bindings for the native I/O runtime (native/mpmc_io.cpp).

The reference's runtime is C throughout (SURVEY.md §2); here the
latency-critical host I/O — PQR trajectory parsing/writing and OpenDX
grids — is C++ behind a plain C ABI, auto-built with the repo Makefile on
first use.  Everything degrades gracefully to the pure-Python
implementations when no compiler/toolchain is available; tests
cross-validate the two.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NAME_LEN = 8
_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_DIR, "libmpmc_io.so")

_lib = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _DIR], capture_output=True,
                           timeout=120)
        return r.returncode == 0 and os.path.exists(_SO)
    except Exception:
        return False


def _stale() -> bool:
    """True when any native source is newer than the built library."""
    try:
        t_so = os.path.getmtime(_SO)
        return any(os.path.getmtime(os.path.join(_DIR, f)) > t_so
                   for f in os.listdir(_DIR)
                   if f.endswith((".cpp", ".h", "Makefile")))
    except OSError:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The shared library, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if ((not os.path.exists(_SO) or _stale()) and os.path.exists(
            os.path.join(_DIR, "mpmc_io.cpp"))):
        _build()
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.pqr_open.restype = ctypes.c_void_p
    lib.pqr_open.argtypes = [ctypes.c_char_p]
    lib.pqr_open_stream.restype = ctypes.c_void_p
    lib.pqr_open_stream.argtypes = [ctypes.c_char_p]
    lib.pqr_stream_advance.restype = ctypes.c_long
    lib.pqr_stream_advance.argtypes = [ctypes.c_void_p]
    lib.pqr_error.restype = ctypes.c_char_p
    lib.pqr_error.argtypes = [ctypes.c_void_p]
    lib.pqr_n_frames.restype = ctypes.c_long
    lib.pqr_n_frames.argtypes = [ctypes.c_void_p]
    lib.pqr_frame_natoms.restype = ctypes.c_long
    lib.pqr_frame_natoms.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.pqr_frame_cell.restype = ctypes.c_long
    lib.pqr_frame_cell.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                   ctypes.POINTER(ctypes.c_double)]
    lib.pqr_frame_data.restype = ctypes.c_long
    lib.pqr_frame_data.argtypes = [
        ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.pqr_close.argtypes = [ctypes.c_void_p]
    lib.pqr_write_frame.restype = ctypes.c_long
    lib.pqr_write_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.dx_write.restype = ctypes.c_long
    lib.dx_write.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    lib.traj_rdf.restype = ctypes.c_long
    lib.traj_rdf.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.c_char, ctypes.c_char, ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_long, ctypes.POINTER(ctypes.c_double)]
    lib.traj_density.restype = ctypes.c_long
    lib.traj_density.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char,
        ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
    lib.traj_loading.restype = ctypes.c_long
    lib.traj_loading.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char,
        ctypes.POINTER(ctypes.c_double)]
    lib.traj_msd.restype = ctypes.c_long
    lib.traj_msd.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char,
        ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long)]
    lib.traj_widom.restype = ctypes.c_long
    lib.traj_widom.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_long, ctypes.c_ulonglong,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
    lib.traj_widom_mol.restype = ctypes.c_long
    lib.traj_widom_mol.argtypes = [
        ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_double, ctypes.c_long,
        ctypes.c_ulonglong, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_double,
        ctypes.POINTER(ctypes.c_double)]
    lib.traj_orient.restype = ctypes.c_long
    lib.traj_orient.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double), ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_long)]
    lib.traj_sq.restype = ctypes.c_long
    lib.traj_sq.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_long, ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
    lib.traj_pore.restype = ctypes.c_long
    lib.traj_pore.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char,
        ctypes.c_long, ctypes.c_long, ctypes.c_ulonglong,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double)]
    lib.traj_asa.restype = ctypes.c_long
    lib.traj_asa.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char,
        ctypes.c_double, ctypes.c_long, ctypes.c_ulonglong,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double)]
    lib.traj_cluster.restype = ctypes.c_long
    lib.traj_cluster.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double),
        ctypes.c_long, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _open_traj(lib, path: str, stream: bool):
    """Trajectory handle for the single-pass analyzers: streaming
    (constant memory — frames parse one at a time) unless the caller
    needs the random-access API."""
    h = (lib.pqr_open_stream if stream else lib.pqr_open)(path.encode())
    if not h:
        raise FileNotFoundError(path)
    return h


def _check_analyzer(lib, h, r, path: str, what: str):
    """Common analyzer return-code handling: -3 = parse error found
    mid-stream (message in pqr_error), -1 = no usable cell."""
    if r == -3:
        err = lib.pqr_error(h)
        raise ValueError(f"{path}: {err.decode() if err else what}")
    if r == -1:
        raise ValueError(f"{path}: no usable cell for {what} "
                         "(pass box=)")
    if r < 0:
        raise ValueError(f"{path}: {what} failed")
    return r


def _fixed_names(names: List[str]) -> bytes:
    out = bytearray(_NAME_LEN * len(names))
    for i, n in enumerate(names):
        b = n.encode()[:_NAME_LEN - 1]
        out[i * _NAME_LEN:i * _NAME_LEN + len(b)] = b
    return bytes(out)


def _frame_arrays(lib, h, i: int, n: int):
    """Packed arrays for frame i (-1 = the streamed scratch frame)."""
    num = np.empty((n, 13), np.float64)
    ids = np.empty((n, 2), np.int64)
    flags = ctypes.create_string_buffer(max(n, 1))
    names = ctypes.create_string_buffer(max(_NAME_LEN * n, 1))
    mnames = ctypes.create_string_buffer(max(_NAME_LEN * n, 1))
    lib.pqr_frame_data(
        h, i, num.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        flags, names, mnames)
    box = None
    cell = (ctypes.c_double * 6)()
    if lib.pqr_frame_cell(h, i, cell):
        from mpmc_tpu.ops.pbc import cell_from_abc
        box = np.asarray(cell_from_abc(*list(cell)))
    return {"num": num, "ids": ids, "flags": flags.raw[:n],
            "names": names.raw[:_NAME_LEN * n],
            "mol_names": mnames.raw[:_NAME_LEN * n], "box": box}


def read_frames_arrays(path: str):
    """Raw per-frame arrays from the native parser (None if no library):
    list of dicts {num [n,13], ids [n,2] (serial, mol_id), flags bytes,
    names bytes, mol_names bytes, box (3,3) or None}."""
    lib = load()
    if lib is None:
        return None
    h = lib.pqr_open(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        err = lib.pqr_error(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        return [_frame_arrays(lib, h, i, lib.pqr_frame_natoms(h, i))
                for i in range(lib.pqr_n_frames(h))]
    finally:
        lib.pqr_close(h)


def stream_frames_arrays(path: str):
    """Generator of read_frames_arrays dicts, ONE frame in memory at a
    time — the constant-memory path multi-GB replay runs on.  None if
    the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    if not os.path.exists(path):
        raise FileNotFoundError(path)

    def gen():
        h = lib.pqr_open_stream(path.encode())
        if not h:
            raise FileNotFoundError(path)
        try:
            while True:
                n = lib.pqr_stream_advance(h)
                if n == 0:
                    return
                if n < 0:
                    err = lib.pqr_error(h)
                    raise ValueError(
                        f"{path}: "
                        f"{err.decode() if err else 'parse error'}")
                yield _frame_arrays(lib, h, -1, n)
        finally:
            lib.pqr_close(h)

    return gen()


def frame_from_arrays(arr):
    """Convert one raw-array frame into a PqrFrame (object API)."""
    from mpmc_tpu.io.pqr import PqrAtom, PqrFrame
    num, ids = arr["num"], arr["ids"]
    names, mnames, flags = arr["names"], arr["mol_names"], arr["flags"]
    atoms = []
    for k in range(num.shape[0]):
        nm = names[k * _NAME_LEN:(k + 1) * _NAME_LEN]
        mn = mnames[k * _NAME_LEN:(k + 1) * _NAME_LEN]
        atoms.append(PqrAtom(
            serial=int(ids[k, 0]),
            name=nm.split(b"\0")[0].decode(),
            mol_name=mn.split(b"\0")[0].decode(),
            mol_id=int(ids[k, 1]),
            flag=chr(flags[k]),
            xyz=num[k, :3].copy(),
            mass=num[k, 3], charge=num[k, 4], polar=num[k, 5],
            eps=num[k, 6], sig=num[k, 7], omega=num[k, 8],
            c6=num[k, 9], c8=num[k, 10], c10=num[k, 11],
            gwp_alpha=num[k, 12]))
    return PqrFrame(atoms, box=arr["box"])


def read_frames(path: str):
    """List of PqrFrame via the native parser (None if unavailable)."""
    frames = read_frames_arrays(path)
    if frames is None:
        return None
    return [frame_from_arrays(a) for a in frames]


def write_frame(path: str, atoms, mode: str = "w", remark: str = "",
                extended: bool = False) -> bool:
    """Write one PQR frame natively; False if the library is unavailable."""
    lib = load()
    if lib is None:
        return False
    n = len(atoms)
    num = np.empty((n, 13), np.float64)
    ids = np.empty((n, 2), np.int64)
    flags = bytearray(n)
    for k, a in enumerate(atoms):
        num[k, :3] = a.xyz
        num[k, 3:] = (a.mass, a.charge, a.polar, a.eps, a.sig, a.omega,
                      a.c6, a.c8, a.c10, a.gwp_alpha)
        ids[k] = (a.serial, a.mol_id)
        flags[k] = ord(a.flag[0]) if a.flag else ord("M")
    r = lib.pqr_write_frame(
        path.encode(), mode.encode(), remark.encode(), n,
        num.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        bytes(flags), _fixed_names([a.name for a in atoms]),
        _fixed_names([a.mol_name for a in atoms]), int(extended))
    return r == n


def write_frame_arrays(path: str, num: np.ndarray, ids: np.ndarray,
                       flags: bytes, names: bytes, mol_names: bytes,
                       mode: str = "w", remark: str = "",
                       extended: bool = False) -> bool:
    """Zero-object write path: packed arrays straight to the C writer.
    num [n,13] f64 (xyz, mass, charge, polar, eps, sig, omega, c6, c8,
    c10, gwp); ids [n,2] i64 (serial, mol_id); flags [n] bytes;
    names/mol_names [n*8] fixed-width bytes."""
    lib = load()
    if lib is None:
        return False
    n = num.shape[0]
    num = np.ascontiguousarray(num, np.float64)
    ids = np.ascontiguousarray(ids, np.int64)
    r = lib.pqr_write_frame(
        path.encode(), mode.encode(), remark.encode(), n,
        num.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        flags, names, mol_names, int(extended))
    return r == n


def dx_write(path: str, box: np.ndarray, dims, data: np.ndarray) -> bool:
    lib = load()
    if lib is None:
        return False
    nx, ny, nz = (int(d) for d in dims)
    deltas = np.ascontiguousarray(
        np.asarray(box, np.float64) / np.asarray([[nx], [ny], [nz]],
                                                 np.float64))
    flat = np.ascontiguousarray(data, np.float64).reshape(-1)
    r = lib.dx_write(path.encode(), nx, ny, nz,
                     deltas.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                     flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return r == nx * ny * nz


def _cell_ptr(box):
    """(a b c alpha beta gamma) ctypes array from a 3x3 basis (or a
    6-vector passed through); None box -> NULL (frames must carry
    CRYST records then)."""
    if box is None:
        return None
    box = np.asarray(box, np.float64)
    if box.shape == (3, 3):
        from mpmc_tpu.ops.pbc import abc_from_cell
        abc = abc_from_cell(box)
    else:
        abc = box.reshape(6)
    return (ctypes.c_double * 6)(*[float(v) for v in abc])


def traj_rdf(path: str, name_a: str = "*", name_b: str = "*",
             flag_a: str = "*", flag_b: str = "*", box=None,
             rmax: float = 10.0, nbins: int = 200):
    """Native g(r) over a trajectory; None if the library is unavailable.
    Raises ValueError when a frame has no usable cell."""
    lib = load()
    if lib is None:
        return None
    h = _open_traj(lib, path, stream=True)
    try:
        gr = np.zeros(nbins, np.float64)
        r = lib.traj_rdf(
            h, name_a.encode(), name_b.encode(),
            (flag_a.encode() + b"*")[:1], (flag_b.encode() + b"*")[:1],
            _cell_ptr(box),
            float(rmax), int(nbins),
            gr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        _check_analyzer(lib, h, r, path, "RDF")
        return gr
    finally:
        lib.pqr_close(h)


def traj_density(path: str, mol_name: str = "*", flag: str = "M",
                 dims=(32, 32, 32), box=None):
    """Native molecule-COM density counts grid [nx,ny,nz] accumulated
    over every frame (PopulationHistogram layout; divide by the returned
    frame count for a per-frame average).  Returns (grid, n_frames);
    None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    h = _open_traj(lib, path, stream=True)
    try:
        nx, ny, nz = (int(d) for d in dims)
        grid = np.zeros((nx, ny, nz), np.float64)
        r = lib.traj_density(
            h, mol_name.encode(), (flag.encode() + b"*")[:1], nx, ny, nz,
            _cell_ptr(box),
            grid.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        _check_analyzer(lib, h, r, path, "density")
        return grid, int(r)
    finally:
        lib.pqr_close(h)


def traj_loading(path: str, mol_name: str = "*", flag: str = "M"):
    """Native per-frame selected-molecule counts (GCMC loading series).
    Returns a [n_frames] float array; None if the library is
    unavailable."""
    lib = load()
    if lib is None:
        return None
    h = lib.pqr_open(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        err = lib.pqr_error(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        nf = lib.pqr_n_frames(h)
        counts = np.zeros(max(int(nf), 1), np.float64)
        r = lib.traj_loading(
            h, mol_name.encode(), (flag.encode() + b"*")[:1],
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if r < 0:
            raise ValueError(f"{path}: traj_loading failed")
        return counts[:int(r)]
    finally:
        lib.pqr_close(h)


def traj_msd(path: str, mol_name: str = "*", flag: str = "M", box=None,
             max_lag: int = 0):
    """Native mean-square COM displacement vs frame lag with min-image
    unwrapping; segments close when a molecule vanishes (GCMC).
    Returns (msd [max_lag+1], counts [max_lag+1]); None if the library
    is unavailable."""
    lib = load()
    if lib is None:
        return None
    # the default max_lag needs the frame count upfront -> eager parse;
    # an explicit max_lag streams at constant memory
    h = _open_traj(lib, path, stream=max_lag > 0)
    try:
        err = lib.pqr_error(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        if max_lag <= 0:
            max_lag = max(int(lib.pqr_n_frames(h)) - 1, 1)
        msd = np.zeros(max_lag + 1, np.float64)
        cnt = np.zeros(max_lag + 1, np.int64)
        r = lib.traj_msd(
            h, mol_name.encode(), (flag.encode() + b"*")[:1],
            _cell_ptr(box), int(max_lag),
            msd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
        _check_analyzer(lib, h, r, path, "MSD")
        return msd, cnt
    finally:
        lib.pqr_close(h)


def traj_widom_mol(path: str, site_xyz, site_eps, site_sig, site_q,
                   temperature: float, n_try: int = 1000, seed: int = 0,
                   posquat=None, box=None, rc: float = 10.0):
    """Native rigid multi-site Widom insertion (LJ + cutoff Coulomb).
    ``site_xyz`` [S,3] template coordinates about the insertion origin;
    ``posquat`` [n_try,7] optional fixed (frac xyz, quat wxyz) trials
    reused every frame.  Returns (mean exp(-bU), mean U exp(-bU),
    n_frames); None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    from mpmc_tpu.constants import KE
    h = _open_traj(lib, path, stream=True)
    try:
        xyz = np.ascontiguousarray(site_xyz, np.float64).reshape(-1, 3)
        s = xyz.shape[0]
        eps = np.ascontiguousarray(site_eps, np.float64).reshape(s)
        sig = np.ascontiguousarray(site_sig, np.float64).reshape(s)
        q = np.ascontiguousarray(site_q, np.float64).reshape(s)
        pq = None
        if posquat is not None:
            pq = np.ascontiguousarray(posquat, np.float64)
            if pq.shape != (int(n_try), 7):
                raise ValueError("posquat must be [n_try, 7]")
            pq = pq.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        out = np.zeros(2, np.float64)
        dp = ctypes.POINTER(ctypes.c_double)
        r = lib.traj_widom_mol(
            h, s, xyz.ctypes.data_as(dp), eps.ctypes.data_as(dp),
            sig.ctypes.data_as(dp), q.ctypes.data_as(dp), float(KE),
            1.0 / float(temperature), int(n_try),
            int(seed) & (2**64 - 1), pq, _cell_ptr(box), float(rc),
            out.ctypes.data_as(dp))
        _check_analyzer(lib, h, r, path, "Widom")
        return float(out[0]), float(out[1]), int(r)
    finally:
        lib.pqr_close(h)


def traj_orient(path: str, mol_name: str = "*", flag: str = "M",
                axis_name: str = "*", box=None, max_lag: int = 0):
    """Native orientational autocorrelation of molecular axes.
    Returns (c1 [max_lag+1], c2 [max_lag+1], counts [max_lag+1]); None
    if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    h = _open_traj(lib, path, stream=max_lag > 0)
    try:
        err = lib.pqr_error(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        if max_lag <= 0:
            max_lag = max(int(lib.pqr_n_frames(h)) - 1, 1)
        c1 = np.zeros(max_lag + 1, np.float64)
        c2 = np.zeros(max_lag + 1, np.float64)
        cnt = np.zeros(max_lag + 1, np.int64)
        r = lib.traj_orient(
            h, mol_name.encode(), (flag.encode() + b"*")[:1],
            axis_name.encode(), _cell_ptr(box), int(max_lag),
            c1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            c2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
        _check_analyzer(lib, h, r, path, "orientation autocorrelation")
        return c1, c2, cnt
    finally:
        lib.pqr_close(h)


def traj_sq(path: str, q, name: str = "*", flag: str = "*", box=None,
            dr_bin: float = 0.005):
    """Native Debye structure factor S(q) at the given q values [1/A].
    Returns (sq [nq], n_frames); None if the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    h = _open_traj(lib, path, stream=True)
    try:
        qv = np.ascontiguousarray(q, np.float64).reshape(-1)
        sq = np.zeros(qv.size, np.float64)
        r = lib.traj_sq(
            h, name.encode(), (flag.encode() + b"*")[:1], _cell_ptr(box),
            qv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            int(qv.size), float(dr_bin),
            sq.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        _check_analyzer(lib, h, r, path, "S(q)")
        return sq, int(r)
    finally:
        lib.pqr_close(h)


def traj_pore(path: str, name: str = "*", flag: str = "F",
              n_points: int = 20000, n_centers: int = 2000,
              seed: int = 0, frac_pts=None, frac_ctr=None, box=None):
    """Native geometric pore sampling of the FIRST frame: per-point
    surface distance d_surf and Gelb-Gubbins pore radius (largest
    covering-sphere radius).  Returns (d_surf [n_points],
    r_pore [n_points]); None if the library is unavailable.
    ``frac_pts``/``frac_ctr`` fix the fractional sample/center points
    (the cross-validation path)."""
    lib = load()
    if lib is None:
        return None
    h = _open_traj(lib, path, stream=True)
    try:
        dp = ctypes.POINTER(ctypes.c_double)

        def pts(arr, n, what):
            if arr is None:
                return None
            a = np.ascontiguousarray(arr, np.float64)
            if a.shape != (int(n), 3):
                raise ValueError(f"{what} must be [{n}, 3]")
            return a.ctypes.data_as(dp)

        d = np.zeros(int(n_points), np.float64)
        rr = np.zeros(int(n_points), np.float64)
        r = lib.traj_pore(
            h, name.encode(), (flag.encode() + b"*")[:1],
            int(n_points), int(n_centers), int(seed) & (2**64 - 1),
            pts(frac_pts, n_points, "frac_pts"),
            pts(frac_ctr, n_centers, "frac_ctr"),
            _cell_ptr(box), d.ctypes.data_as(dp),
            rr.ctypes.data_as(dp))
        _check_analyzer(lib, h, r, path, "pore sampling")
        return d, rr
    finally:
        lib.pqr_close(h)


def traj_asa(path: str, name: str = "*", flag: str = "F",
             probe_sigma: float = 0.0, n_sphere: int = 512,
             seed: int = 0, unit_pts=None, box=None):
    """Native Shrake-Rupley accessible surface area of the FIRST
    frame.  Returns (area [A^2], cell volume [A^3], selected mass
    [amu]); None if the library is unavailable.  ``unit_pts``
    [n_sphere,3] fixes the sphere directions (cross-validation)."""
    lib = load()
    if lib is None:
        return None
    h = _open_traj(lib, path, stream=True)
    try:
        dp = ctypes.POINTER(ctypes.c_double)
        up = None
        if unit_pts is not None:
            up = np.ascontiguousarray(unit_pts, np.float64)
            if up.shape != (int(n_sphere), 3):
                raise ValueError("unit_pts must be [n_sphere, 3]")
            up = up.ctypes.data_as(dp)
        out = np.zeros(3, np.float64)
        r = lib.traj_asa(
            h, name.encode(), (flag.encode() + b"*")[:1],
            float(probe_sigma), int(n_sphere), int(seed) & (2**64 - 1),
            up, _cell_ptr(box), out.ctypes.data_as(dp))
        _check_analyzer(lib, h, r, path, "surface area")
        return float(out[0]), float(out[1]), float(out[2])
    finally:
        lib.pqr_close(h)


def traj_widom(path: str, eps: float, sig: float, temperature: float,
               n_try: int = 1000, seed: int = 0, frac_pos=None,
               box=None, rc: float = 10.0):
    """Native Widom LJ test-particle insertion over every frame.
    Returns (mean exp(-bU), mean U exp(-bU), n_frames); None if the
    library is unavailable.  ``frac_pos`` [n_try,3] fixes the fractional
    insertion points (reused every frame — the cross-validation path);
    None draws fresh ones per frame from ``seed``."""
    lib = load()
    if lib is None:
        return None
    h = _open_traj(lib, path, stream=True)
    try:
        fp = None
        if frac_pos is not None:
            fp = np.ascontiguousarray(frac_pos, np.float64)
            if fp.shape != (int(n_try), 3):
                raise ValueError("frac_pos must be [n_try, 3]")
            fp = fp.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        out = np.zeros(2, np.float64)
        r = lib.traj_widom(
            h, float(eps), float(sig), 1.0 / float(temperature),
            int(n_try), int(seed) & (2**64 - 1), fp, _cell_ptr(box),
            float(rc),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        _check_analyzer(lib, h, r, path, "Widom")
        return float(out[0]), float(out[1]), int(r)
    finally:
        lib.pqr_close(h)


def traj_cluster(path: str, mol_name: str = "*", flag: str = "M",
                 rc: float = 4.0, box=None, max_size: int = 64):
    """Native COM cluster statistics per frame (union-find connected
    components under the min-image cutoff ``rc``).  Returns
    (series [n_frames, 3] = n_clusters / mean size / largest fraction,
    hist [max_size] pooled cluster-size counts); None if the library is
    unavailable."""
    lib = load()
    if lib is None:
        return None
    h = lib.pqr_open(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        err = lib.pqr_error(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        nf = max(int(lib.pqr_n_frames(h)), 1)
        series = np.zeros((nf, 3), np.float64)
        hist = np.zeros(int(max_size), np.float64)
        dp = ctypes.POINTER(ctypes.c_double)
        r = lib.traj_cluster(
            h, mol_name.encode(), (flag.encode() + b"*")[:1],
            float(rc), _cell_ptr(box), int(max_size),
            series.ctypes.data_as(dp), hist.ctypes.data_as(dp))
        _check_analyzer(lib, h, r, path, "cluster analysis")
        return series[:int(r)], hist
    finally:
        lib.pqr_close(h)
