"""End-to-end equation-of-state check: NVT-sampled LJ gas pressure from
the replay virial must match rho kT (1 + B2 rho) with the second virial
coefficient computed by independent numerical quadrature.

Exercises in one chain: NVT sampling -> trajectory writing (native
codec) -> replay -> volume-perturbation pressure, against first
principles."""
import io
import numpy as np
import pytest

from mpmc_tpu.io import input_script
from mpmc_tpu.mc import run as run_mod


def b2_lj(T, eps=119.8, sig=3.405, rmax=40.0, n=200000):
    """B2(T) = -2 pi Int (e^{-u/T} - 1) r^2 dr  [A^3] by quadrature."""
    r = np.linspace(1e-3, rmax, n)
    s6 = (sig / r) ** 6
    u = 4 * eps * s6 * (s6 - 1)
    f = np.exp(-np.minimum(u / T, 700)) - 1.0
    return -2 * np.pi * np.trapezoid(f * r * r, r)


@pytest.mark.slow
def test_nvt_pressure_matches_second_virial(tmp_path):
    # dilute LJ gas: rho* ~ 0.0085 so the B2 correction is ~ -4% and
    # higher virials are negligible
    T, L, n = 180.0, 40.0, 14
    rng = np.random.default_rng(7)
    pts = rng.uniform(2.0, L - 2.0, (n, 3))
    pqr = tmp_path / "gas.pqr"
    pqr.write_text("\n".join(
        f"ATOM {i+1} Ar AR {i+1} M {p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
        "39.948 0.0 0.0 119.8 3.405" for i, p in enumerate(pts)) + "\nEND\n")
    traj = tmp_path / "traj.pqr"
    base = f"""
temperature {T}
basis1 {L} 0 0
basis2 0 {L} 0
basis3 0 0 {L}
rd_lrc off
coulomb off
precision float64
"""
    job = input_script.parse(f"""
ensemble nvt
numsteps 60000
corrtime 400
move_factor 4.0
{base}
pqr_input {pqr}
traj_output {traj}
""")
    run_mod.run(job, log=io.StringIO())

    job2 = input_script.parse(f"""
ensemble replay
calc_pressure on
{base}
pqr_input {traj}
""")
    avgs = run_mod.run(job2, log=io.StringIO())
    samples = np.asarray(avgs.samples["pressure_atm"][30:])
    got = samples.mean()
    sem = samples.std() / np.sqrt(len(samples) / 4)   # correlation guard

    from mpmc_tpu.constants import ATM2K_A3
    rho = n / L ** 3
    expect = rho * T * (1.0 + b2_lj(T) * rho) / ATM2K_A3
    ideal = rho * T / ATM2K_A3
    # the B2 correction must be resolved: closer to 'expect' than 'ideal'
    assert got == pytest.approx(expect, abs=max(3 * sem, 0.02 * expect))


@pytest.mark.slow
def test_npt_pressure_self_consistency(tmp_path):
    """NPT-sampled configurations, replayed with the virial estimator,
    must reproduce the imposed pressure (volume moves <-> virial
    consistency; O(1/N) ensemble corrections allowed)."""
    T, P, n = 160.0, 40.0, 32
    rng = np.random.default_rng(1)
    L0 = 22.0
    pts = rng.uniform(1.0, L0 - 1.0, (n, 3))
    pqr = tmp_path / "gas.pqr"
    pqr.write_text("\n".join(
        f"ATOM {i+1} Ar AR {i+1} M {p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
        "39.948 0.0 0.0 119.8 3.405" for i, p in enumerate(pts)) + "\nEND\n")
    traj = tmp_path / "traj.pqr"
    job = input_script.parse(f"""
ensemble npt
numsteps 80000
corrtime 500
temperature {T}
pressure {P}
volume_probability 0.06
volume_change_factor 0.08
move_factor 2.0
basis1 {L0} 0 0
basis2 0 {L0} 0
basis3 0 0 {L0}
rd_lrc off
coulomb off
cutoff 8.0
precision float64
pqr_input {pqr}
traj_output {traj}
""")
    run_mod.run(job, log=io.StringIO())
    job2 = input_script.parse(f"""
ensemble replay
calc_pressure on
temperature {T}
read_pqr_box on      ! NPT frames carry their own CRYST1 cell
rd_lrc off
coulomb off
cutoff 8.0
precision float64
pqr_input {traj}
""")
    avgs = run_mod.run(job2, log=io.StringIO())
    got = np.mean(avgs.samples["pressure_atm"][40:])
    assert got == pytest.approx(P, rel=0.15)
