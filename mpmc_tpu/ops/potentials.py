"""Alternative repulsion-dispersion potentials.

Rebuilds of the reference's RD variants (SURVEY.md §2): Silvera-Goldman
(src/energy/sg.c [M]), Dreiding exp-6 (src/energy/dreiding.c [M]),
AMOEBA-style buffered 14-7 (src/energy/lj_buffered_14_7.c [M]) and the
Born-Mayer + damped C6/C8/C10 dispersion expansion
(src/energy/disp_expansion.c [M], the PHAHST family).

NOTE (SURVEY.md §0): the reference mount was empty, so the exact parameter
column conventions below are *this framework's documented contract*:

- ``sg``            : parameter-free H2-H2 potential (Silvera & Goldman
                      1978 constants, converted Hartree/bohr -> K/A).
- ``dreiding``      : eps column = well depth D0 [K], sig column = r0 [A];
                      zeta = 13.772; D0 geometric / r0 arithmetic mixing.
- ``b14_7``         : eps [K], sig = r0 [A]; Halgren delta=0.07 gamma=0.12
                      with Halgren mixing rules.
- ``disp_expansion``: eps column = Born-Mayer prefactor A [K], sig column =
                      exponent B [1/A]; C6/C8/C10 columns in K*A^2n.
                      Mixing: A geometric, B harmonic mean, C2n geometric.
                      Tang-Toennies damping f_2n(Br) when cfg.damp_dispersion.
"""
from __future__ import annotations

import jax.numpy as jnp

from mpmc_tpu.constants import BOHR_A, HARTREE_K

# Silvera–Goldman constants (atomic units; Silvera & Goldman, JCP 69, 4209
# (1978)) — isotropic H2–H2 pair potential.
_SG_ALPHA = 1.713
_SG_BETA = 1.5671
_SG_GAMMA = 0.00993
_SG_C6 = 12.14
_SG_C8 = 215.2
_SG_C9 = 143.1
_SG_C10 = 4813.9
_SG_RC = 8.32   # bohr — damping onset (1.28 * r_min)


def sg_energy(r_ang):
    """Silvera-Goldman H2-H2 potential, r in Angstrom, returns Kelvin.

    r is floored at 0.3 bohr (0.16 A): below it the dispersion sum
    overflows f32 (C10/r^10 > 3.4e38 for r < 3.2e-4 bohr) while the
    damping fc underflows to 0, and 0*inf = NaN would poison the fused
    MC kernels' branch-free accumulators (ops/pallas/mc_kernel.py).
    The floor turns that region into a constant ~1.1e6 K rejection
    plateau — physically equivalent (deep core overlap is always
    rejected) and identical in every path since the formula is
    shared."""
    r = jnp.maximum(r_ang, 0.3 * BOHR_A) / BOHR_A
    rep = jnp.exp(_SG_ALPHA - _SG_BETA * r - _SG_GAMMA * r * r)
    r2 = r * r
    r6 = r2 * r2 * r2
    disp = (_SG_C6 / r6 + _SG_C8 / (r6 * r2) + _SG_C10 / (r6 * r2 * r2)
            - _SG_C9 / (r6 * r2 * r))
    fc = jnp.where(r < _SG_RC,
                   jnp.exp(-((_SG_RC / r - 1.0) ** 2)), 1.0)
    return (rep - fc * disp) * HARTREE_K


def dreiding_energy(r, d0, r0, zeta=13.772):
    """Dreiding exponential-6: U = D0 [ (6/(z-6)) e^{z(1-p)} - (z/(z-6)) p^-6 ]."""
    p = r / r0
    a = 6.0 / (zeta - 6.0)
    b = zeta / (zeta - 6.0)
    return d0 * (a * jnp.exp(zeta * (1.0 - p)) - b * p ** (-6.0))


def b14_7_energy(r, eps, r0, delta=0.07, gamma=0.12):
    """Halgren buffered 14-7: U = eps ((1+d)/(p+d))^7 ((1+g)/(p^7+g) - 2)."""
    p = r / r0
    t = ((1.0 + delta) / (p + delta)) ** 7
    return eps * t * ((1.0 + gamma) / (p ** 7 + gamma) - 2.0)


def tt_damping(x, n):
    """Tang-Toennies incomplete-gamma damping f_n(x) = 1 - e^-x sum_{k<=n} x^k/k!."""
    s = jnp.ones_like(x)
    term = jnp.ones_like(x)
    for k in range(1, n + 1):
        term = term * x / k
        s = s + term
    return 1.0 - jnp.exp(-x) * s


def disp_expansion_energy(r, a_ij, b_ij, c6, c8, c10, damp=True):
    """Born-Mayer repulsion + damped C6/C8/C10 dispersion."""
    rep = a_ij * jnp.exp(-b_ij * r)
    r2 = r * r
    r6 = r2 * r2 * r2
    x = b_ij * r
    f6 = tt_damping(x, 6) if damp else 1.0
    f8 = tt_damping(x, 8) if damp else 1.0
    f10 = tt_damping(x, 10) if damp else 1.0
    return rep - f6 * c6 / r6 - f8 * c8 / (r6 * r2) - f10 * c10 / (r6 * r2 * r2)


def disp_tail_coefficient(c6, c8, c10, rc):
    """Per-(ordered-)pair long-range tail coefficient for the damped
    dispersion expansion (Born-Mayer repulsion decays exponentially and
    Tang-Toennies damping -> 1 beyond any sane cutoff):

        T_ij = 4 pi Int_rc^inf -(C6/r^6 + C8/r^8 + C10/r^10) r^2 dr
             = -4 pi [ C6/(3 rc^3) + C8/(5 rc^5) + C10/(7 rc^7) ]

    Same ordered-pair convention as lj.tail_coefficient
    (U_lrc = (1/2V)[2 sum_{i<j} T_ij + sum_i T_ii])."""
    rc3 = rc * rc * rc
    rc5 = rc3 * rc * rc
    rc7 = rc5 * rc * rc
    return -4.0 * jnp.pi * (c6 / (3.0 * rc3) + c8 / (5.0 * rc5)
                            + c10 / (7.0 * rc7))


def london_c6(alpha_i, alpha_j, omega_i, omega_j):
    """Mixed London dispersion coefficient of two Drude oscillators
    [K A^6]:  C6_ij = (3/2) hbar (w_i w_j / (w_i + w_j)) a_i a_j,
    with w in atomic units (the PQR omega column, as consumed by
    ops/vdw.py) and a in A^3.  Exact for two coupled isotropic Drude
    oscillators; reduces to (3/4) hbar w a^2 for identical sites — the
    r->inf limit of the cdvdw eigensolve (ops/vdw.py docstring)."""
    wsum = jnp.maximum(omega_i + omega_j, 1e-30)
    return (1.5 * HARTREE_K * omega_i * omega_j / wsum
            * alpha_i * alpha_j)


def cdvdw_repulsion_energy(r, ei, ej, si, sj, ai, aj, wi, wj, cfg):
    """Pair repulsion used alongside coupled-dipole vdW (SURVEY.md §2
    "Coupled-dipole vdW": cdvdw_sig_repulsion / 9th / exp variants,
    src/energy/lj.c + vdw.c [M]).

    PROVENANCE (SURVEY §0: mount empty — documented contract): the
    many-body eigensolve supplies ALL dispersion, so the 12-6 attraction
    must be dropped; the remaining repulsion is parameterized
    consistently with the Drude dispersion it pairs with:

    - ``sig``: U = C6_ij sig_ij^6 / r^12 — the LJ repulsive wall whose
      amplitude 4 eps sig^6 is identified with the London C6 of the SAME
      alpha/omega Drude parameters (4 eps sig^12 = C6 sig^6), so the pair
      curve U_rep - C6/r^6 is an ordinary LJ well with its depth fixed by
      the polarizability — no independent eps parameter.
    - ``9th``: U = C6_ij sig_ij^3 / r^9 — softer r^-9 wall matching the
      sig variant at contact (r = sig_ij).
    - ``exp``: Born-Mayer U = A_ij exp(-B_ij r) with the disp_expansion
      column convention (eps column = A [K] geometric-mixed, sig column =
      B [1/A] harmonic-mixed) — the PHAST-style exponential wall.

    Sites without Drude parameters (alpha or omega = 0) contribute no
    sig/9th repulsion, mirroring their absence from the cdvdw
    eigensolve."""
    if cfg.cdvdw_repulsion == "exp":
        a_ij = jnp.sqrt(jnp.maximum(ei * ej, 0.0))
        b_ij = 2.0 * si * sj / jnp.maximum(si + sj, 1e-12)
        return a_ij * jnp.exp(-b_ij * r)
    c6 = london_c6(ai, aj, wi, wj)
    sig = 0.5 * (si + sj)                     # Lorentz arithmetic
    if cfg.cdvdw_repulsion == "sig":
        return c6 * sig ** 6 / r ** 12
    if cfg.cdvdw_repulsion == "9th":
        return c6 * sig ** 3 / r ** 9
    raise ValueError(cfg.cdvdw_repulsion)


def cdvdw_repulsion_tail_coefficient(si, sj, ai, aj, wi, wj, rc, cfg):
    """Ordered-pair long-range tail for the sig/9th repulsion walls
    (T_ij = 4 pi Int_rc^inf U r^2 dr; exp decays below any tail):
    sig: 4 pi C6 sig^6/(9 rc^9);  9th: 4 pi C6 sig^3/(6 rc^6)."""
    c6 = london_c6(ai, aj, wi, wj)
    sig = 0.5 * (si + sj)
    if cfg.cdvdw_repulsion == "sig":
        return 4.0 * jnp.pi * c6 * sig ** 6 / (9.0 * rc ** 9)
    if cfg.cdvdw_repulsion == "9th":
        return 4.0 * jnp.pi * c6 * sig ** 3 / (6.0 * rc ** 6)
    return jnp.zeros_like(rc) * (si + sj)     # exp: negligible


def rd_pair_energy_generic(r, ei, ej, si, sj, c6i, c6j, c8i, c8j,
                           c10i, c10j, cfg):
    """Non-LJ RD pair energies from broadcastable per-side parameter
    arrays — gather-free so the jnp tile pass and the Pallas kernels share
    the identical formulas (mixing rules documented in the module
    docstring)."""
    if cfg.rd_potential == "sg":
        return sg_energy(r)
    if cfg.rd_potential == "dreiding":
        d0 = jnp.sqrt(ei * ej)
        r0 = jnp.maximum(0.5 * (si + sj), 1e-6)
        return dreiding_energy(r, d0, r0)
    if cfg.rd_potential == "b14_7":
        r0 = (si**3 + sj**3) / jnp.maximum(si**2 + sj**2, 1e-12)
        se = (jnp.sqrt(ei) + jnp.sqrt(ej)) ** 2
        eps = 4.0 * ei * ej / jnp.maximum(se, 1e-12)
        return b14_7_energy(r, eps, jnp.maximum(r0, 1e-6))
    if cfg.rd_potential == "disp_expansion":
        a_ij = jnp.sqrt(jnp.maximum(ei * ej, 0.0))
        b_ij = 2.0 * si * sj / jnp.maximum(si + sj, 1e-12)
        c6 = jnp.sqrt(jnp.maximum(c6i * c6j, 0.0))
        c8 = jnp.sqrt(jnp.maximum(c8i * c8j, 0.0))
        c10 = jnp.sqrt(jnp.maximum(c10i * c10j, 0.0))
        return disp_expansion_energy(r, a_ij, b_ij, c6, c8, c10,
                                     cfg.damp_dispersion)
    raise ValueError(cfg.rd_potential)


def rd_pair_energy(r, r2s, idx_i, params, cfg):
    """Dispatch the non-LJ RD potentials over a [B,N] tile.

    ``idx_i``: row atom indices; column params broadcast from ``params``.
    """
    col = lambda x: x[None, :]
    row = lambda x: x[idx_i][:, None]
    return rd_pair_energy_generic(
        r, row(params.eps), col(params.eps), row(params.sig),
        col(params.sig), row(params.c6), col(params.c6), row(params.c8),
        col(params.c8), row(params.c10), col(params.c10), cfg)
