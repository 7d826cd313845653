"""Coupled-dipole many-body van der Waals (the reference's ``cdvdw``).

Rebuild of SURVEY.md §2 "Coupled-dipole vdW (MBD)" (src/energy/vdw.c [C]):
every polarizable site is a quantum Drude oscillator with polarizability
alpha_i [A^3] and characteristic frequency omega_i [a.u.] (the PQR omega
column); the dipole-coupled normal modes give the many-body dispersion
energy

    E_vdw = (hbar/2) [ sum_k omega_k  -  3 sum_i omega_i ],

where omega_k^2 are the eigenvalues of the 3P x 3P matrix

    M_(ia)(jb) = omega_i^2 delta_ij delta_ab
                 - omega_i omega_j sqrt(alpha_i alpha_j) T_(ia)(jb)

with T the (Thole-damped, cutoff) dipole-dipole tensor shared with the
polarization machinery.  For two identical undamped isotropic oscillators
this reduces to the textbook coupled-Drude result

    E(r) = (hbar w/2)[ sqrt(1+2a) + sqrt(1-2a) + 2 sqrt(1+a)
                       + 2 sqrt(1-a) - 6 ],   a = alpha / r^3,

whose r->inf expansion is the London term -(3/4) hbar w alpha^2 / r^6 —
the analytic case the tests pin down.

Sites are selected *statically* at system build (params.vdw_sites: all
atoms with alpha>0 and omega>0), so the eigenproblem has a fixed 3P x 3P
shape under jit; GCMC-dead sites are decoupled dynamically (their modes
are exactly omega_i and cancel against the free-site sum).
"""
from __future__ import annotations

import jax.numpy as jnp

from mpmc_tpu.constants import HARTREE_K
from mpmc_tpu.ops import thole


def vdw_energy(pos, box, atom_alive, params, cfg):
    """Many-body dispersion energy [K]; 0 if no eligible sites."""
    sites = params.vdw_sites
    if sites is None or sites.shape[0] == 0:
        return jnp.zeros((), pos.dtype)
    p = pos[sites]
    alpha = params.polar[sites]
    omega = params.omega[sites]
    ok = atom_alive[sites]
    P = sites.shape[0]

    t = thole.dipole_tensor(p, box, ok, cfg)          # [P,P,3,3]
    scale = (omega[:, None] * omega[None, :]
             * jnp.sqrt(alpha[:, None] * alpha[None, :]))
    m = -scale[..., None, None] * t                    # coupling blocks
    m = m.transpose(0, 2, 1, 3).reshape(3 * P, 3 * P)
    diag = jnp.repeat(omega * omega, 3)
    m = m + jnp.diag(diag)
    lam = jnp.linalg.eigvalsh(m)
    coupled = jnp.sum(jnp.sqrt(jnp.maximum(lam, 0.0)))
    free = 3.0 * jnp.sum(omega)        # dead sites cancel exactly
    return (0.5 * HARTREE_K * (coupled - free)).astype(pos.dtype)
