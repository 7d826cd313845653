"""Ewald summation: reciprocal-space, self, and Wolf terms.

Rebuild of the reference's electrostatics (SURVEY.md §2 "Ewald
electrostatics", src/energy/coulombic.c [C]).  The real-space erfc sum and
the intramolecular erf exclusion live in ops/pairs.py (they share the pair
tiles); this module owns the k-space machinery:

    U_recip = ke * (2 pi / V) sum_{k != 0} w_k exp(-k^2/4a^2)/k^2 |S(k)|^2
    S(k)    = sum_i alive_i q_i exp(i k . r_i)
    U_self  = -ke * a/sqrt(pi) * sum_i alive_i q_i^2

k-vectors are generated from a *static* integer half-space table (spherical
cutoff |n| <= kmax, lexicographic half-space, weight 2) so the structure
factor is one [N, Nk] matmul — MXU-shaped by construction (SURVEY.md §5
"Long-context analog": Ewald recip as batched dense matmuls).

The cached structure factor (sk_re, sk_im) enables O(A * Nk) delta updates
when one molecule moves — the functional analog of the reference's per-pair
energy caching for the k-space term.

Neutral-system convention: no uniform-background (charged-cell) correction
term is applied, matching typical MPMC usage on neutral frameworks.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from mpmc_tpu.constants import KE
from jax.scipy.special import erfc


@functools.lru_cache(maxsize=None)
def half_space_ints(kmax: int):
    """Static integer k-vector table: one of each +/-n pair, |n|<=kmax, n!=0."""
    rng = np.arange(-kmax, kmax + 1)
    n = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), -1).reshape(-1, 3)
    n2 = (n * n).sum(1)
    sphere = (n2 > 0) & (n2 <= kmax * kmax)
    half = ((n[:, 0] > 0)
            | ((n[:, 0] == 0) & (n[:, 1] > 0))
            | ((n[:, 0] == 0) & (n[:, 1] == 0) & (n[:, 2] > 0)))
    return np.ascontiguousarray(n[sphere & half], dtype=np.float64)


def kvectors(box, kmax: int):
    """[Nk,3] reciprocal vectors for the current (possibly traced) box."""
    ints = jnp.asarray(half_space_ints(kmax), box.dtype)
    recip = 2.0 * jnp.pi * jnp.linalg.inv(box).T
    return ints @ recip


def structure_factor(pos, charge, alive, kvecs):
    """S(k) = sum_i alive_i q_i e^{i k.r_i} -> (re, im), each [Nk]."""
    q = jnp.where(alive, charge, 0.0)
    phase = pos @ kvecs.T                       # [N, Nk]
    return q @ jnp.cos(phase), q @ jnp.sin(phase)


def mol_structure_factor(pos_rows, charge_rows, row_ok, kvecs):
    """Partial S(k) from one molecule's atoms (for delta updates)."""
    q = jnp.where(row_ok, charge_rows, 0.0)
    phase = pos_rows @ kvecs.T                  # [A, Nk]
    return q @ jnp.cos(phase), q @ jnp.sin(phase)


def recip_energy_from_sk(sk_re, sk_im, box, alpha, kvecs):
    v = jnp.abs(jnp.linalg.det(box))
    k2 = jnp.sum(kvecs * kvecs, axis=-1)
    w = jnp.exp(-k2 / (4.0 * alpha * alpha)) / k2
    s2 = sk_re * sk_re + sk_im * sk_im
    # weight 2: the integer table holds one of each +/-k pair
    return KE * (2.0 * jnp.pi / v) * 2.0 * jnp.sum(w * s2)


def recip_energy(pos, charge, alive, box, alpha, kmax):
    kv = kvectors(box, kmax)
    sk_re, sk_im = structure_factor(pos, charge, alive, kv)
    return recip_energy_from_sk(sk_re, sk_im, box, alpha, kv), (sk_re, sk_im)


def self_energy(charge, alive, alpha):
    q2 = jnp.where(alive, charge * charge, 0.0)
    return -KE * alpha / jnp.sqrt(jnp.pi) * jnp.sum(q2)


def wolf_self_energy(charge, alive, alpha, rc):
    """Wolf method self/shift term:
    U_self = -ke (erfc(a rc)/(2 rc) + a/sqrt(pi)) sum q_i^2."""
    q2 = jnp.where(alive, charge * charge, 0.0)
    return -KE * (erfc(alpha * rc) / (2.0 * rc)
                  + alpha / jnp.sqrt(jnp.pi)) * jnp.sum(q2)
