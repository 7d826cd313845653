"""SPECTRE: massive-polarizability free-charge treatment.

Rebuild of the reference's SPECTRE method (SURVEY.md §2 "SPECTRE" [M],
options ``spectre``, ``spectre_max_charge``, ``spectre_max_target``;
Belof's free-charge treatment scattered through polar/input [L]).  The
mount was empty (SURVEY §0), so the exact upstream semantics could not
be verified; this module implements the documented behavior of the
method as described in the survey — the framework's contract:

- PQR atoms flagged ``S`` are *spectre sites*: mobile point charges
  (the infinite-polarizability limit of an induced dipole is a free
  charge), sampled by the ordinary displacement moves like any other
  movable single-atom molecule.
- Their charges are *renormalized* at every corrtime boundary:
  each |q_i| is clamped to ``spectre_max_charge`` and, when
  ``spectre_max_target`` > 0, the total spectre charge magnitude
  sum_i |q_i| is rescaled onto that target.  The full-energy refresh
  that follows every corrtime (metropolis.initialize) rebuilds every
  charge-dependent cache (Ewald S(k), self/exclusion, e_frozen), so
  the renormalization needs no bookkeeping of its own.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def spectre_atom_indices(params, spectre_species) -> np.ndarray:
    """Atom-slot indices of every molecule of a spectre species."""
    if not spectre_species:
        return np.zeros(0, np.int64)
    mol_sp = np.asarray(params.mol_species)
    atom_sp = mol_sp[np.asarray(params.mol_id)]
    ok = np.isin(atom_sp, np.asarray(list(spectre_species)))
    ok &= np.asarray(params.atom_ok)
    return np.nonzero(ok)[0]


def renormalize_charges(q, idx, max_charge: float, max_target: float):
    """Clamp each spectre |q| to max_charge, then rescale the set onto
    sum|q| = max_target (if a positive target is configured).  Returns
    the updated copy of ``q``."""
    q = np.array(q, np.float64, copy=True)
    if len(idx) == 0:
        return q
    qs = np.clip(q[idx], -max_charge, max_charge)
    if max_target > 0.0:
        total = np.sum(np.abs(qs))
        if total > 1e-30:
            qs = qs * (max_target / total)
            qs = np.clip(qs, -max_charge, max_charge)
    q[idx] = qs
    return q


def apply(params, spectre_idx: np.ndarray, cfg):
    """Per-corrtime renormalization: returns params with updated
    charges (same pytree structure — no recompilation)."""
    q = renormalize_charges(np.asarray(params.charge), spectre_idx,
                            cfg.spectre_max_charge,
                            cfg.spectre_max_target)
    return dataclasses.replace(
        params, charge=jnp.asarray(q, params.charge.dtype))
