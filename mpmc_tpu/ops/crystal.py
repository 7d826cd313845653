"""Periodic-image repulsion-dispersion lattice sum (``rd_crystal``).

Rebuild of the reference's rd_crystal option (SURVEY.md §2
"Lennard-Jones RD": "rd_crystal periodic-image summation for RD" [M],
src/energy/lj.c [M]; §2.9 "RD": ``rd_crystal on`` + ``rd_crystal_order``).
The reference mount was empty (SURVEY §0), so the documented contract here
is the standard lattice-sum physics the option exists for:

    U_rd = 1/2  sum_i sum_j sum'_n  u(|r_ij + n . h|)

where n runs over all integer image triples with |n_a| <= order, the
primed sum excludes the (i == j, n == 0) self term, and the n == 0 term
additionally excludes intramolecular (bonded) pairs — exactly like the
cutoff pair pass.  Unlike the cutoff pass, NO distance cutoff is applied
inside the shells: the point of the option is converged lattice energies
for small crystal cells where no legal cutoff (<= L/2) captures the RD
tail.  ``rd_lrc`` is incompatible (the shells ARE the tail) and forced
off by the input parser.

A molecule's interaction with its *own periodic images* (i, j in the same
molecule, n != 0 — including i == j) is part of the sum and is NOT
invariant under rotation or insertion, so the per-move delta path
(``mol_rd_crystal``) includes it.

Validated against the known simple-cubic LJ lattice sums
(A12 = 6.2021888, A6 = 8.4019238; Ashcroft & Mermin tab. 20.1 convention)
in tests/test_crystal.py, plus the usual delta-vs-recompute bookkeeping
invariant.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mpmc_tpu.ops import pbc as pbc_ops


def image_shifts(order: int):
    """All integer image triples |n_a| <= order, central (0,0,0) first."""
    import numpy as np
    g = np.arange(-order, order + 1)
    s = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    key = np.argsort((np.abs(s).max(1) > 0).astype(int), kind="stable")
    s = s[key]
    assert (s[0] == 0).all()
    return s


def _rd_u_shifted(dr0, shift_cart, idx_i, params, cfg, temperature):
    """[B,N] RD pair energies at displacement dr0 + shift (no masks)."""
    from mpmc_tpu.ops import pairs as pairs_ops
    d = dr0 + shift_cart[None, None, :]
    r2 = jnp.sum(d * d, axis=-1)
    r2s = jnp.where(r2 > 1e-12, r2, 1.0)
    r = jnp.sqrt(r2s)
    rd_u, _ = pairs_ops.rd_tile_energy(r, r2s, idx_i, params, cfg,
                                       temperature, rc=None)
    if rd_u is None:
        rd_u = jnp.zeros_like(r2)
    return rd_u, r2


def rd_crystal_full(pos, box, atom_alive, params, cfg, temperature,
                    split_frozen=False):
    """Full-system crystal RD energy.  Returns a scalar, or with
    ``split_frozen`` an (active, frozen_frozen) pair where the frozen part
    holds terms internal to the frozen framework (same convention as
    ops/pairs.pair_pass)."""
    N = pos.shape[0]
    B = min(cfg.pair_chunk, N)
    nb = -(-N // B)
    box_inv = jnp.linalg.inv(box)
    shifts = jnp.asarray(image_shifts(cfg.rd_crystal_order), pos.dtype)
    cols = jnp.arange(N)
    atom_frozen = params.mol_frozen[params.mol_id]

    def block(b):
        i0 = b * B
        idx = jnp.clip(i0 + jnp.arange(B), 0, N - 1)
        row_valid = (i0 + jnp.arange(B) < N) & atom_alive[idx]
        dr0 = pbc_ops.min_image(pos[idx][:, None, :] - pos[None, :, :],
                                box, box_inv)
        base = row_valid[:, None] & atom_alive[None, :]
        tri = cols[None, :] > idx[:, None]
        same_mol = params.mol_id[idx][:, None] == params.mol_id[None, :]
        diag = cols[None, :] == idx[:, None]
        if split_frozen:
            ff = atom_frozen[idx][:, None] & atom_frozen[None, :]
        else:
            ff = jnp.zeros_like(base)

        def per_shift(acc, si):
            s_cart = shifts[si] @ box
            rd_u, _ = _rd_u_shifted(dr0, s_cart, idx, params, cfg,
                                    temperature)
            central = si == 0
            # central image: inter-molecular i<j only (bonded exclusion);
            # other images: all i<j pairs (incl. intramolecular) plus the
            # half-weighted self-image diagonal.
            w_tri = jnp.where(central, base & tri & ~same_mol, base & tri)
            w_diag = (~central) & base & diag
            u = (jnp.sum(jnp.where(w_tri & ~ff, rd_u, 0.0))
                 + 0.5 * jnp.sum(jnp.where(w_diag & ~ff, rd_u, 0.0)))
            u_ff = (jnp.sum(jnp.where(w_tri & ff, rd_u, 0.0))
                    + 0.5 * jnp.sum(jnp.where(w_diag & ff, rd_u, 0.0)))
            return (acc[0] + u, acc[1] + u_ff), None

        z = jnp.zeros((), pos.dtype)
        (u, u_ff), _ = jax.lax.scan(per_shift, (z, z),
                                    jnp.arange(shifts.shape[0]))
        return u, u_ff

    def body(acc, b):
        u, u_ff = block(b)
        return (acc[0] + u, acc[1] + u_ff), None

    z = jnp.zeros((), pos.dtype)
    (u, u_ff), _ = jax.lax.scan(body, (z, z), jnp.arange(nb))
    return (u, u_ff) if split_frozen else u + u_ff


def mol_rd_crystal(pos, box, atom_alive, params, cfg, temperature, mol,
                   row_pos=None):
    """Crystal RD terms touching molecule ``mol``: one-sided rows-vs-other
    columns over ALL image shifts, plus the molecule's interaction with
    its own periodic images (1/2 sum_{i,j in mol} sum_{n!=0}).  The delta
    analog of ops/pairs.mol_pair_pass for the crystal sum.  ``row_pos``:
    trial rows for the molecule itself."""
    box_inv = jnp.linalg.inv(box)
    shifts = jnp.asarray(image_shifts(cfg.rd_crystal_order), pos.dtype)
    idx = params.mol_atoms[mol]
    na = params.mol_natoms[mol]
    A = idx.shape[0]
    row_valid = jnp.arange(A) < na
    col_alive = atom_alive & (params.mol_id != mol)

    rows = pos[idx] if row_pos is None else row_pos
    dr0 = pbc_ops.min_image(rows[:, None, :] - pos[None, :, :],
                            box, box_inv)
    inter_mask = row_valid[:, None] & col_alive[None, :]

    # own-molecule block (A x A): images only
    dr0_own = pbc_ops.min_image(rows[:, None, :] - rows[None, :, :],
                                box, box_inv)
    own_mask = row_valid[:, None] & row_valid[None, :]

    def per_shift(acc, si):
        s_cart = shifts[si] @ box
        rd_u, _ = _rd_u_shifted(dr0, s_cart, idx, params, cfg, temperature)
        u = jnp.sum(jnp.where(inter_mask, rd_u, 0.0))
        central = si == 0
        d_own = dr0_own + s_cart[None, None, :]
        r2o = jnp.sum(d_own * d_own, -1)
        r2so = jnp.where(r2o > 1e-12, r2o, 1.0)
        from mpmc_tpu.ops import pairs as pairs_ops
        rd_own, _ = pairs_ops.rd_tile_energy(
            jnp.sqrt(r2so), r2so, jnp.arange(A), _OwnParams(params, idx),
            cfg, temperature, rc=None)
        if rd_own is None:
            rd_own = jnp.zeros_like(r2o)
        u_own = 0.5 * jnp.sum(
            jnp.where(own_mask & ~central, rd_own, 0.0))
        return acc + u + u_own, None

    z = jnp.zeros((), pos.dtype)
    u, _ = jax.lax.scan(per_shift, z, jnp.arange(shifts.shape[0]))
    return u


_PER_ATOM = ("charge", "mass", "polar", "eps", "sig", "omega", "c6", "c8",
             "c10", "gwp_alpha", "mol_id", "atom_ok")


class _OwnParams:
    """View of Params whose *per-atom* arrays are gathered down to one
    molecule's A atom slots (rows passed as ``idx_i = arange(A)``), so
    rd_tile_energy's row/column gathers address the own-molecule block.
    Per-molecule arrays (mol_mass etc.) pass through untouched — row
    lookups like ``params.mol_mass[params.mol_id[idx_i]]`` stay valid."""

    def __init__(self, params, idx):
        self._p = params
        self._idx = idx

    def __getattr__(self, name):
        v = getattr(self._p, name)
        if name in _PER_ATOM:
            return v[self._idx]
        return v
