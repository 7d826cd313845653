"""Trial-move proposal builders: pure functions producing candidate
positions / alive-masks / boxes.

Rebuild of the reference's move machinery (SURVEY.md §2 "Moves /
checkpoint", src/mc/mc_moves.c [C]) with the checkpoint()/restore() undo
system replaced by functional select: the candidate state is built out of
place and merged only on acceptance (SURVEY.md §7 design stance).

Move semantics follow the reference:
- displace: uniform translation in a cube of half-width ``move_factor``
  PLUS a random rotation about the molecular COM by a uniform angle in
  [0, rot_factor] about a random axis.
- insert: clone the species template at a uniform fractional position with
  a uniform random orientation (Shoemake quaternion).
- delete: clear the slot's alive flag.
- volume: random walk in ln V; molecule COMs rescale, intramolecular
  geometry stays rigid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from mpmc_tpu.state import Params, molecule_com
from mpmc_tpu.utils import quaternion as quat


def pick_nth_true(mask, n):
    """Index of the (n+1)-th True in ``mask`` (jit-safe).  Caller must
    guarantee n < sum(mask)."""
    cs = jnp.cumsum(mask.astype(jnp.int32))
    return jnp.argmax(cs > n)


def pick_random_true(key, mask):
    """(index, count): uniformly-random True position in ``mask``."""
    cnt = jnp.sum(mask.astype(jnp.int32))
    u = jax.random.uniform(key)
    n = jnp.minimum((u * cnt).astype(jnp.int32), jnp.maximum(cnt - 1, 0))
    return pick_nth_true(mask, n), cnt


def displace_molecule(pos, params: Params, mol, key, move_factor,
                      rot_factor):
    """Translate + rotate one molecule; returns the full new pos array.

    Padded ``mol_atoms`` rows duplicate the molecule's first atom index;
    every duplicate computes the identical new coordinate, so the scatter
    is deterministic.
    """
    k_t, k_r = jax.random.split(key)
    idx = params.mol_atoms[mol]
    com = molecule_com(pos, params, mol)
    disp = (jax.random.uniform(k_t, (3,), pos.dtype) * 2.0 - 1.0) * move_factor
    q = quat.random_small(k_r, rot_factor)
    new = com + disp + quat.rotate(pos[idx] - com, q)
    return pos.at[idx].set(new.astype(pos.dtype))


def place_template(pos, params: Params, mol, species, key, box):
    """Write the species template into molecule slot ``mol`` at a random
    COM and orientation (GCMC insertion, SURVEY.md §3.3)."""
    k_p, k_r = jax.random.split(key)
    frac = jax.random.uniform(k_p, (3,), pos.dtype)
    com = frac @ box
    q = quat.random_uniform(k_r)
    tmpl = params.species_pos[species]                   # [A,3], COM at 0
    new = com + quat.rotate(tmpl, q)
    idx = params.mol_atoms[mol]
    # rows beyond the species' atom count are padded duplicates of the
    # first atom index -> overwrite them with the first template row so the
    # scatter stays deterministic.
    a = jnp.arange(idx.shape[0])
    ok = a < params.mol_natoms[mol]
    new = jnp.where(ok[:, None], new, new[0])
    return pos.at[idx].set(new.astype(pos.dtype))


def scale_volume(pos, box, params: Params, mol_alive, d_lnv):
    """NPT volume move: isotropic cell rescale by molecule COM
    (rigid molecules keep their internal geometry).

    Returns (new_pos, new_box).  Only valid without a frozen framework —
    the caller gates volume moves on that.
    """
    s = jnp.exp(d_lnv / 3.0)
    new_box = box * s
    # shift every atom by (s-1) * its molecule's COM
    from mpmc_tpu.state import all_molecule_coms
    coms = all_molecule_coms(pos, params)                # [M,3]
    shift = (s - 1.0) * coms[params.mol_id]              # [N,3]
    return pos + shift, new_box
