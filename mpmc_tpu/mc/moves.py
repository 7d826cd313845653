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


def displace_rows(pos, params: Params, mol, key, move_factor, rot_factor):
    """(idx, new_rows): trial coordinates for one molecule's atoms after
    a translate+rotate move (rows only — callers scatter on acceptance).

    Padded ``mol_atoms`` rows duplicate the molecule's first atom index;
    every duplicate computes the identical new coordinate, so the scatter
    is deterministic."""
    from mpmc_tpu.state import mol_rows
    k_t, k_r = jax.random.split(key)
    idx = params.mol_atoms[mol]
    rows = mol_rows(pos, params, mol)         # slice, not gather
    valid = jnp.arange(rows.shape[0]) < params.mol_natoms[mol]
    w = jnp.where(valid, mol_rows(params.mass, params, mol), 0.0)[:, None]
    com = jnp.sum(rows * w, 0) / jnp.maximum(jnp.sum(w), 1e-30)
    disp = (jax.random.uniform(k_t, (3,), pos.dtype) * 2.0 - 1.0) * move_factor
    q = quat.random_small(k_r, rot_factor)
    new = com + disp + quat.rotate(rows - com, q)
    # padded rows duplicate the first row's value (sliced padding holds
    # the NEXT molecule's atoms — the duplicate-pad contract stands)
    new = jnp.where(valid[:, None], new, new[0])
    return idx, new.astype(pos.dtype)


def displace_molecule(pos, params: Params, mol, key, move_factor,
                      rot_factor):
    """Translate + rotate one molecule; returns the full new pos array."""
    idx, new = displace_rows(pos, params, mol, key, move_factor, rot_factor)
    return pos.at[idx].set(new)


def cavity_open_grid(pos, box, atom_alive, g: int, radius):
    """[g^3] bool: grid cells whose center has no alive atom within
    ``radius`` (minimum image) — the reference's cavity grid
    (SURVEY.md §2 "Cavity bias", src/mc/cavity.c [M])."""
    from mpmc_tpu.ops import pbc as pbc_ops
    ii = jnp.arange(g)
    frac = (jnp.stack(jnp.meshgrid(ii, ii, ii, indexing="ij"),
                      -1).reshape(-1, 3).astype(pos.dtype) + 0.5) / g
    centers = pbc_ops._apply33(frac, box)                # [G,3]
    box_inv = jnp.linalg.inv(box)
    G = centers.shape[0]
    B = min(G, 256)
    nb = -(-G // B)

    def body(_, b):
        c = jax.lax.dynamic_slice_in_dim(centers, b * B, B)
        dr = pbc_ops.min_image(c[:, None, :] - pos[None, :, :], box,
                               box_inv)
        r2 = jnp.sum(dr * dr, -1)
        near = (r2 < radius * radius) & atom_alive[None, :]
        return None, ~jnp.any(near, axis=1)

    _, open_blocks = jax.lax.scan(body, None, jnp.arange(nb))
    return open_blocks.reshape(nb * B)[:G]


def cell_com(key, cell, g: int, box, dtype):
    """Uniform random point inside grid cell ``cell`` (flat index)."""
    from mpmc_tpu.ops import pbc as pbc_ops
    ijk = jnp.stack([cell // (g * g), (cell // g) % g, cell % g])
    u = jax.random.uniform(key, (3,), dtype)
    frac = (ijk.astype(dtype) + u) / g
    return pbc_ops._apply33(frac, box)


def place_rows(params: Params, mol, species, key, box, com=None,
               dtype=jnp.float32):
    """[A,3] trial rows: the species template at a random COM and
    orientation (GCMC insertion, SURVEY.md §3.3).  ``com`` overrides the
    uniform-in-cell proposal (cavity-biased insertion).  Rows beyond the
    species' atom count duplicate the first row so acceptance scatters
    stay deterministic (padded ``mol_atoms`` entries repeat index 0)."""
    k_p, k_r = jax.random.split(key)
    if com is None:
        frac = jax.random.uniform(k_p, (3,), dtype)
        com = frac @ box
    q = quat.random_uniform(k_r)
    tmpl = params.species_pos[species]                   # [A,3], COM at 0
    new = com + quat.rotate(tmpl, q)
    a = jnp.arange(params.mol_atoms.shape[1])
    ok = a < params.mol_natoms[mol]
    return jnp.where(ok[:, None], new, new[0]).astype(dtype)


def place_template(pos, params: Params, mol, species, key, box, com=None):
    """Write the species template into molecule slot ``mol`` (full-array
    form of place_rows)."""
    new = place_rows(params, mol, species, key, box, com=com,
                     dtype=pos.dtype)
    return pos.at[params.mol_atoms[mol]].set(new)


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
