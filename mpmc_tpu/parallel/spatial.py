"""Atom-sharded (spatial) parallel energy evaluation over a device mesh.

The reference has NO domain decomposition — its MPI axis is replicas only
(SURVEY.md §2 "Parallelism strategies": "Domain/spatial decomposition
(TP/PP analog): No").  This module goes beyond reference parity: the
O(N^2) pair matrix is tiled by ROW BLOCKS across mesh devices under
``shard_map`` — each device evaluates its row-block strip of the
half-matrix against the full (replicated) position array and the scalar
partial sums meet in one ``psum`` over ICI.  The Ewald reciprocal term
shards over k-vectors the same way.  This is the "shard the pair
tile-grid" design from SURVEY.md §5 ("the ring attention of MC") and is
what scales a SINGLE huge system (10^5+ atoms) across chips, orthogonal
to replica parallelism.

Row blocks are interleaved round-robin (device d owns rows d, d+D,
d+2D, ...) so the triangular mask's load stays balanced.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mpmc_tpu.ops import ewald, pairs
from mpmc_tpu.ops.pairs import PairTerms

AXIS = "atoms"


def default_mesh(n_devices=None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def pair_pass_sharded(pos, box, atom_alive, params, cfg, temperature,
                      mesh: Mesh):
    """Full-system PairTerms with row blocks sharded over the mesh.

    Equivalent to ops/pairs.pair_pass (triangular i<j counting); each
    device holds a replicated copy of positions and reduces only scalars
    — communication is one psum of ~5 numbers.
    """
    ndev = mesh.shape[AXIS]
    N = pos.shape[0]
    rows_per = -(-N // ndev)

    def local(pos_l, box_l, alive_l):
        d = jax.lax.axis_index(AXIS)
        box_inv = jnp.linalg.inv(box_l)
        rc = pairs.derived_cutoff(box_l, cfg)
        alpha = pairs.derived_alpha(rc, cfg)
        B = min(cfg.pair_chunk, rows_per)
        nb = -(-rows_per // B)

        def body(acc, b):
            # interleaved rows: this device's k-th row is d + k*ndev
            k0 = b * B
            local_k = k0 + jnp.arange(B)
            rows = d + local_k * ndev
            idx = jnp.clip(rows, 0, N - 1)
            valid = (local_k < rows_per) & (rows < N) & alive_l[idx]
            t = pairs._block_terms(
                pos_l[idx], idx, valid, pos_l, alive_l, params, cfg,
                box_l, box_inv, rc, alpha, temperature, triangular=True)
            return acc.combine(t), None

        acc, _ = jax.lax.scan(body, PairTerms.zero(pos_l.dtype),
                              jnp.arange(nb))
        return PairTerms(
            rd=jax.lax.psum(acc.rd, AXIS),
            es_real=jax.lax.psum(acc.es_real, AXIS),
            es_excl=jax.lax.psum(acc.es_excl, AXIS),
            lrc_coeff=jax.lax.psum(acc.lrc_coeff, AXIS),
            min_r2=-jax.lax.pmax(-acc.min_r2, AXIS))

    f = jax.shard_map(local, mesh=mesh, in_specs=(P(), P(), P()),
                      out_specs=P(), check_vma=False)
    return f(pos, box, atom_alive)


def recip_energy_sharded(pos, charge, alive, box, alpha, kmax,
                         mesh: Mesh):
    """Ewald reciprocal energy with the k-vector table sharded over the
    mesh: each device computes its strip of the structure factor and the
    weighted |S(k)|^2 partial sum; one psum of a scalar."""
    ndev = mesh.shape[AXIS]
    ints = ewald.half_space_ints(kmax)
    K = len(ints)
    k_pad = -(-K // ndev) * ndev
    ints_p = np.pad(ints, ((0, k_pad - K), (0, 0)))
    ok = np.arange(k_pad) < K
    ints_j = jnp.asarray(ints_p, pos.dtype)
    ok_j = jnp.asarray(ok)

    def local(pos_l, charge_l, alive_l, box_l, ints_l, ok_l):
        recip = 2.0 * jnp.pi * jnp.linalg.inv(box_l).T
        kv = ints_l @ recip
        q = jnp.where(alive_l, charge_l, 0.0)
        phase = pos_l @ kv.T
        sk_re = q @ jnp.cos(phase)
        sk_im = q @ jnp.sin(phase)
        v = jnp.abs(jnp.linalg.det(box_l))
        k2 = jnp.sum(kv * kv, axis=-1)
        w = jnp.where(ok_l, jnp.exp(-k2 / (4.0 * alpha * alpha))
                      / jnp.where(k2 > 0, k2, 1.0), 0.0)
        from mpmc_tpu.constants import KE
        e = KE * (2.0 * jnp.pi / v) * 2.0 * jnp.sum(
            w * (sk_re * sk_re + sk_im * sk_im))
        return jax.lax.psum(e, AXIS)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(AXIS), P(AXIS)),
        out_specs=P(), check_vma=False)
    return f(pos, charge, alive, box, ints_j, ok_j)
