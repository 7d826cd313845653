"""Pallas TPU kernels for the Thole polarization hot paths.

The reference's per-step bottleneck for polar systems is the dipole SCF
(SURVEY.md §3.2: "HOTTEST"; the one component it offloads to CUDA,
src/polarization/polar_cuda.cu [M]).  Here the two O(N^2) passes inside
the SCF become fused TPU tile kernels:

- ``dipole_field``: E_i = sum_j [3 d2 (dr.mu_j) dr / r^5 - d1 mu_j / r^3]
  (the matvec applied every CG/Jacobi iteration);
- ``charge_field``: E_i = sum_j q_j d1 dr / r^3 over intermolecular pairs
  (the static-field build).

Each (TI x TJ) tile computes minimum-image displacements, damping and the
tensor contraction entirely in VMEM and accumulates a [3, TI] strip of
the output field; nothing of size [N, N] or [B, N] touches HBM.  Masks
and formulas mirror ops/thole.py exactly (same _damping), which remains
the reference implementation and the f64 parity path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile shape: measured on a v5e-class chip (2026-08-17 scan, N=10.8k):
# 256x256 -> 6.4 ms, 128x512 -> 4.6, 128x1024 -> 4.2 ms per dipole
# matvec (rsqrt form).  Short output strips with wide source tiles win:
# the [8, TI] accumulator stays cheap while the j-loop amortizes.
# TJ > 1024 stalled the axon compile service (CLAUDE.md landmine).
# r3 re-scan (chained-call timing): 256x1024 beat 128x1024 in both
# same-process orderings (2.00 vs 2.94 and 2.20 vs 2.37 ms) — the
# matvec is VPU-bound, so the margin is ~5-25% depending on chip state.
TI = 256
TJ = 1024


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def grid_shape(n_real, ti=TI, tj=TJ):
    """(n_pad, n_i_tiles, n_j_tiles) for the given tile sizes — the
    shape contract between a caller-built ``visit`` table and the
    kernel grid."""
    n_pad = _round_up(n_real, max(ti, tj))
    return n_pad, n_pad // ti, n_pad // tj


def _damping(r, lam, kind):
    # mirrors ops/thole._damping (exponential = Thole model 3,
    # linear = Thole model 1)
    if kind == "none":
        one = jnp.ones_like(r)
        return one, one
    if kind == "linear":
        u = jnp.minimum(r / lam, 1.0)
        u3 = u * u * u
        return 4.0 * u3 - 3.0 * u3 * u, u3 * u
    x = lam * r
    e = jnp.exp(-x)
    p1 = 1.0 + x + 0.5 * x * x
    return 1.0 - e * p1, 1.0 - e * (p1 + x * x * x / 6.0)


def _kernel(scal_ref, pi_ref, pj_ref, srcj_ref, oki_ref, okj_ref,
            mi_ref, mj_ref, box_ref, binv_ref, *rest,
            mode, damp_kind, n_real, ortho=False, ti_size=TI,
            tj_size=TJ, use_visit=False):
    if use_visit:
        visit_ref, out_ref = rest
    else:
        (out_ref,) = rest
    ti = pl.program_id(0)
    tj = pl.program_id(1)

    @pl.when(tj == 0)
    def _():
        out_ref[:, :] = jnp.zeros((8, ti_size), jnp.float32)

    def compute():
        rc = scal_ref[0, 0]
        lam = scal_ref[0, 1]

        dx = [pi_ref[k, :][:, None] - pj_ref[k, :][None, :]
              for k in range(3)]
        if ortho:
            # diagonal basis: drop the exact-zero triclinic cross terms —
            # per-pair displacements are bit-identical (IEEE x + 0.0 == x),
            # 1/3 the min-image ops (same fast path as pair_kernel._kernel
            # / mc_kernel mimg).  The summed field may still reassociate at
            # ulp level: the branch changes the HLO ahead of the tile
            # reduction, and the compiler may fuse that sum differently.
            fr = [dx[a] * binv_ref[a, a] for a in range(3)]
            fr = [f - jnp.round(f) for f in fr]
            dr = [fr[a] * box_ref[a, a] for a in range(3)]
        else:
            fr = [sum(dx[b] * binv_ref[b, a] for b in range(3))
                  for a in range(3)]
            fr = [f - jnp.round(f) for f in fr]
            dr = [sum(fr[a] * box_ref[a, b] for a in range(3))
                  for b in range(3)]
        r2 = dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2]

        rows = ti * ti_size + jax.lax.broadcasted_iota(
            jnp.int32, (ti_size, tj_size), 0)
        cols = tj * tj_size + jax.lax.broadcasted_iota(
            jnp.int32, (ti_size, tj_size), 1)
        ok = ((oki_ref[0, :][:, None] > 0) & (okj_ref[0, :][None, :] > 0)
              & (rows != cols) & (rows < n_real) & (cols < n_real)
              & (r2 < rc * rc))
        if mode == "charge":
            # static field: intermolecular only
            ok = ok & (mi_ref[0, :][:, None] != mj_ref[0, :][None, :])

        r2s = jnp.where(r2 > 1e-12, r2, 1.0)
        # rsqrt-derived reciprocals: the VPU's divide and sqrt are
        # multi-pass; one rsqrt plus multiplies keeps the pair loop
        # ALU-bound
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        inv_r3 = inv_r2 * inv_r
        r = r2s * inv_r
        d1, d2 = _damping(r, lam, damp_kind)

        if mode == "charge":
            coef = jnp.where(ok, srcj_ref[0, :][None, :] * d1 * inv_r3,
                             0.0)
            ex = jnp.sum(coef * dr[0], axis=1)
            ey = jnp.sum(coef * dr[1], axis=1)
            ez = jnp.sum(coef * dr[2], axis=1)
        else:
            mu = [srcj_ref[k, :][None, :] for k in range(3)]
            mdotr = mu[0] * dr[0] + mu[1] * dr[1] + mu[2] * dr[2]
            c1 = jnp.where(ok, 3.0 * d2 * mdotr * inv_r3 * inv_r2, 0.0)
            c2 = jnp.where(ok, d1 * inv_r3, 0.0)
            ex = jnp.sum(c1 * dr[0] - c2 * mu[0], axis=1)
            ey = jnp.sum(c1 * dr[1] - c2 * mu[1], axis=1)
            ez = jnp.sum(c1 * dr[2] - c2 * mu[2], axis=1)

        out_ref[0, :] += ex
        out_ref[1, :] += ey
        out_ref[2, :] += ez

    if use_visit:
        # tile-level cutoff culling (r6): the caller's conservative
        # visit table marks tiles whose min cross-pair min-image
        # distance is >= rc; every pair in a skipped tile is already
        # masked to an exact zero by the r2 < rc^2 test, so skipping
        # the whole tile leaves the accumulated field bit-identical
        # (x + 0.0 == x) while saving the tile's VPU work.
        @pl.when(visit_ref[ti, tj] != 0)
        def _():
            compute()
    else:
        compute()


@functools.partial(jax.jit, static_argnames=("mode", "damp_kind", "n_real",
                                             "interpret", "ortho",
                                             "ti_size", "tj_size"))
def _field(pos, src, ok_i, ok_j, mol_id, box, rc, lam, mode, damp_kind,
           n_real, interpret=False, ortho=False, visit=None,
           ti_size=TI, tj_size=TJ):
    f32 = jnp.float32
    n_pad = _round_up(n_real, max(ti_size, tj_size))

    def pad1(x, dt=f32):
        x = jnp.asarray(x)
        return jnp.pad(x.astype(dt), (0, n_pad - x.shape[0])).reshape(
            1, n_pad)

    pos_t = jnp.pad(pos.astype(f32), ((0, n_pad - pos.shape[0]), (0, 0))).T
    if mode == "charge":
        src_t = pad1(src)                                 # charges [1,N]
        src_rows = 1
    else:
        src_t = jnp.pad(src.astype(f32),
                        ((0, n_pad - src.shape[0]), (0, 0))).T   # [3,N]
        src_rows = 3
    oki = pad1(ok_i, jnp.int32)
    okj = pad1(ok_j, jnp.int32)
    m = pad1(mol_id, jnp.int32)
    scal = jnp.stack([rc, lam]).astype(f32).reshape(1, 2)
    box32 = box.astype(f32)
    binv = jnp.linalg.inv(box32)

    ni, nj = n_pad // ti_size, n_pad // tj_size
    grid = (ni, nj)
    row = lambda T, r: pl.BlockSpec((r, T), lambda i, j: (0, i),
                                    memory_space=pltpu.VMEM)
    col = lambda T, r: pl.BlockSpec((r, T), lambda i, j: (0, j),
                                    memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        row(ti_size, 3), col(tj_size, 3),      # positions
        col(tj_size, src_rows),                # source (charges or mu)
        row(ti_size, 1), col(tj_size, 1),      # site masks
        row(ti_size, 1), col(tj_size, 1),      # mol ids
        pl.BlockSpec((3, 3), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((3, 3), lambda i, j: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [scal, pos_t, pos_t, src_t, oki, okj, m, m, box32, binv]
    use_visit = visit is not None
    if use_visit:
        in_specs.append(pl.BlockSpec((ni, nj), lambda i, j: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(visit.astype(jnp.int32).reshape(ni, nj))
    out = pl.pallas_call(
        functools.partial(_kernel, mode=mode, damp_kind=damp_kind,
                          n_real=n_real, ortho=ortho, ti_size=ti_size,
                          tj_size=tj_size, use_visit=use_visit),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, ti_size), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), f32),
        interpret=interpret,
    )(*args)
    return out[:3, :n_real].T


def charge_field(pos, box, site_ok, charge, mol_id, rc, lam, damp_kind,
                 interpret=False, ortho=False, visit=None,
                 ti_size=TI, tj_size=TJ):
    """Damped intermolecular static field [N,3] (pallas)."""
    return _field(pos, charge, site_ok, site_ok, mol_id, box, rc, lam,
                  "charge", damp_kind, pos.shape[0], interpret=interpret,
                  ortho=ortho, visit=visit, ti_size=ti_size,
                  tj_size=tj_size)


def dipole_field(pos, box, site_ok, mu, mol_id, rc, lam, damp_kind,
                 interpret=False, ortho=False, visit=None,
                 ti_size=TI, tj_size=TJ):
    """(T mu) matvec [N,3] (pallas).  ``visit``: optional conservative
    [NI,NJ] tile-visit table (see thole.cull_visit / grid_shape) — tiles
    marked 0 are skipped whole; every pair they contain must already be
    outside rc, so the result is bit-identical to the dense pass."""
    return _field(pos, mu, site_ok, site_ok, mol_id, box, rc, lam,
                  "dipole", damp_kind, pos.shape[0], interpret=interpret,
                  ortho=ortho, visit=visit, ti_size=ti_size,
                  tj_size=tj_size)


def supported(cfg) -> bool:
    return (cfg.dtype == "float32"
            and cfg.polar_damp_type in ("exponential", "linear", "none"))
