"""Fused multi-step Monte Carlo kernel (Pallas TPU).

Single-chain MC latency is bound by the per-step chain of small XLA ops
inside ``lax.scan`` (delta tile, bookkeeping selects), not by FLOPs —
SURVEY.md §3.1's hot loop, VERDICT r1 item 3.  This kernel runs K whole
Metropolis displacement steps per launch with the entire system state
resident in VMEM: per step it draws the target atom and trial
displacement from PRE-DRAWN uniforms, evaluates the old+new pair energy
against all atoms in fused column tiles, applies the acceptance rule,
and commits the position update in place.  One launch ~ K steps; no
HBM round-trips between steps.

Scope (static gate ``supported``): ensemble nvt, every movable molecule
monatomic (single-site species — the BASELINE config-1 LJ-fluid shape),
rd lj/none, coulomb none|cutoff|wolf (Ewald's k-space bookkeeping stays
on the scan path), no FH/FK, no polarization/cdvdw, f32.

Random numbers are drawn OUTSIDE with jax.random (``draw_uniforms``) and
passed in as a [K, 8] table: lane 0 picks the molecule, 1-3 the
displacement, 4 the acceptance coin.  This keeps the kernel trivially
testable — a pure-jnp reference consuming the same table must produce
the bit-identical trajectory (tests/test_fused_mc.py) — at the cost of
K*8 f32 of input per launch (negligible).

The per-pair formulas mirror ops/pairs._tile_values for the supported
configs; energies accumulate per-term so the caller updates
EnergyBreakdown exactly like the scan path (delta accumulation washed
by the per-corrtime initialize, same contract).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpmc_tpu.constants import KE

TJ = 1024      # column tile
ROW_X, ROW_Y, ROW_Z, ROW_EPS, ROW_SIG, ROW_Q, ROW_ALIVE = range(7)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _erfc(x):
    # A&S 7.1.26 — same polynomial as pair_kernel._erfc
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


def _pair_terms(dx, dy, dz, eps_j, sig_j, q_j, ok, eps_i, sig_i, q_i,
                rc, alpha, cfg):
    """(rd, es, min_r2) of one site vs a column tile (masked sums)."""
    r2 = dx * dx + dy * dy + dz * dz
    act = ok & (r2 < rc * rc)
    r2s = jnp.where(r2 > 1e-12, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2s)
    rd = jnp.zeros((), jnp.float32)
    if cfg.rd_potential == "lj":
        if cfg.mixing_rule == "lb":
            eps = jnp.sqrt(eps_i) * jnp.sqrt(eps_j)
            sig = 0.5 * (sig_i + sig_j)
        else:   # waldman_hagler
            s6i, s6j = sig_i ** 6, sig_j ** 6
            denom = jnp.maximum(s6i + s6j, 1e-300)
            sig = (0.5 * denom) ** (1.0 / 6.0)
            eps = jnp.sqrt(eps_i * eps_j) * (
                2.0 * sig_i ** 3 * sig_j ** 3 / denom)
        s2 = (sig * sig) * (inv_r * inv_r)
        s6 = s2 * s2 * s2
        rd = jnp.sum(jnp.where(act, 4.0 * eps * s6 * (s6 - 1.0), 0.0))
    es = jnp.zeros((), jnp.float32)
    if cfg.coulomb != "none":
        qq = q_i * q_j
        r = r2s * inv_r
        if cfg.coulomb == "cutoff":
            es_u = qq * inv_r
        else:   # wolf (shifted)
            es_u = qq * (_erfc(alpha * r) * inv_r
                         - _erfc(alpha * rc) / rc)
        es = jnp.sum(jnp.where(act, es_u, 0.0))
    min_r2 = jnp.min(jnp.where(ok, r2, jnp.inf))
    return rd, es, min_r2


def _kernel(scal_ref, u_ref, tbl_ref, data_in_ref, data_ref, out_ref, *,
            cfg, n_steps, n_pad, n_real):
    # data_in_ref aliases data_ref (input_output_aliases) — all access
    # goes through the output ref
    del data_in_ref
    rc = scal_ref[0, 0]
    alpha = scal_ref[0, 1]
    beta = scal_ref[0, 2]
    mf = scal_ref[0, 3]
    n_mov = scal_ref[0, 4]          # float count of movable molecules
    thr2 = scal_ref[0, 5]           # autoreject r_min^2 (0 = off)
    box = [[scal_ref[1, 3 * a + b] for b in range(3)] for a in range(3)]
    binv = [[scal_ref[2, 3 * a + b] for b in range(3)] for a in range(3)]

    n_tiles = n_pad // TJ

    def step(k, carry):
        d_rd, d_es, n_acc = carry
        # --- proposal -----------------------------------------------------
        # Mosaic cannot load a single VMEM lane at a dynamic offset
        # ("index must be a multiple of 128"), so every scalar access
        # loads the 128-aligned tile containing the element and
        # mask-reduces it out; the update store blends the same tile.
        m = jnp.minimum((u_ref[k, 0] * n_mov).astype(jnp.int32),
                        (n_mov - 1.0).astype(jnp.int32))
        mt0 = pl.multiple_of((m // 128) * 128, 128)
        ttile = tbl_ref[pl.dslice(0, 1), pl.dslice(mt0, 128)]  # [1,128]
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        i = jnp.sum(jnp.where(lane1 == (m - mt0), ttile, 0))

        j0 = pl.multiple_of((i // 128) * 128, 128)
        off = i - j0
        itile = data_ref[pl.dslice(0, 8), pl.dslice(j0, 128)]  # [8,128]
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        sel = lane == off

        def pick(row):
            return jnp.sum(jnp.where(sel & (sub == row), itile, 0.0))

        old = [pick(r) for r in (ROW_X, ROW_Y, ROW_Z)]
        eps_i = pick(ROW_EPS)
        sig_i = pick(ROW_SIG)
        q_i = pick(ROW_Q)
        new = [old[a] + (2.0 * u_ref[k, 1 + a] - 1.0) * mf
               for a in range(3)]

        # --- old+new delta pass over column tiles ---------------------------
        def col(jt, acc):
            rd_o, es_o, rd_n, es_n, mr2 = acc
            j0 = jt * TJ
            blk = data_ref[pl.dslice(0, 8), pl.dslice(j0, TJ)]
            px, py, pz = blk[ROW_X], blk[ROW_Y], blk[ROW_Z]
            eps_j, sig_j = blk[ROW_EPS], blk[ROW_SIG]
            q_j, alive_j = blk[ROW_Q], blk[ROW_ALIVE]
            cols = j0 + jax.lax.broadcasted_iota(jnp.int32, (TJ,), 0)
            ok = (alive_j > 0) & (cols != i) & (cols < n_real)

            def mimg(dx, dy, dz):
                fr = [dx * binv[0][a] + dy * binv[1][a] + dz * binv[2][a]
                      for a in range(3)]
                fr = [f - jnp.round(f) for f in fr]
                return [fr[0] * box[0][b] + fr[1] * box[1][b]
                        + fr[2] * box[2][b] for b in range(3)]

            do = mimg(old[0] - px, old[1] - py, old[2] - pz)
            dn = mimg(new[0] - px, new[1] - py, new[2] - pz)
            r_o, e_o, _ = _pair_terms(do[0], do[1], do[2], eps_j, sig_j,
                                      q_j, ok, eps_i, sig_i, q_i, rc,
                                      alpha, cfg)
            r_n, e_n, m2 = _pair_terms(dn[0], dn[1], dn[2], eps_j, sig_j,
                                       q_j, ok, eps_i, sig_i, q_i, rc,
                                       alpha, cfg)
            return (rd_o + r_o, es_o + e_o, rd_n + r_n, es_n + e_n,
                    jnp.minimum(mr2, m2))

        z = jnp.zeros((), jnp.float32)
        rd_o, es_o, rd_n, es_n, mr2 = jax.lax.fori_loop(
            0, n_tiles, col, (z, z, z, z, jnp.asarray(jnp.inf)))
        drd = rd_n - rd_o
        des = KE * (es_n - es_o)
        du = drd + des
        reject_overlap = (thr2 > 0.0) & (mr2 < thr2)
        accept = ((jnp.log(jnp.maximum(u_ref[k, 4], 1e-38))
                   < -beta * du) & ~reject_overlap)

        @pl.when(accept)
        def _():
            tile = data_ref[pl.dslice(0, 8), pl.dslice(j0, 128)]
            for a, r in enumerate((ROW_X, ROW_Y, ROW_Z)):
                tile = jnp.where(sel & (sub == r), new[a], tile)
            data_ref[pl.dslice(0, 8), pl.dslice(j0, 128)] = tile

        af = accept.astype(jnp.float32)
        return (d_rd + af * drd, d_es + af * des, n_acc + af)

    z = jnp.zeros((), jnp.float32)
    d_rd, d_es, n_acc = jax.lax.fori_loop(0, n_steps, step, (z, z, z))
    out_ref[0, 0] = d_rd
    out_ref[0, 1] = d_es
    out_ref[0, 2] = n_acc


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_steps", "n_real",
                                    "interpret"))
def run_steps(pos, eps, sig, charge, alive, mov_atom, box, rc, alpha,
              beta, move_factor, thr2, uniforms, cfg, n_steps, n_real,
              interpret=False):
    """K fused displacement steps.  Returns (new_pos [N,3], d_rd, d_es,
    n_accept).  ``mov_atom``: [Mv] atom row of each movable molecule;
    ``uniforms``: [K, 8] from draw_uniforms."""
    f32 = jnp.float32
    n_pad = _round_up(n_real, TJ)

    def pad1(x, fill=0.0):
        x = jnp.asarray(x).astype(f32)
        return jnp.pad(x, (0, n_pad - x.shape[0]), constant_values=fill)

    data = jnp.zeros((8, n_pad), f32)
    data = data.at[ROW_X, :n_real].set(pos[:, 0].astype(f32))
    data = data.at[ROW_Y, :n_real].set(pos[:, 1].astype(f32))
    data = data.at[ROW_Z, :n_real].set(pos[:, 2].astype(f32))
    data = data.at[ROW_EPS].set(pad1(eps))
    data = data.at[ROW_SIG].set(pad1(sig))
    data = data.at[ROW_Q].set(pad1(charge))
    data = data.at[ROW_ALIVE].set(pad1(alive.astype(f32)))

    mv = jnp.asarray(mov_atom, jnp.int32)
    mv_pad = _round_up(max(mv.shape[0], 1), 128)
    tbl = jnp.pad(mv, (0, mv_pad - mv.shape[0])).reshape(1, mv_pad)

    box32 = jnp.asarray(box, f32)
    binv = jnp.linalg.inv(box32)
    scal = jnp.zeros((3, 16), f32)
    scal = scal.at[0, 0].set(jnp.asarray(rc, f32))
    scal = scal.at[0, 1].set(jnp.asarray(alpha, f32))
    scal = scal.at[0, 2].set(jnp.asarray(beta, f32))
    scal = scal.at[0, 3].set(jnp.asarray(move_factor, f32))
    scal = scal.at[0, 4].set(jnp.asarray(mv.shape[0], f32))
    scal = scal.at[0, 5].set(jnp.asarray(thr2, f32))
    scal = scal.at[1, :9].set(box32.reshape(-1))
    scal = scal.at[2, :9].set(binv.reshape(-1))

    u = jnp.asarray(uniforms, f32)

    out_data, out_sums = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, n_steps=n_steps,
                          n_pad=n_pad, n_real=n_real),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((3, 16), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_steps, 8), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mv_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, n_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n_pad), f32),
            jax.ShapeDtypeStruct((1, 8), f32),
        ],
        input_output_aliases={3: 0},
        interpret=interpret,
    )(scal, u, tbl, data)
    new_pos = jnp.stack([out_data[ROW_X, :n_real],
                         out_data[ROW_Y, :n_real],
                         out_data[ROW_Z, :n_real]], axis=1)
    return (new_pos.astype(pos.dtype), out_sums[0, 0], out_sums[0, 1],
            out_sums[0, 2])


def draw_uniforms(key, n_steps):
    """[K, 8] uniform table: lane 0 molecule pick, 1-3 displacement,
    4 acceptance coin (5-7 spare)."""
    return jax.random.uniform(key, (n_steps, 8), jnp.float32)


def supported(cfg, params) -> bool:
    """Static gate for the fused multi-step path (module docstring)."""
    if not (cfg.ensemble == "nvt"
            and cfg.rd_potential in ("lj", "none")
            and cfg.coulomb in ("none", "cutoff", "wolf")
            and cfg.mixing_rule in ("lb", "waldman_hagler")
            and not cfg.feynman_hibbs and not cfg.feynman_kleinert
            and not cfg.polarization and not cfg.cdvdw
            and cfg.cdvdw_repulsion == "none"
            # rd_lrc IS allowed: tail coefficients are
            # distance-independent, so displacement deltas are zero
            and not cfg.rd_crystal
            and not cfg.quantum_rotation
            and cfg.dtype == "float32"):
        return False
    # monatomic movable species only (no rotations, no intra terms)
    natoms = np.asarray(params.mol_natoms)
    frozen = np.asarray(params.mol_frozen)
    mov = ~frozen & (np.asarray(params.mol_species) >= 0)
    return bool(mov.any()) and bool((natoms[mov] == 1).all())


def movable_atoms(params, mol_alive) -> np.ndarray:
    """[Mv] atom row of each alive movable (monatomic) molecule."""
    alive = np.asarray(mol_alive)
    frozen = np.asarray(params.mol_frozen)
    spec = np.asarray(params.mol_species)
    start = np.asarray(params.mol_start)
    mv = alive & ~frozen & (spec >= 0)
    return start[mv].astype(np.int32)
