"""Pallas TPU kernel: fused O(N^2) pair pass.

The rebuild of the reference's hot pair loop (SURVEY.md §2 "Pair builder"
+ the RD/ES real-space loops, src/energy/pairs.c / lj.c / coulombic.c [C])
as one tiled TPU kernel: each (TI x TJ) tile loads two position/parameter
strips into VMEM, computes minimum-image displacements, LJ, Ewald
real-space erfc, the intramolecular erf exclusion and the LJ tail
coefficient in registers, and reduces them to scalar partials — no [B,N]
intermediates ever round-trip through HBM (the jnp scan path materializes
several per block).  Lower-triangular tiles are skipped via a cheap
predicate on sequential grid steps.

Semantics match ops/pairs.pair_pass(..., split_frozen=True) exactly:
triangular i<j counting, alive/intra/cutoff masks, active vs
frozen-frozen split, min_r2 overlap tracking.  The per-pair formulas are
the same lj_ops functions the jnp path uses.

f32 only (TPU-native); the f64 parity path stays on the jnp pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mpmc_tpu.constants import KE
from mpmc_tpu.ops import lj as lj_ops


def _erfc(x):
    """erfc for x >= 0 — Mosaic has no erf/erfc primitive.  Abramowitz &
    Stegun 7.1.26: |abs error| <= 1.5e-7, i.e. at the f32 noise floor."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


def _erf(x):
    """erf for x >= 0.  The intramolecular exclusion term evaluates erf at
    small alpha*r where 1 - _erfc(x) would inherit the A&S absolute error
    as a large *relative* error; a Maclaurin series is f32-exact there."""
    t = x * x
    c = 1.1283791670955126   # 2/sqrt(pi)
    series = c * x * (1.0 + t * (-1.0 / 3.0 + t * (0.1 + t * (
        -1.0 / 42.0 + t * (1.0 / 216.0 + t * (-1.0 / 1320.0
                                              + t * (1.0 / 9360.0)))))))
    return jnp.where(x < 0.6, series, 1.0 - _erfc(x))

TI = 256   # row tile
TJ = 256   # col tile

# output slot layout: [rd, es_real, es_excl, lrc, rd_ff, es_real_ff,
#                      es_excl_ff, lrc_ff, min_r2]
N_OUT = 16   # padded lane count

# accumulator rows: slots 0-7 = term sums, 8 = min_r2; padded to the
# f32 sublane count x2.  Accumulation stays VECTORIZED: each tile
# reduces its (TI,TJ) values only along sublanes (axis=0, cheap) into
# (1,TJ) planes accumulated in VMEM; the single cross-lane reduction
# happens once in the caller.  The previous per-tile scalar jnp.sum +
# SMEM store serialized the pipeline (same lesson as the fused MC
# kernel's 4.4x vector-accumulator win).
ACC_ROWS = 16

# packed-plane row layout: all per-atom inputs ride in ONE (PROWS, N)
# f32 array so each tile is 2 block DMAs (row strip + col strip)
P_X, P_Y, P_Z, P_Q, P_EPS, P_SIG, P_C6, P_C8, P_C10 = range(9)
P_MOL, P_ALIVE, P_FROZ = 9, 10, 11
PROWS = 16   # padded to the f32 sublane count x2


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(scal_ref, rowb_ref, colb_ref, box_ref, binv_ref, out_ref,
            *, cfg, n_real, row_start=0, row_tile0=0):
    """Packed-plane tile kernel: the per-atom inputs arrive as ONE
    (PROWS, T) block per side (row/col), so each grid step issues 2
    block DMAs instead of 24 — per-step DMA setup latency, not
    bandwidth, dominated the unpacked layout (~19 us/tile measured)."""
    ti = pl.program_id(0) + row_tile0
    tj = pl.program_id(1)

    @pl.when((pl.program_id(0) == 0) & (tj == 0))
    def _():
        out_ref[:, :] = jnp.zeros((ACC_ROWS, TJ), jnp.float32)
        out_ref[8:9, :] = jnp.full((1, TJ), jnp.inf, jnp.float32)

    # skip tiles entirely below the diagonal (j block ends before i
    # starts) — unless row-restricted, where cols < row_start count for
    # every row (the skipped frozen-prefix rows reappear as columns)
    @pl.when(((tj + 1) * TJ > ti * TI) | (tj * TJ < row_start))
    def _compute():
        rc = scal_ref[0, 0]
        alpha = scal_ref[0, 1]
        ri = lambda k: rowb_ref[k, :]     # (TI,) strip, packed row k
        cj = lambda k: colb_ref[k, :]     # (TJ,) strip

        # minimum-image dr for all (TI, TJ) pairs, component-wise.
        # cfg.ortho_box: drop the exact-zero triclinic cross terms —
        # BIT-identical (IEEE x + 0.0 == x), 1/3 the min-image ops
        # (see mc_kernel._kernel mimg)
        dx = [ri(k)[:, None] - cj(k)[None, :] for k in range(3)]
        if cfg.ortho_box:
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

        rows = ti * TI + jax.lax.broadcasted_iota(jnp.int32, (TI, TJ), 0)
        cols = tj * TJ + jax.lax.broadcasted_iota(jnp.int32, (TI, TJ), 1)
        alive = (ri(P_ALIVE)[:, None] > 0) & (cj(P_ALIVE)[None, :] > 0)
        tri = cols > rows
        if row_start:
            # row-restricted pass: rows < row_start are frozen-prefix
            # rows handled as extra columns (each active-frozen pair
            # counted once, frozen member never a row)
            tri = (tri | (cols < row_start)) & (rows >= row_start)
        pair_ok = tri & (cols < n_real) & (rows < n_real) & alive
        # mol ids ride as f32 (exact below 2^24); padded slots are -1
        # and dead, so the equality test is exact
        same_mol = ri(P_MOL)[:, None] == cj(P_MOL)[None, :]
        inter = pair_ok & ~same_mol
        intra = pair_ok & same_mol
        act = inter & (r2 < rc * rc)
        ff = (ri(P_FROZ)[:, None] > 0) & (cj(P_FROZ)[None, :] > 0)

        r2s = jnp.where(r2 > 1e-12, r2, 1.0)
        inv_r = jax.lax.rsqrt(r2s)   # one rsqrt; VPU div/sqrt are slow
        r = r2s * inv_r

        rd_u = None
        tc = None
        if cfg.rd_potential == "lj":
            if cfg.mixing_rule == "lb":
                # factor the geometric mean: sqrt per strip element, not
                # per pair (sqrt(ei ej) = sqrt(ei) sqrt(ej), eps >= 0)
                eps = (jnp.sqrt(ri(P_EPS))[:, None]
                       * jnp.sqrt(cj(P_EPS))[None, :])
                sig = 0.5 * (ri(P_SIG)[:, None] + cj(P_SIG)[None, :])
            else:
                eps, sig = lj_ops.mix(
                    ri(P_EPS)[:, None], cj(P_EPS)[None, :],
                    ri(P_SIG)[:, None], cj(P_SIG)[None, :],
                    cfg.mixing_rule)
            s2 = (sig * sig) * (inv_r * inv_r)
            s6 = s2 * s2 * s2
            rd_u = 4.0 * eps * s6 * (s6 - 1.0)
            if cfg.rd_lrc:
                tc = lj_ops.tail_coefficient(eps, sig, rc)
        elif cfg.rd_potential in ("sg", "dreiding", "b14_7",
                                  "disp_expansion"):
            from mpmc_tpu.ops import potentials
            rd_u = potentials.rd_pair_energy_generic(
                r, ri(P_EPS)[:, None], cj(P_EPS)[None, :],
                ri(P_SIG)[:, None], cj(P_SIG)[None, :],
                ri(P_C6)[:, None], cj(P_C6)[None, :],
                ri(P_C8)[:, None], cj(P_C8)[None, :],
                ri(P_C10)[:, None], cj(P_C10)[None, :], cfg)
            if cfg.rd_potential == "disp_expansion" and cfg.rd_lrc:
                c6m = jnp.sqrt(jnp.maximum(
                    ri(P_C6)[:, None] * cj(P_C6)[None, :], 0.0))
                c8m = jnp.sqrt(jnp.maximum(
                    ri(P_C8)[:, None] * cj(P_C8)[None, :], 0.0))
                c10m = jnp.sqrt(jnp.maximum(
                    ri(P_C10)[:, None] * cj(P_C10)[None, :], 0.0))
                tc = potentials.disp_tail_coefficient(c6m, c8m, c10m, rc)

        es_u = None
        ex_u = None
        qq = ri(P_Q)[:, None] * cj(P_Q)[None, :]
        if cfg.coulomb == "ewald":
            es_u = qq * _erfc(alpha * r) * inv_r
            ex_u = -qq * _erf(alpha * r) * inv_r
        elif cfg.coulomb == "wolf":
            es_u = qq * (_erfc(alpha * r) * inv_r - _erfc(alpha * rc) / rc)
        elif cfg.coulomb == "cutoff":
            es_u = qq * inv_r

        def s(values, mask):
            # sublane-only reduction to a (1, TJ) plane — no cross-lane
            # ops, no scalar stores, per-tile work stays vectorized
            if values is None:
                return None, None
            return (jnp.sum(jnp.where(mask & ~ff, values, 0.0), axis=0,
                            keepdims=True),
                    jnp.sum(jnp.where(mask & ff, values, 0.0), axis=0,
                            keepdims=True))

        rd_a, rd_f = s(rd_u, act)
        es_a, es_f = s(es_u, act)
        ex_a, ex_f = s(ex_u, intra)
        tc_a, tc_f = s(tc, inter)
        mr2 = jnp.min(jnp.where(inter & ~ff, r2, jnp.inf), axis=0,
                      keepdims=True)

        for k, p in ((0, rd_a), (1, es_a), (2, ex_a), (3, tc_a),
                     (4, rd_f), (5, es_f), (6, ex_f), (7, tc_f)):
            if p is not None:
                out_ref[k:k + 1, :] += p
        out_ref[8:9, :] = jnp.minimum(out_ref[8:9, :], mr2)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_real", "interpret",
                                    "row_start"))
def pair_terms_tiles(pos, charge, eps, sig, c6, c8, c10, mol_id, alive,
                     frozen, box, rc, alpha, cfg, n_real,
                     interpret=False, row_start=0):
    """Run the fused tile kernel; returns the 9 raw sums
    [rd, es_real(no ke), es_excl(no ke), lrc, ...ff..., min_r2].

    Inputs are the padded per-atom arrays; ``n_real`` (static) is the
    padded size actually scanned.  Charges are unscaled — the ke
    prefactor is applied by the caller.

    ``row_start`` (static) restricts the row tiles to rows >=
    row_start, triangular against ALL columns plus cols < row_start
    for every row — the Pallas mirror of ops/pairs.pair_pass's
    row-restricted fast-refresh semantics (the ff output slots are
    exact zeros there: no frozen atom is ever a row).
    """
    f32 = jnp.float32
    n_pad = _round_up(n_real, max(TI, TJ))
    row_tile0 = row_start // TI   # first row tile that contains a row

    def pad1(x, fill=0.0):
        x = jnp.asarray(x)
        return jnp.pad(x.astype(f32), (0, n_pad - x.shape[0]),
                       constant_values=fill)

    # ONE packed (PROWS, n_pad) plane: 2 block DMAs per tile, not 24
    packed = jnp.zeros((PROWS, n_pad), f32)
    pos32 = pos.astype(f32)
    packed = packed.at[P_X].set(pad1(pos32[:, 0]))
    packed = packed.at[P_Y].set(pad1(pos32[:, 1]))
    packed = packed.at[P_Z].set(pad1(pos32[:, 2]))
    packed = packed.at[P_Q].set(pad1(charge))
    packed = packed.at[P_EPS].set(pad1(eps))
    packed = packed.at[P_SIG].set(pad1(sig))
    packed = packed.at[P_C6].set(pad1(c6))
    packed = packed.at[P_C8].set(pad1(c8))
    packed = packed.at[P_C10].set(pad1(c10))
    packed = packed.at[P_MOL].set(pad1(mol_id, -1.0))
    packed = packed.at[P_ALIVE].set(pad1(alive))
    packed = packed.at[P_FROZ].set(pad1(frozen))
    scal = jnp.stack([rc, alpha]).astype(f32).reshape(1, 2)
    box32 = box.astype(f32)
    binv = jnp.linalg.inv(box32)

    grid = (n_pad // TI - row_tile0, n_pad // TJ)
    out = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, n_real=n_real,
                          row_start=row_start, row_tile0=row_tile0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PROWS, TI), lambda i, j: (0, i + row_tile0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PROWS, TJ), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 3), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ACC_ROWS, TJ), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ACC_ROWS, TJ), f32),
        interpret=interpret,
    )(scal, packed, packed, box32, binv)
    # the one cross-lane reduction, outside the kernel
    return jnp.concatenate([jnp.sum(out[0:8], axis=1),
                            jnp.min(out[8:9], axis=1)])


def pair_pass_pallas(pos, box, atom_alive, params, cfg, rc, alpha,
                     interpret=False, row_start=0):
    """PairTerms-compatible wrapper: returns (active, frozen_frozen)
    tuples of raw term dicts with the ke prefactor applied, matching
    ops/pairs.pair_pass(split_frozen=True).  With ``row_start`` the ff
    part is exact zeros and ``active`` matches the row-restricted
    single-output pair_pass."""
    from mpmc_tpu.ops.pairs import PairTerms
    frozen = params.mol_frozen[params.mol_id]
    raw = pair_terms_tiles(
        pos, params.charge, params.eps, params.sig, params.c6, params.c8,
        params.c10, params.mol_id, atom_alive, frozen, box, rc, alpha,
        cfg, pos.shape[0], interpret=interpret, row_start=row_start)
    dtype = pos.dtype
    c = lambda x: x.astype(dtype)
    ke = jnp.asarray(KE, dtype)
    act = PairTerms(rd=c(raw[0]), es_real=ke * c(raw[1]),
                    es_excl=ke * c(raw[2]), lrc_coeff=c(raw[3]),
                    min_r2=c(raw[8]))
    ff = PairTerms(rd=c(raw[4]), es_real=ke * c(raw[5]),
                   es_excl=ke * c(raw[6]), lrc_coeff=c(raw[7]),
                   min_r2=jnp.asarray(jnp.inf, dtype))
    return act, ff


def supported(cfg) -> bool:
    """Static gate: which configurations the fused kernel covers."""
    return (cfg.rd_potential in ("lj", "none", "sg", "dreiding", "b14_7",
                                 "disp_expansion")
            and cfg.coulomb in ("ewald", "wolf", "cutoff", "none")
            and not cfg.feynman_hibbs
            and not cfg.feynman_kleinert
            and cfg.cdvdw_repulsion == "none"
            and cfg.dtype == "float32")


# ---------------------------------------------------------------------------
# Delta-pass kernel: one molecule's rows vs all columns — the per-move
# workhorse (ops/pairs.mol_pair_pass).  The jnp path materializes ~8
# [A, N] intermediates per call in HBM; this kernel keeps everything in
# VMEM per (A_pad x TJ) tile.  vmap-able over chains (batched grid).
# ---------------------------------------------------------------------------

A_PAD = 8    # molecule rows padded to the f32 sublane count
MOL_TJ = 2048   # column tile for the delta kernel (rows are only A_PAD
                # sublanes, so fat tiles amortize grid-iteration overhead)


def _mol_kernel(scal_ref, rowd_ref, pj_ref, qj_ref, ej_ref, sj_ref,
                c6j_ref, c8j_ref, c10j_ref, aj_ref, box_ref, binv_ref,
                out_ref, *, cfg, n_real):
    tj = pl.program_id(0)

    @pl.when(tj == 0)
    def _():
        for k in range(N_OUT):
            out_ref[0, k] = jnp.asarray(0.0, jnp.float32)
        out_ref[0, 8] = jnp.asarray(jnp.inf, jnp.float32)

    rc = scal_ref[0, 0]
    alpha = scal_ref[0, 1]

    # row data packed as (10*A_PAD, 128): fields x,y,z,q,eps,sig,valid,
    # c6,c8,c10 replicated across lanes; lane slice [:, :1] -> columns
    fld = lambda k: rowd_ref[k * A_PAD:(k + 1) * A_PAD, 0:1]   # [A_PAD,1]
    dx = [fld(k) - pj_ref[k, :][None, :] for k in range(3)]
    if cfg.ortho_box:
        # diagonal basis: bit-identical cross-term skip (see _kernel)
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

    cols = tj * MOL_TJ + jax.lax.broadcasted_iota(jnp.int32,
                                                  (A_PAD, MOL_TJ), 1)
    ok = ((fld(6) > 0) & (aj_ref[0, :][None, :] > 0) & (cols < n_real))
    act = ok & (r2 < rc * rc)

    r2s = jnp.where(r2 > 1e-12, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2s)
    r = r2s * inv_r
    zero = jnp.zeros((), jnp.float32)

    rd = zero
    tc_s = zero
    if cfg.rd_potential == "lj":
        if cfg.mixing_rule == "lb":
            eps = jnp.sqrt(fld(4)) * jnp.sqrt(ej_ref[0, :][None, :])
            sig = 0.5 * (fld(5) + sj_ref[0, :][None, :])
        else:
            eps, sig = lj_ops.mix(fld(4), ej_ref[0, :][None, :],
                                  fld(5), sj_ref[0, :][None, :],
                                  cfg.mixing_rule)
        s2 = (sig * sig) * (inv_r * inv_r)
        s6 = s2 * s2 * s2
        rd = jnp.sum(jnp.where(act, 4.0 * eps * s6 * (s6 - 1.0), 0.0))
        if cfg.rd_lrc:
            tc_s = jnp.sum(jnp.where(
                ok, lj_ops.tail_coefficient(eps, sig, rc), 0.0))
    elif cfg.rd_potential in ("sg", "dreiding", "b14_7", "disp_expansion"):
        from mpmc_tpu.ops import potentials
        u = potentials.rd_pair_energy_generic(
            r, fld(4), ej_ref[0, :][None, :], fld(5),
            sj_ref[0, :][None, :], fld(7), c6j_ref[0, :][None, :],
            fld(8), c8j_ref[0, :][None, :], fld(9),
            c10j_ref[0, :][None, :], cfg)
        rd = jnp.sum(jnp.where(act, u, 0.0))
        if cfg.rd_potential == "disp_expansion" and cfg.rd_lrc:
            c6m = jnp.sqrt(jnp.maximum(
                fld(7) * c6j_ref[0, :][None, :], 0.0))
            c8m = jnp.sqrt(jnp.maximum(
                fld(8) * c8j_ref[0, :][None, :], 0.0))
            c10m = jnp.sqrt(jnp.maximum(
                fld(9) * c10j_ref[0, :][None, :], 0.0))
            tc_s = jnp.sum(jnp.where(
                ok, potentials.disp_tail_coefficient(c6m, c8m, c10m, rc),
                0.0))

    es = zero
    qq = fld(3) * qj_ref[0, :][None, :]
    if cfg.coulomb == "ewald":
        es = jnp.sum(jnp.where(act, qq * _erfc(alpha * r) * inv_r, 0.0))
    elif cfg.coulomb == "wolf":
        es = jnp.sum(jnp.where(
            act, qq * (_erfc(alpha * r) * inv_r - _erfc(alpha * rc) / rc),
            0.0))
    elif cfg.coulomb == "cutoff":
        es = jnp.sum(jnp.where(act, qq * inv_r, 0.0))

    out_ref[0, 0] += rd
    out_ref[0, 1] += es
    out_ref[0, 3] += tc_s
    out_ref[0, 8] = jnp.minimum(out_ref[0, 8],
                                jnp.min(jnp.where(ok, r2, jnp.inf)))


@functools.partial(jax.jit, static_argnames=("cfg", "n_real", "interpret"))
def mol_pair_tiles(pos_rows, q_rows, eps_rows, sig_rows, c6_rows,
                   c8_rows, c10_rows, valid_rows, pos, charge, eps, sig,
                   c6, c8, c10, col_alive, box, rc, alpha, cfg, n_real,
                   interpret=False):
    """One molecule's rows (padded to A_PAD) against every column.
    Returns raw sums [rd, es(no ke), _, lrc, ..., min_r2].

    ``col_alive`` must already exclude the molecule's own columns."""
    f32 = jnp.float32
    n_pad = _round_up(n_real, MOL_TJ)
    A = pos_rows.shape[0]
    if A > A_PAD:
        raise ValueError(f"molecule has {A} atoms > A_PAD={A_PAD}; "
                         "raise pair_kernel.A_PAD")

    def padr(x):
        x = jnp.asarray(x).astype(f32)
        return jnp.pad(x, (0, A_PAD - A))

    def padc(x, dt=f32, fill=0):
        x = jnp.asarray(x)
        return jnp.pad(x.astype(dt), (0, n_pad - x.shape[0]),
                       constant_values=fill).reshape(1, n_pad)

    # packed row fields -> (10*A_PAD, 128), value broadcast across lanes
    rowf = jnp.concatenate([
        padr(pos_rows[:, 0]), padr(pos_rows[:, 1]), padr(pos_rows[:, 2]),
        padr(q_rows), padr(eps_rows), padr(sig_rows),
        padr(valid_rows.astype(f32)), padr(c6_rows), padr(c8_rows),
        padr(c10_rows)])                                   # [10*A_PAD]
    rowd = jnp.broadcast_to(rowf[:, None], (10 * A_PAD, 128))
    pos_t = jnp.pad(pos.astype(f32), ((0, n_pad - pos.shape[0]),
                                      (0, 0))).T
    scal = jnp.stack([rc, alpha]).astype(f32).reshape(1, 2)
    box32 = box.astype(f32)
    binv = jnp.linalg.inv(box32)

    cols1 = lambda: pl.BlockSpec((1, MOL_TJ), lambda j: (0, j),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mol_kernel, cfg=cfg, n_real=n_real),
        grid=(n_pad // MOL_TJ,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((10 * A_PAD, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, MOL_TJ), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            cols1(), cols1(), cols1(), cols1(), cols1(), cols1(),
            cols1(),
            pl.BlockSpec((3, 3), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 3), lambda j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, N_OUT), lambda j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, N_OUT), f32),
        interpret=interpret,
    )(scal, rowd, pos_t, padc(charge), padc(eps), padc(sig), padc(c6),
      padc(c8), padc(c10), padc(col_alive, jnp.int32), box32, binv)
    return out[0]


def mol_pair_pass_pallas(pos, box, atom_alive, params, cfg, mol, rc,
                         alpha, interpret=False, row_pos=None):
    """PairTerms-compatible delta pass for one molecule (ke applied)."""
    from mpmc_tpu.ops.pairs import PairTerms
    from mpmc_tpu.state import mol_rows as _mr
    na = params.mol_natoms[mol]
    valid = jnp.arange(params.max_atoms_per_mol) < na
    col_alive = atom_alive & (params.mol_id != mol)
    raw = mol_pair_tiles(
        _mr(pos, params, mol) if row_pos is None else row_pos,
        _mr(params.charge, params, mol), _mr(params.eps, params, mol),
        _mr(params.sig, params, mol), _mr(params.c6, params, mol),
        _mr(params.c8, params, mol), _mr(params.c10, params, mol),
        valid, pos,
        params.charge, params.eps, params.sig, params.c6, params.c8,
        params.c10, col_alive, box, rc, alpha, cfg, pos.shape[0],
        interpret=interpret)
    dtype = pos.dtype
    ke = jnp.asarray(KE, dtype)
    z = jnp.zeros((), dtype)
    return PairTerms(rd=raw[0].astype(dtype),
                     es_real=ke * raw[1].astype(dtype),
                     es_excl=z, lrc_coeff=raw[3].astype(dtype),
                     min_r2=raw[8].astype(dtype))
