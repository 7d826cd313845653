"""Fused multi-step Monte Carlo kernel (Pallas TPU).

Single-chain MC latency is bound by the per-step chain of small XLA ops
inside ``lax.scan`` (delta tile, bookkeeping selects), not by FLOPs —
SURVEY.md §3.1's hot loop, VERDICT r1 item 3.  This kernel runs K whole
Metropolis displacement steps per launch with the entire system state
resident in VMEM: per step it draws the target molecule and the
translate+rotate trial from PRE-DRAWN uniforms, evaluates the old+new
pair energy against all atoms in fused column tiles, applies the
acceptance rule, and commits the position update in place.  One launch
~ K steps; no HBM round-trips between steps.

Scope (static gate ``supported``): ensemble nvt, rigid movable
molecules of <= MAX_SITES atoms (monatomic LJ fluids through small
rigid sorbates like 3-site H2), rd lj/none/disp_expansion/sg/
dreiding/b14_7 (the non-LJ forms via the scan path's shared
ops/potentials.rd_pair_energy_generic), FH2/FH4 and Feynman-Kleinert
on top of LJ, coulomb none|cutoff|wolf|ewald|gwp, no
polarization/cdvdw/rd_crystal, f32.  Under
ewald the cached structure factor S(k) lives in VMEM beside the atom
table: each step adds the moved molecule's phase delta, scores
dE_recip = sum_k c_k (|S+dS|^2-|S|^2), and commits dS on accept —
exactly the scan path's _mol_sf_delta/_recip_delta, fused.  The
rigid-move-invariant self and intra-exclusion terms stay constant.
The move mirrors mc/moves.displace_rows
exactly: uniform translation in a cube of half-width move_factor PLUS
rotation about the mass-weighted COM by a uniform angle in
[0, rot_factor) about a uniform random axis (a normalized Gaussian and
sphere point picking draw from the same distribution).

Random numbers are drawn OUTSIDE with jax.random (``draw_uniforms``)
and passed in as a [K, 8] table: lane 0 picks the molecule, 1-3 the
displacement, 4 the acceptance coin, 5-7 the rotation (axis z,
axis azimuth, angle).  This keeps the kernel trivially testable — a
pure-numpy reference consuming the same table must produce the
bit-identical trajectory (tests/test_fused_mc.py) — at the cost of K*8
f32 of input per launch (negligible).

The per-pair formulas mirror ops/pairs._tile_values for the supported
configs (inter-molecular pairs only — the moved molecule's own columns
are excluded, matching the same_mol mask); energies accumulate per-term
so the caller updates EnergyBreakdown exactly like the scan path (delta
accumulation washed by the per-corrtime initialize, same contract).
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
BLOCK_UNROLL = 1   # column-block fori_loop unroll (see _kernel).
# NOTE: must stay 1 — Mosaic's scan lowering only supports unroll=1 or a
# FULL static unroll (NotImplementedError "Got unroll=2" on real TPU,
# 2026-08-18); interpret mode accepts any value, so CPU tests cannot
# catch a regression here.
MAX_SITES = 8  # supported() cap on movable-molecule size
(ROW_X, ROW_Y, ROW_Z, ROW_EPS, ROW_SIG, ROW_Q, ROW_ALIVE,
 ROW_MASS, ROW_MOLMASS) = range(9)
# disp_expansion per-atom dispersion coefficients reuse slots 8-10
# (feynman_hibbs requires rd_potential == 'lj', so ROW_MOLMASS and
# these never coexist)
ROW_C6, ROW_C8, ROW_C10 = 8, 9, 10


def _needs_molmass(cfg) -> bool:
    """FH and FK both need the molecule-mass plane for the per-pair
    reduced mass."""
    return cfg.feynman_hibbs or cfg.feynman_kleinert


def _row_gwp(cfg) -> int:
    """Row index of the GWP width plane (valid only when cfg.coulomb ==
    'gwp'): appended after whichever optional planes are active."""
    return (8 + (1 if _needs_molmass(cfg) else 0)
            + (3 if cfg.rd_potential == "disp_expansion" else 0))


def _n_rows(cfg) -> int:
    """Per-atom VMEM planes: the base 8, plus the molecule-mass plane
    Feynman-Hibbs needs for the per-pair reduced mass, and/or the three
    dispersion-coefficient planes of disp_expansion, and/or the GWP
    charge-width plane."""
    return _row_gwp(cfg) + (1 if cfg.coulomb == "gwp" else 0)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _erfc(x):
    # A&S 7.1.26 — same polynomial as pair_kernel._erfc
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return poly * jnp.exp(-x * x)


def _pair_terms(dx, dy, dz, eps_j, sig_j, q_j, ok, eps_i, sig_i, q_i,
                rc, alpha, cfg, mm_i=None, mm_j=None, beta=None,
                disp_i=None, disp_j=None, gwp_i=None, gwp_j=None):
    """Elementwise (rd, es, masked r2) of one site vs an atom block.

    Returns PER-LANE values: the kernels accumulate (8,128) vectors
    across blocks and sites and reduce ONCE per step.  The old per-tile
    ``jnp.sum`` form put hundreds of vector->scalar round-trips on the
    step's serial path, which dominated kernel time (~270 ns per
    site-tile pass measured 2026-08-17).

    Under cfg.feynman_hibbs, ``mm_i`` (moving molecule total mass,
    scalar) / ``mm_j`` (column atoms' molecule-mass plane) / ``beta``
    feed the FH quantum correction — the same LJ-derivative series as
    ops/lj.feynman_hibbs, with the molecule-pair reduced mass exactly
    like the scan path (a frozen-framework partner's huge molecule
    mass degrades red -> mm_i, the right physical limit)."""
    r2 = dx * dx + dy * dy + dz * dz
    act = ok & (r2 < rc * rc)
    r2s = jnp.where(r2 > 1e-12, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2s)
    rd = jnp.zeros_like(r2)
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
        rd_u = 4.0 * eps * s6 * (s6 - 1.0)
        if cfg.feynman_kleinert:
            # FK variational effective potential — the SAME shared
            # fixed-point formula as the scan path (ops/pairs
            # rd_tile_energy FK branch), with the molecule-pair reduced
            # mass like FH below.  Elementwise (exp/log/tanh/where), so
            # it lowers in Mosaic directly; FK takes precedence over FH
            # when both flags are set, mirroring the scan path.
            from mpmc_tpu.ops import lj as lj_ops
            red = mm_i * mm_j / jnp.maximum(mm_i + mm_j, 1e-30)
            r = r2s * inv_r
            v1, v2, v3, v4 = lj_ops.derivatives(r, eps, sig)
            rd_u = rd_u + lj_ops.feynman_kleinert_from_derivs(
                r, v1, v2, v3, v4, red, 1.0 / beta)
        elif cfg.feynman_hibbs:
            from mpmc_tpu.constants import HBAR2_KB_AMU_A2
            red = mm_i * mm_j / jnp.maximum(mm_i + mm_j, 1e-30)
            s12 = s6 * s6
            e4 = 4.0 * eps
            v1 = e4 * (6.0 * s6 - 12.0 * s12) * inv_r
            v2 = e4 * (156.0 * s12 - 42.0 * s6) * (inv_r * inv_r)
            c2 = (HBAR2_KB_AMU_A2 / 24.0) * beta / jnp.maximum(red,
                                                               1e-30)
            rd_u = rd_u + c2 * (v2 + 2.0 * v1 * inv_r)
            if cfg.feynman_hibbs_order >= 4:
                inv3 = inv_r * inv_r * inv_r
                v3 = e4 * (336.0 * s6 - 2184.0 * s12) * inv3
                v4 = e4 * (32760.0 * s12 - 3024.0 * s6) * (inv3 * inv_r)
                c4 = ((HBAR2_KB_AMU_A2 * HBAR2_KB_AMU_A2 / 1152.0)
                      * beta * beta
                      / jnp.maximum(red * red, 1e-30))
                rd_u = rd_u + c4 * (15.0 * v1 * inv3 + 4.0 * v3 * inv_r
                                    + v4)
        rd = jnp.where(act, rd_u, 0.0)
    elif cfg.rd_potential in ("disp_expansion", "sg", "dreiding",
                              "b14_7"):
        # Born-Mayer + TT-damped C6/C8/C10, Silvera-Goldman, Dreiding
        # exp-6 or buffered 14-7 — the SAME shared formula as the jnp
        # tile pass (ops/potentials.rd_pair_energy_generic is
        # gather-free and elementwise, so it lowers in Mosaic
        # directly).  Only disp_expansion reads the C6/C8/C10 planes;
        # the other three use eps/sig (sg: nothing), so zeros stand in
        # for the absent dispersion-coefficient planes.
        from mpmc_tpu.ops import potentials
        r = r2s * inv_r
        z = jnp.float32(0.0)
        d_i = disp_i if disp_i is not None else (z, z, z)
        d_j = disp_j if disp_j is not None else (z, z, z)
        rd_u = potentials.rd_pair_energy_generic(
            r, eps_i, eps_j, sig_i, sig_j, d_i[0], d_j[0],
            d_i[1], d_j[1], d_i[2], d_j[2], cfg)
        rd = jnp.where(act, rd_u, 0.0)
    es = jnp.zeros_like(r2)
    if cfg.coulomb != "none":
        qq = q_i * q_j
        r = r2s * inv_r
        if cfg.coulomb == "cutoff":
            es_u = qq * inv_r
        elif cfg.coulomb == "ewald":
            # real-space erfc sum (ops/pairs._tile_values ewald branch);
            # the k-space part is the S(k) delta in _kernel
            es_u = qq * _erfc(alpha * r) * inv_r
        elif cfg.coulomb == "gwp":
            # Gaussian-wave-packet smeared charges
            # (ops/pairs._tile_values gwp branch): erf(r/sqrt(2(s_i^2+
            # s_j^2)))/r, point charges where both widths vanish
            from mpmc_tpu.ops.pallas.pair_kernel import _erf
            s2 = gwp_i * gwp_i + gwp_j * gwp_j
            smear = jnp.where(
                s2 > 1e-12,
                _erf(r * jax.lax.rsqrt(2.0 * jnp.maximum(s2, 1e-12))),
                1.0)
            es_u = qq * smear * inv_r
        else:   # wolf (shifted)
            es_u = qq * (_erfc(alpha * r) * inv_r
                         - _erfc(alpha * rc) / rc)
        es = jnp.where(act, es_u, 0.0)
    r2m = jnp.where(ok, r2, jnp.inf)
    return rd, es, r2m


def _kernel(scal_ref, u_ref, tbl_ref, ktab_ref, rot_in_ref, data_in_ref,
            sk_in_ref, data_ref, out_ref, sk_ref, rot_ref, *,
            cfg, n_steps, n_pad, n_real, a_max, nk_pad, mv_pad,
            n_chains=1):
    # data_in_ref/sk_in_ref/rot_in_ref alias data_ref/sk_ref/rot_ref
    # (input_output_aliases) — all access goes through the output refs
    #
    # n_chains > 1 (run_steps_multi): C independent chains live in the
    # SAME launch as stacked plane groups (chain c's plane q at rows
    # [(c*NQ + q)*R, ...)) with per-chain S(k) and per-chain beta, and
    # each fori_loop step runs all C chains' Metropolis steps.  The
    # single-chain step is a serial dependency chain (pick -> window ->
    # pair pass -> reduce -> commit); C independent copies give the
    # Mosaic scheduler work to overlap into its latency, which one
    # chain cannot fill.
    del data_in_ref, sk_in_ref, rot_in_ref
    ew = cfg.coulomb == "ewald"
    sf = cfg.quantum_rotation       # in-kernel spinflip moves
    nve = cfg.ensemble == "nve"     # Ray microcanonical acceptance
    # sf IS allowed multi-chain: the rot table stacks per-chain 3-row
    # groups (chain c's rows [3c, 3c+3)).  NVE stays single-chain (the
    # kinetic reservoir k_init is one scalar lane).
    assert n_chains == 1 or not nve
    rc = scal_ref[0, 0]
    alpha = scal_ref[0, 1]
    beta0 = scal_ref[0, 2]
    mf = scal_ref[0, 3]
    n_mov = scal_ref[0, 4]          # float count of movable molecules
    thr2 = scal_ref[0, 5]           # autoreject r_min^2 (0 = off)
    rotf = scal_ref[0, 6]           # max rotation angle (rad)
    p_spin = scal_ref[0, 7]         # P(spinflip) (0 when sf off)
    k_init = scal_ref[0, 8]         # NVE kinetic reservoir K at entry
    g_nve = scal_ref[0, 9]          # NVE exponent F/2 - 1
    box = [[scal_ref[1, 3 * a + b] for b in range(3)] for a in range(3)]
    binv = [[scal_ref[2, 3 * a + b] for b in range(3)] for a in range(3)]
    # per-chain inverse temperatures (scal row 3) — PT ladders batch
    betas = ([scal_ref[3, c] for c in range(n_chains)]
             if n_chains > 1 else [beta0])

    fh = _needs_molmass(cfg)
    de = cfg.rd_potential == "disp_expansion"
    gw = cfg.coulomb == "gwp"
    # Sublane-packed planes: each per-atom quantity q is an (R, 128)
    # plane at rows [q*R, (q+1)*R) of data_ref, atom n at (n//128,
    # n%128).  Every block op then runs on full (8,128) vregs instead
    # of the old (1, TJ) row slices that used 1 of 8 sublanes.
    R = n_pad // 128
    nq = _n_rows(cfg)
    n_blk = n_pad // TJ             # 1024-atom (8-row) blocks
    Rk = nk_pad // 128
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)

    def chain_step(cc, k, carry):
        d_rd, d_es, d_rec, n_acc, acc_sp, att_sp, k_cur = carry
        co = cc * nq * R            # chain's data-plane row offset
        cs = cc * 2 * Rk            # chain's S(k) row offset
        beta = betas[cc]
        uk = cc * n_steps + k       # chain's uniform-table row
        # --- proposal ---------------------------------------------------
        # Scalar accesses load the aligned tile containing the element
        # and mask-reduce it out; the update store blends the same
        # window.  The moved molecule's rows [start, start+A) span at
        # most 2 plane rows; a 16-row 8-aligned window always covers
        # them (requires R >= 16, i.e. n_pad >= 2048 — run_steps pads).
        m = jnp.minimum((u_ref[uk, 0] * n_mov).astype(jnp.int32),
                        (n_mov - 1.0).astype(jnp.int32))
        mt0 = pl.multiple_of((m // 128) * 128, 128)
        ttile = tbl_ref[pl.dslice(0, 2), pl.dslice(mt0, 128)]  # [2,128]
        tlane = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
        trow = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0)
        tsel = tlane == (m - mt0)
        start = jnp.sum(jnp.where(tsel & (trow == 0), ttile, 0))
        n_at = jnp.sum(jnp.where(tsel & (trow == 1), ttile, 0))

        if sf:
            # spinflip move (lane 8 carve-out, mirroring
            # make_branch_picker): positions untouched, acceptance on
            # the cached rotor free-energy difference rot_f[m, 1-s] -
            # rot_f[m, s] (mc/metropolis.b_spinflip; per-corrtime
            # staleness contract identical to the scan path).  The
            # pair pass below still executes with a zeroed move — its
            # ~0 deltas are masked out of du and the accumulators, so
            # the dataflow stays branch-free.
            is_spin = u_ref[uk, 8] < p_spin
            fpair = 1.0 - is_spin.astype(jnp.float32)
            rwin = rot_ref[pl.dslice(3 * cc, 3), pl.dslice(mt0, 128)]
            rlane = jax.lax.broadcasted_iota(jnp.int32, (3, 128), 1)
            rrow = jax.lax.broadcasted_iota(jnp.int32, (3, 128), 0)
            rsel = rlane == (m - mt0)

            def rpick(r):
                return jnp.sum(jnp.where(rsel & (rrow == r), rwin, 0.0))

            f_para, f_ortho, s_cur = rpick(0), rpick(1), rpick(2)
            d_f = jnp.where(s_cur > 0.5, f_para - f_ortho,
                            f_ortho - f_para)
        else:
            is_spin = jnp.zeros((), bool)
            fpair = jnp.float32(1.0)
            d_f = jnp.float32(0.0)

        rw0 = pl.multiple_of(
            jnp.minimum((start // TJ) * 8, jnp.int32(R - 16)), 8)

        def wload(q):
            return data_ref[pl.dslice(
                pl.multiple_of(co + q * R + rw0, 8), 16), :]

        asel = [(sub16 == (start + a) // 128 - rw0)
                & (lane16 == (start + a) % 128) for a in range(a_max)]

        def wpick(win, a):
            return jnp.sum(jnp.where(asel[a], win, 0.0))

        wx, wy, wz = wload(ROW_X), wload(ROW_Y), wload(ROW_Z)
        valid = [jnp.asarray(a, jnp.int32) < n_at for a in range(a_max)]
        old = [[wpick(w, a) for w in (wx, wy, wz)]
               for a in range(a_max)]
        eps_i = [wpick(wload(ROW_EPS), a) for a in range(a_max)]
        sig_i = [wpick(wload(ROW_SIG), a) for a in range(a_max)]
        q_i = [wpick(wload(ROW_Q), a) for a in range(a_max)]
        disp_i = ([(wpick(wload(ROW_C6), a), wpick(wload(ROW_C8), a),
                    wpick(wload(ROW_C10), a)) for a in range(a_max)]
                  if de else [None] * a_max)
        gwp_i = ([wpick(wload(_row_gwp(cfg)), a) for a in range(a_max)]
                 if gw else [None] * a_max)

        disp = [(2.0 * u_ref[uk, 1 + c] - 1.0) * mf * fpair
                for c in range(3)]
        msum = None
        if a_max > 1 or fh:
            wm = wload(ROW_MASS)
            mass = [jnp.where(valid[a], wpick(wm, a), 0.0)
                    for a in range(a_max)]
            msum = sum(mass)
        if a_max == 1:
            new = [[old[0][c] + disp[c] for c in range(3)]]
        else:
            # mass-weighted COM, then translate + rotate about it
            com = [sum(mass[a] * old[a][c] for a in range(a_max))
                   / jnp.maximum(msum, 1e-30) for c in range(3)]
            # uniform axis (sphere point picking) + uniform angle
            az = 2.0 * u_ref[uk, 5] - 1.0
            aphi = 2.0 * np.float32(np.pi) * u_ref[uk, 6]
            s = jnp.sqrt(jnp.maximum(1.0 - az * az, 0.0))
            ax, ay = s * jnp.cos(aphi), s * jnp.sin(aphi)
            ang = u_ref[uk, 7] * rotf * fpair
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            omc = 1.0 - ca
            R3 = [[ca + ax * ax * omc, ax * ay * omc - az * sa,
                   ax * az * omc + ay * sa],
                  [ay * ax * omc + az * sa, ca + ay * ay * omc,
                   ay * az * omc - ax * sa],
                  [az * ax * omc - ay * sa, az * ay * omc + ax * sa,
                   ca + az * az * omc]]
            new = []
            for a in range(a_max):
                rel = [old[a][c] - com[c] for c in range(3)]
                new.append([com[c] + disp[c]
                            + sum(R3[c][d] * rel[d] for d in range(3))
                            for c in range(3)])

        # --- old+new delta pass: (8,128) vector accumulators ------------
        def col(jt, acc):
            rd_a, es_a, mr_a = acc
            r0 = pl.multiple_of(jt * 8, 8)

            def plane(q):
                return data_ref[pl.dslice(
                    pl.multiple_of(co + q * R + r0, 8), 8), :]

            px, py, pz = plane(ROW_X), plane(ROW_Y), plane(ROW_Z)
            eps_j, sig_j = plane(ROW_EPS), plane(ROW_SIG)
            q_j, alive_j = plane(ROW_Q), plane(ROW_ALIVE)
            mm_j = plane(ROW_MOLMASS) if fh else None
            disp_j = ((plane(ROW_C6), plane(ROW_C8), plane(ROW_C10))
                      if de else None)
            gwp_j = plane(_row_gwp(cfg)) if gw else None
            lin = jt * TJ + sub8 * 128 + lane8
            # inter-molecular only: the moved molecule's own rows are
            # excluded (ops/pairs._block_terms same_mol mask)
            ok = ((alive_j > 0) & (lin < n_real)
                  & ((lin < start) | (lin >= start + n_at)))

            def mimg(dx, dy, dz):
                if cfg.ortho_box:
                    # diagonal basis: drop the exact-zero cross terms
                    # (12 VPU ops vs 36 — min-image is ~half the
                    # pair-pass flops, MEASURE_STEP_SPLIT.json).
                    # BIT-identical to the general path below: the
                    # dropped terms are IEEE +/-0.0 adds (x + 0.0 == x),
                    # so the scan-path bookkeeping contract is untouched
                    # even on r^-12-amplified core pairs.  A rewrite
                    # that also skips the frac round-trip
                    # (d - L*round(d/L)) is NOT bit-safe: its ulp
                    # differences blow up ~1e7x on jammed cores.
                    fr = [d * binv[a][a]
                          for a, d in enumerate((dx, dy, dz))]
                    fr = [f - jnp.round(f) for f in fr]
                    return [fr[a] * box[a][a] for a in range(3)]
                fr = [dx * binv[0][a] + dy * binv[1][a] + dz * binv[2][a]
                      for a in range(3)]
                fr = [f - jnp.round(f) for f in fr]
                return [fr[0] * box[0][b] + fr[1] * box[1][b]
                        + fr[2] * box[2][b] for b in range(3)]

            for a in range(a_max):
                ok_a = ok & valid[a] if a_max > 1 else ok
                do = mimg(old[a][0] - px, old[a][1] - py, old[a][2] - pz)
                dn = mimg(new[a][0] - px, new[a][1] - py, new[a][2] - pz)
                r_o, e_o, _ = _pair_terms(
                    do[0], do[1], do[2], eps_j, sig_j, q_j, ok_a,
                    eps_i[a], sig_i[a], q_i[a], rc, alpha, cfg,
                    mm_i=msum, mm_j=mm_j, beta=beta,
                    disp_i=disp_i[a], disp_j=disp_j,
                    gwp_i=gwp_i[a], gwp_j=gwp_j)
                r_n, e_n, m2 = _pair_terms(
                    dn[0], dn[1], dn[2], eps_j, sig_j, q_j, ok_a,
                    eps_i[a], sig_i[a], q_i[a], rc, alpha, cfg,
                    mm_i=msum, mm_j=mm_j, beta=beta,
                    disp_i=disp_i[a], disp_j=disp_j,
                    gwp_i=gwp_i[a], gwp_j=gwp_j)
                rd_a = rd_a + (r_n - r_o)
                es_a = es_a + (e_n - e_o)
                mr_a = jnp.minimum(mr_a, m2)
            return (rd_a, es_a, mr_a)

        zb = jnp.zeros((8, 128), jnp.float32)
        # unroll must stay 1 (see BLOCK_UNROLL note): Mosaic rejects
        # partial unrolls on real TPU even though interpret mode
        # accepts them
        rd_a, es_a, mr_a = jax.lax.fori_loop(
            0, n_blk, col, (zb, zb, jnp.full((8, 128), jnp.inf,
                                             jnp.float32)),
            unroll=BLOCK_UNROLL)
        drd = jnp.sum(rd_a)
        des = KE * jnp.sum(es_a)
        mr2 = jnp.min(mr_a)

        # --- k-space S(k) delta (ewald only; mirrors mc.metropolis.
        # _mol_sf_delta + _recip_delta): dS = sum_a q_a (cis(k.r_new_a)
        # - cis(k.r_old_a)); dE = sum_k c_k (|S+dS|^2 - |S|^2) with
        # c_k = KE (2 pi / V) pw_k exp(-k^2/4a^2)/k^2 folded in on the
        # host.  Padded k lanes have c=0 and k=0 (so dS there is 0 by
        # cos(0)-cos(0)).  Self/intra-exclusion terms are rigid-move
        # invariant and stay constant (module docstring).  The k table
        # and S(k) are (Rk,128) planes like the atom data.
        if ew:
            kx = ktab_ref[pl.dslice(0, Rk), :]
            ky = ktab_ref[pl.dslice(Rk, Rk), :]
            kz = ktab_ref[pl.dslice(2 * Rk, Rk), :]
            kc = ktab_ref[pl.dslice(3 * Rk, Rk), :]
            dsr = jnp.zeros((Rk, 128), jnp.float32)
            dsi = jnp.zeros((Rk, 128), jnp.float32)
            for a in range(a_max):
                qa = (jnp.where(valid[a], q_i[a], 0.0)
                      if a_max > 1 else q_i[a])
                to = kx * old[a][0] + ky * old[a][1] + kz * old[a][2]
                tn = kx * new[a][0] + ky * new[a][1] + kz * new[a][2]
                dsr = dsr + qa * (jnp.cos(tn) - jnp.cos(to))
                dsi = dsi + qa * (jnp.sin(tn) - jnp.sin(to))
            sx = sk_ref[pl.dslice(cs, 2 * Rk), :]
            sr, si = sx[0:Rk], sx[Rk:2 * Rk]
            drec = jnp.sum(kc * ((2.0 * sr + dsr) * dsr
                                 + (2.0 * si + dsi) * dsi))
        else:
            drec = jnp.zeros((), jnp.float32)

        du = drd + des + drec
        if sf:
            # spinflip: the zeroed move's ~0 pair deltas are replaced
            # by the rotor free-energy difference, and the overlap
            # autoreject does not apply (no positions change)
            du = jnp.where(is_spin, d_f, du)
        reject_overlap = (thr2 > 0.0) & (mr2 < thr2)
        if sf:
            reject_overlap = reject_overlap & ~is_spin
        if nve:
            # Ray's microcanonical rule (mc/metropolis.step nve
            # branch): P = min(1, (K_new/K_old)**(F/2-1)) with the
            # kinetic reservoir K_new = K_old - dU > 0, carried across
            # the chunk's steps and re-derived from the energy totals
            # at every chunk entry
            k_new = k_cur - du
            ln_acc = g_nve * (jnp.log(jnp.maximum(k_new, 1e-30))
                              - jnp.log(jnp.maximum(k_cur, 1e-30)))
            accept = ((k_new > 0.0) & (k_cur > 0.0)
                      & (jnp.log(jnp.maximum(u_ref[uk, 4], 1e-38))
                         < ln_acc) & ~reject_overlap)
            k_cur = jnp.where(accept, k_new, k_cur)
        else:
            accept = ((jnp.log(jnp.maximum(u_ref[uk, 4], 1e-38))
                       < -beta * du) & ~reject_overlap)
        acc_pair = accept & ~is_spin if sf else accept

        # unconditional blended stores: storing the (possibly
        # unchanged) window every step avoids a per-step pl.when
        # region; measured marginally faster than the conditional form
        # (2026-08-17) and keeps the dataflow branch-free
        for q, w in ((ROW_X, wx), (ROW_Y, wy), (ROW_Z, wz)):
            for a in range(a_max):
                va = valid[a] if a_max > 1 else True
                w = jnp.where(asel[a] & va & acc_pair, new[a][q], w)
            data_ref[pl.dslice(pl.multiple_of(co + q * R + rw0, 8),
                               16), :] = w

        if ew:
            accf = acc_pair.astype(jnp.float32)
            sk_ref[pl.dslice(cs, 2 * Rk), :] = jnp.concatenate(
                [sr + accf * dsr, si + accf * dsi], axis=0)

        if sf:
            # commit the flip into this chain's spin row
            srow = rot_ref[pl.dslice(3 * cc + 2, 1), :]
            slane = jax.lax.broadcasted_iota(jnp.int32, (1, mv_pad), 1)
            srow = jnp.where((slane == m) & accept & is_spin,
                             1.0 - srow, srow)
            rot_ref[pl.dslice(3 * cc + 2, 1), :] = srow
            fsp = is_spin.astype(jnp.float32)
            acc_sp = acc_sp + accept.astype(jnp.float32) * fsp
            att_sp = att_sp + fsp

        af = acc_pair.astype(jnp.float32)
        # where, NOT af-multiply: a rejected trial's pair energy can be
        # inf (deep-core overlap overflows the f32 LJ/dispersion sums)
        # and 0 * inf = NaN would poison the chunk accumulators; the
        # select yields an exact 0 on reject.  An ACCEPTED step cannot
        # carry inf — inf du always rejects.
        zf = jnp.float32(0.0)
        return (d_rd + jnp.where(acc_pair, drd, zf),
                d_es + jnp.where(acc_pair, des, zf),
                d_rec + jnp.where(acc_pair, drec, zf),
                n_acc + af, acc_sp, att_sp, k_cur)

    def step(k, carry):
        # all chains' steps per iteration — independent dataflow the
        # scheduler can interleave (n_chains == 1: the original body)
        return tuple(chain_step(cc, k, carry[cc])
                     for cc in range(n_chains))

    z = jnp.zeros((), jnp.float32)
    outs = jax.lax.fori_loop(0, n_steps, step,
                             ((z, z, z, z, z, z, k_init),) * n_chains)
    for cc in range(n_chains):
        for i in range(6):
            out_ref[cc, i] = outs[cc][i]
    # non-ewald: sk_ref is aliased to its (dummy) input and stays as-is


def _pack_ktab(kvecs, kcoef, cfg):
    """Shared k-table packing for every wrapper: ((4*Rk,128) ktab
    planes, nk, nk_pad, padk) — padk pads a [<=nk] vector to nk_pad
    (None outside ewald; callers build their own S(k) stacks with
    it so single- and multi-chain layouts stay bit-identical)."""
    f32 = jnp.float32
    if cfg.coulomb == "ewald":
        nk = kvecs.shape[0]
        nk_pad = _round_up(nk, 128)

        def padk(x):
            x = jnp.asarray(x).astype(f32)
            return jnp.pad(x, (0, nk_pad - x.shape[0]))

        ktab = jnp.stack([padk(kvecs[:, 0]), padk(kvecs[:, 1]),
                          padk(kvecs[:, 2]), padk(kcoef)])
    else:
        nk = nk_pad = 128
        padk = None
        ktab = jnp.zeros((4, nk_pad), f32)
    return ktab.reshape(4 * (nk_pad // 128), 128), nk, nk_pad, padk


def _pack_param_planes(eps, sig, charge, mass, cfg, n_pad,
                       mol_mass_atom=None, c6=None, c8=None, c10=None,
                       gwp_alpha=None):
    """Shared per-atom parameter planes for every wrapper: (nq,
    [nq, n_pad] planes with the position/alive rows left zero, pad1).
    One packer keeps the four run_steps* layouts bit-identical — the
    multi==single bit-exactness tests depend on that."""
    f32 = jnp.float32

    def pad1(x, fill=0.0):
        x = jnp.asarray(x).astype(f32)
        return jnp.pad(x, (0, n_pad - x.shape[0]), constant_values=fill)

    nq = _n_rows(cfg)
    base = jnp.zeros((nq, n_pad), f32)
    base = base.at[ROW_EPS].set(pad1(eps))
    base = base.at[ROW_SIG].set(pad1(sig))
    base = base.at[ROW_Q].set(pad1(charge))
    base = base.at[ROW_MASS].set(pad1(mass))
    if _needs_molmass(cfg):
        base = base.at[ROW_MOLMASS].set(pad1(mol_mass_atom))
    if cfg.rd_potential == "disp_expansion":
        base = base.at[ROW_C6].set(pad1(c6))
        base = base.at[ROW_C8].set(pad1(c8))
        base = base.at[ROW_C10].set(pad1(c10))
    if cfg.coulomb == "gwp":
        base = base.at[_row_gwp(cfg)].set(pad1(gwp_alpha))
    return nq, base, pad1


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_steps", "n_real", "a_max",
                                    "interpret"))
def run_steps(pos, eps, sig, charge, mass, alive, mov_start, mov_natoms,
              box, rc, alpha, beta, move_factor, rot_factor, thr2,
              uniforms, cfg, n_steps, n_real, a_max=1, interpret=False,
              kvecs=None, kcoef=None, sk_re=None, sk_im=None,
              rot_f=None, spin=None, p_spin=0.0, mol_mass_atom=None,
              c6=None, c8=None, c10=None, gwp_alpha=None,
              nve_k0=0.0, nve_g=0.0):
    """K fused translate+rotate (+spinflip) steps.  Returns (new_pos
    [N,3], d_rd, d_es, d_recip, n_accept_displace, sk_re', sk_im',
    spin' [Mv] f32, n_accept_spinflip, n_attempt_spinflip).
    ``mov_start``/``mov_natoms``: [Mv] first atom row and atom count of
    each movable molecule; ``uniforms``: [K, 8] from draw_uniforms
    ([K, >=9] under cfg.quantum_rotation — lane 8 is the spinflip
    carve-out); ``a_max``: static max movable-molecule size.  For
    cfg.coulomb == 'ewald' pass ``kvecs`` [Nk,3], ``kcoef`` [Nk] (the
    fully-folded per-k energy coefficient
    KE*(2pi/V)*pw*exp(-k^2/4a^2)/k^2) and the cached structure factor
    ``sk_re``/``sk_im`` [Nk]; the updated S(k) comes back in outputs
    5-6 (pass-through otherwise).  For cfg.quantum_rotation pass
    ``rot_f`` [Mv,2] (F_para, F_ortho per movable molecule), ``spin``
    [Mv] (0/1) and the scalar spinflip probability ``p_spin``
    (mc/metropolis.b_spinflip semantics, per-corrtime rot_f staleness
    contract)."""
    f32 = jnp.float32
    # n_pad >= 2048 so the kernel's 16-row molecule windows fit (R>=16)
    n_pad = max(2 * TJ, _round_up(n_real, TJ))
    R = n_pad // 128
    ew = cfg.coulomb == "ewald"
    ktab, nk, nk_pad, padk = _pack_ktab(kvecs, kcoef, cfg)
    Rk = nk_pad // 128
    sk = (jnp.stack([padk(sk_re), padk(sk_im)]) if ew
          else jnp.zeros((2, nk_pad), f32)).reshape(2 * Rk, 128)

    nq, data, pad1 = _pack_param_planes(
        eps, sig, charge, mass, cfg, n_pad, mol_mass_atom=mol_mass_atom,
        c6=c6, c8=c8, c10=c10, gwp_alpha=gwp_alpha)
    data = data.at[ROW_X, :n_real].set(pos[:, 0].astype(f32))
    data = data.at[ROW_Y, :n_real].set(pos[:, 1].astype(f32))
    data = data.at[ROW_Z, :n_real].set(pos[:, 2].astype(f32))
    data = data.at[ROW_ALIVE].set(pad1(alive.astype(f32)))
    # sublane-packed planes: quantity q rows [q*R,(q+1)*R), atom n at
    # (n//128, n%128) — see _kernel
    data = data.reshape(nq * R, 128)

    mv = jnp.asarray(mov_start, jnp.int32)
    na = jnp.asarray(mov_natoms, jnp.int32)
    mv_pad = _round_up(max(mv.shape[0], 1), 128)
    tbl = jnp.stack([jnp.pad(mv, (0, mv_pad - mv.shape[0])),
                     jnp.pad(na, (0, mv_pad - na.shape[0]))])
    if cfg.quantum_rotation:
        pad_mv = mv_pad - mv.shape[0]
        rot = jnp.stack([
            jnp.pad(jnp.asarray(rot_f[:, 0], f32), (0, pad_mv)),
            jnp.pad(jnp.asarray(rot_f[:, 1], f32), (0, pad_mv)),
            jnp.pad(jnp.asarray(spin, f32), (0, pad_mv))])
    else:
        rot = jnp.zeros((3, mv_pad), f32)

    box32 = jnp.asarray(box, f32)
    binv = jnp.linalg.inv(box32)
    scal = jnp.zeros((3, 16), f32)
    scal = scal.at[0, 0].set(jnp.asarray(rc, f32))
    scal = scal.at[0, 1].set(jnp.asarray(alpha, f32))
    scal = scal.at[0, 2].set(jnp.asarray(beta, f32))
    scal = scal.at[0, 3].set(jnp.asarray(move_factor, f32))
    scal = scal.at[0, 4].set(jnp.asarray(mv.shape[0], f32))
    scal = scal.at[0, 5].set(jnp.asarray(thr2, f32))
    scal = scal.at[0, 6].set(jnp.asarray(rot_factor, f32))
    scal = scal.at[0, 7].set(jnp.asarray(p_spin, f32))
    scal = scal.at[0, 8].set(jnp.asarray(nve_k0, f32))
    scal = scal.at[0, 9].set(jnp.asarray(nve_g, f32))
    scal = scal.at[1, :9].set(box32.reshape(-1))
    scal = scal.at[2, :9].set(binv.reshape(-1))

    u = jnp.asarray(uniforms, f32)

    out_data, out_sums, out_sk, out_rot = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, n_steps=n_steps,
                          n_pad=n_pad, n_real=n_real, a_max=a_max,
                          nk_pad=nk_pad, mv_pad=mv_pad),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((3, 16), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(uniforms.shape, lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, mv_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mv_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq * R, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nq * R, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mv_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq * R, 128), f32),
            jax.ShapeDtypeStruct((1, 8), f32),
            jax.ShapeDtypeStruct((2 * Rk, 128), f32),
            jax.ShapeDtypeStruct((3, mv_pad), f32),
        ],
        input_output_aliases={5: 0, 6: 2, 4: 3},
        interpret=interpret,
    )(scal, u, tbl, ktab, rot, data, sk)
    planes = out_data.reshape(nq, n_pad)
    new_pos = jnp.stack([planes[ROW_X, :n_real],
                         planes[ROW_Y, :n_real],
                         planes[ROW_Z, :n_real]], axis=1)
    out_sk2 = out_sk.reshape(2, nk_pad)
    return (new_pos.astype(pos.dtype), out_sums[0, 0], out_sums[0, 1],
            out_sums[0, 2], out_sums[0, 3],
            out_sk2[0, :nk], out_sk2[1, :nk],
            out_rot[2, :mv.shape[0]], out_sums[0, 4], out_sums[0, 5])


MAX_MULTI_CHAINS = 48   # per-chain scal lane budget (betas / cavity).
                        # The multi pallas_calls raise vmem_limit_bytes
                        # above Mosaic's default cap; 2026-08-18 µVT
                        # C-scan on the 10.8k system: 16 -> 210k,
                        # 24 -> 223k, 32 -> 236k, 48 -> 246k agg
                        # steps/s, C=64 crashes the TPU compile helper


def multi_width_ok(n_chains: int, params) -> bool:
    """Proven compile envelope for the chain-interleaved kernels: a
    Mosaic failure at too-large C x N is a hard error, not a graceful
    fallback, so drivers gate on measured-good points — C<=24 works up
    to the 53.7k-atom system (C=32 crashed the compile helper there,
    MEASURE_LARGE_C.json); C<=48 is proven at ~11k atoms (C=56 is a
    hard VMEM OOM, C=64 crashed the compile helper).  Conservative
    interpolation between the proven points: chain-atoms <= 48 *
    16384."""
    n = int(params.n_atoms_max)
    return (n_chains <= 16
            or (n_chains <= 24 and n <= 53728)
            or n_chains * n <= 48 * 16384)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_steps", "n_real", "a_max",
                                    "interpret"))
def run_steps_multi(pos, eps, sig, charge, mass, alive, mov_start,
                    mov_natoms, box, rc, alpha, betas, move_factor,
                    rot_factor, thr2, uniforms, cfg, n_steps, n_real,
                    a_max=1, interpret=False, kvecs=None, kcoef=None,
                    sk_re=None, sk_im=None, rot_f=None, spin=None,
                    p_spin=0.0, mol_mass_atom=None,
                    c6=None, c8=None, c10=None, gwp_alpha=None):
    """C chains x K fused NVT steps in ONE launch (chain-interleaved
    _kernel; see its n_chains note).  ``pos`` [C,N,3], ``betas`` [C]
    per-chain 1/T (PT ladders batch), ``uniforms`` [C*K, lanes] (chain
    c's step k at row c*K + k — each chain's trajectory is bit-equal to
    a run_steps call with its own [K, lanes] table), ``sk_re``/
    ``sk_im`` [C, Nk] under ewald.  Params/box/movable tables are
    shared across chains (same system, same aliveness — the NVT
    contract).  For cfg.quantum_rotation pass ``rot_f`` [C,Mv,2],
    ``spin`` [C,Mv] and the shared scalar ``p_spin`` (the move-type
    probabilities are ladder-shared, run_steps semantics otherwise) —
    each chain's 3-row rot group is per-chain kernel state.  Returns
    (new_pos [C,N,3], sums [C,6] = (d_rd, d_es, d_rec, n_acc_disp,
    n_acc_spinflip, n_att_spinflip) per chain, sk_re' [C,Nk], sk_im',
    spin' [C,Mv] f32)."""
    f32 = jnp.float32
    C = pos.shape[0]
    assert C <= MAX_MULTI_CHAINS
    n_pad = max(2 * TJ, _round_up(n_real, TJ))
    R = n_pad // 128
    ew = cfg.coulomb == "ewald"
    ktab, nk, nk_pad, padk = _pack_ktab(kvecs, kcoef, cfg)
    Rk = nk_pad // 128
    sk = (jnp.concatenate([jnp.stack([padk(sk_re[c]), padk(sk_im[c])])
                           for c in range(C)]) if ew
          else jnp.zeros((C * 2, nk_pad), f32)).reshape(
        C * 2 * Rk, 128)

    nq, base, pad1 = _pack_param_planes(
        eps, sig, charge, mass, cfg, n_pad, mol_mass_atom=mol_mass_atom,
        c6=c6, c8=c8, c10=c10, gwp_alpha=gwp_alpha)
    base = base.at[ROW_ALIVE].set(pad1(alive.astype(f32)))
    datas = []
    for c in range(C):
        d = base.at[ROW_X, :n_real].set(pos[c, :, 0].astype(f32))
        d = d.at[ROW_Y, :n_real].set(pos[c, :, 1].astype(f32))
        d = d.at[ROW_Z, :n_real].set(pos[c, :, 2].astype(f32))
        datas.append(d.reshape(nq * R, 128))
    data = jnp.concatenate(datas)

    mv = jnp.asarray(mov_start, jnp.int32)
    na = jnp.asarray(mov_natoms, jnp.int32)
    mv_pad = _round_up(max(mv.shape[0], 1), 128)
    tbl = jnp.stack([jnp.pad(mv, (0, mv_pad - mv.shape[0])),
                     jnp.pad(na, (0, mv_pad - na.shape[0]))])
    if cfg.quantum_rotation:
        pad_mv = mv_pad - mv.shape[0]
        rot = jnp.concatenate([jnp.stack([
            jnp.pad(jnp.asarray(rot_f[c, :, 0], f32), (0, pad_mv)),
            jnp.pad(jnp.asarray(rot_f[c, :, 1], f32), (0, pad_mv)),
            jnp.pad(jnp.asarray(spin[c], f32), (0, pad_mv))])
            for c in range(C)])
    else:
        rot = jnp.zeros((3 * C, mv_pad), f32)

    box32 = jnp.asarray(box, f32)
    binv = jnp.linalg.inv(box32)
    betas32 = jnp.asarray(betas, f32).reshape(C)
    SL = max(16, MAX_MULTI_CHAINS)   # scal lane width (>= C betas)
    scal = jnp.zeros((4, SL), f32)
    # slot 2 must carry chain 0's beta: the kernel's n_chains == 1 path
    # reads THIS slot (a zero here would sample at beta = 0)
    for i, v in enumerate((rc, alpha, betas32[0], move_factor,
                           mv.shape[0], thr2, rot_factor, p_spin)):
        scal = scal.at[0, i].set(jnp.asarray(v, f32))
    scal = scal.at[1, :9].set(box32.reshape(-1))
    scal = scal.at[2, :9].set(binv.reshape(-1))
    scal = scal.at[3, :C].set(betas32)

    u = jnp.asarray(uniforms, f32)

    out_data, out_sums, out_sk, out_rot = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, n_steps=n_steps,
                          n_pad=n_pad, n_real=n_real, a_max=a_max,
                          nk_pad=nk_pad, mv_pad=mv_pad, n_chains=C),
        grid=(1,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        in_specs=[
            pl.BlockSpec((4, SL), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(uniforms.shape, lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, mv_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C, mv_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C * nq * R, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C * 2 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C * nq * R, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 8), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((C * 2 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C, mv_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C * nq * R, 128), f32),
            jax.ShapeDtypeStruct((C, 8), f32),
            jax.ShapeDtypeStruct((C * 2 * Rk, 128), f32),
            jax.ShapeDtypeStruct((3 * C, mv_pad), f32),
        ],
        input_output_aliases={5: 0, 6: 2, 4: 3},
        interpret=interpret,
    )(scal, u, tbl, ktab, rot, data, sk)
    planes = out_data.reshape(C, nq, n_pad)
    new_pos = jnp.stack([planes[:, ROW_X, :n_real],
                         planes[:, ROW_Y, :n_real],
                         planes[:, ROW_Z, :n_real]], axis=2)
    out_sk2 = out_sk.reshape(C, 2, nk_pad)
    spin_out = out_rot.reshape(C, 3, mv_pad)[:, 2, :mv.shape[0]]
    return (new_pos.astype(pos.dtype), out_sums[:, :6],
            out_sk2[:, 0, :nk], out_sk2[:, 1, :nk], spin_out)


def _kernel_uvt(scal_ref, u_ref, ktab_ref, cav_ref, eta_ref, tbl_in_ref,
                data_in_ref, sk_in_ref, rot_in_ref, cull_ref, data_ref,
                out_ref, sk_ref, tbl_ref, rot_ref, tm_ref, *, cfg,
                n_steps, n_pad, n_real, A_list, nk_pad, ms_pad, g3_pad,
                tm_pad, n_chains=1, use_cull=False):
    """Fused µVT (GCMC) step loop: displace | insert | delete per step.

    Differences from the NVT ``_kernel``: the movable-slot table carries
    a DYNAMIC alive row (committed in-kernel on insert/delete accept);
    the j-th alive/dead slot is selected by a prefix-sum rank computed
    as a triangular-matrix matmul (Mosaic has no cumsum primitive); all
    three move branches share ONE old+new column pass via has_old/
    has_new masks (insert masks the old pass, delete the new pass); and
    the rigid-molecule self/intra-exclusion/LRC constants enter the
    acceptance as host-precomputed scalars, exactly like the scan
    path's b_insert/b_delete (mc/metropolis.py).

    Multi-sorbate (``A_list`` = per-species site counts, S = len):
    insert and delete draw the species FIRST (uniform over S, lane 9),
    then pick a slot of that species — the 1/S proposal factor cancels
    between insert and its reverse delete, so the acceptance uses only
    the per-species ln(f_s V) and N_s exactly like the scan path's
    species-first b_insert/b_delete (detailed balance; see
    test_multisorbate_ideal_gas_partial_loadings).  Displacement picks
    uniformly over ALL alive movable slots.  Per-species constants
    (site count, template, self/exclusion energies, ln fV, LRC c1 and
    the S x S cross matrix c_x) are selected from SMEM by the picked
    slot's species; the LRC delta for species s at per-species counts
    N_s' is  insert: (c1[s] + sum_s' c_x[s,s'] N_s');
    delete: -(c1[s] + sum_s' c_x[s,s'] N_s' - c_x[s,s]).

    Cavity bias (``cfg.cavity_bias``): insert proposes the COM inside a
    uniformly-picked OPEN grid cell (lane 10 picks rank j among the
    n_open cells of the per-chunk open-cell id list in ``cav_ref``;
    lanes 1-3 become the in-cell fractional position), and the
    acceptance gains +ln(n_open/G^3) on insert / -ln(n_open/G^3) on
    delete — exactly the scan path's cav_bias correction
    (mc/metropolis.b_insert/b_delete; SURVEY.md §2 "Cavity bias").
    The open-cell grid refreshes per corrtime (initialize), the same
    staleness contract as the scan path.

    Spinflip (``cfg.quantum_rotation``): lane 11 carves the move out
    BEFORE the insert/delete/displace split, mirroring the scan path's
    outer spinflip draw (mc/metropolis.make_branch_picker).  The picked
    slot comes from the displace pool (all alive movables); the pair
    pass and S(k) delta run fully masked (has_old = has_new = False),
    du is replaced by the cached rotor free-energy difference read off
    the per-chain 3-row rot group (f_para/f_ortho/spin in SLOT lanes),
    and an accept only flips the spin row — positions, aliveness and
    every energy accumulator stay untouched, exactly like the scan
    path's b_spinflip (denergy = 0, bias-only acceptance).

    TMMC (``cfg.tmmc``, single insert species by the parse-time gate):
    every insert/delete attempt adds (1, a) to the per-macrostate
    collection rows at N = pre-move alive count, where a is the
    UNBIASED acceptance probability min(1, exp(lnb − βΔU)) (0 on a
    hard reject) — the scan path's conditional-mean estimator
    (mc/metropolis.make_step_fn).  The accumulators live in ``tm_ref``
    ([n_chains·4·Rt, 128] rank-major planes: per chain the 4 groups
    n_ins / Σa_ins / n_del / Σa_del of Rt rows each, macrostate N at
    plane offset N), zeroed at kernel start so each chunk returns its
    own deltas (the driver accumulates into state.tmmc_c and the run
    loop host-flushes in f64).  Under ``cfg.tmmc_bias`` the acceptance
    (NOT the collection) adds η(N') − η(N) read from the ``eta_ref``
    plane — bias moves the walker, never the estimator.

    Data layout is the same sublane-packed (R,128)-plane scheme as the
    NVT ``_kernel`` (full-vreg block math, 16-row molecule windows,
    vector energy accumulators reduced once per step)."""
    del tbl_in_ref, data_in_ref, sk_in_ref, rot_in_ref
    ew = cfg.coulomb == "ewald"
    cb = cfg.cavity_bias
    tm = cfg.tmmc                   # in-kernel TMMC collection
    # bias requires collection: the parse gate forces tmmc on with
    # tmmc_bias, but a direct-API cfg(tmmc=False, tmmc_bias=True) must
    # not reach the η branch (it reads the tm-only macrostate n_int)
    tm_bias = cfg.tmmc_bias and tm
    Rt = tm_pad // 128
    sf = cfg.quantum_rotation       # in-kernel spinflip moves
    # cavity bias under n_chains > 1: the open-cell grid is per-chain
    # state (each chain's positions close different cells), so cav_ref
    # stacks C [Rg,128] planes and cav_n/cav_lnf live in per-chain SMEM
    # lanes (rows 8+4S / 8+4S+1), read inside chain_step
    fh = _needs_molmass(cfg)
    de = cfg.rd_potential == "disp_expansion"
    gw = cfg.coulomb == "gwp"
    S = len(A_list)
    A = max(A_list)                 # unrolled site loop bound
    uniform_A = len(set(A_list)) == 1
    rc = scal_ref[0, 0]
    alpha = scal_ref[0, 1]
    beta = scal_ref[0, 2]
    mf = scal_ref[0, 3]
    thr2 = scal_ref[0, 4]
    rotf = scal_ref[0, 5]
    p_half = scal_ref[0, 6]         # 0.5 * insert_probability
    p_ins = scal_ref[0, 7]          # insert_probability
    p_spin = scal_ref[0, 8]         # P(spinflip) (0 when sf off)
    box = [[scal_ref[1, 3 * a + b] for b in range(3)] for a in range(3)]
    binv = [[scal_ref[2, 3 * a + b] for b in range(3)] for a in range(3)]
    # per-species SMEM tables (rows 3-7 + S cx rows + 3S template rows)
    natoms_s = [scal_ref[3, s] for s in range(S)]
    lnfv_s = [scal_ref[4, s] for s in range(S)]
    d_self_s = [scal_ref[5, s] for s in range(S)]
    d_excl_s = [scal_ref[6, s] for s in range(S)]
    c1_s = [scal_ref[7, s] for s in range(S)]
    cx = [[scal_ref[8 + s, t] for t in range(S)] for s in range(S)]
    tmpl_s = [[[scal_ref[8 + S + 3 * s + c, a] for c in range(3)]
               for a in range(A)] for s in range(S)]

    R = n_pad // 128
    nq = _n_rows(cfg)
    n_blk = n_pad // TJ
    Rk = nk_pad // 128
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    two_pi = np.float32(2.0 * np.pi)

    def sp_sel(spf, table):
        """Select a per-species scalar by the (float) species id."""
        if S == 1:
            return table[0]
        out = table[0]
        for s in range(1, S):
            out = jnp.where(spf == np.float32(s), table[s], out)
        return out

    def chain_step(cc, k, carry):
        (d_rd, d_es, d_rec, d_slf, d_exc, d_lrc,
         acc_d, acc_i, acc_x, att_d, att_i, att_x,
         acc_s, att_s) = carry
        co = cc * nq * R            # chain's data-plane row offset
        cs = cc * 2 * Rk            # chain's S(k) row offset
        ct = cc * 4                 # chain's slot-table row offset
        uk = cc * n_steps + k       # chain's uniform-table row
        # per-chain cavity-bias scalars (1.0 / 0.0 when bias off)
        cav_n = scal_ref[8 + 4 * S, cc]
        cav_lnf = scal_ref[8 + 4 * S + 1, cc]
        # per-chain beta (µVT PT ladders): the multi builder appends a
        # betas row; the single-chain builder's scal has no such row, so
        # gate on n_chains (all in-step uses — acceptance, the µVT
        # ln(beta f V / (N+1)) weight — read this local)
        if n_chains > 1:
            beta = scal_ref[8 + 4 * S + 2, cc]
        else:
            beta = scal_ref[0, 2]
        # per-chain ln(f_s V) (fixed-T fugacity-ladder PT): the multi
        # builder ALWAYS appends S per-chain lnfv rows after the betas
        # row; shared-fugacity callers broadcast one row into every
        # lane, so reading the per-chain lane is bit-identical to the
        # shared row-4 table the single-chain kernel keeps using
        if n_chains > 1:
            lnfv_s_c = [scal_ref[8 + 4 * S + 3 + s, cc]
                        for s in range(S)]
        else:
            lnfv_s_c = lnfv_s
        # --- move type + species + slot pick -----------------------------
        u8 = u_ref[uk, 8]
        if sf:
            # outer spinflip carve (lane 11) before the base pick —
            # make_branch_picker semantics
            is_spin = u_ref[uk, 11] < p_spin
        else:
            is_spin = jnp.zeros((), bool)
        is_ins = (u8 < p_half) & ~is_spin
        is_del = (u8 >= p_half) & (u8 < p_ins) & ~is_spin
        is_disp = (u8 >= p_ins) & ~is_spin
        fins = is_ins.astype(jnp.float32)
        fdel = is_del.astype(jnp.float32)

        tb = tbl_ref[pl.dslice(ct, 4), pl.dslice(0, ms_pad)]  # [4,ms]
        spec_v = tb[1:2]
        alive_v = tb[2:3]
        valid_v = tb[3:4]
        if S == 1:
            n_vec = [jnp.sum(alive_v)]
            n_alive = n_vec[0]
            n_free = jnp.sum(valid_v) - n_alive
            wv = jnp.where(is_ins, valid_v - alive_v, alive_v)
            cnt = jnp.where(is_ins, n_free, n_alive)
            n_s = n_alive
            suf = np.float32(0.0)
        else:
            # species-first pick (uniform over S) for insert/delete
            su = jnp.minimum((u_ref[uk, 9] * np.float32(S)).astype(
                jnp.int32), S - 1)
            suf = su.astype(jnp.float32)
            sel_sp = (spec_v == suf).astype(jnp.float32)      # [1, ms]
            n_vec = [jnp.sum(alive_v
                             * (spec_v == np.float32(s)).astype(
                                 jnp.float32)) for s in range(S)]
            n_s = sp_sel(suf, n_vec)                # alive of species su
            free_s = jnp.sum((valid_v - alive_v) * sel_sp)
            wv = jnp.where(is_ins, (valid_v - alive_v) * sel_sp,
                           jnp.where(is_del, alive_v * sel_sp, alive_v))
            cnt = jnp.where(is_ins, free_s,
                            jnp.where(is_del, n_s, sum(n_vec)))
        j = jnp.minimum(jnp.floor(u_ref[uk, 0] * cnt), cnt - 1.0)
        # inclusive prefix sum as [1,ms] @ upper-tri ones (MXU)
        ir = jax.lax.broadcasted_iota(jnp.int32, (ms_pad, ms_pad), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (ms_pad, ms_pad), 1)
        tri = (ir <= ic).astype(jnp.float32)
        rank = jnp.dot(wv, tri, preferred_element_type=jnp.float32)
        sel_slot = (wv > 0) & (rank == j + 1.0)               # [1, ms]
        start = jnp.sum(jnp.where(sel_slot, tb[0:1], 0.0)).astype(
            jnp.int32)
        # picked slot's species: = su for insert/delete; for displace
        # read it off the slot table
        if S == 1:
            spf = suf
            na_i = jnp.int32(A)
        else:
            sp_disp = jnp.sum(jnp.where(sel_slot, spec_v, 0.0))
            spf = jnp.where(is_disp | is_spin, sp_disp, suf)
            na = sp_sel(spf, natoms_s)
            na_i = na.astype(jnp.int32)
        # per-site validity (species may have fewer than A sites)
        if uniform_A:
            valid = [True] * A
        else:
            valid = [jnp.asarray(a, jnp.int32) < na_i for a in range(A)]

        # --- load the slot's rows (16-row aligned plane windows) ---------
        rw0 = pl.multiple_of(
            jnp.minimum((start // TJ) * 8, jnp.int32(R - 16)), 8)

        def wload(q):
            return data_ref[pl.dslice(
                pl.multiple_of(co + q * R + rw0, 8), 16), :]

        asel = [(sub16 == (start + a) // 128 - rw0)
                & (lane16 == (start + a) % 128) for a in range(A)]

        def wpick(win, a):
            return jnp.sum(jnp.where(asel[a], win, 0.0))

        wx, wy, wz = wload(ROW_X), wload(ROW_Y), wload(ROW_Z)
        wal = wload(ROW_ALIVE)
        old = [[wpick(w, a) for w in (wx, wy, wz)] for a in range(A)]
        eps_i = [wpick(wload(ROW_EPS), a) for a in range(A)]
        sig_i = [wpick(wload(ROW_SIG), a) for a in range(A)]
        q_i = [wpick(wload(ROW_Q), a) for a in range(A)]
        disp_i = ([(wpick(wload(ROW_C6), a), wpick(wload(ROW_C8), a),
                    wpick(wload(ROW_C10), a)) for a in range(A)]
                  if de else [None] * A)
        gwp_i = ([wpick(wload(_row_gwp(cfg)), a) for a in range(A)]
                 if gw else [None] * A)
        # selected species' template rows (COM-centered)
        tmpl = [[sp_sel(spf, [tmpl_s[s][a][c] for s in range(S)])
                 for c in range(3)] for a in range(A)]

        # --- trial rows: displace (translate+rotate) or insert (template
        # at uniform fractional COM + uniform Shoemake orientation,
        # mirroring mc/moves.place_rows) ----------------------------------
        disp = [(2.0 * u_ref[uk, 1 + c] - 1.0) * mf for c in range(3)]
        if cb:
            # cavity-biased insert COM: pick rank j among the n_open
            # open cells (lane 10), read the cell id off the [Rg,128]
            # open-cell list plane, then place uniformly IN that cell
            # (lanes 1-3) — mirrors moves.pick_random_true + cell_com
            g = np.float32(cfg.cavity_grid)
            Rg = g3_pad // 128
            jc = jnp.minimum(jnp.floor(u_ref[uk, 10] * cav_n),
                             cav_n - 1.0)
            ling = (jax.lax.broadcasted_iota(jnp.int32, (Rg, 128), 0)
                    * 128
                    + jax.lax.broadcasted_iota(jnp.int32, (Rg, 128), 1)
                    ).astype(jnp.float32)
            cell = jnp.sum(jnp.where(
                ling == jc, cav_ref[pl.dslice(cc * Rg, Rg), :], 0.0))
            ci = jnp.floor(cell / (g * g))
            rem = cell - ci * g * g
            cj = jnp.floor(rem / g)
            ck = rem - cj * g
            fr_ins = [(ci + u_ref[uk, 1]) / g, (cj + u_ref[uk, 2]) / g,
                      (ck + u_ref[uk, 3]) / g]
        else:
            fr_ins = [u_ref[uk, 1], u_ref[uk, 2], u_ref[uk, 3]]
        com_new = [fr_ins[0] * box[0][c] + fr_ins[1] * box[1][c]
                   + fr_ins[2] * box[2][c] for c in range(3)]
        msum = None
        if A > 1 or fh:
            wm = wload(ROW_MASS)
            mass = [wpick(wm, a) if uniform_A
                    else jnp.where(valid[a], wpick(wm, a), 0.0)
                    for a in range(A)]
            msum = sum(mass)
        if A == 1:
            new = [[jnp.where(is_ins, com_new[c], old[0][c] + disp[c])
                    for c in range(3)]]
        else:
            com = [sum(mass[a] * old[a][c] for a in range(A))
                   / jnp.maximum(msum, 1e-30) for c in range(3)]
            # displace rotation: uniform axis + uniform angle in [0,rotf)
            az = 2.0 * u_ref[uk, 5] - 1.0
            aphi = two_pi * u_ref[uk, 6]
            s = jnp.sqrt(jnp.maximum(1.0 - az * az, 0.0))
            ax, ay = s * jnp.cos(aphi), s * jnp.sin(aphi)
            ang = u_ref[uk, 7] * rotf
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            omc = 1.0 - ca
            Rd = [[ca + ax * ax * omc, ax * ay * omc - az * sa,
                   ax * az * omc + ay * sa],
                  [ay * ax * omc + az * sa, ca + ay * ay * omc,
                   ay * az * omc - ax * sa],
                  [az * ax * omc - ay * sa, az * ay * omc + ax * sa,
                   ca + az * az * omc]]
            # insert rotation: uniform quaternion (Shoemake) from the
            # same three lanes
            sq1 = jnp.sqrt(jnp.maximum(1.0 - u_ref[uk, 5], 0.0))
            sq2 = jnp.sqrt(jnp.maximum(u_ref[uk, 5], 0.0))
            th1, th2 = two_pi * u_ref[uk, 6], two_pi * u_ref[uk, 7]
            qx, qy = sq1 * jnp.sin(th1), sq1 * jnp.cos(th1)
            qz, qw = sq2 * jnp.sin(th2), sq2 * jnp.cos(th2)
            Ri = [[1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
                   2 * (qx * qz + qy * qw)],
                  [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
                   2 * (qy * qz - qx * qw)],
                  [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
                   1 - 2 * (qx * qx + qy * qy)]]
            Rm = [[jnp.where(is_ins, Ri[c][d], Rd[c][d])
                   for d in range(3)] for c in range(3)]
            t = [jnp.where(is_ins, com_new[c], com[c] + disp[c])
                 for c in range(3)]
            new = []
            for a in range(A):
                rel = [jnp.where(is_ins, tmpl[a][d], old[a][d] - com[d])
                       for d in range(3)]
                new.append([t[c] + sum(Rm[c][d] * rel[d]
                                       for d in range(3))
                            for c in range(3)])

        # --- one old+new column pass for all three branches --------------
        # (spinflip masks BOTH passes: no pair or S(k) deltas)
        has_old = ~is_ins & ~is_spin
        has_new = ~is_del & ~is_spin

        if use_cull:
            # per-step AABB of the molecule's old+new rows (column-tile
            # culling, r6): a column block whose static AABB sits >= rc
            # from every moved row under min-image contributes only
            # cutoff-masked zeros to the pair pass and can be skipped
            # whole.  Old rows ride in even on inserts (stale slot
            # coordinates are somewhere in the box — conservative).
            big = np.float32(1e30)
            rcen, rhw = [], []
            for c in range(3):
                los, his = [], []
                for a in range(A):
                    lo_a = jnp.minimum(old[a][c], new[a][c])
                    hi_a = jnp.maximum(old[a][c], new[a][c])
                    if not uniform_A:
                        lo_a = jnp.where(valid[a], lo_a, big)
                        hi_a = jnp.where(valid[a], hi_a, -big)
                    los.append(lo_a)
                    his.append(hi_a)
                lo = functools.reduce(jnp.minimum, los)
                hi = functools.reduce(jnp.maximum, his)
                rcen.append(0.5 * (lo + hi))
                rhw.append(0.5 * (hi - lo))

        if sf:
            # cached rotor free-energy difference at the picked slot
            # (per-chain 3-row rot group, slot lanes)
            ro = 3 * cc

            def rpick(r):
                return jnp.sum(jnp.where(
                    sel_slot, rot_ref[pl.dslice(ro + r, 1), :], 0.0))

            f_para, f_ortho, s_cur = rpick(0), rpick(1), rpick(2)
            d_f = jnp.where(s_cur > 0.5, f_para - f_ortho,
                            f_ortho - f_para)

        def col_loads(jt):
            # plane loads + masks stay OUTSIDE the cull branch so
            # Mosaic can keep prefetching/pipelining them across the
            # block loop; only the transcendental-heavy pair compute
            # is conditional (measured: branching the loads too cost
            # 20-37% — MEASURE_MC_CULL variant 1)
            r0 = pl.multiple_of(jt * 8, 8)

            def plane(q):
                return data_ref[pl.dslice(
                    pl.multiple_of(co + q * R + r0, 8), 8), :]

            px, py, pz = plane(ROW_X), plane(ROW_Y), plane(ROW_Z)
            eps_j, sig_j = plane(ROW_EPS), plane(ROW_SIG)
            q_j, alive_j = plane(ROW_Q), plane(ROW_ALIVE)
            mm_j = plane(ROW_MOLMASS) if fh else None
            disp_j = ((plane(ROW_C6), plane(ROW_C8), plane(ROW_C10))
                      if de else None)
            gwp_j = plane(_row_gwp(cfg)) if gw else None
            lin = jt * TJ + sub8 * 128 + lane8
            ok = ((alive_j > 0) & (lin < n_real)
                  & ((lin < start) | (lin >= start + na_i)))
            return (px, py, pz, eps_j, sig_j, q_j, mm_j, disp_j,
                    gwp_j, ok)

        def col_compute(loaded, acc):
            (px, py, pz, eps_j, sig_j, q_j, mm_j, disp_j, gwp_j,
             ok) = loaded
            rd_a, es_a, mr_a = acc

            def mimg(dx, dy, dz):
                if cfg.ortho_box:
                    # diagonal basis: drop the exact-zero cross terms —
                    # BIT-identical to the general path (see the NVT
                    # kernel's mimg)
                    fr = [d * binv[a][a]
                          for a, d in enumerate((dx, dy, dz))]
                    fr = [f - jnp.round(f) for f in fr]
                    return [fr[a] * box[a][a] for a in range(3)]
                fr = [dx * binv[0][a] + dy * binv[1][a]
                      + dz * binv[2][a] for a in range(3)]
                fr = [f - jnp.round(f) for f in fr]
                return [fr[0] * box[0][b] + fr[1] * box[1][b]
                        + fr[2] * box[2][b] for b in range(3)]

            for a in range(A):
                ok_a = ok if uniform_A else ok & valid[a]
                do = mimg(old[a][0] - px, old[a][1] - py,
                          old[a][2] - pz)
                dn = mimg(new[a][0] - px, new[a][1] - py,
                          new[a][2] - pz)
                r_o, e_o, _ = _pair_terms(
                    do[0], do[1], do[2], eps_j, sig_j, q_j,
                    ok_a & has_old, eps_i[a], sig_i[a], q_i[a], rc,
                    alpha, cfg, mm_i=msum, mm_j=mm_j, beta=beta,
                    disp_i=disp_i[a], disp_j=disp_j,
                    gwp_i=gwp_i[a], gwp_j=gwp_j)
                r_n, e_n, m2 = _pair_terms(
                    dn[0], dn[1], dn[2], eps_j, sig_j, q_j,
                    ok_a & has_new, eps_i[a], sig_i[a], q_i[a], rc,
                    alpha, cfg, mm_i=msum, mm_j=mm_j, beta=beta,
                    disp_i=disp_i[a], disp_j=disp_j,
                    gwp_i=gwp_i[a], gwp_j=gwp_j)
                rd_a = rd_a + (r_n - r_o)
                es_a = es_a + (e_n - e_o)
                mr_a = jnp.minimum(mr_a, m2)
            return (rd_a, es_a, mr_a)

        def col_body(jt, acc):
            return col_compute(col_loads(jt), acc)

        if use_cull:
            def col(jt, acc):
                # conservative min-image AABB gap: skip iff the block
                # is flagged static (no movable-slot rows) AND its
                # bounding box sits >= rc from the molecule's rows.
                # Skipped blocks' pairs are all cutoff-masked zeros
                # (and their r2 >= rc^2 can never win the autoreject
                # minimum, gated thr < rc at setup) — bit-identical.
                loaded = col_loads(jt)
                g2 = np.float32(0.0)
                for c in range(3):
                    bmin = cull_ref[jt, c]
                    bmax = cull_ref[jt, 3 + c]
                    c2 = 0.5 * (bmin + bmax)
                    h2 = 0.5 * (bmax - bmin)
                    dc = rcen[c] - c2
                    dc = dc - box[c][c] * jnp.round(dc / box[c][c])
                    g = jnp.maximum(jnp.abs(dc) - rhw[c] - h2, 0.0)
                    g2 = g2 + g * g
                skip = (cull_ref[jt, 6] > 0.0) & (g2 >= rc * rc)
                return jax.lax.cond(skip, lambda a: a,
                                    lambda a: col_compute(loaded, a),
                                    acc)
        else:
            col = col_body

        zb = jnp.zeros((8, 128), jnp.float32)
        # unroll must stay 1 (see BLOCK_UNROLL note): Mosaic rejects
        # partial unrolls on real TPU even though interpret mode
        # accepts them
        rd_a, es_a, mr_a = jax.lax.fori_loop(
            0, n_blk, col, (zb, zb, jnp.full((8, 128), jnp.inf,
                                             jnp.float32)),
            unroll=BLOCK_UNROLL)
        drd = jnp.sum(rd_a)
        des = KE * jnp.sum(es_a)
        mr2 = jnp.min(mr_a)

        # --- k-space S(k) delta (masked like the pair pass) --------------
        if ew:
            fo = has_old.astype(jnp.float32)
            fn = has_new.astype(jnp.float32)
            kx = ktab_ref[pl.dslice(0, Rk), :]
            ky = ktab_ref[pl.dslice(Rk, Rk), :]
            kz = ktab_ref[pl.dslice(2 * Rk, Rk), :]
            kc = ktab_ref[pl.dslice(3 * Rk, Rk), :]
            dsr = jnp.zeros((Rk, 128), jnp.float32)
            dsi = jnp.zeros((Rk, 128), jnp.float32)
            for a in range(A):
                qa = (q_i[a] if uniform_A
                      else jnp.where(valid[a], q_i[a], 0.0))
                to = kx * old[a][0] + ky * old[a][1] + kz * old[a][2]
                tn = kx * new[a][0] + ky * new[a][1] + kz * new[a][2]
                dsr = dsr + qa * (fn * jnp.cos(tn)
                                  - fo * jnp.cos(to))
                dsi = dsi + qa * (fn * jnp.sin(tn)
                                  - fo * jnp.sin(to))
            sx = sk_ref[pl.dslice(cs, 2 * Rk), :]
            sr, si = sx[0:Rk], sx[Rk:2 * Rk]
            drec = jnp.sum(kc * ((2.0 * sr + dsr) * dsr
                                 + (2.0 * si + dsi) * dsi))
        else:
            drec = jnp.zeros((), jnp.float32)

        # --- per-molecule constants + acceptance -------------------------
        sgn = fins - fdel
        dslf = sgn * sp_sel(spf, d_self_s)
        dexc = sgn * sp_sel(spf, d_excl_s)
        c1 = sp_sel(spf, c1_s)
        if S == 1:
            c2 = cx[0][0]
            dlrc = (fins * (c1 + c2 * n_s)
                    - fdel * (c1 + c2 * (n_s - 1.0)))
        else:
            cx_dot = sp_sel(spf, [sum(cx[s][t] * n_vec[t]
                                      for t in range(S))
                                  for s in range(S)])
            cx_self = sp_sel(spf, [cx[s][s] for s in range(S)])
            dlrc = (fins * (c1 + cx_dot)
                    - fdel * (c1 + cx_dot - cx_self))
        du = drd + des + drec + dslf + dexc + dlrc
        if sf:
            # spinflip: every pair/LRC/self delta above is 0 by the
            # has_old/has_new masks and sgn = 0; the move's only energy
            # is the rotor free-energy difference
            du = jnp.where(is_spin, d_f, du)
        lnfv = sp_sel(spf, lnfv_s_c)
        lnb = (fins * (lnfv + jnp.log(beta)
                       - jnp.log(n_s + 1.0))
               + fdel * (jnp.log(jnp.maximum(n_s, 1e-30))
                         - jnp.log(beta) - lnfv))
        if cb:
            # +ln f on insert (proposal density 1/(n_open v_cell) vs
            # 1/V), -ln f on the reverse of a delete (scan-path
            # cav_bias); n_open == 0 hard-rejects inserts
            lnb = lnb + sgn * cav_lnf
        reject = ((cnt < 0.5) | ((thr2 > 0.0) & has_new
                                 & (mr2 < thr2)))
        if cb:
            reject = reject | (is_ins & (cav_n < 0.5))
        ln_t = lnb - beta * du          # unbiased log-acceptance
        if tm:
            n_int = n_s.astype(jnp.int32)   # pre-move macrostate
        if tm_bias:
            # flat-histogram walker bias η(N') − η(N) (scan path's
            # thermo.tmmc_eta term); η is a per-chunk constant plane
            lin_t = (jax.lax.broadcasted_iota(jnp.int32, (Rt, 128), 0)
                     * 128
                     + jax.lax.broadcasted_iota(jnp.int32, (Rt, 128), 1))
            eta_pl = eta_ref[pl.dslice(0, Rt), :]
            eta_cur = jnp.sum(jnp.where(lin_t == n_int, eta_pl, 0.0))
            n_to = jnp.clip(n_int + is_ins.astype(jnp.int32)
                            - is_del.astype(jnp.int32), 0, tm_pad - 1)
            eta_to = jnp.sum(jnp.where(lin_t == n_to, eta_pl, 0.0))
            ln_eff = ln_t + (eta_to - eta_cur)
        else:
            ln_eff = ln_t
        accept = ((jnp.log(jnp.maximum(u_ref[uk, 4], 1e-38))
                   < ln_eff) & ~reject)
        if tm:
            # TMMC collection: one blended RMW of this chain's 4-group
            # block; displace/spinflip steps add exact zeros (fins =
            # fdel = 0).  a is the UNBIASED probability (kernel
            # docstring); exp(-inf) underflows cleanly to 0 on the
            # deep-core rejects that make du = inf
            a_pr = jnp.where(reject, np.float32(0.0),
                             jnp.exp(jnp.minimum(ln_t, 0.0)))
            r4 = jax.lax.broadcasted_iota(jnp.int32, (4 * Rt, 128), 0)
            grp = r4 // Rt
            lin4 = ((r4 % Rt) * 128
                    + jax.lax.broadcasted_iota(jnp.int32,
                                               (4 * Rt, 128), 1))
            incv = jnp.where(grp == 0, fins,
                             jnp.where(grp == 1, fins * a_pr,
                                       jnp.where(grp == 2, fdel,
                                                 fdel * a_pr)))
            blk = tm_ref[pl.dslice(cc * 4 * Rt, 4 * Rt), :]
            tm_ref[pl.dslice(cc * 4 * Rt, 4 * Rt), :] = blk + jnp.where(
                lin4 == n_int, incv, 0.0)
        # spinflip accepts touch ONLY the spin row — never positions,
        # aliveness, the slot table, or the energy accumulators
        acc_pos = accept & ~is_spin if sf else accept

        # unconditional blended stores (see the NVT kernel note)
        alive_val = 1.0 - fdel
        wins = [wx, wy, wz]
        for ci, q in enumerate((ROW_X, ROW_Y, ROW_Z)):
            w = wins[ci]
            for a in range(A):
                sel = (asel[a] if uniform_A
                       else asel[a] & valid[a])
                w = jnp.where(sel & ~is_del & acc_pos, new[a][ci], w)
            data_ref[pl.dslice(pl.multiple_of(co + q * R + rw0, 8),
                               16), :] = w
        w = wal
        for a in range(A):
            sel = (asel[a] if uniform_A
                   else asel[a] & valid[a])
            w = jnp.where(sel & acc_pos, alive_val, w)
        data_ref[pl.dslice(
            pl.multiple_of(co + ROW_ALIVE * R + rw0, 8), 16), :] = w
        # slot-table alive flag (no-op for displace)
        row2 = jnp.where(sel_slot & acc_pos, 1.0 - fdel, alive_v)
        tbl_ref[pl.dslice(ct + 2, 1), pl.dslice(0, ms_pad)] = row2

        if ew:
            accf = acc_pos.astype(jnp.float32)
            sk_ref[pl.dslice(cs, 2 * Rk), :] = jnp.concatenate(
                [sr + accf * dsr, si + accf * dsi], axis=0)

        if sf:
            # commit the flip into this chain's spin row
            srow = rot_ref[pl.dslice(ro + 2, 1), :]
            srow = jnp.where(sel_slot & accept & is_spin,
                             1.0 - srow, srow)
            rot_ref[pl.dslice(ro + 2, 1), :] = srow

        af = acc_pos.astype(jnp.float32)
        fdsp = is_disp.astype(jnp.float32)
        fsp = is_spin.astype(jnp.float32)
        afs = accept.astype(jnp.float32)
        # where, NOT af-multiply, for the energy deltas: a rejected
        # trial's pair energy can be inf (deep-core overlap overflows
        # the f32 LJ/dispersion sums — a uniform-position µVT insert
        # WILL eventually land inside a core) and 0 * inf = NaN would
        # poison the chunk accumulators; the select yields an exact 0
        # on reject, and an accepted step cannot carry inf.
        zf = jnp.float32(0.0)
        sel = lambda v: jnp.where(accept, v, zf)
        return (d_rd + sel(drd), d_es + sel(des), d_rec + sel(drec),
                d_slf + sel(dslf), d_exc + sel(dexc),
                d_lrc + sel(dlrc),
                acc_d + af * fdsp, acc_i + af * fins, acc_x + af * fdel,
                att_d + fdsp, att_i + fins, att_x + fdel,
                acc_s + afs * fsp, att_s + fsp)

    def step(k, carry):
        # all chains' steps per iteration (see the NVT _kernel note)
        return tuple(chain_step(cc, k, carry[cc])
                     for cc in range(n_chains))

    # the collection output starts from zero every chunk (pallas output
    # buffers are uninitialized; the driver owns the running total)
    tm_rows = n_chains * 4 * Rt if tm else 1
    tm_ref[pl.dslice(0, tm_rows), :] = jnp.zeros((tm_rows, 128),
                                                 jnp.float32)
    z = jnp.zeros((), jnp.float32)
    outs = jax.lax.fori_loop(0, n_steps, step,
                             (((z,) * 14),) * n_chains)
    for cc in range(n_chains):
        for i in range(14):
            out_ref[cc, i] = outs[cc][i]




def _pack_cav(cav_open, cfg):
    """Open-cell plane + scalars for one chain: ([Rg,128] rank->cell-id
    list, n_open, ln(n_open/G^3), g3_pad).  (1.0 / 0.0 dummies when
    cavity bias is off.)"""
    f32 = jnp.float32
    if not cfg.cavity_bias:
        return (jnp.zeros((1, 128), f32), jnp.asarray(1.0, f32),
                jnp.asarray(0.0, f32), 128)
    g3 = cav_open.shape[0]
    g3_pad = _round_up(g3, 128)
    m32 = cav_open.astype(jnp.int32)
    cav_n = jnp.sum(m32).astype(f32)
    cav_lnf = (jnp.log(jnp.maximum(cav_n, 1e-30))
               - jnp.log(jnp.asarray(float(g3), f32)))
    # dense rank->cell-id list: open cell of rank r scatters its id
    # to row r (2-D scatter, closed cells dropped out of bounds)
    rank = jnp.cumsum(m32) - 1
    tgt = jnp.where(cav_open, rank, g3_pad)
    lst = jnp.zeros((g3_pad, 1), f32).at[tgt].set(
        jnp.arange(g3, dtype=f32)[:, None], mode="drop")
    return lst.reshape(g3_pad // 128, 128), cav_n, cav_lnf, g3_pad


def _pack_tmmc(tmmc_eta, ms, cfg):
    """(η bias plane [Rt,128], tm_pad) for the in-kernel TMMC support:
    macrostates 0..ms (one insert species — the parse gate), η padded
    with its last resolved value semantics already applied by
    analyze.tmmc_eta (zeros = no bias / bias not yet resolved).
    ([1,128] zero dummy when tmmc is off.)"""
    f32 = jnp.float32
    if not cfg.tmmc:
        return jnp.zeros((1, 128), f32), 128
    tm_pad = _round_up(ms + 1, 128)
    if tmmc_eta is None:
        eta = jnp.zeros((tm_pad,), f32)
    else:
        e = jnp.asarray(tmmc_eta, f32)
        K = e.shape[0]
        eta = (e[:tm_pad] if K >= tm_pad
               else jnp.pad(e, (0, tm_pad - K), mode="edge"))
    return eta.reshape(tm_pad // 128, 128), tm_pad


def cull_gate(cfg) -> bool:
    """Static gate for in-kernel column-tile culling (r6): the fused
    µVT pair pass skips whole 1024-atom column blocks whose static
    AABB is provably >= rc from the moved molecule's rows under
    min-image (cull table from _pack_cull; per-step row AABB in
    _kernel_uvt).  Exact: skipped pairs are already cutoff-masked
    zeros, and the gate requires the autoreject radius below the
    cutoff so the skipped r2 >= rc^2 values can never win the
    autoreject minimum.  Requires an orthorhombic box (axis-aligned
    AABB bound); ``mc_cull auto`` (default) engages only with an
    explicit cutoff (the profitable regime), ``on`` forces derived
    rc = L/2 too, ``off`` disables."""
    mode = cfg.mc_cull
    if mode == "off" or not cfg.ortho_box:
        return False
    if cfg.cutoff is None:
        return mode == "on"
    return cfg.cavity_autoreject_absolute < cfg.cutoff


def _pack_cull(pos0, slot_start, slot_species, A_list, n_pad, n_real):
    """[blk_pad,16] column-block cull table: cols 0-2 AABB min, 3-5
    AABB max, 6 static flag (1 = no movable-slot row intersects the
    block, so its AABB is launch-invariant — frozen atoms never move
    inside a launch; movable/padding-containing blocks get flag 0 and
    are always visited).  Built from chain-0 positions: flagged blocks
    hold only frozen rows, identical across chains forever."""
    f32 = jnp.float32
    n_blk = n_pad // TJ
    blk_pad = max(8, _round_up(n_blk, 8))
    pb = jnp.pad(pos0.astype(f32), ((0, n_pad - pos0.shape[0]), (0, 0)))
    blk = pb.reshape(n_blk, TJ, 3)
    bmin, bmax = blk.min(1), blk.max(1)
    na_slot = jnp.zeros(slot_start.shape, f32)
    for si, a in enumerate(A_list):
        na_slot = jnp.where(
            jnp.asarray(slot_species, f32) == np.float32(si),
            np.float32(a), na_slot)
    lo = jnp.asarray(slot_start, f32)[None, :]
    hi = lo + na_slot[None, :]
    b0 = (jnp.arange(n_blk, dtype=f32) * np.float32(TJ))[:, None]
    inter = (lo < b0 + np.float32(TJ)) & (hi > b0)
    flag = ~jnp.any(inter, axis=1)
    # 128 lanes (only 7 used): a 16-lane VMEM operand nudged Mosaic
    # into lane-padding the [C*K,16] uniforms table to 128 lanes too
    # (8x -> 128 MB at C=32), blowing VMEM; a native-width table costs
    # 28 KB and leaves the uniforms layout alone
    tab = jnp.zeros((blk_pad, 128), f32)
    tab = tab.at[:n_blk, 0:3].set(bmin)
    tab = tab.at[:n_blk, 3:6].set(bmax)
    tab = tab.at[:n_blk, 6].set(flag.astype(f32))
    return tab, blk_pad


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_steps", "n_real", "A_list",
                                    "interpret"))
def run_steps_uvt(pos, eps, sig, charge, mass, alive, slot_start,
                  slot_species, slot_alive, tmpl, box, rc, alpha, beta,
                  move_factor, rot_factor, thr2, p_ins, lnfv, d_self,
                  d_excl, c1, cx, uniforms, cfg, n_steps, n_real, A_list,
                  interpret=False, kvecs=None, kcoef=None, sk_re=None,
                  sk_im=None, cav_open=None, rot_f=None, spin=None,
                  p_spin=0.0, mol_mass_atom=None,
                  c6=None, c8=None, c10=None, gwp_alpha=None,
                  tmmc_eta=None):
    """K fused µVT steps (displace | insert | delete | spinflip).
    Returns (new_pos [N,3], new_slot_alive [Ms] bool, sums [14],
    sk_re', sk_im', spin' [Ms] f32, d_tmmc) where sums = (d_rd,
    d_es_real, d_es_recip, d_es_self, d_es_excl, d_lrc, acc_disp,
    acc_ins, acc_del, att_disp, att_ins, att_del, acc_spin, att_spin)
    and d_tmmc is the chunk's [tm_pad, 4] collection-matrix DELTA under
    cfg.tmmc (None otherwise; kernel docstring).  ``tmmc_eta``: [K']
    flat-histogram bias table for cfg.tmmc_bias (None = zero bias).
    ``slot_start``/``slot_species``/``slot_alive``: [Ms]
    first atom row, insert-species index (0..S-1) and alive flag of
    EVERY movable slot; ``A_list``: static per-species site counts
    (S = len); ``tmpl``: [S, max(A_list), 3] COM-centered species
    templates; ``uniforms``: [K,16] from draw_uniforms(lanes=16);
    per-species [S] arrays ``lnfv`` (ln of fugacity*V in K/A^3 units),
    ``d_self``/``d_excl`` (per-molecule Ewald self and intra-exclusion
    energies), ``c1`` and [S,S] ``cx`` (LRC delta coefficients:
    d_lrc(insert species s at per-species counts N_t) =
    c1[s] + sum_t cx[s,t]*N_t).  For cfg.cavity_bias pass ``cav_open``
    ([G^3] bool open-cell mask, frozen for the chunk): inserts then
    propose inside open cells with the matching ln(n_open/G^3)
    acceptance correction (kernel docstring).  For
    cfg.quantum_rotation pass ``rot_f`` [Ms,2] (F_para, F_ortho in
    SLOT order), ``spin`` [Ms] and the scalar ``p_spin`` — inserted
    molecules keep their slot's stale spin/rot_f rows until the next
    per-corrtime refresh, the scan path's b_spinflip contract."""
    f32 = jnp.float32
    S = len(A_list)
    A = max(A_list)
    cav, cav_n, cav_lnf, g3_pad = _pack_cav(cav_open, cfg)
    eta, tm_pad = _pack_tmmc(tmmc_eta, slot_start.shape[0], cfg)
    # n_pad >= 2048 so the kernel's 16-row molecule windows fit (R>=16)
    n_pad = max(2 * TJ, _round_up(n_real, TJ))
    R = n_pad // 128
    ew = cfg.coulomb == "ewald"
    ktab, nk, nk_pad, padk = _pack_ktab(kvecs, kcoef, cfg)
    Rk = nk_pad // 128
    sk = (jnp.stack([padk(sk_re), padk(sk_im)]) if ew
          else jnp.zeros((2, nk_pad), f32)).reshape(2 * Rk, 128)

    nq, data, pad1 = _pack_param_planes(
        eps, sig, charge, mass, cfg, n_pad, mol_mass_atom=mol_mass_atom,
        c6=c6, c8=c8, c10=c10, gwp_alpha=gwp_alpha)
    data = data.at[ROW_X, :n_real].set(pos[:, 0].astype(f32))
    data = data.at[ROW_Y, :n_real].set(pos[:, 1].astype(f32))
    data = data.at[ROW_Z, :n_real].set(pos[:, 2].astype(f32))
    data = data.at[ROW_ALIVE].set(pad1(alive.astype(f32)))
    # sublane-packed planes: quantity q rows [q*R,(q+1)*R), atom n at
    # (n//128, n%128) — see _kernel
    data = data.reshape(nq * R, 128)

    ms = slot_start.shape[0]
    ms_pad = _round_up(max(ms, 1), 128)

    def padm(x, fill=0.0):
        x = jnp.asarray(x).astype(f32)
        return jnp.pad(x, (0, ms_pad - x.shape[0]), constant_values=fill)

    tbl = jnp.stack([padm(slot_start),
                     padm(slot_species, fill=-1.0),
                     padm(slot_alive.astype(f32)),
                     padm(jnp.ones((ms,), f32))])
    if cfg.quantum_rotation:
        rot = jnp.stack([padm(rot_f[:, 0]), padm(rot_f[:, 1]),
                         padm(spin)])
    else:
        rot = jnp.zeros((3, ms_pad), f32)

    box32 = jnp.asarray(box, f32)
    binv = jnp.linalg.inv(box32)
    n_rows = 8 + 4 * S + 2      # + per-chain cav_n / cav_lnf rows
    scal = jnp.zeros((n_rows, 16), f32)
    for i, v in enumerate((rc, alpha, beta, move_factor, thr2,
                           rot_factor, 0.5 * p_ins, p_ins, p_spin)):
        scal = scal.at[0, i].set(jnp.asarray(v, f32))
    scal = scal.at[1, :9].set(box32.reshape(-1))
    scal = scal.at[2, :9].set(binv.reshape(-1))
    scal = scal.at[3, :S].set(jnp.asarray(A_list, f32))
    scal = scal.at[4, :S].set(jnp.asarray(lnfv, f32).reshape(S))
    scal = scal.at[5, :S].set(jnp.asarray(d_self, f32).reshape(S))
    scal = scal.at[6, :S].set(jnp.asarray(d_excl, f32).reshape(S))
    scal = scal.at[7, :S].set(jnp.asarray(c1, f32).reshape(S))
    scal = scal.at[8:8 + S, :S].set(jnp.asarray(cx, f32).reshape(S, S))
    tmpl32 = jnp.asarray(tmpl, f32).reshape(S, A, 3)
    for s in range(S):
        scal = scal.at[8 + S + 3 * s:8 + S + 3 * s + 3, :A].set(
            tmpl32[s].T)
    scal = scal.at[8 + 4 * S, 0].set(cav_n)
    scal = scal.at[8 + 4 * S + 1, 0].set(cav_lnf)

    u = jnp.asarray(uniforms, f32)

    use_cull = cull_gate(cfg)
    if use_cull:
        culltab, blk_pad = _pack_cull(pos, slot_start, slot_species,
                                      A_list, n_pad, n_real)
    else:
        culltab, blk_pad = jnp.zeros((8, 128), f32), 8

    tm_rows = 4 * (tm_pad // 128) if cfg.tmmc else 1
    (out_data, out_sums, out_sk, out_tbl, out_rot,
     out_tm) = pl.pallas_call(
        functools.partial(_kernel_uvt, cfg=cfg, n_steps=n_steps,
                          n_pad=n_pad, n_real=n_real, A_list=A_list,
                          nk_pad=nk_pad, ms_pad=ms_pad, g3_pad=g3_pad,
                          tm_pad=tm_pad, use_cull=use_cull),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_rows, 16), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_steps, 16), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g3_pad // 128, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm_pad // 128, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, ms_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq * R, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ms_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_pad, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nq * R, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, ms_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ms_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm_rows, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq * R, 128), f32),
            jax.ShapeDtypeStruct((1, 16), f32),
            jax.ShapeDtypeStruct((2 * Rk, 128), f32),
            jax.ShapeDtypeStruct((4, ms_pad), f32),
            jax.ShapeDtypeStruct((3, ms_pad), f32),
            jax.ShapeDtypeStruct((tm_rows, 128), f32),
        ],
        input_output_aliases={6: 0, 7: 2, 5: 3, 8: 4},
        interpret=interpret,
    )(scal, u, ktab, cav, eta, tbl, data, sk, rot, culltab)
    planes = out_data.reshape(nq, n_pad)
    new_pos = jnp.stack([planes[ROW_X, :n_real],
                         planes[ROW_Y, :n_real],
                         planes[ROW_Z, :n_real]], axis=1)
    out_sk2 = out_sk.reshape(2, nk_pad)
    d_tm = (out_tm.reshape(4, tm_pad).T if cfg.tmmc else None)
    return (new_pos.astype(pos.dtype), out_tbl[2, :ms] > 0.5,
            out_sums[0, :14], out_sk2[0, :nk], out_sk2[1, :nk],
            out_rot[2, :ms], d_tm)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_steps", "n_real", "A_list",
                                    "interpret"))
def run_steps_uvt_multi(pos, eps, sig, charge, mass, alive, slot_start,
                        slot_species, slot_alive, tmpl, box, rc, alpha,
                        beta, move_factor, rot_factor, thr2, p_ins, lnfv,
                        d_self, d_excl, c1, cx, uniforms, cfg, n_steps,
                        n_real, A_list, interpret=False, kvecs=None,
                        kcoef=None, sk_re=None, sk_im=None,
                        cav_open=None, rot_f=None, spin=None,
                        p_spin=0.0, mol_mass_atom=None, c6=None,
                        c8=None, c10=None, gwp_alpha=None, betas=None,
                        lnfvs=None, tmmc_eta=None):
    """C chains x K fused µVT steps in ONE launch (chain-interleaved
    _kernel_uvt).  Per-chain state: ``pos`` [C,N,3], ``alive`` [C,N],
    ``slot_alive`` [C,Ms], ``sk_re``/``sk_im`` [C,Nk]; everything else
    (params, box, thermo-derived scalars and per-species constants) is
    shared.  ``betas`` [C] (optional) gives each chain its own 1/T —
    the µVT PT ladder path: beta enters only the acceptance and the
    ln(beta f V/(N+1)) insert weight, never the per-species constants
    (fugacity is per-species, shared; FH/FK are excluded by the fused
    gate, so pair energies are T-independent).  ``lnfvs`` [C, S]
    (optional) gives each chain its own per-species ln(f_s V) table —
    the fixed-T fugacity-ladder PT path (pt_fugacity): fugacity enters
    ONLY the insert/delete acceptance, never the pair energies or the
    d_self/d_excl/c1/cx constants, so per-chain rungs share everything
    else.  Cavity bias IS supported:
    ``cav_open`` [C, G^3] carries each chain's open-cell mask
    (per-chain planes + per-chain n_open/ln-correction SMEM lanes).
    Each chain's trajectory is bit-equal to a run_steps_uvt call with
    its own [K,16] uniform block (chain c's step k at row c*K + k).
    For cfg.quantum_rotation pass ``rot_f`` [C,Ms,2], ``spin`` [C,Ms]
    and the shared scalar ``p_spin`` (per-chain 3-row rot groups, slot
    order).  Returns (new_pos [C,N,3], new_slot_alive [C,Ms] bool,
    sums [C,14], sk_re' [C,Nk], sk_im', spin' [C,Ms] f32, d_tmmc
    [C, tm_pad, 4] per-chain collection deltas under cfg.tmmc — the
    η bias table (``tmmc_eta``) is SHARED across chains, matching the
    chains driver's chain-summed bias rebuild)."""
    f32 = jnp.float32
    C = pos.shape[0]
    assert C <= MAX_MULTI_CHAINS
    eta, tm_pad = _pack_tmmc(tmmc_eta, slot_start.shape[0], cfg)
    tm_rows = 4 * (tm_pad // 128) if cfg.tmmc else 1
    if cfg.cavity_bias:
        packs = [_pack_cav(cav_open[c], cfg) for c in range(C)]
        g3_pad = packs[0][3]
        cav = jnp.concatenate([pk[0] for pk in packs])
        cav_ns = jnp.stack([pk[1] for pk in packs])
        cav_lnfs = jnp.stack([pk[2] for pk in packs])
    else:
        g3_pad = 128
        cav = jnp.zeros((C, 128), f32)
        cav_ns = jnp.ones((C,), f32)
        cav_lnfs = jnp.zeros((C,), f32)
    n_pad = max(2 * TJ, _round_up(n_real, TJ))
    R = n_pad // 128
    ew = cfg.coulomb == "ewald"
    S = len(A_list)
    A = max(A_list)
    ktab, nk, nk_pad, padk = _pack_ktab(kvecs, kcoef, cfg)
    Rk = nk_pad // 128
    sk = (jnp.concatenate([jnp.stack([padk(sk_re[c]), padk(sk_im[c])])
                           for c in range(C)]) if ew
          else jnp.zeros((C * 2, nk_pad), f32)).reshape(
        C * 2 * Rk, 128)

    nq, base, pad1 = _pack_param_planes(
        eps, sig, charge, mass, cfg, n_pad, mol_mass_atom=mol_mass_atom,
        c6=c6, c8=c8, c10=c10, gwp_alpha=gwp_alpha)
    datas = []
    for c in range(C):
        d = base.at[ROW_X, :n_real].set(pos[c, :, 0].astype(f32))
        d = d.at[ROW_Y, :n_real].set(pos[c, :, 1].astype(f32))
        d = d.at[ROW_Z, :n_real].set(pos[c, :, 2].astype(f32))
        d = d.at[ROW_ALIVE].set(pad1(alive[c].astype(f32)))
        datas.append(d.reshape(nq * R, 128))
    data = jnp.concatenate(datas)

    ms = slot_start.shape[0]
    ms_pad = _round_up(max(ms, 1), 128)

    def padm(x, fill=0.0):
        x = jnp.asarray(x).astype(f32)
        return jnp.pad(x, (0, ms_pad - x.shape[0]), constant_values=fill)

    tbl = jnp.concatenate(
        [jnp.stack([padm(slot_start),
                    padm(slot_species, fill=-1.0),
                    padm(slot_alive[c].astype(f32)),
                    padm(jnp.ones((ms,), f32))]) for c in range(C)])
    if cfg.quantum_rotation:
        rot = jnp.concatenate([jnp.stack([
            padm(rot_f[c, :, 0]), padm(rot_f[c, :, 1]),
            padm(spin[c])]) for c in range(C)])
    else:
        rot = jnp.zeros((3 * C, ms_pad), f32)

    box32 = jnp.asarray(box, f32)
    binv = jnp.linalg.inv(box32)
    # + per-chain cav_n / cav_lnf / beta rows + S per-chain lnfv rows
    n_rows = 8 + 4 * S + 3 + S
    SL = max(16, MAX_MULTI_CHAINS)   # scal lane width (>= C cav lanes)
    scal = jnp.zeros((n_rows, SL), f32)
    for i, v in enumerate((rc, alpha, beta, move_factor, thr2,
                           rot_factor, 0.5 * p_ins, p_ins, p_spin)):
        scal = scal.at[0, i].set(jnp.asarray(v, f32))
    scal = scal.at[1, :9].set(box32.reshape(-1))
    scal = scal.at[2, :9].set(binv.reshape(-1))
    scal = scal.at[3, :S].set(jnp.asarray(A_list, f32))
    scal = scal.at[4, :S].set(jnp.asarray(lnfv, f32).reshape(S))
    scal = scal.at[5, :S].set(jnp.asarray(d_self, f32).reshape(S))
    scal = scal.at[6, :S].set(jnp.asarray(d_excl, f32).reshape(S))
    scal = scal.at[7, :S].set(jnp.asarray(c1, f32).reshape(S))
    scal = scal.at[8:8 + S, :S].set(jnp.asarray(cx, f32).reshape(S, S))
    tmpl32 = jnp.asarray(tmpl, f32).reshape(S, A, 3)
    for s in range(S):
        scal = scal.at[8 + S + 3 * s:8 + S + 3 * s + 3, :A].set(
            tmpl32[s].T)
    scal = scal.at[8 + 4 * S, :C].set(cav_ns)
    scal = scal.at[8 + 4 * S + 1, :C].set(cav_lnfs)
    # per-chain betas (µVT PT ladders); shared beta broadcast otherwise
    betas32 = (jnp.broadcast_to(jnp.asarray(beta, f32), (C,))
               if betas is None else jnp.asarray(betas, f32).reshape(C))
    scal = scal.at[8 + 4 * S + 2, :C].set(betas32)
    # per-chain ln(f_s V) rows (fugacity-ladder PT); shared-fugacity
    # callers broadcast row 4's exact f32 values into every lane, so
    # the kernel's per-chain read is bit-identical to the shared table
    lnfvs32 = (jnp.broadcast_to(jnp.asarray(lnfv, f32).reshape(1, S),
                                (C, S))
               if lnfvs is None
               else jnp.asarray(lnfvs, f32).reshape(C, S))
    for s in range(S):
        scal = scal.at[8 + 4 * S + 3 + s, :C].set(lnfvs32[:, s])

    u = jnp.asarray(uniforms, f32)

    use_cull = cull_gate(cfg)
    if use_cull:
        # chain-0 positions suffice: flagged blocks hold only frozen
        # rows, identical across chains forever (_pack_cull docstring)
        culltab, blk_pad = _pack_cull(pos[0], slot_start, slot_species,
                                      A_list, n_pad, n_real)
    else:
        culltab, blk_pad = jnp.zeros((8, 128), f32), 8

    (out_data, out_sums, out_sk, out_tbl, out_rot,
     out_tm) = pl.pallas_call(
        functools.partial(_kernel_uvt, cfg=cfg, n_steps=n_steps,
                          n_pad=n_pad, n_real=n_real, A_list=A_list,
                          nk_pad=nk_pad, ms_pad=ms_pad, g3_pad=g3_pad,
                          tm_pad=tm_pad, n_chains=C,
                          use_cull=use_cull),
        grid=(1,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        in_specs=[
            pl.BlockSpec((n_rows, SL), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(uniforms.shape, lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C * (g3_pad // 128), 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm_pad // 128, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C * 4, ms_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C * nq * R, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C * 2 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C, ms_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_pad, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C * nq * R, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 16), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((C * 2 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C * 4, ms_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C, ms_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C * tm_rows if cfg.tmmc else 1, 128),
                         lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C * nq * R, 128), f32),
            jax.ShapeDtypeStruct((C, 16), f32),
            jax.ShapeDtypeStruct((C * 2 * Rk, 128), f32),
            jax.ShapeDtypeStruct((C * 4, ms_pad), f32),
            jax.ShapeDtypeStruct((3 * C, ms_pad), f32),
            jax.ShapeDtypeStruct((C * tm_rows if cfg.tmmc else 1, 128),
                                 f32),
        ],
        input_output_aliases={6: 0, 7: 2, 5: 3, 8: 4},
        interpret=interpret,
    )(scal, u, ktab, cav, eta, tbl, data, sk, rot, culltab)
    planes = out_data.reshape(C, nq, n_pad)
    new_pos = jnp.stack([planes[:, ROW_X, :n_real],
                         planes[:, ROW_Y, :n_real],
                         planes[:, ROW_Z, :n_real]], axis=2)
    out_tbl2 = out_tbl.reshape(C, 4, ms_pad)
    out_sk2 = out_sk.reshape(C, 2, nk_pad)
    d_tm = (out_tm.reshape(C, 4, tm_pad).transpose(0, 2, 1)
            if cfg.tmmc else None)
    return (new_pos.astype(pos.dtype), out_tbl2[:, 2, :ms] > 0.5,
            out_sums[:, :14], out_sk2[:, 0, :nk], out_sk2[:, 1, :nk],
            out_rot.reshape(C, 3, ms_pad)[:, 2, :ms], d_tm)


# --------------------------------------------------------------------------
# Fused polar delayed-acceptance stage 1 (r2 verdict item 1, route b).
#
# Under polarization + polar_delayed, 80-90% of µVT steps die at the
# Christen-Fox stage-1 filter (zodid surrogate) and change NOTHING —
# measured r3: of the 1.17 ms/step delayed-acceptance budget on the
# 10.8k bench system, 0.57 ms was scan-path proposal machinery and only
# 0.60 ms the survivors' CG matvecs.  Because stage-1 rejections leave
# the state untouched, a kernel that only PROPOSES and FILTERS needs no
# stores at all: it re-proposes from the same resident planes each step,
# evaluates du (pair + S(k) + self/excl/LRC) AND the zodid surrogate
# delta d* in one pass, and freezes at the first stage-1 survivor,
# emitting that candidate's full record.  The XLA driver then runs the
# exact SCF stage 2 for the one survivor with the SAME helpers the scan
# path uses (thole.field_delta / residual_delta / solve_scf), so the
# sampled distribution is identical to the scan path's delayed
# acceptance (exact w.r.t. the SCF target).

PDA_SEG = 16    # steps per stage-1 kernel launch: E[steps to survivor]
                # is ~1/s ~ 5-9, so most launches freeze mid-segment;
                # the frozen tail burns ~4 us/step of masked pair
                # passes.  r3 TPU scan on the bench config:
                # 8/16/32 -> 1244/1387/1389 steps/s — 16 and 32 tie,
                # 8 pays too many launches; keep 16 (smaller program)


def _kernel_uvt_pda(scal_ref, u_ref, ktab_ref, cav_ref, tbl_ref,
                    data_ref, sk_ref, rec_ref, *, cfg, n_steps, n_pad,
                    n_real, A_list, nk_pad, ms_pad, g3_pad):
    """Propose-and-filter µVT kernel for polar delayed acceptance.

    Read-only: proposes displace|insert|delete from the resident state
    each step (same pick/placement math as ``_kernel_uvt``), computes
    the non-polar delta du, the reciprocal-space delta against the
    cached S(k), and the zodid surrogate delta

        d* = -ke/2 [ sum_j alpha_j (|E0_j + dE_j|^2 - |E0_j|^2)
                     + sum_a alpha_a |E_new_a|^2  (has_new)
                     - sum_a alpha_a |E0_old_a|^2 (has_old) ],

    where dE_j is the damped charge-field delta of the moved sites at
    every other alive site (thole.field_delta tile (a)) and E_new_a the
    field at the trial rows (tile (b)) — accumulated INSIDE the same
    column pass that computes the pair energies, reusing its min-image
    displacements.  Stage 1 accepts with ln u1 < lnb - beta (du + d*);
    the kernel then FREEZES (live = 0): later steps propose nothing and
    count nothing.  Output ``rec_ref`` [8,16] SMEM:

      row 0: n_done, hit, mtype (0/1/2 disp/ins/del), slot_idx (movable-
             slot order), species, u2 (stage-2 coin, lane 12),
             att_disp, att_ins, att_del, d_surr, lnb
      row 1: drd, des_real, drec, dslf, dexcl, dlrc
      rows 2-4: trial rows x/y/z in lanes 0..A-1

    E0 planes ride at rows nq..nq+2 and alpha (params.polar) at nq+3.
    Cavity bias (cfg.cavity_bias) is carried exactly like _kernel_uvt:
    inserts propose inside a uniformly-picked open cell (per-chunk
    rank->cell-id list in cav_ref), lnb gains the ±ln(n_open/G³)
    correction, and an empty grid hard-rejects inserts.
    """
    ew = cfg.coulomb == "ewald"
    cb = cfg.cavity_bias
    sf = cfg.quantum_rotation       # in-kernel spinflip carve (r4)
    S = len(A_list)
    A = max(A_list)
    uniform_A = len(set(A_list)) == 1
    rc = scal_ref[0, 0]
    alpha = scal_ref[0, 1]
    beta = scal_ref[0, 2]
    mf = scal_ref[0, 3]
    thr2 = scal_ref[0, 4]
    rotf = scal_ref[0, 5]
    p_half = scal_ref[0, 6]
    p_ins = scal_ref[0, 7]
    p_spin = scal_ref[0, 8]         # P(spinflip) (0 when sf off)
    lam = scal_ref[0, 9]            # polar_damp
    paf = scal_ref[0, 10]           # polar field screening alpha
    pkrc = scal_ref[0, 11]          # wolf field-kernel shift at rc
    de_ins = scal_ref[0, 12]        # eta(n+1)-eta(n) at the segment's
    de_del = scal_ref[0, 13]        # eta(n-1)-eta(n)  fixed macrostate
    box = [[scal_ref[1, 3 * a + b] for b in range(3)] for a in range(3)]
    binv = [[scal_ref[2, 3 * a + b] for b in range(3)] for a in range(3)]
    natoms_s = [scal_ref[3, s] for s in range(S)]
    lnfv_s = [scal_ref[4, s] for s in range(S)]
    d_self_s = [scal_ref[5, s] for s in range(S)]
    d_excl_s = [scal_ref[6, s] for s in range(S)]
    c1_s = [scal_ref[7, s] for s in range(S)]
    cx = [[scal_ref[8 + s, t] for t in range(S)] for s in range(S)]
    tmpl_s = [[[scal_ref[8 + S + 3 * s + c, a] for c in range(3)]
               for a in range(A)] for s in range(S)]
    cav_n = scal_ref[8 + 4 * S, 0]
    cav_lnf = scal_ref[8 + 4 * S, 1]

    nq = _n_rows(cfg)
    ROW_E0 = nq                     # 3 rows
    ROW_POL = nq + 3
    R = n_pad // 128
    n_blk = n_pad // TJ
    Rk = nk_pad // 128
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sub16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    lane16 = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1)
    two_pi = np.float32(2.0 * np.pi)
    half_ke = np.float32(0.5 * KE)
    de = cfg.rd_potential == "disp_expansion"
    gw = cfg.coulomb == "gwp"
    fh = _needs_molmass(cfg)

    def sp_sel(spf, table):
        if S == 1:
            return table[0]
        out = table[0]
        for s in range(1, S):
            out = jnp.where(spf == np.float32(s), table[s], out)
        return out

    def damp1(r, r2s):
        # d1 of ops/thole._damping (charge-field damping only)
        if cfg.polar_damp_type == "none":
            return jnp.ones_like(r)
        if cfg.polar_damp_type == "linear":
            u = jnp.minimum(r / lam, 1.0)
            u3 = u * u * u
            return 4.0 * u3 - 3.0 * u3 * u
        x = lam * r
        e = jnp.exp(-x)
        return 1.0 - e * (1.0 + x + 0.5 * x * x)

    # pairwise field-kernel coefficient (thole._field_coef): direct is
    # d1/r^3; wolf/ewald the (shifted) erfc-screened kernel + Thole
    # near-field.  For polar_ewald this is the REAL-SPACE part only —
    # the k-space delta is omitted from the surrogate (d_surr is
    # recorded, so stage 2 corrects exactly; see the displaced-rows
    # anchoring below for the moved molecule's own field).
    pol_scr = cfg.polar_wolf or cfg.polar_ewald

    def fcoef(ir, r2s, d1):
        ir3 = ir * ir * ir
        if not pol_scr:
            return d1 * ir3
        r = r2s * ir
        tap = paf * np.float32(1.1283791670955126)   # 2a/sqrt(pi)
        g = (_erfc(paf * r) * ir
             + tap * jnp.exp(-paf * paf * r2s)) * ir
        return (g - pkrc) * ir + (d1 - 1.0) * ir3

    def chain_step(k, carry):
        (live, n_done, att, rec, rrows) = carry
        uk = k
        # --- move pick (outer spinflip carve on lane 11, mirroring
        # _kernel_uvt / make_branch_picker; cavity rides lane 10) ------
        u8 = u_ref[uk, 8]
        if sf:
            is_spin = u_ref[uk, 11] < p_spin
        else:
            is_spin = jnp.zeros((), bool)
        is_ins = (u8 < p_half) & ~is_spin
        is_del = (u8 >= p_half) & (u8 < p_ins) & ~is_spin
        is_disp = (u8 >= p_ins) & ~is_spin
        fins = is_ins.astype(jnp.float32)
        fdel = is_del.astype(jnp.float32)
        fspin = is_spin.astype(jnp.float32)

        tb_start = tbl_ref[pl.dslice(0, 1), pl.dslice(0, ms_pad)]
        spec_v = tbl_ref[pl.dslice(1, 1), pl.dslice(0, ms_pad)]
        alive_v = tbl_ref[pl.dslice(2, 1), pl.dslice(0, ms_pad)]
        valid_v = tbl_ref[pl.dslice(3, 1), pl.dslice(0, ms_pad)]
        if S == 1:
            n_vec = [jnp.sum(alive_v)]
            n_alive = n_vec[0]
            n_free = jnp.sum(valid_v) - n_alive
            wv = jnp.where(is_ins, valid_v - alive_v, alive_v)
            cnt = jnp.where(is_ins, n_free, n_alive)
            n_s = n_alive
            suf = np.float32(0.0)
        else:
            su = jnp.minimum((u_ref[uk, 9] * np.float32(S)).astype(
                jnp.int32), S - 1)
            suf = su.astype(jnp.float32)
            sel_sp = (spec_v == suf).astype(jnp.float32)
            n_vec = [jnp.sum(alive_v * (spec_v == np.float32(s)).astype(
                jnp.float32)) for s in range(S)]
            n_s = sp_sel(suf, n_vec)
            free_s = jnp.sum((valid_v - alive_v) * sel_sp)
            wv = jnp.where(is_ins, (valid_v - alive_v) * sel_sp,
                           jnp.where(is_del, alive_v * sel_sp, alive_v))
            cnt = jnp.where(is_ins, free_s,
                            jnp.where(is_del, n_s, sum(n_vec)))
        j = jnp.minimum(jnp.floor(u_ref[uk, 0] * cnt), cnt - 1.0)
        ir = jax.lax.broadcasted_iota(jnp.int32, (ms_pad, ms_pad), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (ms_pad, ms_pad), 1)
        tri = (ir <= ic).astype(jnp.float32)
        rank = jnp.dot(wv, tri, preferred_element_type=jnp.float32)
        sel_slot = (wv > 0) & (rank == j + 1.0)
        start = jnp.sum(jnp.where(sel_slot, tb_start, 0.0)).astype(
            jnp.int32)
        lin_ms = jax.lax.broadcasted_iota(jnp.int32, (1, ms_pad), 1)
        slot_idx = jnp.sum(jnp.where(sel_slot,
                                     lin_ms.astype(jnp.float32), 0.0))
        if S == 1:
            spf = suf
            na_i = jnp.int32(A)
        else:
            sp_disp = jnp.sum(jnp.where(sel_slot, spec_v, 0.0))
            spf = jnp.where(is_disp | is_spin, sp_disp, suf)
            na = sp_sel(spf, natoms_s)
            na_i = na.astype(jnp.int32)
        if uniform_A:
            valid = [True] * A
        else:
            valid = [jnp.asarray(a, jnp.int32) < na_i for a in range(A)]
        if sf:
            # picked rotor's cached free energies + spin state (tbl
            # rows 4-6); d_f = F[1-s] - F[s] (b_spinflip semantics)
            f_par_v = tbl_ref[pl.dslice(4, 1), pl.dslice(0, ms_pad)]
            f_ort_v = tbl_ref[pl.dslice(5, 1), pl.dslice(0, ms_pad)]
            spin_v = tbl_ref[pl.dslice(6, 1), pl.dslice(0, ms_pad)]
            f_p = jnp.sum(jnp.where(sel_slot, f_par_v, 0.0))
            f_o = jnp.sum(jnp.where(sel_slot, f_ort_v, 0.0))
            s_cur = jnp.sum(jnp.where(sel_slot, spin_v, 0.0))
            d_f = jnp.where(s_cur > 0.5, f_p - f_o, f_o - f_p)

        # --- slot window loads ---------------------------------------
        rw0 = pl.multiple_of(
            jnp.minimum((start // TJ) * 8, jnp.int32(R - 16)), 8)

        def wload(q):
            return data_ref[pl.dslice(
                pl.multiple_of(q * R + rw0, 8), 16), :]

        asel = [(sub16 == (start + a) // 128 - rw0)
                & (lane16 == (start + a) % 128) for a in range(A)]

        def wpick(win, a):
            return jnp.sum(jnp.where(asel[a], win, 0.0))

        wx, wy, wz = wload(ROW_X), wload(ROW_Y), wload(ROW_Z)
        old = [[wpick(w, a) for w in (wx, wy, wz)] for a in range(A)]
        eps_i = [wpick(wload(ROW_EPS), a) for a in range(A)]
        sig_i = [wpick(wload(ROW_SIG), a) for a in range(A)]
        q_i = [wpick(wload(ROW_Q), a) for a in range(A)]
        disp_i = ([(wpick(wload(ROW_C6), a), wpick(wload(ROW_C8), a),
                    wpick(wload(ROW_C10), a)) for a in range(A)]
                  if de else [None] * A)
        gwp_i = ([wpick(wload(_row_gwp(cfg)), a) for a in range(A)]
                 if gw else [None] * A)
        pol_i = [wpick(wload(ROW_POL), a) for a in range(A)]
        e0_old = [[wpick(wload(ROW_E0 + c), a) for c in range(3)]
                  for a in range(A)]
        tmpl = [[sp_sel(spf, [tmpl_s[s][a][c] for s in range(S)])
                 for c in range(3)] for a in range(A)]

        # --- trial rows (same math as _kernel_uvt) -------------------
        disp = [(2.0 * u_ref[uk, 1 + c] - 1.0) * mf for c in range(3)]
        if cb:
            # cavity-biased insert COM: rank j among the n_open open
            # cells (lane 10), then uniform inside that cell — mirrors
            # _kernel_uvt / moves.pick_random_true + cell_com
            g = np.float32(cfg.cavity_grid)
            Rg = g3_pad // 128
            jc = jnp.minimum(jnp.floor(u_ref[uk, 10] * cav_n),
                             cav_n - 1.0)
            ling = (jax.lax.broadcasted_iota(jnp.int32, (Rg, 128), 0)
                    * 128
                    + jax.lax.broadcasted_iota(jnp.int32, (Rg, 128), 1)
                    ).astype(jnp.float32)
            cell = jnp.sum(jnp.where(
                ling == jc, cav_ref[pl.dslice(0, Rg), :], 0.0))
            ci = jnp.floor(cell / (g * g))
            rem = cell - ci * g * g
            cj = jnp.floor(rem / g)
            ck = rem - cj * g
            fr_ins = [(ci + u_ref[uk, 1]) / g, (cj + u_ref[uk, 2]) / g,
                      (ck + u_ref[uk, 3]) / g]
        else:
            fr_ins = [u_ref[uk, 1], u_ref[uk, 2], u_ref[uk, 3]]
        com_new = [fr_ins[0] * box[0][c] + fr_ins[1] * box[1][c]
                   + fr_ins[2] * box[2][c] for c in range(3)]
        msum = None
        if A > 1 or fh:
            wm = wload(ROW_MASS)
            mass = [wpick(wm, a) if uniform_A
                    else jnp.where(valid[a], wpick(wm, a), 0.0)
                    for a in range(A)]
            msum = sum(mass)
        if A == 1:
            new = [[jnp.where(is_ins, com_new[c], old[0][c] + disp[c])
                    for c in range(3)]]
        else:
            com = [sum(mass[a] * old[a][c] for a in range(A))
                   / jnp.maximum(msum, 1e-30) for c in range(3)]
            az = 2.0 * u_ref[uk, 5] - 1.0
            aphi = two_pi * u_ref[uk, 6]
            s = jnp.sqrt(jnp.maximum(1.0 - az * az, 0.0))
            ax, ay = s * jnp.cos(aphi), s * jnp.sin(aphi)
            ang = u_ref[uk, 7] * rotf
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            omc = 1.0 - ca
            Rd = [[ca + ax * ax * omc, ax * ay * omc - az * sa,
                   ax * az * omc + ay * sa],
                  [ay * ax * omc + az * sa, ca + ay * ay * omc,
                   ay * az * omc - ax * sa],
                  [az * ax * omc - ay * sa, az * ay * omc + ax * sa,
                   ca + az * az * omc]]
            sq1 = jnp.sqrt(jnp.maximum(1.0 - u_ref[uk, 5], 0.0))
            sq2 = jnp.sqrt(jnp.maximum(u_ref[uk, 5], 0.0))
            th1, th2 = two_pi * u_ref[uk, 6], two_pi * u_ref[uk, 7]
            qx, qy = sq1 * jnp.sin(th1), sq1 * jnp.cos(th1)
            qz, qw = sq2 * jnp.sin(th2), sq2 * jnp.cos(th2)
            Ri = [[1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
                   2 * (qx * qz + qy * qw)],
                  [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
                   2 * (qy * qz - qx * qw)],
                  [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
                   1 - 2 * (qx * qx + qy * qy)]]
            Rm = [[jnp.where(is_ins, Ri[c][d], Rd[c][d])
                   for d in range(3)] for c in range(3)]
            t = [jnp.where(is_ins, com_new[c], com[c] + disp[c])
                 for c in range(3)]
            new = []
            for a in range(A):
                rel = [jnp.where(is_ins, tmpl[a][d], old[a][d] - com[d])
                       for d in range(3)]
                new.append([t[c] + sum(Rm[c][d] * rel[d]
                                       for d in range(3))
                            for c in range(3)])

        # spinflip proposes no geometry change: both pair passes, the
        # S(k) delta and every field/zodid tile mask out, so du and
        # d_surr come out exactly 0 and du := d_f below
        has_old = ~is_ins & ~is_spin
        has_new = ~is_del & ~is_spin
        f_old = has_old.astype(jnp.float32)
        f_new = has_new.astype(jnp.float32)

        # --- one column pass: pair terms + field deltas --------------
        def col(jt, acc):
            if cfg.polar_ewald:
                rd_a, es_a, mr_a, ds_a, en, eo = acc
            else:
                rd_a, es_a, mr_a, ds_a, en = acc
                eo = None
            r0 = pl.multiple_of(jt * 8, 8)

            def plane(q):
                return data_ref[pl.dslice(
                    pl.multiple_of(q * R + r0, 8), 8), :]

            px, py, pz = plane(ROW_X), plane(ROW_Y), plane(ROW_Z)
            eps_j, sig_j = plane(ROW_EPS), plane(ROW_SIG)
            q_j, alive_j = plane(ROW_Q), plane(ROW_ALIVE)
            mm_j = plane(ROW_MOLMASS) if fh else None
            disp_j = ((plane(ROW_C6), plane(ROW_C8), plane(ROW_C10))
                      if de else None)
            gwp_j = plane(_row_gwp(cfg)) if gw else None
            pol_j = plane(ROW_POL)
            e0x, e0y = plane(ROW_E0), plane(ROW_E0 + 1)
            e0z = plane(ROW_E0 + 2)
            lin = jt * TJ + sub8 * 128 + lane8
            ok = ((alive_j > 0) & (lin < n_real)
                  & ((lin < start) | (lin >= start + na_i)))

            def mimg(dx, dy, dz):
                if cfg.ortho_box:
                    fr = [d * binv[a][a]
                          for a, d in enumerate((dx, dy, dz))]
                    fr = [f - jnp.round(f) for f in fr]
                    return [fr[a] * box[a][a] for a in range(3)]
                fr = [dx * binv[0][a] + dy * binv[1][a]
                      + dz * binv[2][a] for a in range(3)]
                fr = [f - jnp.round(f) for f in fr]
                return [fr[0] * box[0][b] + fr[1] * box[1][b]
                        + fr[2] * box[2][b] for b in range(3)]

            dEx = jnp.zeros((8, 128), jnp.float32)
            dEy = jnp.zeros((8, 128), jnp.float32)
            dEz = jnp.zeros((8, 128), jnp.float32)
            for a in range(A):
                ok_a = ok if uniform_A else ok & valid[a]
                do = mimg(old[a][0] - px, old[a][1] - py,
                          old[a][2] - pz)
                dn = mimg(new[a][0] - px, new[a][1] - py,
                          new[a][2] - pz)
                r_o, e_o, _ = _pair_terms(
                    do[0], do[1], do[2], eps_j, sig_j, q_j,
                    ok_a & has_old, eps_i[a], sig_i[a], q_i[a], rc,
                    alpha, cfg, mm_i=msum, mm_j=mm_j, beta=beta,
                    disp_i=disp_i[a], disp_j=disp_j,
                    gwp_i=gwp_i[a], gwp_j=gwp_j)
                r_n, e_n, m2 = _pair_terms(
                    dn[0], dn[1], dn[2], eps_j, sig_j, q_j,
                    ok_a & has_new, eps_i[a], sig_i[a], q_i[a], rc,
                    alpha, cfg, mm_i=msum, mm_j=mm_j, beta=beta,
                    disp_i=disp_i[a], disp_j=disp_j,
                    gwp_i=gwp_i[a], gwp_j=gwp_j)
                rd_a = rd_a + (r_n - r_o)
                es_a = es_a + (e_n - e_o)
                mr_a = jnp.minimum(mr_a, m2)
                # damped charge-field of the moved site (tile (a) of
                # thole.field_delta: dr points toward the TARGET j, so
                # negate the pair-pass displacements) and the field AT
                # the trial row (tile (b): dn points toward the row)
                r2o = do[0] * do[0] + do[1] * do[1] + do[2] * do[2]
                r2n = dn[0] * dn[0] + dn[1] * dn[1] + dn[2] * dn[2]
                in_o = ok_a & has_old & (r2o < rc * rc)
                in_n = ok_a & has_new & (r2n < rc * rc)
                r2os = jnp.where(r2o > 1e-12, r2o, 1.0)
                r2ns = jnp.where(r2n > 1e-12, r2n, 1.0)
                iro = jax.lax.rsqrt(r2os)
                irn = jax.lax.rsqrt(r2ns)
                d1o = damp1(r2os * iro, r2os)
                d1n = damp1(r2ns * irn, r2ns)
                fo = fcoef(iro, r2os, d1o)
                fn = fcoef(irn, r2ns, d1n)
                co = jnp.where(in_o, q_i[a] * fo, 0.0)
                cn = jnp.where(in_n, q_i[a] * fn, 0.0)
                # source at j: dE_j = q_a c(r) (r_j - r_a)
                dEx = dEx - cn * dn[0] + co * do[0]
                dEy = dEy - cn * dn[1] + co * do[1]
                dEz = dEz - cn * dn[2] + co * do[2]
                # field at trial row a from column charges q_j
                cj = jnp.where(in_n, q_j * fn, 0.0)
                en[a] = (en[a][0] + cj * dn[0], en[a][1] + cj * dn[1],
                         en[a][2] + cj * dn[2])
                if cfg.polar_ewald:
                    # real-space field at the OLD rows too: the moved
                    # rows' surrogate field anchors on the resident
                    # (full-Ewald) e0_old + the short-range delta, so
                    # the omitted k-space terms cancel for displaces
                    cjo = jnp.where(in_o, q_j * fo, 0.0)
                    eo[a] = (eo[a][0] + cjo * do[0],
                             eo[a][1] + cjo * do[1],
                             eo[a][2] + cjo * do[2])
            # others' zodid delta for this block (alpha gated by alive)
            al = jnp.where((alive_j > 0) & ok, pol_j, 0.0)
            ds_a = ds_a + al * (2.0 * (e0x * dEx + e0y * dEy
                                       + e0z * dEz)
                                + dEx * dEx + dEy * dEy + dEz * dEz)
            out = (rd_a, es_a, mr_a, ds_a, en)
            return out + ((eo,) if cfg.polar_ewald else ())

        zb = jnp.zeros((8, 128), jnp.float32)
        en0 = [(zb, zb, zb) for _ in range(A)]
        acc0 = (zb, zb, jnp.full((8, 128), jnp.inf, jnp.float32), zb,
                en0)
        if cfg.polar_ewald:
            acc0 = acc0 + ([(zb, zb, zb) for _ in range(A)],)
            rd_a, es_a, mr_a, ds_a, en, eo = jax.lax.fori_loop(
                0, n_blk, col, acc0, unroll=BLOCK_UNROLL)
        else:
            rd_a, es_a, mr_a, ds_a, en = jax.lax.fori_loop(
                0, n_blk, col, acc0, unroll=BLOCK_UNROLL)
        drd = jnp.sum(rd_a)
        des = KE * jnp.sum(es_a)
        mr2 = jnp.min(mr_a)
        # zodid: others + the moved molecule's own rows
        z_others = jnp.sum(ds_a)
        if cfg.polar_ewald:
            # anchor the moved rows' surrogate field on the resident
            # full-Ewald e0_old: E_row = f_old e0_old + (short-range at
            # new rows) - f_old (short-range at old rows) — the omitted
            # k-space terms cancel exactly for displaces and enter only
            # through the (smooth, small) recip delta
            er = [[f_old * e0_old[a][c] + jnp.sum(en[a][c])
                   - f_old * jnp.sum(eo[a][c]) for c in range(3)]
                  for a in range(A)]
            z_new = sum(jnp.where(valid[a] if not uniform_A else True,
                                  pol_i[a] * (er[a][0] ** 2
                                              + er[a][1] ** 2
                                              + er[a][2] ** 2), 0.0)
                        for a in range(A))
        else:
            z_new = sum(jnp.where(valid[a] if not uniform_A else True,
                                  pol_i[a] * (jnp.sum(en[a][0]) ** 2
                                              + jnp.sum(en[a][1]) ** 2
                                              + jnp.sum(en[a][2]) ** 2),
                                  0.0)
                        for a in range(A))
        z_old = sum(jnp.where(valid[a] if not uniform_A else True,
                              pol_i[a] * (e0_old[a][0] ** 2
                                          + e0_old[a][1] ** 2
                                          + e0_old[a][2] ** 2), 0.0)
                    for a in range(A))
        d_surr = -half_ke * (z_others + f_new * z_new - f_old * z_old)

        # --- k-space S(k) delta (read-only) --------------------------
        if ew:
            kx = ktab_ref[pl.dslice(0, Rk), :]
            ky = ktab_ref[pl.dslice(Rk, Rk), :]
            kz = ktab_ref[pl.dslice(2 * Rk, Rk), :]
            kc = ktab_ref[pl.dslice(3 * Rk, Rk), :]
            dsr = jnp.zeros((Rk, 128), jnp.float32)
            dsi = jnp.zeros((Rk, 128), jnp.float32)
            for a in range(A):
                qa = (q_i[a] if uniform_A
                      else jnp.where(valid[a], q_i[a], 0.0))
                to = kx * old[a][0] + ky * old[a][1] + kz * old[a][2]
                tn = kx * new[a][0] + ky * new[a][1] + kz * new[a][2]
                dsr = dsr + qa * (f_new * jnp.cos(tn)
                                  - f_old * jnp.cos(to))
                dsi = dsi + qa * (f_new * jnp.sin(tn)
                                  - f_old * jnp.sin(to))
            sr = sk_ref[pl.dslice(0, Rk), :]
            si = sk_ref[pl.dslice(Rk, Rk), :]
            drec = jnp.sum(kc * ((2.0 * sr + dsr) * dsr
                                 + (2.0 * si + dsi) * dsi))
        else:
            drec = jnp.zeros((), jnp.float32)

        # --- constants + stage-1 acceptance --------------------------
        sgn = fins - fdel
        dslf = sgn * sp_sel(spf, d_self_s)
        dexc = sgn * sp_sel(spf, d_excl_s)
        c1 = sp_sel(spf, c1_s)
        if S == 1:
            c2 = cx[0][0]
            dlrc = (fins * (c1 + c2 * n_s)
                    - fdel * (c1 + c2 * (n_s - 1.0)))
        else:
            cx_dot = sp_sel(spf, [sum(cx[s][t] * n_vec[t]
                                      for t in range(S))
                                  for s in range(S)])
            cx_self = sp_sel(spf, [cx[s][s] for s in range(S)])
            dlrc = (fins * (c1 + cx_dot)
                    - fdel * (c1 + cx_dot - cx_self))
        du = drd + des + drec + dslf + dexc + dlrc
        if sf:
            du = jnp.where(is_spin, d_f, du)
        lnfv = sp_sel(spf, lnfv_s)
        lnb = (fins * (lnfv + jnp.log(beta)
                       - jnp.log(n_s + 1.0))
               + fdel * (jnp.log(jnp.maximum(n_s, 1e-30))
                         - jnp.log(beta) - lnfv))
        if cb:
            lnb = lnb + sgn * cav_lnf
        reject = ((cnt < 0.5) | ((thr2 > 0.0) & has_new
                                 & (mr2 < thr2)))
        if cb:
            reject = reject | (is_ins & (cav_n < 0.5))
        ln1 = lnb - beta * (du + d_surr)
        if cfg.tmmc_bias:
            # flat-histogram tilt rides the STAGE-1 coin (the biased
            # chain's target carries the whole e^eta factor there —
            # metropolis make_step's d_eta note); the kernel state is
            # frozen for the segment, so the per-direction eta deltas
            # are the two driver-computed scalars above.  The recorded
            # lnb stays UNBIASED so the driver's IS-weighted collection
            # can reconstruct ln1.
            ln1 = ln1 + fins * de_ins + fdel * de_del
        acc1 = ((jnp.log(jnp.maximum(u_ref[uk, 4], 1e-38)) < ln1)
                & ~reject)

        # --- freeze + record -----------------------------------------
        lv = live > 0.5
        hit = lv & acc1
        hf = hit.astype(jnp.float32)
        kp = 1.0 - hf
        mtype = fins + 2.0 * fdel + 3.0 * fspin
        new_rec = [
            rec[0] * kp + hf * mtype,
            rec[1] * kp + hf * slot_idx,
            rec[2] * kp + hf * spf,
            rec[3] * kp + hf * u_ref[uk, 12],
            rec[4] * kp + hf * d_surr,
            rec[5] * kp + hf * lnb,
            rec[6] * kp + hf * drd,
            rec[7] * kp + hf * des,
            rec[8] * kp + hf * drec,
            rec[9] * kp + hf * dslf,
            rec[10] * kp + hf * dexc,
            rec[11] * kp + hf * dlrc,
            jnp.maximum(rec[12], hf),          # hit flag (sticky)
        ]
        new_rrows = [[rrows[a][c] * kp + hf * new[a][c]
                      for c in range(3)] for a in range(A)]
        lvf = live
        att2 = (att[0] + lvf * is_disp.astype(jnp.float32),
                att[1] + lvf * fins, att[2] + lvf * fdel,
                att[3] + lvf * fspin)
        return (live * (1.0 - acc1.astype(jnp.float32)),
                n_done + lvf, att2, new_rec, new_rrows)

    z = jnp.zeros((), jnp.float32)
    rec0 = [z] * 13
    rrows0 = [[z, z, z] for _ in range(A)]
    # early exit at the freeze (r4): post-survivor steps propose and
    # count nothing but still burned full masked pair passes under
    # fori_loop — a while_loop stops at the survivor instead.  Frozen
    # steps consumed only their own uniform rows, so skipping them is
    # bit-exact for the produced record.
    def _cond(carry):
        k, live, *_ = carry
        return (k < n_steps) & (live > 0.5)

    def _body(carry):
        k, live, n_done, att, rec, rrows = carry
        live, n_done, att, rec, rrows = chain_step(
            k, (live, n_done, att, rec, rrows))
        return (k + 1, live, n_done, att, rec, rrows)

    _, live, n_done, att, rec, rrows = jax.lax.while_loop(
        _cond, _body, (jnp.int32(0), jnp.float32(1.0), z, (z, z, z, z),
                       rec0, rrows0))
    rec_ref[0, 0] = n_done
    rec_ref[0, 1] = rec[12]
    rec_ref[0, 2] = rec[0]
    rec_ref[0, 3] = rec[1]
    rec_ref[0, 4] = rec[2]
    rec_ref[0, 5] = rec[3]
    rec_ref[0, 6] = att[0]
    rec_ref[0, 7] = att[1]
    rec_ref[0, 8] = att[2]
    rec_ref[0, 9] = rec[4]
    rec_ref[0, 10] = rec[5]
    for i in range(6):
        rec_ref[1, i] = rec[6 + i]
    for c in range(3):
        for a in range(A):
            rec_ref[2 + c, a] = rrows[a][c]
        for a in range(A, 16):
            rec_ref[2 + c, a] = z
    rec_ref[0, 11] = att[3]         # spinflip attempts (sf only)
    for i in range(12, 16):
        rec_ref[0, i] = z
    for i in range(6, 16):
        rec_ref[1, i] = z
    for r in range(5, 8):
        for i in range(16):
            rec_ref[r, i] = z


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_steps", "n_real", "A_list",
                                    "interpret"))
def run_steps_uvt_pda(pos, eps, sig, charge, mass, alive, slot_start,
                      slot_species, slot_alive, tmpl, box, rc, alpha,
                      beta, move_factor, rot_factor, thr2, p_ins, lnfv,
                      d_self, d_excl, c1, cx, uniforms, cfg, n_steps,
                      n_real, A_list, e0, polar, polar_damp,
                      interpret=False, kvecs=None, kcoef=None,
                      sk_re=None, sk_im=None, cav_open=None,
                      mol_mass_atom=None,
                      c6=None, c8=None, c10=None, gwp_alpha=None,
                      rot_f=None, spin=None, p_spin=0.0,
                      polar_field_alpha=0.0, polar_field_krc=0.0,
                      d_eta_ins=0.0, d_eta_del=0.0):
    """Stage-1 segment of the fused polar delayed acceptance: up to K
    propose-and-filter µVT steps from a FIXED state (kernel docstring).
    Returns the [8,16] record block (f32).  ``e0`` [N,3] is the cached
    static field, ``polar`` [N] the site polarizabilities; for
    cfg.cavity_bias pass ``cav_open`` ([G^3] bool open-cell mask,
    frozen for the chunk).  For cfg.quantum_rotation pass ``rot_f``
    [Ms,2]/``spin`` [Ms] in slot order + the scalar ``p_spin`` — the
    lane-11 spinflip carve proposes a flip whose stage-1 test is the
    full b_spinflip acceptance (du := d_f, d_surr = 0) and whose
    stage-2 is trivially exact (no geometry change)."""
    f32 = jnp.float32
    S = len(A_list)
    A = max(A_list)
    cav, cav_n, cav_lnf, g3_pad = _pack_cav(cav_open, cfg)
    n_pad = max(2 * TJ, _round_up(n_real, TJ))
    R = n_pad // 128
    ew = cfg.coulomb == "ewald"
    ktab, nk, nk_pad, padk = _pack_ktab(kvecs, kcoef, cfg)
    Rk = nk_pad // 128
    sk = (jnp.stack([padk(sk_re), padk(sk_im)]) if ew
          else jnp.zeros((2, nk_pad), f32)).reshape(2 * Rk, 128)

    nq, data, pad1 = _pack_param_planes(
        eps, sig, charge, mass, cfg, n_pad, mol_mass_atom=mol_mass_atom,
        c6=c6, c8=c8, c10=c10, gwp_alpha=gwp_alpha)
    data = data.at[ROW_X, :n_real].set(pos[:, 0].astype(f32))
    data = data.at[ROW_Y, :n_real].set(pos[:, 1].astype(f32))
    data = data.at[ROW_Z, :n_real].set(pos[:, 2].astype(f32))
    data = data.at[ROW_ALIVE].set(pad1(alive.astype(f32)))
    extra = jnp.zeros((4, n_pad), f32)
    for c in range(3):
        extra = extra.at[c, :n_real].set(e0[:, c].astype(f32))
    extra = extra.at[3].set(pad1(polar))
    data = jnp.concatenate([data, extra]).reshape((nq + 4) * R, 128)

    ms = slot_start.shape[0]
    ms_pad = _round_up(max(ms, 1), 128)

    def padm(x, fill=0.0):
        x = jnp.asarray(x).astype(f32)
        return jnp.pad(x, (0, ms_pad - x.shape[0]), constant_values=fill)

    tbl_rows = [padm(slot_start),
                padm(slot_species, fill=-1.0),
                padm(slot_alive.astype(f32)),
                padm(jnp.ones((ms,), f32))]
    if cfg.quantum_rotation:
        tbl_rows += [padm(jnp.asarray(rot_f[:, 0], f32)),
                     padm(jnp.asarray(rot_f[:, 1], f32)),
                     padm(jnp.asarray(spin, f32))]
    tbl = jnp.stack(tbl_rows)

    box32 = jnp.asarray(box, f32)
    binv = jnp.linalg.inv(box32)
    n_rows = 8 + 4 * S + 1      # + cav_n/cav_lnf row
    scal = jnp.zeros((n_rows, 16), f32)
    for i, v in enumerate((rc, alpha, beta, move_factor, thr2,
                           rot_factor, 0.5 * p_ins, p_ins)):
        scal = scal.at[0, i].set(jnp.asarray(v, f32))
    scal = scal.at[0, 8].set(jnp.asarray(p_spin, f32))
    scal = scal.at[0, 9].set(jnp.asarray(polar_damp, f32))
    scal = scal.at[0, 10].set(jnp.asarray(polar_field_alpha, f32))
    scal = scal.at[0, 11].set(jnp.asarray(polar_field_krc, f32))
    scal = scal.at[0, 12].set(jnp.asarray(d_eta_ins, f32))
    scal = scal.at[0, 13].set(jnp.asarray(d_eta_del, f32))
    scal = scal.at[1, :9].set(box32.reshape(-1))
    scal = scal.at[2, :9].set(binv.reshape(-1))
    scal = scal.at[3, :S].set(jnp.asarray(A_list, f32))
    scal = scal.at[4, :S].set(jnp.asarray(lnfv, f32).reshape(S))
    scal = scal.at[5, :S].set(jnp.asarray(d_self, f32).reshape(S))
    scal = scal.at[6, :S].set(jnp.asarray(d_excl, f32).reshape(S))
    scal = scal.at[7, :S].set(jnp.asarray(c1, f32).reshape(S))
    scal = scal.at[8:8 + S, :S].set(jnp.asarray(cx, f32).reshape(S, S))
    tmpl32 = jnp.asarray(tmpl, f32).reshape(S, A, 3)
    for s in range(S):
        scal = scal.at[8 + S + 3 * s:8 + S + 3 * s + 3, :A].set(
            tmpl32[s].T)
    scal = scal.at[8 + 4 * S, 0].set(cav_n)
    scal = scal.at[8 + 4 * S, 1].set(cav_lnf)

    u = jnp.asarray(uniforms, f32)

    rec = pl.pallas_call(
        functools.partial(_kernel_uvt_pda, cfg=cfg, n_steps=n_steps,
                          n_pad=n_pad, n_real=n_real, A_list=A_list,
                          nk_pad=nk_pad, ms_pad=ms_pad, g3_pad=g3_pad),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_rows, 16), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_steps, 16), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g3_pad // 128, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tbl.shape[0], ms_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(((nq + 4) * R, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * Rk, 128), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 16), lambda _: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((8, 16), f32),
        interpret=interpret,
    )(scal, u, ktab, cav, tbl, data, sk)
    return rec


def pda_effective_cfg(cfg, params):
    """The cfg the fused polar-DA kernel path actually runs: µVT
    surface.  ``ensemble nvt`` maps onto the same kernel with
    insert_probability 0 (the all-displace limit — every movable
    species becomes a nominal insert species so the slot tables
    build); µVT passes through.  Returns None when the ensemble has no
    mapping."""
    import dataclasses as _dc
    if cfg.ensemble == "uvt":
        return cfg
    if cfg.ensemble == "nvt":
        spec = np.asarray(params.mol_species)
        mov = ~np.asarray(params.mol_frozen) & (spec >= 0)
        if not mov.any():
            return None
        ins = tuple(sorted({int(s) for s in spec[mov]}))
        return _dc.replace(cfg, ensemble="uvt", insert_species=ins)
    return None


def supported_uvt_polar_da(cfg, params) -> bool:
    """Static gate for the fused polar delayed-acceptance path: the µVT
    structural surface (one-to-MAX_SPECIES rigid insert species) — or
    NVT, which runs the same kernel in the all-displace limit
    (pda_effective_cfg) — with polarization + polar_delayed on any
    delta-able static field (thole.field_delta_supported: direct, wolf
    and — with an ewald energy path — polar_ewald; r4 verdict item 1),
    CG solver (warm-startable stage 2), cavity bias supported (same
    open-cell plane as _kernel_uvt).  For wolf the in-kernel field
    delta is complete (shifted pairwise kernel); for polar_ewald the
    stage-1 surrogate uses the real-space field delta anchored on the
    resident full-Ewald e0 planes, omitting only the smooth k-space
    delta — valid delayed acceptance regardless, since the recorded
    d_surr is what stage 2 corrects against (Christen & Fox need the
    surrogate to be deterministic, not exact).  TMMC COLLECTION
    composes (r3 verdict item 5): the driver bins the segment's
    stage-1 rejections from the kernel's per-type attempt counters and
    adds the survivor's exact min(1,a2) estimator
    (_fused_chunk_uvt_pda) — no kernel planes needed.  Spinflip
    composes too (r4): the lane-11 carve's stage-1 test IS the full
    b_spinflip acceptance (no geometry change, so d_surr = 0 exactly
    and stage 2 is trivial); structural rotor conditions delegate to
    supported_uvt.  tmmc_BIAS composes since r5 (r4 verdict item 2):
    the kernel state is frozen per segment, so the eta tilt reduces to
    two driver-computed scalars (eta(n±1)-eta(n)) riding the stage-1
    coin, and the driver's collection carries the scan path's
    importance weight min(1,a1)/min(1,a1 e^dEta).  Refused: cdvdw,
    f32."""
    import dataclasses as _dc
    from mpmc_tpu.ops import thole as _th
    if not (cfg.polarization and cfg.polar_delayed
            and cfg.polar_solver == "cg"
            and cfg.polar_damp_type in ("exponential", "linear", "none")
            and _th.field_delta_supported(cfg)
            and not cfg.cdvdw):
        return False
    cfg_eff = pda_effective_cfg(cfg, params)
    if cfg_eff is None:
        return False
    return supported_uvt(_dc.replace(cfg_eff, polarization=False),
                         params)


def draw_uniforms(key, n_steps, lanes=8):
    """[K, lanes] uniform table.  Lanes 0-7: 0 slot pick, 1-3
    displacement (µVT insert: fractional COM), 4 acceptance coin, 5-7
    rotation axis z / azimuth / angle (µVT insert: Shoemake quaternion
    u1/u2/u3).  Lane 8: NVT spinflip carve-out (lanes=16 under
    cfg.quantum_rotation) / µVT move-type draw (lanes=16); lane 9:
    insert/delete species pick (consumed only when S > 1); lane 10:
    cavity-bias open-cell pick (consumed only under cfg.cavity_bias,
    when lanes 1-3 become the in-cell fractional position); lane 11:
    µVT spinflip carve-out (consumed only under
    cfg.quantum_rotation)."""
    return jax.random.uniform(key, (n_steps, lanes), jnp.float32)


def _supported_physics(cfg) -> bool:
    """Physics-surface gate shared by the NVT and µVT fused paths."""
    return (cfg.rd_potential in ("lj", "none", "disp_expansion",
                                 "sg", "dreiding", "b14_7")
            and cfg.coulomb in ("none", "cutoff", "wolf",
                                "ewald", "gwp")
            and cfg.mixing_rule in ("lb", "waldman_hagler")
            # feynman_hibbs IS allowed (in-kernel FH2/FH4 correction
            # with the molecule-pair reduced mass), and so is
            # feynman_kleinert (the unrolled fixed point is elementwise
            # — _pair_terms calls the scan path's shared
            # lj.feynman_kleinert_from_derivs); both are defined on top
            # of the LJ derivatives only
            and not (cfg.feynman_kleinert and cfg.rd_potential != "lj")
            and not (cfg.feynman_hibbs and cfg.rd_potential != "lj")
            and not cfg.polarization and not cfg.cdvdw
            and cfg.cdvdw_repulsion == "none"
            # rd_lrc IS allowed: NVT tail coefficients are
            # distance-independent (displacement deltas are zero); the
            # uvt kernel carries the count-dependent delta explicitly
            and not cfg.rd_crystal
            and cfg.dtype == "float32")


def supported(cfg, params) -> bool:
    """Static gate for the fused multi-step NVT path (module
    docstring).  quantum_rotation IS supported: spinflip moves run
    in-kernel against the per-corrtime rot_f table (requires every
    movable molecule to be a rotor, natoms >= 2, so displace and
    spinflip share one eligibility pool — the scan path's separate
    natoms>=2 mask collapses to it).  NVE (Ray microcanonical) runs on
    the same kernel with the kinetic-reservoir acceptance and the
    spinflip carve-out excluded (spinflip_active forbids it there)."""
    if not (cfg.ensemble in ("nvt", "nve") and _supported_physics(cfg)):
        return False
    if cfg.tmmc:    # µVT-only (parse gate); in-kernel only in _kernel_uvt
        return False
    if cfg.ensemble == "nve" and cfg.quantum_rotation:
        return False
    # rigid molecules up to MAX_SITES atoms (no intra terms)
    natoms = np.asarray(params.mol_natoms)
    frozen = np.asarray(params.mol_frozen)
    mov = ~frozen & (np.asarray(params.mol_species) >= 0)
    if not mov.any() or not (natoms[mov] <= MAX_SITES).all():
        return False
    if cfg.quantum_rotation and int(natoms[mov].min()) < 2:
        return False
    return True


def supported_multi(cfg, params) -> bool:
    """Static gate for the chain-interleaved multi-chain NVT path
    (run_steps_multi): the NVT kernel surface minus NVE (the kinetic
    reservoir is one scalar lane, i.e. per-chain state the scal row
    does not carry).  quantum_rotation IS supported: each chain's
    rot_f/spin rows ride in as a per-chain 3-row group."""
    return supported(cfg, params) and cfg.ensemble == "nvt"


def supported_npt(cfg, params) -> bool:
    """Static gate for the HYBRID fused NPT path
    (mc/metropolis.run_chunk_fused_npt): fused displacement segments
    need the NVT kernel surface; the interleaved scan-path volume
    moves additionally require NO frozen framework — moves.scale_volume
    rescales every molecule about its COM, which is only meaningful
    when everything is movable (same gate the scan path's b_volume
    documents)."""
    if not (cfg.ensemble == "npt" and _supported_physics(cfg)
            and not cfg.quantum_rotation and not cfg.tmmc):
        return False
    frozen = np.asarray(params.mol_frozen)
    if frozen.any():
        return False
    natoms = np.asarray(params.mol_natoms)
    mov = np.asarray(params.mol_species) >= 0
    return bool(mov.any()) and bool((natoms[mov] <= MAX_SITES).all())


MAX_SPECIES = 8     # SMEM per-species table width (supported_uvt cap)


def supported_uvt(cfg, params) -> bool:
    """Static gate for the fused µVT path: same physics surface as the
    NVT gate plus GCMC over up to MAX_SPECIES insert species (every
    movable slot belongs to one of them, so the per-molecule
    self/exclusion/LRC deltas are per-species constants).  Cavity bias
    IS supported: the per-corrtime open-cell grid rides into VMEM as a
    rank->cell-id list (see _kernel_uvt docstring).  quantum_rotation
    IS supported when every insert species is a rotor (natoms >= 2):
    spinflips run in-kernel against the slot-order rot_f table."""
    if not (cfg.ensemble == "uvt"
            and 1 <= len(cfg.insert_species) <= MAX_SPECIES
            and _supported_physics(cfg)):
        return False
    # TMMC collection runs in-kernel (per-macrostate planes + η bias),
    # but only over a scalar macrostate — one insert species (the
    # parse-time gate; re-checked for direct API users)
    if cfg.tmmc and len(cfg.insert_species) != 1:
        return False
    frozen = np.asarray(params.mol_frozen)
    spec = np.asarray(params.mol_species)
    natoms = np.asarray(params.mol_natoms)
    mov = ~frozen & (spec >= 0)
    if not mov.any() or not np.isin(spec[mov],
                                    list(cfg.insert_species)).all():
        return False
    for si in cfg.insert_species:
        a = natoms[mov & (spec == si)]
        if a.size == 0:     # species with no slot: no capacity to insert
            return False
        if not (a == a[0]).all() or int(a[0]) > MAX_SITES:
            return False
        if cfg.quantum_rotation and int(a[0]) < 2:
            return False    # monatomic species are not rotors
        if cfg.coulomb == "ewald":
            # a charged template changes the cell's net charge per
            # insert/delete: the jellium-background delta is quadratic
            # in Q (metropolis._background_delta), which the kernel's
            # per-species constant tables cannot carry — scan path
            m0 = int(np.flatnonzero(mov & (spec == si))[0])
            qnet = float(np.where(
                (np.asarray(params.mol_id) == m0)
                & np.asarray(params.atom_ok),
                np.asarray(params.charge), 0.0).sum())
            if abs(qnet) > 1e-6:
                return False
    return True


def supported_uvt_multi(cfg, params) -> bool:
    """Static gate for the chain-interleaved multi-chain µVT path
    (run_steps_uvt_multi): the full fused µVT surface — cavity bias
    included (each chain's open-cell grid rides in as its own plane
    with per-chain n_open/ln-correction SMEM lanes)."""
    return supported_uvt(cfg, params)


def movable_slots(params, insert_species=None):
    """([Ms] slot indices, [Ms] first atom rows, [Ms] species index into
    ``insert_species`` order, A_list) of EVERY movable molecule slot,
    alive or dead (fused µVT path; see supported_uvt).  ``A_list`` is
    the per-species site-count tuple in ``insert_species`` order;
    ``insert_species=None`` treats all movable species in ascending
    id order (legacy single-species callers)."""
    frozen = np.asarray(params.mol_frozen)
    spec = np.asarray(params.mol_species)
    mov = np.where(~frozen & (spec >= 0))[0]
    start = np.asarray(params.mol_start)[mov].astype(np.int32)
    natoms = np.asarray(params.mol_natoms)
    if insert_species is None:
        insert_species = tuple(sorted(set(spec[mov].tolist())))
    order = {int(si): i for i, si in enumerate(insert_species)}
    species_idx = np.asarray([order[int(s)] for s in spec[mov]],
                             np.int32)
    A_list = tuple(int(natoms[mov][species_idx == i][0])
                   for i in range(len(insert_species)))
    return mov.astype(np.int32), start, species_idx, A_list


def movable_mols(params, mol_alive):
    """([Mv] first atom row, [Mv] atom count, a_max, [Mv] molecule slot
    index) of each alive movable molecule."""
    alive = np.asarray(mol_alive)
    frozen = np.asarray(params.mol_frozen)
    spec = np.asarray(params.mol_species)
    start = np.asarray(params.mol_start)
    natoms = np.asarray(params.mol_natoms)
    mv = alive & ~frozen & (spec >= 0)
    a_max = int(natoms[mv].max()) if mv.any() else 1
    return (start[mv].astype(np.int32), natoms[mv].astype(np.int32),
            a_max, np.where(mv)[0].astype(np.int32))


def movable_atoms(params, mol_alive) -> np.ndarray:
    """[Mv] atom row of each alive movable molecule (legacy monatomic
    helper; see movable_mols)."""
    return movable_mols(params, mol_alive)[0]
