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
rigid sorbates like 3-site H2), rd lj/none, coulomb
none|cutoff|wolf|ewald, no FH/FK, no polarization/cdvdw, f32.  Under
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
MAX_SITES = 8  # supported() cap on movable-molecule size
(ROW_X, ROW_Y, ROW_Z, ROW_EPS, ROW_SIG, ROW_Q, ROW_ALIVE,
 ROW_MASS) = range(8)


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
        elif cfg.coulomb == "ewald":
            # real-space erfc sum (ops/pairs._tile_values ewald branch);
            # the k-space part is the S(k) delta in _kernel
            es_u = qq * _erfc(alpha * r) * inv_r
        else:   # wolf (shifted)
            es_u = qq * (_erfc(alpha * r) * inv_r
                         - _erfc(alpha * rc) / rc)
        es = jnp.sum(jnp.where(act, es_u, 0.0))
    min_r2 = jnp.min(jnp.where(ok, r2, jnp.inf))
    return rd, es, min_r2


def _kernel(scal_ref, u_ref, tbl_ref, ktab_ref, data_in_ref, sk_in_ref,
            data_ref, out_ref, sk_ref, *,
            cfg, n_steps, n_pad, n_real, a_max, nk_pad):
    # data_in_ref/sk_in_ref alias data_ref/sk_ref (input_output_aliases)
    # — all access goes through the output refs
    del data_in_ref, sk_in_ref
    ew = cfg.coulomb == "ewald"
    rc = scal_ref[0, 0]
    alpha = scal_ref[0, 1]
    beta = scal_ref[0, 2]
    mf = scal_ref[0, 3]
    n_mov = scal_ref[0, 4]          # float count of movable molecules
    thr2 = scal_ref[0, 5]           # autoreject r_min^2 (0 = off)
    rotf = scal_ref[0, 6]           # max rotation angle (rad)
    box = [[scal_ref[1, 3 * a + b] for b in range(3)] for a in range(3)]
    binv = [[scal_ref[2, 3 * a + b] for b in range(3)] for a in range(3)]

    n_tiles = n_pad // TJ
    MW = 256 if a_max > 1 else 128      # molecule-tile width

    def step(k, carry):
        d_rd, d_es, d_rec, n_acc = carry
        # --- proposal -----------------------------------------------------
        # Mosaic cannot load a single VMEM lane at a dynamic offset
        # ("index must be a multiple of 128"), so every scalar access
        # loads the 128-aligned tile containing the element and
        # mask-reduces it out; the update store blends the same tile.
        # Multi-site molecules are contiguous atom rows [start, start+A)
        # and may straddle a 128 boundary -> a 256-wide tile clamped to
        # the array end always covers them (A <= MAX_SITES << 128).
        m = jnp.minimum((u_ref[k, 0] * n_mov).astype(jnp.int32),
                        (n_mov - 1.0).astype(jnp.int32))
        mt0 = pl.multiple_of((m // 128) * 128, 128)
        ttile = tbl_ref[pl.dslice(0, 2), pl.dslice(mt0, 128)]  # [2,128]
        tlane = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
        trow = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 0)
        tsel = tlane == (m - mt0)
        start = jnp.sum(jnp.where(tsel & (trow == 0), ttile, 0))
        n_at = jnp.sum(jnp.where(tsel & (trow == 1), ttile, 0))

        j0 = pl.multiple_of(
            jnp.minimum((start // 128) * 128, n_pad - MW), 128)
        off = start - j0
        itile = data_ref[pl.dslice(0, 8), pl.dslice(j0, MW)]  # [8,MW]
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, MW), 1)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, MW), 0)

        def pick(a, row):
            sel = lane == off + a
            return jnp.sum(jnp.where(sel & (sub == row), itile, 0.0))

        valid = [jnp.asarray(a, jnp.int32) < n_at for a in range(a_max)]
        old = [[pick(a, r) for r in (ROW_X, ROW_Y, ROW_Z)]
               for a in range(a_max)]
        eps_i = [pick(a, ROW_EPS) for a in range(a_max)]
        sig_i = [pick(a, ROW_SIG) for a in range(a_max)]
        q_i = [pick(a, ROW_Q) for a in range(a_max)]

        disp = [(2.0 * u_ref[k, 1 + c] - 1.0) * mf for c in range(3)]
        if a_max == 1:
            new = [[old[0][c] + disp[c] for c in range(3)]]
        else:
            # mass-weighted COM, then translate + rotate about it
            mass = [jnp.where(valid[a], pick(a, ROW_MASS), 0.0)
                    for a in range(a_max)]
            msum = sum(mass)
            com = [sum(mass[a] * old[a][c] for a in range(a_max))
                   / jnp.maximum(msum, 1e-30) for c in range(3)]
            # uniform axis (sphere point picking) + uniform angle
            az = 2.0 * u_ref[k, 5] - 1.0
            aphi = 2.0 * np.float32(np.pi) * u_ref[k, 6]
            s = jnp.sqrt(jnp.maximum(1.0 - az * az, 0.0))
            ax, ay = s * jnp.cos(aphi), s * jnp.sin(aphi)
            ang = u_ref[k, 7] * rotf
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            omc = 1.0 - ca
            R = [[ca + ax * ax * omc, ax * ay * omc - az * sa,
                  ax * az * omc + ay * sa],
                 [ay * ax * omc + az * sa, ca + ay * ay * omc,
                  ay * az * omc - ax * sa],
                 [az * ax * omc - ay * sa, az * ay * omc + ax * sa,
                  ca + az * az * omc]]
            new = []
            for a in range(a_max):
                rel = [old[a][c] - com[c] for c in range(3)]
                new.append([com[c] + disp[c]
                            + sum(R[c][d] * rel[d] for d in range(3))
                            for c in range(3)])

        # --- old+new delta pass over column tiles ---------------------------
        def col(jt, acc):
            rd_o, es_o, rd_n, es_n, mr2 = acc
            c0 = jt * TJ
            blk = data_ref[pl.dslice(0, 8), pl.dslice(c0, TJ)]
            px, py, pz = blk[ROW_X], blk[ROW_Y], blk[ROW_Z]
            eps_j, sig_j = blk[ROW_EPS], blk[ROW_SIG]
            q_j, alive_j = blk[ROW_Q], blk[ROW_ALIVE]
            cols = c0 + jax.lax.broadcasted_iota(jnp.int32, (TJ,), 0)
            # inter-molecular only: the moved molecule's own columns are
            # excluded (ops/pairs._block_terms same_mol mask)
            ok = ((alive_j > 0) & (cols < n_real)
                  & ((cols < start) | (cols >= start + n_at)))

            def mimg(dx, dy, dz):
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
                    eps_i[a], sig_i[a], q_i[a], rc, alpha, cfg)
                r_n, e_n, m2 = _pair_terms(
                    dn[0], dn[1], dn[2], eps_j, sig_j, q_j, ok_a,
                    eps_i[a], sig_i[a], q_i[a], rc, alpha, cfg)
                rd_o, es_o = rd_o + r_o, es_o + e_o
                rd_n, es_n = rd_n + r_n, es_n + e_n
                mr2 = jnp.minimum(mr2, m2)
            return (rd_o, es_o, rd_n, es_n, mr2)

        z = jnp.zeros((), jnp.float32)
        rd_o, es_o, rd_n, es_n, mr2 = jax.lax.fori_loop(
            0, n_tiles, col, (z, z, z, z, jnp.asarray(jnp.inf)))
        drd = rd_n - rd_o
        des = KE * (es_n - es_o)

        # --- k-space S(k) delta (ewald only; mirrors mc.metropolis.
        # _mol_sf_delta + _recip_delta): dS = sum_a q_a (cis(k.r_new_a)
        # - cis(k.r_old_a)); dE = sum_k c_k (|S+dS|^2 - |S|^2) with
        # c_k = KE (2 pi / V) pw_k exp(-k^2/4a^2)/k^2 folded in on the
        # host.  Padded k lanes have c=0 and k=0 (so dS there is 0 by
        # cos(0)-cos(0)).  Self/intra-exclusion terms are rigid-move
        # invariant and stay constant (module docstring).
        if ew:
            kt = ktab_ref[pl.dslice(0, 4), pl.dslice(0, nk_pad)]
            kx, ky, kz, kc = kt[0:1], kt[1:2], kt[2:3], kt[3:4]
            dsr = jnp.zeros((1, nk_pad), jnp.float32)
            dsi = jnp.zeros((1, nk_pad), jnp.float32)
            for a in range(a_max):
                qa = (jnp.where(valid[a], q_i[a], 0.0)
                      if a_max > 1 else q_i[a])
                to = kx * old[a][0] + ky * old[a][1] + kz * old[a][2]
                tn = kx * new[a][0] + ky * new[a][1] + kz * new[a][2]
                dsr = dsr + qa * (jnp.cos(tn) - jnp.cos(to))
                dsi = dsi + qa * (jnp.sin(tn) - jnp.sin(to))
            s = sk_ref[pl.dslice(0, 2), pl.dslice(0, nk_pad)]
            sr, si = s[0:1], s[1:2]
            drec = jnp.sum(kc * ((2.0 * sr + dsr) * dsr
                                 + (2.0 * si + dsi) * dsi))
        else:
            drec = jnp.zeros((), jnp.float32)

        du = drd + des + drec
        reject_overlap = (thr2 > 0.0) & (mr2 < thr2)
        accept = ((jnp.log(jnp.maximum(u_ref[k, 4], 1e-38))
                   < -beta * du) & ~reject_overlap)

        @pl.when(accept)
        def _():
            tile = data_ref[pl.dslice(0, 8), pl.dslice(j0, MW)]
            for a in range(a_max):
                va = valid[a] if a_max > 1 else True
                sel = (lane == off + a) & va
                for c, r in enumerate((ROW_X, ROW_Y, ROW_Z)):
                    tile = jnp.where(sel & (sub == r), new[a][c], tile)
            data_ref[pl.dslice(0, 8), pl.dslice(j0, MW)] = tile

        if ew:
            @pl.when(accept)
            def _():
                sk_ref[pl.dslice(0, 2), pl.dslice(0, nk_pad)] = (
                    jnp.concatenate([sr + dsr, si + dsi], axis=0))

        af = accept.astype(jnp.float32)
        return (d_rd + af * drd, d_es + af * des, d_rec + af * drec,
                n_acc + af)

    z = jnp.zeros((), jnp.float32)
    d_rd, d_es, d_rec, n_acc = jax.lax.fori_loop(0, n_steps, step,
                                                 (z, z, z, z))
    out_ref[0, 0] = d_rd
    out_ref[0, 1] = d_es
    out_ref[0, 2] = d_rec
    out_ref[0, 3] = n_acc
    # non-ewald: sk_ref is aliased to its (dummy) input and stays as-is


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_steps", "n_real", "a_max",
                                    "interpret"))
def run_steps(pos, eps, sig, charge, mass, alive, mov_start, mov_natoms,
              box, rc, alpha, beta, move_factor, rot_factor, thr2,
              uniforms, cfg, n_steps, n_real, a_max=1, interpret=False,
              kvecs=None, kcoef=None, sk_re=None, sk_im=None):
    """K fused translate+rotate steps.  Returns (new_pos [N,3], d_rd,
    d_es, d_recip, n_accept, sk_re', sk_im').  ``mov_start``/
    ``mov_natoms``: [Mv] first atom row and atom count of each movable
    molecule; ``uniforms``: [K, 8] from draw_uniforms; ``a_max``: static
    max movable-molecule size.  For cfg.coulomb == 'ewald' pass
    ``kvecs`` [Nk,3], ``kcoef`` [Nk] (the fully-folded per-k energy
    coefficient KE*(2pi/V)*pw*exp(-k^2/4a^2)/k^2) and the cached
    structure factor ``sk_re``/``sk_im`` [Nk]; the updated S(k) comes
    back in the last two outputs (pass-through otherwise)."""
    f32 = jnp.float32
    n_pad = _round_up(n_real, TJ)
    ew = cfg.coulomb == "ewald"
    if ew:
        nk = kvecs.shape[0]
        nk_pad = _round_up(nk, 128)

        def padk(x):
            x = jnp.asarray(x).astype(f32)
            return jnp.pad(x, (0, nk_pad - x.shape[0]))

        ktab = jnp.stack([padk(kvecs[:, 0]), padk(kvecs[:, 1]),
                          padk(kvecs[:, 2]), padk(kcoef)])
        sk = jnp.stack([padk(sk_re), padk(sk_im)])
    else:
        nk = nk_pad = 128
        ktab = jnp.zeros((4, nk_pad), f32)
        sk = jnp.zeros((2, nk_pad), f32)

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
    data = data.at[ROW_MASS].set(pad1(mass))

    mv = jnp.asarray(mov_start, jnp.int32)
    na = jnp.asarray(mov_natoms, jnp.int32)
    mv_pad = _round_up(max(mv.shape[0], 1), 128)
    tbl = jnp.stack([jnp.pad(mv, (0, mv_pad - mv.shape[0])),
                     jnp.pad(na, (0, mv_pad - na.shape[0]))])

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
    scal = scal.at[1, :9].set(box32.reshape(-1))
    scal = scal.at[2, :9].set(binv.reshape(-1))

    u = jnp.asarray(uniforms, f32)

    out_data, out_sums, out_sk = pl.pallas_call(
        functools.partial(_kernel, cfg=cfg, n_steps=n_steps,
                          n_pad=n_pad, n_real=n_real, a_max=a_max,
                          nk_pad=nk_pad),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((3, 16), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_steps, 8), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, mv_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, nk_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, nk_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, n_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda _: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2, nk_pad), lambda _: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, n_pad), f32),
            jax.ShapeDtypeStruct((1, 8), f32),
            jax.ShapeDtypeStruct((2, nk_pad), f32),
        ],
        input_output_aliases={4: 0, 5: 2},
        interpret=interpret,
    )(scal, u, tbl, ktab, data, sk)
    new_pos = jnp.stack([out_data[ROW_X, :n_real],
                         out_data[ROW_Y, :n_real],
                         out_data[ROW_Z, :n_real]], axis=1)
    return (new_pos.astype(pos.dtype), out_sums[0, 0], out_sums[0, 1],
            out_sums[0, 2], out_sums[0, 3],
            out_sk[0, :nk], out_sk[1, :nk])


def draw_uniforms(key, n_steps):
    """[K, 8] uniform table: lane 0 molecule pick, 1-3 displacement,
    4 acceptance coin, 5-7 rotation (axis z, azimuth, angle)."""
    return jax.random.uniform(key, (n_steps, 8), jnp.float32)


def supported(cfg, params) -> bool:
    """Static gate for the fused multi-step path (module docstring)."""
    if not (cfg.ensemble == "nvt"
            and cfg.rd_potential in ("lj", "none")
            and cfg.coulomb in ("none", "cutoff", "wolf", "ewald")
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
    # rigid molecules up to MAX_SITES atoms (no intra terms)
    natoms = np.asarray(params.mol_natoms)
    frozen = np.asarray(params.mol_frozen)
    mov = ~frozen & (np.asarray(params.mol_species) >= 0)
    return bool(mov.any()) and bool((natoms[mov] <= MAX_SITES).all())


def movable_mols(params, mol_alive):
    """([Mv] first atom row, [Mv] atom count, a_max) of each alive
    movable molecule."""
    alive = np.asarray(mol_alive)
    frozen = np.asarray(params.mol_frozen)
    spec = np.asarray(params.mol_species)
    start = np.asarray(params.mol_start)
    natoms = np.asarray(params.mol_natoms)
    mv = alive & ~frozen & (spec >= 0)
    a_max = int(natoms[mv].max()) if mv.any() else 1
    return (start[mv].astype(np.int32), natoms[mv].astype(np.int32),
            a_max)


def movable_atoms(params, mol_alive) -> np.ndarray:
    """[Mv] atom row of each alive movable molecule (legacy monatomic
    helper; see movable_mols)."""
    return movable_mols(params, mol_alive)[0]
