"""Benchmarks: MC steps/sec on the five BASELINE.json configs.

The headline (north-star) metric — aggregate GCMC steps/s on the
~10.8k-atom MOF+H2 + Ewald system with batched chains — is printed as
the FINAL JSON line (the driver's one-JSON-line contract parses the tail
of stdout).  The four secondary configs print one JSON line each first,
so every perf axis is tracked per round (VERDICT r1 item 4):

    1. lj_nvt          NVT Lennard-Jones-only fluid, ~10k atoms
    2. nvt_ewald       NVT, charged framework + point-charge sorbate
    3. gcmc (headline) GCMC H2-in-MOF, LJ + Ewald, batched chains
    4. polar_gcmc      polarizable GCMC (Thole SCF), single chain
       + polar_ref_rule: same, reference-parity dipole stopping rule
       + polar_wolf / polar_54k (r5), polar_rc14 tile-culled (r6)
    5. pt_round        8-replica parallel tempering with neighbor swaps
    6. gcmc_tmmc       fused µVT with TMMC collection on (r4)
    7. large_n         ~53.7k-atom scale config (r4)

Every metric reports n_repeats >= 2 with min/max spread (r3 verdict
item 3).

The reference publishes no benchmark numbers (BASELINE.json
``published: {}``); ``vs_baseline`` is computed against the documented
single-core-C algorithmic estimates in BASELINE.md (the most
conservative, fastest end of each band).  All five results are also
written to ``BENCH_FULL.json``.

Sync discipline (CLAUDE.md): host fetches via np.asarray, never
block_until_ready; warm up with the SAME static args that are timed.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# single-core-C estimates per config (BASELINE.md: O(N^2) resum per step;
# conservative fast end of each band)
BASELINES = {
    "lj_nvt": 100.0,       # LJ-only: cheapest per-pair kernel
    "nvt_ewald": 10.0,     # + erfc/exclusion/recip bookkeeping
    "gcmc": 10.0,
    "polar_gcmc": 1.0,     # + Thole SCF iterations dominate
    "pt_round": 10.0,      # per-replica cost = gcmc-like NVT Ewald
}


def _time_batched(state, params, cfg, thermo, n_chains, chunk, n_chunks=3):
    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.parallel import multichain

    state = metropolis.initialize(state, params, cfg, thermo)
    states = multichain.stack_states(state, n_chains)
    states = multichain.initialize_batched(states, params, cfg, thermo)
    states, _ = multichain.run_chunk_batched(states, params, cfg, thermo,
                                             chunk)
    np.asarray(states.energy.rd)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        states, _ = multichain.run_chunk_batched(states, params, cfg,
                                                 thermo, chunk)
    np.asarray(states.energy.rd)
    wall = time.perf_counter() - t0
    return n_chunks * chunk * n_chains / wall


def bench_gcmc():
    """Headline: ~9.3k-atom framework + up to 512 H2 (x3 sites), C=128
    independent GCMC chains batched on one chip (measured optimum,
    CLAUDE.md perf snapshot)."""
    from mpmc_tpu.models import systems

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        temperature=77.0, pressure=1.0)
    sps = _time_batched(state, params, cfg, thermo, n_chains=128,
                        chunk=128, n_chunks=4)
    return {
        "metric":
            "agg_mc_steps_per_sec_10k_mof_h2_gcmc_ewald_batched_chains",
        "value": round(sps, 2), "unit": "steps/s",
        "vs_baseline": round(sps / BASELINES["gcmc"], 2),
    }


def bench_lj_nvt():
    """BASELINE config 1: neutral LJ fluid, ~10k atoms, NVT.  Races the
    C=128 batched-scan chains against C chains interleaved in ONE fused
    Pallas launch (run_chunk_fused_multi), same strategy race as
    bench_nvt_ewald — the single fused chain alone already beat the
    scan aggregate (424k vs 180k, 2026-08-19)."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.parallel import multichain

    params, state, cfg, thermo = systems.lj_fluid(n=10000)
    sps_scan = _time_batched(state, params, cfg, thermo, n_chains=128,
                             chunk=64)

    sps_multi, c_multi = 0.0, 0
    params_f, state_f, cfg_f, thermo_f = systems.lj_fluid(
        n=10000, dtype="float32")
    cfg_f = dataclasses.replace(cfg_f, fused_mc=True)
    st0 = metropolis.initialize(state_f, params_f, cfg_f, thermo_f)
    for C in (16, 48):      # race interleave widths on real HW
        try:
            K, reps = 4096, 3
            states = multichain.stack_states(st0, C)
            states, _ = metropolis.run_chunk_fused_multi(
                states, params_f, cfg_f, thermo_f, K)
            np.asarray(states.pos)
            t0 = time.perf_counter()
            for _ in range(reps):
                states, _ = metropolis.run_chunk_fused_multi(
                    states, params_f, cfg_f, thermo_f, K)
            np.asarray(states.pos)
            sps_c = reps * K * C / (time.perf_counter() - t0)
            if sps_c > sps_multi:
                sps_multi, c_multi = sps_c, C
        except Exception:
            pass            # e.g. compile-service timeout at this C

    sps, method = max((sps_scan, "batched_scan_c128"),
                      (sps_multi, f"fused_interleaved_c{c_multi}"))
    return {"metric": "agg_mc_steps_per_sec_10k_lj_nvt",
            "value": round(sps, 2), "unit": "steps/s",
            "vs_baseline": round(sps / BASELINES["lj_nvt"], 2),
            "method": method}


def bench_lj_nvt_fused():
    """Single-chain latency path: fused multi-step Pallas kernel
    (ops/pallas/mc_kernel.py) on the config-1 LJ fluid.  Tracks the
    per-launch amortization win vs the lax.scan path (VERDICT r1
    item 3; 164k vs 8.5k scan steps/s after the 2026-08-17 packed-plane
    + one-dispatch-per-chunk rework)."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems

    params, state, cfg, thermo = systems.lj_fluid(n=10000,
                                                  dtype="float32")
    cfg = dataclasses.replace(cfg, fused_mc=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    K, reps = 8192, 5
    st, _ = metropolis.run_chunk_fused(state, params, cfg, thermo, K)
    np.asarray(st.pos)
    t0 = time.perf_counter()
    for _ in range(reps):
        st, _ = metropolis.run_chunk_fused(st, params, cfg, thermo, K)
    np.asarray(st.pos)
    sps = reps * K / (time.perf_counter() - t0)
    return {"metric": "mc_steps_per_sec_10k_lj_nvt_single_chain_fused",
            "value": round(sps, 2), "unit": "steps/s",
            "vs_baseline": round(sps / BASELINES["lj_nvt"], 2)}


def bench_gcmc_fused():
    """Fused µVT Pallas kernel (ops/pallas/mc_kernel.py::run_steps_uvt)
    on the north-star MOF+H2 GCMC system with Ewald — single chain.
    2026-08-17 (packed planes + one-dispatch chunks): 232k steps/s vs
    3.6k scan (64x); this now exceeds the 128-chain batched scan
    aggregate, so it doubles as the headline when it wins (main())."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg = dataclasses.replace(cfg, fused_mc=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    K, reps = 8192, 5
    st, _ = metropolis.run_chunk_fused_uvt(state, params, cfg, thermo, K)
    np.asarray(st.pos)
    t0 = time.perf_counter()
    for _ in range(reps):
        st, _ = metropolis.run_chunk_fused_uvt(st, params, cfg, thermo,
                                               K)
    np.asarray(st.pos)
    sps = reps * K / (time.perf_counter() - t0)
    return {"metric":
            "mc_steps_per_sec_10k_mof_h2_gcmc_single_chain_fused",
            "value": round(sps, 2), "unit": "steps/s",
            "vs_baseline": round(sps / BASELINES["gcmc"], 2)}


def bench_gcmc_fused_multi():
    """Chain-interleaved C=8 fused GCMC AGGREGATE (one launch advances
    all chains; ops/pallas/mc_kernel.run_steps_uvt_multi) on the
    north-star system — a third headline contender beside the batched
    scan and the single fused chain."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.parallel import multichain

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg = dataclasses.replace(cfg, fused_mc=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    best, best_c = 0.0, 0
    widths = {}
    # race interleave widths on real HW.  r5 fine-grid re-derivation
    # (MEASURE_INTERLEAVE_SCAN, {8..48} step 8): c16-c48 is a FLAT
    # plateau within run-to-run variance (±2%) — the r4 "interior
    # optimum at c32" was chip-state variance, so {16,32,48} brackets
    # the plateau and racing finer grids buys nothing.
    for C in (16, 32, 48):
        try:
            K, reps = 4096, 3
            states = multichain.stack_states(state, C)
            states, _ = metropolis.run_chunk_fused_uvt_multi(
                states, params, cfg, thermo, K)
            np.asarray(states.pos)
            t0 = time.perf_counter()
            for _ in range(reps):
                states, _ = metropolis.run_chunk_fused_uvt_multi(
                    states, params, cfg, thermo, K)
            np.asarray(states.pos)
            sps = reps * K * C / (time.perf_counter() - t0)
        except Exception:
            widths[f"c{C}"] = "error"
            continue     # compile-service timeout / Mosaic failure at
                         # this width — keep the best surviving C
        widths[f"c{C}"] = round(sps, 2)
        if sps > best:
            best, best_c = sps, C
    return {"metric":
            "agg_mc_steps_per_sec_10k_mof_h2_gcmc_fused_interleaved"
            f"_c{best_c}",
            "value": round(best, 2), "unit": "steps/s",
            "vs_baseline": round(best / BASELINES["gcmc"], 2),
            # the losing widths, so round-over-round winner flips are
            # interpretable (r2 verdict item 5)
            "widths": widths}


def bench_gcmc_tmmc():
    """Fused µVT kernel with transition-matrix collection ON
    (RunConfig.tmmc: in-kernel per-macrostate acceptance-probability
    planes) on the 10.8k-atom north-star system — the single-run
    isotherm flagship path (r3).  Tracks the r3 CLAUDE.md 221.9k
    steps/s claim as a driver-visible artifact (r3 verdict weak #2)."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops.pallas import mc_kernel

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg = dataclasses.replace(cfg, fused_mc=True, tmmc=True)
    assert mc_kernel.supported_uvt(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    K, reps = 8192, 5
    st, _ = metropolis.run_chunk_fused_uvt(state, params, cfg, thermo, K)
    np.asarray(st.pos)
    t0 = time.perf_counter()
    for _ in range(reps):
        st, _ = metropolis.run_chunk_fused_uvt(st, params, cfg, thermo, K)
    np.asarray(st.pos)
    sps = reps * K / (time.perf_counter() - t0)
    return {"metric":
            "mc_steps_per_sec_10k_mof_h2_gcmc_tmmc_collection_fused",
            "value": round(sps, 2), "unit": "steps/s",
            "vs_baseline": round(sps / BASELINES["gcmc"], 2)}


def bench_large_n():
    """Scale axis: ~53.7k-atom MOF+H2 GCMC + Ewald (n_side=37,
    capacity=1024) — the VMEM-envelope story (r3 verdict weak #4:
    regressions on the scale axis were tracked only in old MEASURE
    files).  Races the single fused chain against C in {8,12,16}
    interleaved (r5 MEASURE_INTERLEAVE_SCAN: c8-c16 is a flat plateau
    within run-to-run variance with c12 best in that session; C=32
    crashes the compile helper — do not widen)."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops.pallas import mc_kernel
    from mpmc_tpu.parallel import multichain

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=37, spacing=4.0, n_h2=512, capacity=1024,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg = dataclasses.replace(cfg, fused_mc=True)
    assert mc_kernel.supported_uvt(cfg, params)
    state = metropolis.initialize(state, params, cfg, thermo)
    K = 2048
    st, _ = metropolis.run_chunk_fused_uvt(state, params, cfg, thermo, K)
    np.asarray(st.pos)
    t0 = time.perf_counter()
    for _ in range(3):
        st, _ = metropolis.run_chunk_fused_uvt(st, params, cfg, thermo, K)
    np.asarray(st.pos)
    best = 3 * K / (time.perf_counter() - t0)
    method, widths = "single_fused", {"single": round(best, 2)}
    for C in (8, 12, 16):
        try:
            states = multichain.stack_states(state, C)
            states, _ = metropolis.run_chunk_fused_uvt_multi(
                states, params, cfg, thermo, K)
            np.asarray(states.pos)
            t0 = time.perf_counter()
            for _ in range(3):
                states, _ = metropolis.run_chunk_fused_uvt_multi(
                    states, params, cfg, thermo, K)
            np.asarray(states.pos)
            sps = 3 * K * C / (time.perf_counter() - t0)
        except Exception:
            widths[f"c{C}"] = "error"
            continue
        widths[f"c{C}"] = round(sps, 2)
        if sps > best:
            best, method = sps, f"fused_interleaved_c{C}"
    return {"metric": "agg_mc_steps_per_sec_54k_mof_h2_gcmc_ewald",
            "value": round(best, 2), "unit": "steps/s",
            "vs_baseline": round(best / (BASELINES["gcmc"] / 25.0), 2),
            "method": method, "widths": widths,
            "n_atoms": int(params.n_atoms_max)}


def bench_nvt_ewald():
    """BASELINE config 2: charged rigid framework + point-charge
    sorbates, NVT (displace/rotate only).  Races the two aggregate
    strategies: C=128 batched-scan chains vs C=16 chains interleaved in
    ONE fused Pallas launch (run_chunk_fused_multi)."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.parallel import multichain

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512)
    cfg = dataclasses.replace(cfg, ensemble="nvt")
    sps_scan = _time_batched(state, params, cfg, thermo, n_chains=128,
                             chunk=64)

    sps_multi, c_multi = 0.0, 0
    cfg_f = dataclasses.replace(cfg, fused_mc=True)
    st0 = metropolis.initialize(state, params, cfg_f, thermo)
    for C in (16, 48):      # race interleave widths on real HW
        try:
            K, reps = 4096, 3
            states = multichain.stack_states(st0, C)
            states, _ = metropolis.run_chunk_fused_multi(
                states, params, cfg_f, thermo, K)
            np.asarray(states.pos)
            t0 = time.perf_counter()
            for _ in range(reps):
                states, _ = metropolis.run_chunk_fused_multi(
                    states, params, cfg_f, thermo, K)
            np.asarray(states.pos)
            sps_c = reps * K * C / (time.perf_counter() - t0)
            if sps_c > sps_multi:
                sps_multi, c_multi = sps_c, C
        except Exception:
            pass            # e.g. compile-service timeout at this C

    sps, method = max((sps_scan, "batched_scan_c128"),
                      (sps_multi, f"fused_interleaved_c{c_multi}"))
    return {"metric": "agg_mc_steps_per_sec_10k_mof_h2_nvt_ewald",
            "value": round(sps, 2), "unit": "steps/s",
            "vs_baseline": round(sps / BASELINES["nvt_ewald"], 2),
            "method": method}


def bench_polar_gcmc():
    """BASELINE config 4: polarizable GCMC (Thole dipole SCF).  Single
    chain — the SCF matvec saturates the chip at C=1 (CLAUDE.md)."""
    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems

    import dataclasses

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        polarization=True)
    state = metropolis.initialize(state, params, cfg, thermo)
    chunk = 64

    def time_cfg(c):
        st, _ = metropolis.run_chunk(state, params, c, thermo, chunk)
        np.asarray(st.energy.rd)
        t0 = time.perf_counter()
        for _ in range(3):
            st, _ = metropolis.run_chunk(st, params, c, thermo, chunk)
        np.asarray(st.energy.rd)
        return 3 * chunk / (time.perf_counter() - t0)

    def time_pda():
        import dataclasses as _dc

        from mpmc_tpu.ops.pallas import mc_kernel
        c = _dc.replace(cfg, polar_delayed=True, fused_mc=True)
        if not mc_kernel.supported_uvt_polar_da(c, params):
            return 0.0
        K = 512
        st, _ = metropolis.run_chunk_fused_uvt_polar_da(
            state, params, c, thermo, K)
        np.asarray(st.energy.rd)
        t0 = time.perf_counter()
        n = 0
        for _ in range(3):
            st, stats = metropolis.run_chunk_fused_uvt_polar_da(
                st, params, c, thermo, K)
            n += int(np.asarray(stats.attempts).sum())
        np.asarray(st.energy.rd)
        return n / (time.perf_counter() - t0)

    # race plain Metropolis against delayed acceptance (polar_delayed:
    # zodid stage-1 filter, SCF only for survivors — same stationary
    # distribution, test_thole.py)
    sps_plain = time_cfg(cfg)
    sps_da = time_cfg(dataclasses.replace(cfg, polar_delayed=True))
    sps_pda = time_pda()
    sps, method = max((sps_plain, "metropolis"),
                      (sps_da, "delayed_acceptance"),
                      (sps_pda, "fused_stage1_delayed_acceptance"))
    return {"metric": "mc_steps_per_sec_10k_mof_h2_polar_gcmc_thole_scf",
            "value": round(sps, 2), "unit": "steps/s",
            "vs_baseline": round(sps / BASELINES["polar_gcmc"], 2),
            "method": method}


def bench_polar_ref_rule():
    """First-class metric (r3 verdict items 1b/1c): the fused polar DA
    path under the REFERENCE's convergence rule (per-iteration RMS
    dipole change, ``polar_precision_mode dipole``) at the
    BENCH-SIZE-VALIDATED tolerance 1e-4 Debye.  The r4 drift
    calibration at three system sizes (MEASURE_DIPOLE_TOL*.json;
    docs/performance.md r4) showed the rule is size-INCONSISTENT: on
    this 10.8k-site system the reference-typical 1e-3 setting biases
    the carried U_pol by 198.7 K (~2.6 kT) and 3e-4 by 14.1 K, while
    1e-4 matches the residual-1e-6 fixed point (drift 0.0018 K).  The
    looser points' speeds are reported as labeled fields with their
    measured drifts — speed purchased with size-growing energy bias,
    not claimed as validated performance."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops.pallas import mc_kernel

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        polarization=True)

    def speed(tol):
        c = dataclasses.replace(cfg, polar_delayed=True, fused_mc=True,
                                polar_precision_mode="dipole",
                                polar_precision=tol)
        assert mc_kernel.supported_uvt_polar_da(c, params)
        K = 512
        st = metropolis.initialize(state, params, c, thermo)
        st, _ = metropolis.run_chunk_fused_uvt_polar_da(st, params, c,
                                                        thermo, K)
        np.asarray(st.energy.rd)
        t0 = time.perf_counter()
        n = 0
        for _ in range(3):
            st, stats = metropolis.run_chunk_fused_uvt_polar_da(
                st, params, c, thermo, K)
            n += int(np.asarray(stats.attempts).sum())
        np.asarray(st.energy.rd)
        return n / (time.perf_counter() - t0)

    # bench-size U_pol drifts come from the committed calibration
    # artifact (MEASURE_DIPOLE_TOL_BENCH.json, tools/measure_dipole_
    # tol.py), not hand-copied constants (r4 advisor): if the artifact
    # is missing or lacks a tolerance point, the speed-only field is
    # omitted rather than emitted with a stale drift label.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(
                __file__)), "MEASURE_DIPOLE_TOL_BENCH.json")) as f:
            _tolcal = json.load(f)
    except OSError:
        _tolcal = {}

    def _speed_only(tol, key):
        d = _tolcal.get(key, {}).get("max_u_pol_drift_K")
        if d is None:
            return None
        return round(speed(tol), 2), round(d, 2)

    def drift_check(mode, tol, n_steps=192):
        """Self-enforcing accuracy gate at BENCH size (r4 verdict item
        3 follow-up): run a short chain under the given stopping rule,
        then re-solve the SAME final configuration to a tight
        residual-1e-8 fixed point — the U_pol gap is the carried
        drift.  Measured in-situ (f32, TPU, fused path) this includes
        the f32 bookkeeping floor, so the GATE below is DIFFERENTIAL:
        dipole-1e-4 drift vs residual-1e-6 drift from identical
        chains.  The r4 f64 calibration isolated the rule bias itself
        (0.0018 K at 1e-4 vs 198.7 K at 1e-3); a rule regression
        toward 1e-3-like behavior trips the differential gate by two
        orders of magnitude regardless of the f32 floor."""
        from mpmc_tpu.ops import thole
        c = dataclasses.replace(cfg, polar_delayed=True, fused_mc=True,
                                polar_precision_mode=mode,
                                polar_precision=tol)
        st = metropolis.initialize(state, params, c, thermo)
        st, _ = metropolis.run_chunk_fused_uvt_polar_da(st, params, c,
                                                        thermo, n_steps)
        c_ref = dataclasses.replace(c, polar_precision_mode="residual",
                                    polar_precision=1e-8)
        alive = st.atom_alive(params)
        mu_ref, _, _ = thole.solve_scf(st.pos, st.box, alive, params,
                                       c_ref, st.e0, mu0=st.mu)
        u_run = float(np.asarray(thole.polar_energy(st.mu, st.e0)))
        u_ref = float(np.asarray(thole.polar_energy(mu_ref, st.e0)))
        return abs(u_run - u_ref)

    sps = speed(1e-4)
    drift_k = drift_check("dipole", 1e-4)
    drift_ref_k = drift_check("residual", 1e-6)
    # differential gate: the dipole rule must not drift more than the
    # validated residual rule's own in-situ drift (f32 floor) by more
    # than 3x + 0.5 K headroom; the retired 1e-3 point sits ~199 K
    # above the floor and would trip this by orders of magnitude
    gate_k = 3.0 * drift_ref_k + 0.5
    validated = drift_k < gate_k
    unval = {}
    so = _speed_only(3e-4, "dipole_0.0003")
    if so:
        unval["dipole_3e-4_steps_per_s"] = so[0]
        unval["dipole_3e-4_u_pol_drift_K_bench_size"] = so[1]
    so = _speed_only(1e-3, "dipole_0.001")
    if so:
        unval["ref_typical_1e-3_steps_per_s"] = so[0]
        unval["ref_typical_1e-3_u_pol_drift_K_bench_size"] = so[1]
    return {"metric":
            "mc_steps_per_sec_10k_mof_h2_polar_gcmc_ref_stopping_rule",
            "value": round(sps, 2), "unit": "steps/s",
            "vs_baseline": round(sps / BASELINES["polar_gcmc"], 2),
            "method": ("fused_pda_dipole_mode_1e-4_debye_validated"
                       if validated else
                       "fused_pda_dipole_mode_1e-4_VALIDATION_FAILED"),
            "u_pol_drift_K_measured": round(drift_k, 4),
            "u_pol_drift_K_residual_rule_floor": round(drift_ref_k, 4),
            "drift_gate_K": round(gate_k, 4),
            "speed_only_unvalidated": unval}


def bench_polar_wolf_gcmc():
    """r5 (r4 verdict item 1 'Done' criterion): the production
    Wolf-field polarizable GCMC on the fused PDA path at the validated
    residual-1e-6 rule — the config that fell off a ~10x cliff to the
    full-rebuild scan path before the r5 field-variant widening
    (thole.move_deltas wolf kernel + in-kernel screened field
    coefficient).  The full-Ewald polar field rides as a labeled
    secondary (its k-space delta is linear in the cached S(k))."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops.pallas import mc_kernel

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        polarization=True)

    def time_variant(**kw):
        c = dataclasses.replace(cfg, polar_delayed=True, fused_mc=True,
                                **kw)
        assert mc_kernel.supported_uvt_polar_da(c, params)
        K = 512
        st = metropolis.initialize(state, params, c, thermo)
        st, _ = metropolis.run_chunk_fused_uvt_polar_da(st, params, c,
                                                        thermo, K)
        np.asarray(st.energy.rd)
        t0 = time.perf_counter()
        n = 0
        for _ in range(3):
            st, stats = metropolis.run_chunk_fused_uvt_polar_da(
                st, params, c, thermo, K)
            n += int(np.asarray(stats.attempts).sum())
        np.asarray(st.energy.rd)
        return n / (time.perf_counter() - t0)

    sps = time_variant(polar_wolf=True)
    sps_ew = time_variant(polar_ewald=True)
    return {"metric": "mc_steps_per_sec_10k_mof_h2_polar_wolf_gcmc",
            "value": round(sps, 2), "unit": "steps/s",
            "vs_baseline": round(sps / BASELINES["polar_gcmc"], 2),
            "method": "fused_pda_residual_1e-6",
            "polar_ewald_steps_per_s": round(sps_ew, 2)}


def bench_polar_rc14_gcmc():
    """r6: the explicit-small-cutoff polar GCMC regime (``cutoff 14``,
    the production rc ~ 12-15 A band) with the tile-culled SCF matvec
    (thole.cull_perm/cull_visit + the visit-table pallas kernel; cull
    decisions are conservative AABB min-image bounds, so the matvec is
    exact — skipped tiles hold only cutoff-masked zero pairs).
    Measured 2026-08-21: raw matvec 3.61 -> 1.95 ms (visit fraction
    0.42 at the 256x1024 kernel granularity), end-to-end fused PDA
    +67% (MEASURE_POLAR_CULL.json).  Races cull on vs off in-process
    and reports the winner with the off value attached."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops.pallas import mc_kernel

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        polarization=True)

    def time_variant(cull):
        c = dataclasses.replace(cfg, cutoff=14.0, polar_delayed=True,
                                fused_mc=True,
                                polar_cull="auto" if cull else "off")
        assert mc_kernel.supported_uvt_polar_da(c, params)
        K = 512
        st = metropolis.initialize(state, params, c, thermo)
        st, _ = metropolis.run_chunk_fused_uvt_polar_da(st, params, c,
                                                        thermo, K)
        np.asarray(st.energy.rd)
        t0 = time.perf_counter()
        n = 0
        for _ in range(3):
            st, stats = metropolis.run_chunk_fused_uvt_polar_da(
                st, params, c, thermo, K)
            n += int(np.asarray(stats.attempts).sum())
        np.asarray(st.energy.rd)
        return n / (time.perf_counter() - t0)

    sps_on = time_variant(True)
    sps_off = time_variant(False)
    sps, method = max((sps_on, "fused_pda_tile_culled_matvec"),
                      (sps_off, "fused_pda_dense_matvec"))
    return {"metric": "mc_steps_per_sec_10k_mof_h2_polar_rc14_gcmc",
            "value": round(sps, 2), "unit": "steps/s",
            # vs the derived-rc polar baseline: rc14 is a different
            # physics config, so this column is context, not parity
            "vs_baseline": round(sps / BASELINES["polar_gcmc"], 2),
            "method": method,
            "dense_matvec_steps_per_s": round(sps_off, 2),
            "cull_speedup": round(sps_on / max(sps_off, 1e-9), 2)}


def bench_polar_54k():
    """r5 (r4 verdict item 4): the first polar number beyond 10.8k —
    the 53.7k-atom MOF+H2 polar GCMC on the fused PDA path (the PDA
    kernel fits VMEM at this size; the cost is the O(N'^2) stage-2
    matvec, ~25x the 10.8k cost per application)."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems
    from mpmc_tpu.ops.pallas import mc_kernel

    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=37, spacing=4.0, n_h2=512, capacity=1024,
        polarization=True)

    def time_variant(cull):
        # polar_cull "on" forces the tile-culled matvec at the derived
        # rc = L/2: at 54k a 256-site block is a ~19 A cube vs the
        # 0.366 L = 54 A separation bound, so ~11% of tiles cull
        # (visit 0.89; +8% end-to-end — MEASURE_POLAR_CULL
        # large_54k_derived_rc).  Exact either way; race and report.
        c = dataclasses.replace(cfg, polar_delayed=True, fused_mc=True,
                                polar_cull=cull)
        assert mc_kernel.supported_uvt_polar_da(c, params)
        K = 64
        st = metropolis.initialize(state, params, c, thermo)
        st, _ = metropolis.run_chunk_fused_uvt_polar_da(st, params, c,
                                                        thermo, K)
        np.asarray(st.energy.rd)
        t0 = time.perf_counter()
        n = 0
        for _ in range(2):
            st, stats = metropolis.run_chunk_fused_uvt_polar_da(
                st, params, c, thermo, K)
            n += int(np.asarray(stats.attempts).sum())
        np.asarray(st.energy.rd)
        return n / (time.perf_counter() - t0)

    sps_cull = time_variant("on")
    sps_dense = time_variant("off")
    sps, method = max(
        (sps_cull, "fused_pda_residual_1e-6_tile_culled"),
        (sps_dense, "fused_pda_residual_1e-6"))
    return {"metric": "mc_steps_per_sec_54k_mof_h2_polar_gcmc",
            "value": round(sps, 2), "unit": "steps/s",
            "vs_baseline": round(sps / (BASELINES["polar_gcmc"] / 25.0),
                                 2),
            "method": method,
            "dense_matvec_steps_per_s": round(sps_dense, 2),
            "n_atoms": int(params.n_atoms_max)}


def bench_pt_round():
    """BASELINE config 5: 8-replica parallel tempering.  Uses the fused
    single-chip PT driver (parallel/replica.run_parallel_tempering_fused):
    each replica advances steps_per_round whole MC steps in one Pallas
    launch and the neighbor temperature swap runs ON DEVICE
    (replica.ladder_swap), so a round is R+1 async dispatches with no
    host sync — the old host-swap scan round was D2H-bound at ~6k agg
    steps/s.  The mesh/ppermute PT path is exercised by
    dryrun_multichip instead."""
    import numpy as np

    from mpmc_tpu.models import systems
    from mpmc_tpu.parallel import replica

    R, spr, rounds = 8, 1024, 6
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512)
    import dataclasses
    cfg = dataclasses.replace(cfg, ensemble="nvt", fused_mc=True)
    temps = replica.geometric_ladder(77.0, 250.0, R)

    def time_variant(runner, sync):
        # warm ALL 4 (parity x do_refresh) jit variants of the one-jit
        # round (_pt_fused_round): 3 rounds covers (T,0),(T,1),(F,0);
        # 2 rounds adds (F,1) — the last round always skips the refresh
        runner(params, state, cfg, thermo, temps, 3, spr)
        runner(params, state, cfg, thermo, temps, 2, spr)
        t0 = time.perf_counter()
        states, _, _ = runner(params, state, cfg, thermo, temps,
                              rounds, spr)
        sync(states)
        return rounds * spr * R / (time.perf_counter() - t0)

    sps_seq = time_variant(replica.run_parallel_tempering_fused,
                           lambda s: np.asarray(s[0].pos))
    sps_multi = time_variant(replica.run_parallel_tempering_fused_multi,
                             lambda s: np.asarray(s.pos))
    sps, method = max((sps_seq, "per_replica_launches"),
                      (sps_multi, "chain_interleaved_single_launch"))
    return {"metric": "agg_mc_steps_per_sec_pt_8_replicas_incl_swaps",
            "value": round(sps, 2), "unit": "steps/s",
            "vs_baseline": round(sps / BASELINES["pt_round"], 2),
            "method": method}


def bench_pt_uvt_round():
    """Grand-canonical (GCMC) PT: one-launch chain-interleaved rounds
    with per-chain betas + the (beta_j/beta_i)^dN ladder swap — the
    sorption-workload PT variant (BASELINE config 3 x config 5)."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.models import systems
    from mpmc_tpu.parallel import replica

    R, spr, rounds = 8, 1024, 6
    params, state, cfg, thermo = systems.mof_h2_gcmc(
        n_side=21, spacing=4.0, n_h2=256, capacity=512,
        temperature=77.0, pressure=1.0, dtype="float32")
    cfg = dataclasses.replace(cfg, fused_mc=True)   # ensemble uvt
    temps = replica.geometric_ladder(77.0, 250.0, R)

    def run(nr):
        sts, _, _ = replica.run_parallel_tempering_fused_multi(
            params, state, cfg, thermo, temps, n_rounds=nr,
            steps_per_round=spr, seed=2)
        np.asarray(sts.pos)

    run(3)
    run(2)          # warm all (parity x do_refresh) jit variants
    t0 = time.perf_counter()
    run(rounds)
    sps = rounds * spr * R / (time.perf_counter() - t0)
    return {"metric": "agg_mc_steps_per_sec_pt_uvt_8_replicas_incl_swaps",
            "value": round(sps, 2), "unit": "steps/s",
            "vs_baseline": round(sps / BASELINES["gcmc"], 2),
            "method": "chain_interleaved_per_chain_betas"}


def _backend_or_die(timeout_s=420.0):
    """Initialize the JAX backend under a watchdog.  The axon TPU
    platform is a tunnel; when it is down, backend init HANGS rather
    than raising (observed 2026-08-18), which would leave the driver's
    bench run with no output at all.  A hung init cannot be interrupted,
    so on timeout the contract line is emitted with value 0 and the
    process force-exits."""
    import threading
    devs = []

    def init():
        import jax
        devs.append(jax.devices())

    t = threading.Thread(target=init, daemon=True)
    t.start()
    t.join(timeout_s)
    if not devs:
        line = {"metric": "agg_mc_steps_per_sec_10k_mof_h2_gcmc_ewald",
                "value": 0.0, "unit": "steps/s", "vs_baseline": 0.0,
                "error": f"backend init hung > {timeout_s:.0f}s "
                         "(TPU tunnel down)"}
        print(json.dumps(line), flush=True)
        os._exit(0)
    print(f"# devices: {devs[0]}", file=sys.stderr, flush=True)


def _warm_chip(seconds=8.0):
    """Run untimed fused-kernel work until the chip/tunnel ramps.
    Measured 2026-08-18: the FIRST variant timed in a process can
    measure up to 2x slow (60k vs 128k agg steps/s for the identical
    fused-PT config) — clocks/tunnel need several seconds of sustained
    load before timings are comparable."""
    import dataclasses

    import numpy as np

    from mpmc_tpu.mc import metropolis
    from mpmc_tpu.models import systems

    try:
        params, state, cfg, thermo = systems.mof_h2_gcmc(
            n_side=21, spacing=4.0, n_h2=256, capacity=512,
            temperature=77.0, pressure=1.0, dtype="float32")
        cfg = dataclasses.replace(cfg, fused_mc=True)
        state = metropolis.initialize(state, params, cfg, thermo)
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < seconds:
            state, _ = metropolis.run_chunk_fused_uvt(state, params, cfg,
                                                      thermo, 8192)
            np.asarray(state.energy.rd)
    except Exception:
        pass    # warm-up is best-effort; contenders still warm locally


def _repeat(fn, n):
    """Run a bench n times; report the BEST (throughput racing) plus
    n_repeats and the value spread, so cross-round comparisons can be
    read against the documented up-to-2x chip/tunnel variance
    (r2 verdict item 5; CLAUDE.md benchmark-order landmine)."""
    rows, err = [], None
    for _ in range(n):
        try:
            rows.append(fn())
        except Exception:
            err = traceback.format_exc(limit=1).splitlines()[-1]
    if not rows:
        return {"metric": fn.__name__, "error": err}
    vals = [r["value"] for r in rows]
    best = dict(max(rows, key=lambda r: r["value"]))
    best["n_repeats"] = len(rows)
    if len(rows) > 1:
        best["spread"] = {
            "min": round(min(vals), 2), "max": round(max(vals), 2),
            "values": [round(v, 2) for v in vals],
            "metrics": [r["metric"] for r in rows]}
    return best


def main():
    _backend_or_die()
    _warm_chip()
    results = []
    # measure every GCMC strategy on a quiet chip: batched scan chains,
    # the fused single-chain kernel, and the C=8 chain-interleaved
    # fused aggregate; the BEST is the headline (all run the identical
    # 10.8k-atom MOF+H2+Ewald µVT workload).  The fused contenders
    # repeat twice: the winner flip between interleave widths across
    # rounds was pure run-to-run variance (r2 verdict item 5)
    contenders = []
    for fn, n in ((bench_gcmc, 2), (bench_gcmc_fused, 2),
                  (bench_gcmc_fused_multi, 2)):
        contenders.append(_repeat(fn, n))
    # every metric at n_repeats >= 2 (r3 verdict item 3: single-shot
    # numbers on this chip are +-10-20%; interleaved in one process per
    # the benchmark-order landmine)
    for fn, n in ((bench_lj_nvt, 2), (bench_lj_nvt_fused, 2),
                  (bench_nvt_ewald, 2), (bench_polar_gcmc, 2),
                  (bench_polar_ref_rule, 2), (bench_polar_wolf_gcmc, 2),
                  (bench_polar_rc14_gcmc, 2),
                  (bench_polar_54k, 2), (bench_gcmc_tmmc, 2),
                  (bench_large_n, 2),
                  (bench_pt_round, 2), (bench_pt_uvt_round, 2)):
        row = _repeat(fn, n)
        results.append(row)
        print(json.dumps(row), flush=True)
    ranked = sorted(contenders, key=lambda r: r.get("value", 0.0))
    for row in ranked[:-1]:
        results.append(row)
        print(json.dumps(row), flush=True)
    winner = ranked[-1]
    headline = dict(winner)
    headline["metric"] = "agg_mc_steps_per_sec_10k_mof_h2_gcmc_ewald"
    headline["method"] = winner["metric"]
    if "value" not in headline:   # every contender errored (dead chip/
        headline.update(value=0.0, unit="steps/s",   # tunnel): keep the
                        vs_baseline=0.0)             # one-line contract
    results.append(headline)
    # MFU/roofline accounting for the hot kernels (r3 verdict item 4):
    # measured by tools/measure_roofline.py (microbenchmarked practical
    # peaks + documented flops models); embedded here so every
    # BENCH_FULL carries the utilization numbers alongside the speeds
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(
                __file__)), "MEASURE_ROOFLINE.json")) as f:
            roof = json.load(f)
        results.append({"metric": "kernel_roofline_pct_peak",
                        "peaks": {k: roof[k] for k in roof
                                  if k != "kernels"},
                        "kernels": roof.get("kernels", {})})
    except Exception:
        pass
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_FULL.json"), "w") as f:
        json.dump(results, f, indent=1)
    # the driver's one-line contract: headline LAST on stdout
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
