"""Test configuration: CPU backend, 8 virtual devices, float64 parity mode.

Parity tests (SURVEY.md §7 "Hard parts", f64 vs TPU) run on the CPU backend
with x64 enabled; multi-device sharding tests use 8 virtual CPU devices via
--xla_force_host_platform_device_count.  The TPU path is exercised by
bench.py / __graft_entry__.py on real hardware.
"""
import os
import sys

# NOTE: this image's sitecustomize imports jax and registers the 'axon' TPU
# platform before conftest runs, so env vars alone don't switch backends —
# the runtime config.update below is what actually selects CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# The XLA CPU compiler can segfault late in a long single-process run
# (observed compiling the ~180th test's scan after hundreds of cached
# executables; the same test passes in isolation).  Bound accumulated
# compiler/executable state by dropping JAX caches between test modules
# — within-module sharing (the expensive case) is preserved.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    if os.environ.get("MPMC_NO_CACHE_CLEAR") != "1":
        jax.clear_caches()


# r3: the bound above stopped sufficing once test_fused_mc grew past ~75
# tests of Pallas-interpret programs — the segfault moved INSIDE the
# module (observed at the fused-polar-DA while_loop compile, which
# passes in isolation).  Add a within-module bound: drop caches every
# N tests.  Within-module jit reuse mostly spans a handful of
# neighboring tests sharing a helper, so the recompile cost is small
# next to the stability win.
_CLEAR_EVERY = 40
_counter = {"n": 0}

# r4 escape hatch for the segfault repro harness (docs/segfault.md):
# MPMC_NO_CACHE_CLEAR=1 disables BOTH cache-clear bounds so the
# original crash conditions can be reproduced deliberately.
_NO_CLEAR = os.environ.get("MPMC_NO_CACHE_CLEAR") == "1"


@pytest.fixture(autouse=True)
def _clear_jax_caches_periodically():
    yield
    _counter["n"] += 1
    if not _NO_CLEAR and _counter["n"] % _CLEAR_EVERY == 0:
        jax.clear_caches()


# --- two-tier suite (r2 verdict item 8) ------------------------------------
# The full suite is ~46 min on the 1-core build box (418 tests,
# --durations run 2026-08-20).  Tests measured >= ~20 s — long
# statistical chains and the C-chain bit-exactness batteries — are
# marked `slow` at collection from this list and EXCLUDED by the
# default `pytest tests/` run (pyproject addopts -m "not slow";
# default tier ~29 min).  Run the slow tier with
#     python -m pytest tests/ -m slow
# (CLI -m overrides the ini default; `-m ""` runs everything).
# Names are base names — parametrized variants inherit the mark.
_SLOW_TESTS = {
    # r4 trim (verdict item 8, durations run 2026-08-20, quiet box):
    # combo/CLI-level tests whose mechanisms keep an API-level or
    # base-variant test in the default tier.  Further trimming toward
    # the ~18-min goal would remove UNIQUE per-feature coverage (the
    # tail is hundreds of 3-9 s bookkeeping tests), which the same
    # verdict item forbids — landed at ~22 min / 378 tests.
    "test_dipole_mode_gcmc_observable_parity",
    "test_spatial_mc_step_polar_matches_unsharded",
    "test_pda_cavity_bias_bookkeeping_and_open_cells",
    "test_pda_spinflip_pure_flip_chunk",
    "test_pda_spinflip_one_way_at_large_dF",
    "test_multi_chain_uvt_pt_ladder_betas",
    "test_residual_mode_bookkeeping_over_gcmc_chunk",
    "test_tmmc_polar_delayed_fused_run_driver",
    "test_multi_chain_spinflip_bit_equals_single_chain",
    "test_pt_fugacity_fused_dispatch",
    "test_h2_quantum_fk_deck",
    "test_multichain_matches_physics",
    "test_chains_option_cli",
    "test_chains_npt_cli",
    "test_quantum_rotation_uvt_fused_cli",
    "test_quantum_rotation_chains_cli",
    "test_run_mc_pt_uses_fused_multi_kernel",
    "test_co2_n2_separation_deck",
    "test_h2_sorption_deck",
    "test_chain_devices_cli_matches_unsharded",
    "test_npt_pressure_self_consistency",
    "test_nvt_pressure_matches_second_virial",
    "test_fused_pt_multi_chain",
    "test_multi_chain_uvt_cavity_bias_bit_equals_single_chain",
    "test_uvt_composed_block_matches_chunk_plus_refresh",
    "test_fused_pt_multi_uvt_round",
    "test_h2_isotherm_ladder_deck",
    "test_pda_stage1_statistics_match_scan",
    "test_two_process_pt_matches_single_process",
    "test_multi_chain_uvt_multisorbate_gate_and_run",
    "test_pt_uvt_chain_devices_matches_unsharded",
    "test_batched_chains_with_polar_delta_field",
    "test_scan_path_bit_exact",
    "test_ortho_box_min_image_bit_identical",
    "test_multi_chain_uvt_bit_equals_single_chain",
    "test_multi_chain_uvt_spinflip_bit_equals_single_chain",
    "test_observables_batched_matches_per_chain",
    "test_pda_bookkeeping_matches_full_recompute",
    "test_uvt_matches_scan_equilibrium",
    "test_pt_chain_devices_cli_matches_unsharded",
    "test_multi_chain_bit_equals_single_chain",
    "test_delayed_acceptance_same_equilibrium",
    "test_pt_round_runs_and_preserves_ladder",
    "test_matches_full_refresh_polar",
    "test_quantum_rotation_pt_fused_uvt_cli",
    "test_quantum_rotation_pt_fused_cli",
    "test_field_delta_matches_full_rebuild_over_gcmc_chunk",
    "test_fused_pt_single_chip",
    # r5 trim (r4 verdict item 7, durations run 2026-08-21): next
    # tranche toward <=18 min.  Same policy — combo/CLI-level or
    # duplicate-variant tests whose mechanisms keep a default-tier
    # test: the 1k drift gate (bench.py now re-measures drift at BENCH
    # size every run — the stronger gate), the scan-path DA
    # bookkeeping (wolf/ewald parity + fused-PDA chunk tests stay
    # default), CLI decks, one of each paired spatial/cavity/molcache/
    # estimator check.
    "test_dipole_mode_drift_bounded_larger_system",
    "test_delayed_acceptance_bookkeeping_and_scf_skip",
    "test_quantum_rotation_parallel_tempering_cli",
    "test_field_delta_variant_gcmc_chunk_bookkeeping",
    "test_h2_polar_tmmc_deck",
    "test_h2_polar_wolf_deck",
    "test_scf_runs_with_ewald_field",
    "test_tmmc_polar_delayed_scan_estimator_exact_sums",
    "test_total_energy_sharded_matches_single",
    "test_parallel_tempering_uvt_cli_path",
    "test_spinflip_staleness_quantified",
    "test_cache_matches_uncached_trajectory_start",
    "test_bookkeeping_and_sharded_refresh",
    "test_uvt_cavity_bias_inserts_only_into_open_cells",
    "test_quantum_rotation_cli_run",
    # r5 second tranche (the 2026-08-21 box measured ~1.3-1.45x slower
    # than r4's quiet baseline — r4-equivalent default-tier estimate
    # after this tranche ~16-17 min; sibling/base-variant tests stay
    # default in every case)
    "test_pda_nvt_all_displace_limit",
    "test_fused_nvt_bit_exact",
    "test_multi_chain_uvt_fugacity_ladder_lnfv",
    "test_multi_fit_recovers_parameters_from_3d_configs",
    "test_pda_field_variant_bookkeeping[ewald]",   # wolf stays default
    "test_surface_scan_orientation_sweep_monatomic_invariant",
    "test_uvt_spinflip_pure_flip_chunk",
}


def pytest_collection_modifyitems(config, items):
    for it in items:
        # full name first (lets one PARAM of a test go slow while its
        # siblings stay default), then the base name
        if (it.name in _SLOW_TESTS
                or it.name.split("[")[0] in _SLOW_TESTS):
            it.add_marker(pytest.mark.slow)
