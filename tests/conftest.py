"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Mirrors how the reference's CI needs no GPU (SURVEY.md §4): tests target the
CPU backend (``JAX_PLATFORMS=cpu``) with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware; float64 is enabled
so statistical self-consistency tests can use the reference's tolerances
(t-tests at alpha=1e-4 with 1e6 samples, tests/test_approximations.py:7-8).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment's sitecustomize may force-register a TPU platform via
# jax.config.update("jax_platforms", ...); override it after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Fast tier: `make test-fast` runs `-m "not slow"` (~8.5 min measured on
# the IDLE 1-core dev host, round 4 — 12 min under concurrent load;
# compile time dominates, so it cannot go much lower) so the ~50-minute
# full suite (349 tests; 58 min measured under light load in round 5)
# isn't the only loop.  Slow tests (statistical
# 1e6-sample family checks, end-to-end convergence runs, bit-exact resume
# comparisons) are curated here centrally instead of decorating each file;
# durations measured on the 1-core dev host (pytest --durations).
# ---------------------------------------------------------------------------

SLOW_TESTS = {
    # test_optimizers — end-to-end convergence machinery
    "test_sgo_optimize",
    "test_rule_optimize",
    "test_faso_rmsprop_optimize",
    "test_raabbvi_avgrmsprop_optimize",
    "test_raabbvi_avgadam_optimize",
    "test_raabbvi_is_reusable",
    "test_raabbvi_fullrank_end_to_end",
    "test_faso_rhat_backoff",
    "test_faso_rhat_quantile_gate",
    "test_raabbvi_whole_run_resume_matches_uninterrupted",
    "test_multistart_raabbvi_b1_matches_single",
    "test_multistart_raabbvi_per_restart_termination",
    "test_multistart_raabbvi_round_resume_matches_uninterrupted",
    "test_multistart_raabbvi_async_b1_matches_single",
    "test_multistart_raabbvi_async_per_restart_termination",
    "test_multistart_raabbvi_async_sharded_matches_unsharded",
    "test_multistart_raabbvi_async_stateful_dis",
    "test_multistart_raabbvi_async_resampling_dis_multi_restart",
    "test_multistart_raabbvi_async_resume_matches_uninterrupted",
    "test_multistart_raabbvi_init_rmsprop_b1_matches_single",
    # test_max_time — straight-vs-resumed double runs
    "test_faso_max_time_zero_resumes_to_full_run",
    "test_raabbvi_max_time_whole_run_budget",
    "test_multistart_faso_max_time_zero_resumes_to_full_run",
    "test_multistart_raabbvi_max_time",
    # test_convenience — batched multistart end-to-end runs
    "test_bbvi_multistart",
    # test_convenience — full bbvi matrix + diagnostics pipelines
    "test_bbvi",
    "test_vi_diagnostics",
    "test_vi_diagnostics_with_flow_family",
    # test_families — 1e6-sample statistical self-consistency
    "test_MFGaussian",
    "test_MFStudentT",
    "test_MultivariateT",
    "test_LRGaussian",
    "test_FullRankGaussian",
    "test_nvpflow_normalization",
    # test_objectives — end-to-end recovery runs
    "test_ExclusiveKL",
    "test_ExclusiveKL_path_deriv",
    "test_ExclusiveKL_control_variates",
    "test_ExclusiveKL_control_variates_path_deriv",
    "test_DISInclusiveKL",
    "test_AlphaDivergence",
    "test_IWELBO",
    "test_nvpflow_as_variational_family",
    # test_models — minibatch-SVI end-to-end recovery runs
    "test_subsampled_model_recovery",
    # test_parallel — batched detection + bit-exact equality runs
    "test_sharded_faso_matches_unsharded",
    "test_multistart_faso_detection",
    "test_multistart_faso_matches_single_faso",
    "test_multistart_faso_diagnostics_histories_match_faso",
    "test_multistart_faso_diagnostics_freezes_stopped_rows",
    "test_multistart_faso_diagnostics_nonconverged_opt_param_matches_faso",
    "test_multistart_faso_sharded_matches_unsharded",
    "test_multistart_faso_sharded_stateful_matches_unsharded",
    "test_multistart_faso_resume_matches_uninterrupted",
    "test_multistart_faso_stateful_resume_matches_uninterrupted",
    "test_multistart_faso_lr_grid_resume_restores_grid",
    "test_multistart_faso_per_restart_learning_rates",
    "test_multistart_faso_per_restart_mcse_thresholds",
    "test_multistart_faso_with_stateful_objective",
    "test_weight_decay_applied_in_segment_runners",
    "test_shard_mc_objective_through_optimizer",
    "test_multistart_vmapped",
    "test_multistart_sharded_2d_mesh",
    "test_fsdp_fullrank_trainer",
    # test_checkpoint — straight-vs-resumed double runs
    "test_faso_resume_matches_uninterrupted",
    "test_faso_resume_with_inflight_checks",
    # test_psis / test_mc_diagnostics — large-n golden sweeps
    "test_psislw_2d_columns_match_1d",
    "test_psisloo_shapes_and_consistency",
    "test_ess_vectorized_matches_while_loop",
    "test_psisloo_matches_reference",
    "test_gpdfit_matches_reference",
    "test_psislw_normalization_and_khat_gates",
    "test_psislw_matches_reference",
    "test_mc_diagnostics_golden_vs_reference",
    "test_ess_windowed_matches_direct",
    "test_split_rhat_ring_windows_matches_windowed",
    # test_ops — blocked-solve sweeps (9-19 s each on the 1-core host)
    "test_vjp_matches",
    "test_matches_solve_triangular",
    "test_stl_transpose_solve_matches_factor_solve",
    # second tier (3-14 s each on the 1-core host)
    "test_NVPFlow",
    "test_NeuralNet",
    "test_stl_fused_log_density_matches_generic",
    "test_faso_with_host_loop_objective",
    "test_faso_with_stateful_objective",
    "test_divergence_bound",
    "test_vmem_solve_matches_solve_triangular",
    "test_ess_and_mcse_windowed_chunked",
    "test_rank_normalized_rhat_heavy_tails",
    "test_native_matches_jax_zoo",
    "test_R_hat_convergence_check_rank_normalized",
    "test_split_rhat_ring_windows_unwrapped",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
