"""Test configuration: force an 8-device virtual CPU mesh before jax loads."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the TPU
# tunnel); tests must run on the virtual 8-device CPU mesh instead.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The env var alone is not enough: the ambient axon sitecustomize registers
# the TPU plugin at interpreter start, so the platform must also be forced
# through the config after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# ---------------------------------------------------------------------------
# Test tiering: the default run (`pytest -q`) excludes the `slow` tier via
# pytest.ini addopts; run the rest with `pytest -m slow`.  Slow = golden f64
# physics runs and interpret-mode Pallas equivalence tests with >~10 s serial
# cost (measured via --durations, round 2).  Names may be bare (all
# parametrizations) or carry a specific parametrization.
# ---------------------------------------------------------------------------
SLOW_TESTS = {
    # 3D golden physics (minutes each)
    "test_cg3d_laplace_law",
    "test_cg3d_wetting_contact_angle_neutral",
    "test_sc3d_phase_separation_and_mass",
    "test_coupled_3d_flow_transport",
    # fused-kernel interpret equivalence, heavy parametrizations
    "test_temporal_blocking_matches_sequential",
    "test_coupled_transport_fused_matches_jnp",
    "test_perturbation_fused_matches_jnp",
    "test_compressed_blocked_matches_sequential",
    "test_fused_matches_jnp[True-MRT]",
    "test_model_interpret_integration",
    "test_compressed_perturbation_fused_matches_jnp",
    "test_compressed_fused_matches_compressed_jnp[False-SRT]",
    "test_sc_fused_channel_bcs",
    "test_efs_fused_matches_jnp",
    "test_sc_fused_periodic[2]",
    "test_sc_fused_periodic[4]",
    "test_cg3d_fused_periodic",
    "test_cg3d_fused_wetting",
    "test_cg3d_bc_fused_matches_jnp",
    "test_cg3d_compressed_matches_split",
    "test_cg3d_bf16_storage_tracks_f32",
    "test_coupled_transport_mrt_fused_matches_jnp",
    "test_coupled_transport_d2q9_fused_matches_jnp",
    "test_coupled_transport_conserve_mass_fused_matches_jnp",
    "test_perturbation_mrt_fused_matches_jnp",
    "test_perturbation_mrt_compressed_matches_split",
    "test_washburn_capillary_rise_viscosity_ratio_001",
    "test_contact_angle_150_viscosity_contrast_100",
    "test_efs_viscosity_ratio_1000",
    "test_efs_open_boundaries_iso_depth",
    "test_fused_compressed_sharded_equals_single",
    "test_cg3d_fused_sharded_equals_single",
    # 2D golden physics
    "test_capillary_intrusion_direction",
    "test_static_contact_angle_sweep",
    "test_static_contact_angle_neutral_wetting",
    "test_modified_periodic_color_swap_outlet",
    "test_laplace_law_csf[MRT]",
    # multichip golden equivalence (the cheap SC variant stays fast)
    "test_cg3d_sharded_equals_single",
    "test_csf_sharded_equals_single",
    "test_sharded_2d_mesh",
    # CLI end-to-end
    "test_cli_run_cg_small",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if item.name in SLOW_TESTS or base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
