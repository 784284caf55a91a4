"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware.

The container's sitecustomize eagerly registers and *initializes* the axon
TPU PJRT backend before any conftest runs, so plain env vars are too late —
tests would silently run over the (slow, single-chip) TPU tunnel. We clear
the initialized backends and re-select the CPU platform in-process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import jax._src.xla_bridge as _xb  # noqa: E402

if jax.config.jax_platforms != "cpu":
    _xb._clear_backends()
    jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu" and len(jax.devices()) == 8

jax.config.update("jax_threefry_partitionable", True)
# On TPU the "default" matmul precision uses bf16 inputs; tests compare
# against fp32 torch references, so force full fp32 matmuls.
jax.config.update("jax_default_matmul_precision", "float32")


# --------------------------------------------------------------------- #
# smoke tier: one quick, representative test per subsystem, < 3 min total
# on a single CPU core (select with ``-m fast``). Centralized here so the
# tier is visible and maintained in one place; tests/test_parity_golden.py
# additionally fast-marks three golden replays via its own parametrization.

import pytest  # noqa: E402

FAST_TIER = {
    # ops / kernels
    "tests/test_ops.py::test_resize_bilinear_matches_torch",
    "tests/test_ops.py::test_attention_matches_reference_math",
    "tests/test_ops.py::test_device_normalize_bitmatches_host",
    "tests/test_twoway_blockdiag.py::test_blockdiag_forward_matches_module",
    # models
    "tests/test_models.py::test_lam_no_vit_forward_shapes",
    "tests/test_models.py::test_dummy_model",
    # data engine
    "tests/test_data.py::test_rle_roundtrip",
    "tests/test_data.py::test_coco_dataset_episode",
    # training
    "tests/test_train.py::test_losses_finite",
    "tests/test_train.py::test_substitutor_rotation_roundtrip",
    "tests/test_modality_gating.py::test_union_gating_is_superset_of_every_pass",
    # metrics
    "tests/test_metrics.py::test_pmiou_matches_reference",
    "tests/test_metrics.py::test_fold_global_confusion_matches_pixel_path",
    # parallel / multi-host
    "tests/test_multihost.py::test_loader_process_slices_partition_the_group",
    "tests/test_multihost.py::test_create_mesh_hybrid_slice_major",
    # config surface / demo / orchestration
    "tests/test_configs.py::test_config_surface_exists",
    "tests/test_builtin_demo.py::test_retrieve_models_offline_fallback",
    "tests/test_extras.py::test_optunizer_random_fallback",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid.split("[")[0] in FAST_TIER:
            item.add_marker(pytest.mark.fast)
