"""Test configuration: run everything on a fake 8-device CPU backend.

The reference has no test suite at all (``tests/readme.md`` is the only file;
CI's pytest steps are commented out, ``.github/workflows/ci.yml:46-58``). Here
every module is unit-tested on CPU with a forced 8-device topology so the
multi-chip sharding paths are exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu",
# overriding the JAX_PLATFORMS env var — override it back before backend init
# so tests always run on the fake 8-device CPU topology.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: the heavyweight compiles (CenterPoint's 6-task
# head, the R-CNN ROI path) dominate suite wall time; repeat runs on the same
# host skip them entirely.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/jax_comp_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

# JAX's atexit clean_up() (api.py: clear_backends -> util.clear_all_caches)
# takes 1-9+ MINUTES after heavy-compile sessions on this host (measured on
# test_records_roundtrip_to_centerpoint_loss: tests pass in ~50 s, then the
# interpreter sits in cache_clear for up to >545 s). Unregister exactly that
# handler — nothing else in teardown (multiprocessing joins, coverage
# flushes) is affected, and the process still exits through the normal path
# with pytest's status code.
import atexit  # noqa: E402

from jax._src import api as _jax_api  # noqa: E402

atexit.unregister(_jax_api.clean_up)


# ---------------------------------------------------------------------------
# Fast tier (VERDICT r4 item 5): `pytest -m "not slow"` must stay a quick
# smoke pass (< 5 min single-core target) that still imports and drives every
# subsystem. Tests whose measured wall time is dominated by heavy XLA
# compiles are marked slow HERE (2026-08-20 single-core durations run) so
# the test bodies stay clean; prefix match covers parametrizations. Every
# file below retains at least one unmarked test (test_launch_multiprocess's
# single 6.5 s test stays fast — it is the only launch coverage).
_SLOW_BY_DURATION = (
    "test_zoo.py::test_zoo_fast_smoke_all_families",
    "test_zoo.py::test_unet_end_to_end",
    "test_tracking.py::test_tracking_eval_route_e2e",
    "test_two_stage.py::test_two_stage_loss_and_grad_flow",
    "test_two_stage.py::test_export_3d_refined_roundtrip",
    "test_two_stage.py::test_refine_head_shapes_and_stats",
    "test_two_stage.py::test_predict_refined_shapes_and_score_combination",
    "test_two_stage.py::test_extractor_samples_expected_cell",
    "test_mask_seg_paths.py::test_mask_rcnn_loss_from_record_batch",
    "test_mask_seg_paths.py::test_seg_records_roundtrip_to_unet_loss",
    "test_ros_node.py::test_ros_node_end_to_end",
    "test_pillar_encoder.py::test_masked_bn_train_stats_and_output",
    "test_entrypoints.py::test_cloud_train_workflow",
    "test_space_to_depth.py::test_pointpillars_s2d_loss_and_predict_match",
    "test_space_to_depth.py::test_centerpoint_s2d_loss_matches",
    "test_space_to_depth.py::test_rpn_unrolled_matches_scanned",
    "test_space_to_depth.py::test_rpn_s2d_matches_standard",
    "test_waymo_path.py::test_waymo_batches_to_centerpoint_loss",
    "test_voxelize.py::test_stream_sorted_drop_order_matches_when_no_overflow",
    "test_voxelize.py::test_stream_path_matches_dense_canvas",
    "test_voxelize.py::test_bounded_seg_ops_match_bruteforce",
    "test_voxelize.py::test_compact_scatter_matches_sorted_scatter",
    "test_voxelize.py::test_stream_sorted_drop_order_overflow_keeps_lowest_ids",
    "test_spatial_shard.py::test_spatial_shard_matches_unsharded_loss",
    "test_spatial_shard.py::test_tensor_parallel_params_match_unsharded_loss",
    "test_kitti_eval_scale.py::test_full_kitti_scale_under_wall_budget",
    "test_convert_zoo.py::test_faster_rcnn_rules_cover_every_parameter",
    "test_convert_zoo.py::test_yolov8_rules_cover_every_parameter",
    "test_nuscenes_data.py::test_records_roundtrip_to_centerpoint_loss",
    "test_waymo_eval.py::test_l2_ground_truths_ignored_at_l1",
    "test_waymo_eval.py::test_perfect_detections_score_100",
    "test_waymo_eval.py::test_aph_penalizes_flipped_heading",
    "test_rotated_iou.py::test_pallas_kernel_matches_xla_and_golden",
    "test_rotated_iou.py::test_pallas_kernel_exact_cases",
    "test_rotated_iou.py::test_random_vs_numpy_reference",
    "test_rotated_iou.py::test_chunked_path_matches_direct",
    "test_coco_pipeline.py::test_exported_program_eval_identical",
    "test_rpn_stacked_params.py::test_stacked_gradients_match_per_layer",
    "test_rpn_stacked_params.py::test_stacked_matches_per_layer_train_and_eval",
    "test_resnet_scan.py::test_r50_scan_matches_per_block",
    "test_bench_orchestration.py::test_secondary_chunk_salvages_partials_when_capped",
    "test_bench_orchestration.py::test_all_benches_land_and_headline_prints_last",
    "test_bench_orchestration.py::test_failed_bench_does_not_stop_the_chunk",
    "test_hat_sample.py::test_taps_grads_match_xla",
    "test_hat_sample.py::test_grads_match_xla",
    "test_train_loop.py::test_trainer_checkpoint_resume_roundtrip",
    "test_train_loop.py::test_train_step_updates_batch_stats",
    "test_convert.py::test_pointpillars_rule_coverage_against_model",
    "test_convert.py::test_centerpoint_rule_coverage_against_model",
    "test_eval_protocol_exact.py::test_waymo_range_breakdowns_shard_independently",
    "test_eval_protocol_exact.py::test_waymo_aph_weights_recall_golden",
    "test_host_ops.py::test_native_rotated_nms_matches_device",
    "test_host_ops.py::test_native_matches_device_rotated_iou",
    "test_transforms.py::test_mixup_blends",
    "test_nms.py::test_rotated_nms_suppresses_same_pose",
    "test_seg_pallas.py::test_fwd_bf16_and_unaligned_tail",
    "test_decode_targets.py::test_invalid_objects_leave_heatmap_empty",
    "test_anchors_assign.py::test_assign_targets_basic",
    "test_two_stage.py::test_single_stage_checkpoint_loads_into_two_stage",
    "test_convert.py::test_centernet_rule_coverage_against_model",
)


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        nid = item.nodeid.replace("tests/", "")
        if any(nid == p or nid.startswith(p + "[")
               for p in _SLOW_BY_DURATION):
            item.add_marker(_pytest.mark.slow)
