"""bench.py result-JSON accounting (r5, VERDICT r4 item 2).

The r4 driver artifact carried `skipped_entries: []` after the alarm ate
3 of 4 configs — a reader could not tell "completed everything" from
"lost most of the run". These tests pin the honest-accounting contract of
`_result_json` without touching a backend: the in-flight entry and every
planned-but-unreached config must be reported whenever the JSON is emitted
mid-run, and a clean full run must report an empty skip list.
"""

import json

import bench


def _reset_state():
    bench._STATE.update({
        "entries": [],
        "skipped_entries": [],
        "in_flight": None,
        "pending": [],
        "eval_points_per_sec_per_chip": None,
        "device_kind": "TPU v5 lite",
        "emitted": False,
        "deadline": None,
    })


def test_result_json_reports_in_flight_and_unreached():
    _reset_state()
    bench._STATE["entries"].append({
        "config": "modelnet40_cls", "dtype": "float32",
        "batch_size": 16, "num_point": 1024,
        "points_per_sec_per_chip": 9e5, "train_step_ms": 17.5,
        "flops_per_step": 1e11, "mfu": 0.03,
    })
    bench._STATE["in_flight"] = {"config": "scannet_seg_res",
                                 "dtype": "float32"}
    bench._STATE["pending"] = [
        {"config": "modelnet40_cls", "dtype": "bfloat16"},
        {"config": "whole_scene_single_pass", "dtype": "float32"},
    ]
    out = json.loads(bench._result_json())
    assert out["value"] == 9e5
    reasons = {(s["config"], s["dtype"]): s["reason"]
               for s in out["skipped_entries"]}
    assert reasons[("scannet_seg_res", "float32")] == "in_flight_at_exit"
    assert reasons[("modelnet40_cls", "bfloat16")] == "not_reached"
    assert reasons[("whole_scene_single_pass", "float32")] == "not_reached"
    assert len(out["skipped_entries"]) == 3


def test_result_json_clean_run_has_empty_skip_list():
    _reset_state()
    bench._STATE["entries"].append({
        "config": "modelnet40_cls", "dtype": "float32",
        "batch_size": 16, "num_point": 1024,
        "points_per_sec_per_chip": 9e5, "train_step_ms": 17.5,
        "flops_per_step": 1e11, "mfu": 0.03,
    })
    out = json.loads(bench._result_json())
    assert out["skipped_entries"] == []
    assert out["baseline_is_estimate"] is True


def test_result_json_with_no_entries_is_valid_json():
    _reset_state()
    bench._STATE["pending"] = [{"config": "modelnet40_cls",
                                "dtype": "float32"}]
    out = json.loads(bench._result_json())
    assert out["value"] is None
    assert out["skipped_entries"][0]["reason"] == "not_reached"


def test_budget_skip_reason_preserved():
    _reset_state()
    bench._STATE["skipped_entries"].append(
        {"config": "eval_throughput", "dtype": "float32", "reason": "budget"})
    out = json.loads(bench._result_json())
    assert out["skipped_entries"] == [
        {"config": "eval_throughput", "dtype": "float32", "reason": "budget"}]
