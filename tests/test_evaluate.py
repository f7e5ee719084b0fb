"""Tests for tools/evaluate.py (compare_colmap_poses.m port)."""

import importlib.util
import os
import sys

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "evaluate", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "evaluate.py"))
evaluate = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(evaluate)


def _random_pose(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    return evaluate.quat_to_R(q), rng.standard_normal(3)


def test_identical_models_zero_error():
    rng = np.random.default_rng(0)
    poses = {f"im{i}": _random_pose(rng) for i in range(6)}
    rep = evaluate.evaluate(poses, poses, align=False)
    assert rep["num_registered"] == 6
    assert rep["mean_rot_deg"] < 1e-9
    assert rep["mean_pos_err"] < 1e-9
    assert rep["below_thresholds"]["rot2deg_pos0.05"] == 6


def test_unregistered_images_are_inf():
    rng = np.random.default_rng(1)
    ref = {f"im{i}": _random_pose(rng) for i in range(5)}
    est = {k: ref[k] for k in list(ref)[:3]}
    rep = evaluate.evaluate(est, ref, align=False)
    assert rep["num_unregistered"] == 2
    assert rep["per_image"]["im4"]["rot_deg"] == float("inf")
    assert rep["below_thresholds"]["rot2deg_pos0.05"] == 3


def test_similarity_gauge_removed():
    """A model in a different similarity frame scores ~zero after align."""
    rng = np.random.default_rng(2)
    ref = {f"im{i}": _random_pose(rng) for i in range(8)}
    s = 2.5
    Rg, tg = _random_pose(rng)
    est = {}
    for name, (R, t) in ref.items():
        # world' = s Rg world + tg; world->cam pose transforms as
        # R' = R Rg^T, t' = s t - R' tg.
        R_new = R @ Rg.T
        est[name] = (R_new, s * t - R_new @ tg)
    rep = evaluate.evaluate(est, ref, align=True)
    assert rep["mean_rot_deg"] < 1e-6, rep["mean_rot_deg"]
    assert rep["ate_rmse"] < 1e-6, rep["ate_rmse"]
