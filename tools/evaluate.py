"""Pose-parity evaluator: port of the reference's MATLAB protocol.

Implements ``scripts/matlab/ppsfm/evaluation/colmap/compare_colmap_poses.m:35-77``
(per-image rotation axis-angle + position difference; images missing from
the estimated model get error = inf) and
``count_images_below_error_threshold.m`` (registered-below-threshold
counts), extended with a similarity (Umeyama) gauge alignment so a model
can be scored against ground-truth poses in a different frame, plus the
internal mean point-to-line reprojection error
(``src/base/reconstruction.cc:511``).

Inputs: a model directory (our reference-compatible text format) and
either a second model directory or a ``gt_poses.txt``
(``# name qw qx qy qz tx ty tz``, written by tools/synth_dataset.py).

Usage:
  python tools/evaluate.py MODEL_DIR --gt GT_POSES_TXT [--json OUT.json]
  python tools/evaluate.py MODEL_DIR --ref-model OTHER_MODEL_DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def quat_to_R(q):
    q = np.asarray(q, float)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [w*w + x*x - y*y - z*z, 2*(x*y - w*z), 2*(x*z + w*y)],
        [2*(x*y + w*z), w*w - x*x + y*y - z*z, 2*(y*z - w*x)],
        [2*(x*z - w*y), 2*(y*z + w*x), w*w - x*x - y*y + z*z]])


def axis_angle_deg(R):
    """Rotation angle of a rotation matrix, degrees (rotm2axang norm)."""
    cos = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    return float(np.degrees(np.arccos(cos)))


def read_gt_poses(path):
    """gt_poses.txt -> {name: (R, t)} world->cam."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            name = parts[0]
            q = [float(v) for v in parts[1:5]]
            t = np.asarray([float(v) for v in parts[5:8]])
            out[name] = (quat_to_R(q), t)
    return out


def read_model_poses(model_dir):
    """images.txt of a model dir -> {name: (R, t)} (registered only)."""
    from privacy_preserving_sfm_tpu.models.reconstruction import (
        Reconstruction,
    )
    rec = Reconstruction.read_text(model_dir)
    out = {}
    for img in rec.images.values():
        if img.registered:
            out[img.name] = (img.rotation_matrix(), np.asarray(img.tvec))
    return rec, out


def similarity_align(src, dst):
    """Umeyama: s, R, t with dst ~= s * R @ src + t."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    cs, cd = src - mu_s, dst - mu_d
    cov = cd.T @ cs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var = (cs ** 2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var)
    t = mu_d - s * R @ mu_s
    return s, R, t


def evaluate(est_poses, ref_poses, align=True):
    """Per-image diffs per compare_colmap_poses.m, optionally after a
    similarity alignment of camera centers (gauge removal for GT frames).

    Returns dict with per-image errors and the aggregate metrics.
    """
    common = sorted(set(est_poses) & set(ref_poses))
    missing = sorted(set(ref_poses) - set(est_poses))

    s, Ra, ta = 1.0, np.eye(3), np.zeros(3)
    if align and len(common) >= 3:
        est_centers = np.stack([-est_poses[n][0].T @ est_poses[n][1]
                                for n in common])
        ref_centers = np.stack([-ref_poses[n][0].T @ ref_poses[n][1]
                                for n in common])
        s, Ra, ta = similarity_align(est_centers, ref_centers)

    per_image = {}
    rot_errs, pos_errs = [], []
    for name in common:
        R_e, t_e = est_poses[name]
        R_r, t_r = ref_poses[name]
        # Aligned estimate: world' = s Ra world + ta  =>  for a world->cam
        # pose (R, t): R' = R Ra^T, t' = s t - R' ta  (cf.
        # Reconstruction.transform).
        R_al = R_e @ Ra.T
        t_al = s * t_e - R_al @ ta
        R_diff = R_al @ R_r.T  # images2.R * images1.R' of the protocol
        rot = axis_angle_deg(R_diff)
        pos = float(np.linalg.norm(R_diff @ t_r - t_al))
        per_image[name] = {"rot_deg": rot, "pos": pos}
        rot_errs.append(rot)
        pos_errs.append(pos)
    for name in missing:
        per_image[name] = {"rot_deg": float("inf"), "pos": float("inf")}

    centers_err = None
    if align and common:
        est_centers = np.stack([-est_poses[n][0].T @ est_poses[n][1]
                                for n in common])
        ref_centers = np.stack([-ref_poses[n][0].T @ ref_poses[n][1]
                                for n in common])
        aligned = (s * (Ra @ est_centers.T)).T + ta
        centers_err = np.sqrt(((aligned - ref_centers) ** 2).sum(-1))

    def count_below(rot_th, pos_th):
        return sum(1 for v in per_image.values()
                   if v["rot_deg"] <= rot_th and v["pos"] <= pos_th)

    return {
        "num_ref_images": len(ref_poses),
        "num_registered": len(common),
        "num_unregistered": len(missing),
        "mean_rot_deg": float(np.mean(rot_errs)) if rot_errs else None,
        "median_rot_deg": float(np.median(rot_errs)) if rot_errs else None,
        "ate_rmse": (float(np.sqrt((centers_err ** 2).mean()))
                     if centers_err is not None else None),
        "mean_pos_err": float(np.mean(pos_errs)) if pos_errs else None,
        "below_thresholds": {
            "rot2deg_pos0.05": count_below(2.0, 0.05),
            "rot5deg_pos0.20": count_below(5.0, 0.20),
        },
        "per_image": per_image,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--gt", help="gt_poses.txt with GT world->cam poses")
    ap.add_argument("--ref-model", help="reference model dir to compare to")
    ap.add_argument("--no-align", action="store_true",
                    help="skip similarity alignment (models share a frame)")
    ap.add_argument("--json", help="write the report to this path")
    args = ap.parse_args()

    rec, est = read_model_poses(args.model_dir)
    if args.gt:
        ref = read_gt_poses(args.gt)
    elif args.ref_model:
        _, ref = read_model_poses(args.ref_model)
    else:
        ap.error("need --gt or --ref-model")

    report = evaluate(est, ref, align=not args.no_align)
    report["mean_reproj_error_px"] = rec.compute_mean_reprojection_error()
    report["mean_track_length"] = rec.compute_mean_track_length()
    report["num_points3d"] = len(rec.points3d)

    brief = {k: v for k, v in report.items() if k != "per_image"}
    print(json.dumps(brief, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
