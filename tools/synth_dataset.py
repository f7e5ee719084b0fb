"""Generate a synthetic multi-view image dataset with gravity + calibration.

Renders a richly-textured tilted plane through per-view homographies
(cv2.warpPerspective), writes ``<img>.png``, ``<img>.png.gravity.txt`` and
``<img>.png.camera_model.txt`` in the reference's dataset layout
(``image_reader.cc:206-247``), plus ``gt_poses.txt`` for evaluation.

The tilted plane (z = z0 + ax*u + ay*v) keeps the horizontal-plane 2D
reduction of the initializer non-degenerate (a fronto-parallel plane would
project to a line in the 2D sub-problem).

Usage: python tools/synth_dataset.py OUTDIR [num_images]
"""

import os
import sys

import numpy as np


def make_dataset(outdir: str, num_images: int = 8, width=640, height=480,
                 f=400.0, seed=0):
    import cv2
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from privacy_preserving_sfm_tpu.ops import lie

    rng = np.random.default_rng(seed)
    os.makedirs(outdir, exist_ok=True)

    # High-contrast smooth texture.
    tex_size = 1600
    tex = rng.uniform(0, 1, (tex_size // 8, tex_size // 8)).astype(np.float32)
    tex = cv2.resize(tex, (tex_size, tex_size), interpolation=cv2.INTER_CUBIC)
    tex += 0.5 * cv2.resize(
        rng.uniform(0, 1, (tex_size // 32, tex_size // 32)).astype(np.float32),
        (tex_size, tex_size), interpolation=cv2.INTER_CUBIC)
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    tex = (tex * 255).astype(np.uint8)

    # Plane: X(u, v) = (u, v, z0 + ax u + ay v), (u, v) in [-S, S]^2.
    S, z0, ax_c, ay_c = 3.0, 5.0, 0.5, 0.35
    M = np.array([[1.0, 0.0, 0.0],
                  [0.0, 1.0, 0.0],
                  [ax_c, ay_c, z0]])
    # Texture px -> (u, v): u = (x/tex) * 2S - S.
    T = np.array([[2 * S / tex_size, 0, -S],
                  [0, 2 * S / tex_size, -S],
                  [0, 0, 1.0]])
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])

    # Camera arc: centers spread wide relative to scene depth, AIMED at the
    # plane center so every view keeps it in frame.  The spread matters:
    # the initializer's mean-min-tri-angle gate (2 deg) needs adjacent-view
    # baselines of >= ~3.5% of depth (atan(spread/(n-1)/z0)), which a
    # narrow arc of 50 views fails.
    spread = 10.0
    gt_lines = []
    for i in range(num_images):
        frac = i / max(1, num_images - 1)
        C = np.array([spread * (frac - 0.5),
                      rng.uniform(-0.15, 0.15), rng.uniform(-0.3, 0.3)])
        yaw = np.arctan2(C[0], z0)  # aim the optical axis at (0, 0, z0)
        q_yaw = np.array([np.cos(yaw / 2), 0, np.sin(yaw / 2), 0])
        ax = rng.standard_normal(3) * 0.03
        ang = np.linalg.norm(ax) + 1e-12
        q_tilt = np.concatenate([[np.cos(ang / 2)],
                                 np.sin(ang / 2) * ax / ang])
        q = np.asarray(lie.quat_multiply(jnp.asarray(q_tilt),
                                         jnp.asarray(q_yaw)))
        R = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
        t = -R @ C
        # Homography texture -> image: world point X = M [u, v, 1]^T, so
        # x ~ K (R X + t) = K (R M + t [0,0,1]) [u,v,1]^T.
        H = K @ (R @ M + t[:, None] @ np.array([[0.0, 0.0, 1.0]])) @ T

        img = cv2.warpPerspective(tex, H, (width, height),
                                  flags=cv2.INTER_LINEAR,
                                  borderMode=cv2.BORDER_REPLICATE)
        name = f"img{i:03d}.png"
        cv2.imwrite(os.path.join(outdir, name), img)
        g = R @ np.array([0.0, 1.0, 0.0])
        with open(os.path.join(outdir, name + ".gravity.txt"), "w") as fo:
            fo.write(f"{g[0]} {g[1]} {g[2]}\n")
        with open(os.path.join(outdir, name + ".camera_model.txt"), "w") as fo:
            fo.write(f"SIMPLE_PINHOLE, {f}, {width / 2}, {height / 2}\n")
        gt_lines.append(
            f"{name} " + " ".join(repr(float(v)) for v in q) + " "
            + " ".join(repr(float(v)) for v in t))

    with open(os.path.join(outdir, "gt_poses.txt"), "w") as fo:
        fo.write("# name qw qx qy qz tx ty tz\n")
        fo.write("\n".join(gt_lines) + "\n")
    # Scene metadata: lets evaluation tools rebuild the exact per-view
    # homographies (H_i = K (R_i M + t_i e3^T) T).
    import json
    with open(os.path.join(outdir, "meta.json"), "w") as fo:
        json.dump({"f": f, "width": width, "height": height,
                   "plane_S": S, "plane_z0": z0,
                   "plane_ax": ax_c, "plane_ay": ay_c,
                   "tex_size": tex_size}, fo)
    return outdir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ppsfm_synth"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    make_dataset(out, n)
    print(f"wrote {n} images to {out}")
