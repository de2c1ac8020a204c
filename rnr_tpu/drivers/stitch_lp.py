"""Stitch an initial environment-map estimate from view backgrounds.

Counterpart of reference `stitch_lp.py`: for each sampled view, mask out
the projected (and dilated) object, map every background pixel's camera
ray to equirect coordinates, and average the pixel colors into a light
probe.  Writes `light_probe_stitch_<pattern>/{idx}.exr/.png`, a coverage
mask and a count map — the exact inputs `train_rnr` expects
(train_rnr.py:283-311).

Pure host NumPy/cv2 (this is an IO-bound offline pass).

Usage:
  python -m rnr_tpu.drivers.stitch_lp --data_root DATA [--lighting_idx 0]
      [--sampling_pattern skipinv_10] [--img_suffix .png]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import scipy.io

from rnr_tpu.drivers.common import resolve, cond_mkdir


def spherical_mapping_np(d: np.ndarray) -> np.ndarray:
    """[3, ...] directions -> [2, ...] equirect uv (render.py:87-93)."""
    u = np.arctan2(d[2], d[0]) * 0.5 / np.pi + 0.5
    v = np.arccos(np.clip(d[1], -1.0, 1.0)) / np.pi
    return np.stack((u, v))


def camera_rays_np(pose: np.ndarray, proj: np.ndarray, w: int, h: int
                   ) -> np.ndarray:
    """World-space ray per pixel, [3, H, W] (stitch_lp.py:26-33)."""
    y, x = np.meshgrid(
        np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij"
    )
    p = np.stack((x, y, np.ones_like(x))).reshape(3, -1)
    p = np.linalg.inv(proj) @ p
    p = np.linalg.inv(pose[:3, :3]) @ p
    p /= np.maximum(np.linalg.norm(p, axis=0, keepdims=True), 1e-12)
    return p.reshape(3, h, w)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--calib_fp", type=str, default="_/calib.mat")
    p.add_argument("--obj_fp", type=str, default="_/mesh.obj")
    p.add_argument("--lighting_idx", type=int, default=0)
    p.add_argument("--sampling_pattern", type=str, default="skipinv_10")
    p.add_argument("--img_suffix", type=str, default=".exr")
    p.add_argument("--lp_h", type=int, default=1600)
    p.add_argument("--lp_w", type=int, default=3200)
    return p


def main(argv=None) -> None:
    import cv2

    from rnr_tpu.data import load_obj
    from rnr_tpu.data.dataset import apply_sampling_pattern

    opt = build_argparser().parse_args(argv)
    opt.calib_fp = resolve(opt.calib_fp, opt.data_root)
    opt.obj_fp = resolve(opt.obj_fp, opt.data_root)
    img_dir = os.path.join(opt.data_root, f"rgb{opt.lighting_idx}")

    save_dir = os.path.join(
        opt.data_root, f"light_probe_stitch_{opt.sampling_pattern}"
    )
    save_mask = os.path.join(save_dir, "mask")
    save_count = os.path.join(save_dir, "count")
    for d in (save_dir, save_mask, save_count):
        cond_mkdir(d)

    calib = scipy.io.loadmat(opt.calib_fp)
    poses = calib["poses"]
    projs = calib["projs"]
    img_hws = calib["img_hws"]
    num_view = poses.shape[0]

    mesh = load_obj(opt.obj_fp)
    global_RT = calib["global_RT"]
    verts_h = np.concatenate(
        [mesh.v, np.ones((mesh.v.shape[0], 1), np.float32)], axis=1
    )
    vertices = (global_RT @ verts_h.T)  # [4, V] world (stitch_lp.py:96)

    keep = set(apply_sampling_pattern(num_view, opt.sampling_pattern))

    env = np.zeros((opt.lp_h, opt.lp_w, 3), np.float64)
    count = np.zeros((opt.lp_h, opt.lp_w, 3), np.float32)
    used_views = 0

    for i in range(num_view):
        if i not in keep:
            continue
        img_h, img_w = int(img_hws[i, 0]), int(img_hws[i, 1])
        pose = poses[i] @ np.linalg.inv(global_RT)
        proj = projs[i]

        if opt.img_suffix == ".exr":
            fp = os.path.join(img_dir, "%03d%s" % (i, opt.img_suffix))
            img = cv2.imread(fp, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
        else:
            fp = os.path.join(img_dir, "%06d%s" % (i, opt.img_suffix))
            img = cv2.imread(fp, cv2.IMREAD_UNCHANGED)
            img = img.astype(np.float32)[:, :, :3] / 255.0
        if img is None:
            print(f"view {i}: missing image {fp}, skipped")
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

        # project vertices, clamp into the frame (stitch_lp.py:125-133)
        v_cam = pose @ vertices
        v_px = proj @ v_cam[:3]
        v_px[0] /= v_px[2]
        v_px[1] /= v_px[2]
        v_px = v_px.astype(np.int32)
        v_px[v_px < 0] = 0
        v_px[0, v_px[0] > img_w - 1] = img_w - 1
        v_px[1, v_px[1] > img_h - 1] = img_h - 1

        # object mask: fill all faces at once, dilate at 512, resize back
        mask = np.zeros((img_h, img_w), np.uint8)
        polys = v_px[:2].T[mesh.f_v_idx]  # [F, 3, 2] int32
        cv2.fillPoly(mask, list(polys), 255)
        kernel = np.ones((17, 17), np.uint8)
        mask = cv2.resize(
            cv2.dilate(cv2.resize(mask, (512, 512)), kernel),
            (img_w, img_h),
        )
        bg = mask == 0

        rays = camera_rays_np(pose, proj, img_w, img_h)
        uv = spherical_mapping_np(rays[:, bg])
        ui = np.round(np.clip(uv[0] * opt.lp_w, None, opt.lp_w - 1)).astype(int)
        vi = np.round(np.clip(uv[1] * opt.lp_h, None, opt.lp_h - 1)).astype(int)

        np.add.at(env, (vi, ui), img[bg][:, :3])
        np.add.at(count, (vi, ui), 1.0)
        used_views += 1
        if used_views % 10 == 0:
            print(f"view {i} stitched")

    covered = count.sum(axis=2) > 0
    env[covered] /= count[covered]

    idx = str(opt.lighting_idx)
    cv2.imwrite(
        os.path.join(save_dir, idx + ".png"),
        (np.clip(env[:, :, ::-1], 0, 1) * 255).astype(np.uint8),
    )
    # HDR float output: EXR if this cv2 build supports it, else Radiance HDR
    try:
        cv2.imwrite(
            os.path.join(save_dir, idx + ".exr"),
            env[:, :, ::-1].astype(np.float32),
        )
    except cv2.error:
        cv2.imwrite(
            os.path.join(save_dir, idx + ".hdr"),
            env[:, :, ::-1].astype(np.float32),
        )
    cv2.imwrite(
        os.path.join(save_mask, idx + ".png"),
        (covered[:, :, None].repeat(3, 2) * 255).astype(np.uint8),
    )
    cv2.imwrite(
        os.path.join(save_count, idx + ".png"),
        (count / max(used_views, 1) * 255.0).astype(np.uint8),
    )
    scipy.io.savemat(
        os.path.join(save_count, idx + ".mat"),
        {"count": count[:, :, 0].astype(np.int64), "num_view": used_views},
    )
    print(f"stitched {used_views} views -> {save_dir}")


if __name__ == "__main__":
    main()
