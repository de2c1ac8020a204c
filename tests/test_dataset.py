"""Dataset layer tests with a synthetic scene on disk."""

import os

import numpy as np
import pytest
import scipy.io

cv2 = pytest.importorskip("cv2")

from rnr_tpu.data import (
    ViewDataset, LightProbeDataset, BatchLoader, collate_views,
    apply_sampling_pattern,
)


def test_sampling_patterns():
    assert apply_sampling_pattern(10, "all") == list(range(10))
    assert apply_sampling_pattern(10, "first_3") == [0, 1, 2]
    assert apply_sampling_pattern(10, "after_7") == [7, 8, 9]
    assert apply_sampling_pattern(10, "skip_3") == [0, 3, 6, 9]
    assert apply_sampling_pattern(10, "skipinv_3") == [1, 2, 4, 5, 7, 8]
    assert apply_sampling_pattern(10, "only_4") == [4]
    assert apply_sampling_pattern(4, "filter", keep_id=[2, 0]) == [2, 0]
    with pytest.raises(ValueError):
        apply_sampling_pattern(4, "bogus_1")


def _make_scene(root, num_view=6, hw=(40, 60)):
    os.makedirs(os.path.join(root, "rgb0"), exist_ok=True)
    poses = np.zeros((num_view, 4, 4), np.float64)
    projs = np.zeros((num_view, 3, 3), np.float64)
    for i in range(num_view):
        poses[i] = np.eye(4)
        poses[i][2, 3] = 2.0 + i * 0.1
        projs[i] = np.array([[50, 0, hw[1] / 2], [0, 50, hw[0] / 2], [0, 0, 1]])
        img = np.full((hw[0], hw[1], 3), 10 * (i + 1), np.uint8)
        cv2.imwrite(os.path.join(root, "rgb0", f"{i:05d}.png"), img)
    scipy.io.savemat(
        os.path.join(root, "calib.mat"),
        {
            "poses": poses,
            "projs": projs,
            "dist_coeffs": np.zeros((num_view, 5)),
            "img_hws": np.tile(np.asarray(hw), (num_view, 1)),
            "global_RT": np.eye(4),
        },
    )
    return root


def test_view_dataset_basics(tmp_path):
    root = _make_scene(str(tmp_path))
    ds = ViewDataset(
        root_dir=root,
        calib_path=os.path.join(root, "calib.mat"),
        img_dir=os.path.join(root, "rgb0"),
        img_size=(32, 32),
        sampling_pattern="skipinv_3",
    )
    assert len(ds) == 4  # 6 views minus indices 0, 3
    ds.buffer_all()
    v = ds[0]
    assert v["img_gt"].shape == (32, 32, 3)  # NHWC host layout
    # the square crop keeps the 40px height: offset y 0, x shifted
    assert v["proj"].shape == (3, 3)
    # intrinsics folded with crop+scale: fx scaled by 32/40
    np.testing.assert_allclose(v["proj"][1, 1], 50 * 32 / 40, rtol=1e-6)
    np.testing.assert_allclose(v["proj"][0, 0], 50 * 32 / 40, rtol=1e-6)
    # crop offset moves cx by -(60-40)/2 = -10 before scaling
    np.testing.assert_allclose(
        v["proj"][0, 2], (30 - 10) * 32 / 40, rtol=1e-6
    )
    np.testing.assert_allclose(v["proj_inv"] @ v["proj"], np.eye(3), atol=1e-5)
    # view 0 of the subsampled set is original view 1 -> gray value 20/255
    np.testing.assert_allclose(v["img_gt"], 20 / 255.0, atol=1e-3)


def test_batch_loader_and_collate(tmp_path):
    root = _make_scene(str(tmp_path))
    ds = ViewDataset(
        root_dir=root,
        calib_path=os.path.join(root, "calib.mat"),
        img_dir=os.path.join(root, "rgb0"),
        img_size=(16, 16),
        sampling_pattern="all",
    )
    ds.buffer_all()
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    batch = collate_views(batches[0], ["img_gt", "pose", "proj"])
    assert batch["img_gt"].shape == (2, 16, 16, 3)
    assert batch["pose"].shape == (2, 4, 4)


def test_light_probe_dataset(tmp_path):
    d = tmp_path / "lp"
    d.mkdir()
    for i in range(2):
        img = np.full((8, 16, 3), 60 * (i + 1), np.uint8)
        cv2.imwrite(str(d / f"probe{i}.png"), img)
    ds = LightProbeDataset(str(d))
    assert len(ds) == 2
    ds.buffer_all()
    lp = ds[1]["lp_img"]
    assert lp.shape == (8, 16, 3)
    np.testing.assert_allclose(lp, 120 / 255.0, atol=1e-3)
