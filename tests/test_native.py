"""Native runtime (C++ OBJ parser + image decoder) parity tests."""

import os

import numpy as np
import pytest

from rnr_tpu.data import load_obj
from rnr_tpu.data.native import (
    native_available, parse_obj_native, decode_images_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library unavailable"
)


def test_obj_parser_parity(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(
        "# header\n"
        "v 0.5 -1.25 3e-2\nv 1 0 0\nv 1 1 0.5\nv 0 1 0.5\nv 2 2 2\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 1\nvn 0 1 0\n"
        "f 1/1/1 2/2/1 3/3/2 4/4/2\n"
        "f -3 -2 -1\n"
    )
    py = load_obj(str(p), use_native=False)
    nat = load_obj(str(p), use_native=True)
    np.testing.assert_allclose(nat.v, py.v, rtol=1e-6)
    np.testing.assert_allclose(nat.vt, py.vt, rtol=1e-6)
    np.testing.assert_allclose(nat.vn, py.vn, rtol=1e-6)
    np.testing.assert_array_equal(nat.f_v_idx, py.f_v_idx)
    # mixed faces (one with vt/vn triplets, one bare) -> triplet arrays
    # dropped in both parsers
    assert nat.f_vt_idx.shape == py.f_vt_idx.shape
    assert nat.f_vn_idx.shape == py.f_vn_idx.shape


def test_obj_parser_parity_large_random(tmp_path, rng):
    nv, nf = 500, 900
    v = rng.standard_normal((nv, 3)).astype(np.float32)
    f = rng.integers(0, nv, (nf, 3)).astype(np.int32)
    lines = ["v %f %f %f" % tuple(x) for x in v]
    lines += ["f %d %d %d" % tuple(x + 1) for x in f]
    p = tmp_path / "big.obj"
    p.write_text("\n".join(lines) + "\n")
    py = load_obj(str(p), use_native=False)
    nat = load_obj(str(p), use_native=True)
    np.testing.assert_allclose(nat.v, py.v, rtol=1e-5)
    np.testing.assert_array_equal(nat.f_v_idx, py.f_v_idx)


def test_native_image_decode_matches_cv2(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    paths = []
    refs = []
    for i in range(4):
        img = (rng.uniform(0, 255, (24, 32, 3))).astype(np.uint8)
        p = str(tmp_path / f"img{i}.png")
        cv2.imwrite(p, img[:, :, ::-1])  # BGR on disk
        paths.append(p)
        refs.append(img.astype(np.float32) / 255.0)
    out = decode_images_native(paths, n_threads=2)
    assert out is not None
    for got, want in zip(out, refs):
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_native_image_decode_jpeg(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    img = (rng.uniform(0, 255, (16, 16, 3))).astype(np.uint8)
    p = str(tmp_path / "img.jpg")
    cv2.imwrite(p, img[:, :, ::-1])
    out = decode_images_native([p])
    assert out is not None
    want = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    np.testing.assert_allclose(out[0], want, atol=2e-2)
