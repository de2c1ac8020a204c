"""OBJ parser/writer roundtrip tests."""

import numpy as np

from rnr_tpu.data import load_obj, save_obj, Mesh


OBJ_TEXT = """# comment
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.5
v 0.0 1.0 0.5
vt 0.0 0.0
vt 1.0 0.0
vt 1.0 1.0
vt 0.0 1.0
vn 0.0 0.0 1.0
f 1/1/1 2/2/1 3/3/1 4/4/1
"""


def test_load_obj_quads_and_triplets(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(OBJ_TEXT)
    m = load_obj(str(p))
    assert m.v.shape == (4, 3)
    assert m.vt.shape == (4, 2)
    assert m.vn.shape == (1, 3)
    # quad fan-triangulated into 2 faces
    np.testing.assert_array_equal(m.f_v_idx, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_array_equal(m.f_vt_idx, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_array_equal(m.f_vn_idx, [[0, 0, 0], [0, 0, 0]])


def test_load_obj_negative_indices(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    m = load_obj(str(p))
    np.testing.assert_array_equal(m.f_v_idx, [[0, 1, 2]])


def test_load_obj_normalization(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text("v 2 2 2\nv 4 2 2\nv 4 4 4\nf 1 2 3\n")
    m = load_obj(str(p), normalization=True)
    assert np.abs(m.v).max() <= 1.0 + 1e-6
    np.testing.assert_allclose(m.v.max(0) + m.v.min(0), 0.0, atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.standard_normal((5, 3)).astype(np.float32)
    f = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    vt = rng.uniform(0, 1, (5, 2)).astype(np.float32)
    p = tmp_path / "rt.obj"
    save_obj(str(p), v, f, vt=vt, f_vt_idx=f)
    m = load_obj(str(p))
    np.testing.assert_allclose(m.v, v, atol=1e-5)
    np.testing.assert_array_equal(m.f_v_idx, f)
    np.testing.assert_allclose(m.vt, vt, atol=1e-5)


def test_mesh_global_rt(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(
        "v 1 0 0\nv 0 1 0\nv 0 0 1\nvn 1 0 0\nvn 0 1 0\nvn 0 0 1\n"
        "f 1//1 2//2 3//3\n"
    )
    # 90-degree rotation about z plus translation
    RT = np.array(
        [[0, -1, 0, 1], [1, 0, 0, 2], [0, 0, 1, 3], [0, 0, 0, 1]], np.float64
    )
    m = Mesh(str(p), global_RT=RT)
    np.testing.assert_allclose(m.v[0], [1, 3, 3], atol=1e-5)
    # normals rotate without translation and stay unit
    np.testing.assert_allclose(m.vn[0], [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(m.vn, axis=1), 1.0, atol=1e-5)
    assert m.span_max_orig > 0
