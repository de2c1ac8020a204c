"""Model-layer numerical parity against the reference torch code.

Imports /root/reference's `network.py` and `render.py` with stubs for the
CUDA-only / missing dependencies and compares element-wise with this
framework's modules.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# ---- stubs for the reference's unavailable imports ----------------------
for name in ("torchvision", "torchvision.utils", "pyshtools",
             "torch_cluster", "skimage", "skimage.transform"):
    if name not in sys.modules:
        m = types.ModuleType(name)
        if name == "torch_cluster":
            m.knn_graph = None
        if name == "skimage":
            m.transform = types.ModuleType("skimage.transform")
        sys.modules[name] = m
if not hasattr(sys.modules["skimage"], "transform"):
    sys.modules["skimage"].transform = sys.modules["skimage.transform"]

if "torch_geometric" not in sys.modules:
    tg = types.ModuleType("torch_geometric")
    tg.data = types.ModuleType("torch_geometric.data")
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.data"] = tg.data

if "pytorch_msssim" not in sys.modules:
    m = types.ModuleType("pytorch_msssim")
    m.ssim = lambda *a, **k: torch.zeros(1)
    sys.modules["pytorch_msssim"] = m


def _torch_vertex_attrs_to_faces(vertex_attrs, faces):
    bs, nv, na = vertex_attrs.shape
    faces = faces + (torch.arange(bs, dtype=torch.int32) * nv)[:, None, None]
    return vertex_attrs.reshape(bs * nv, na)[faces.long()]


if "neural_renderer" not in sys.modules:
    nr = types.ModuleType("neural_renderer")
    nr.vertex_attrs_to_faces = _torch_vertex_attrs_to_faces
    nr.load_obj = None
    nr.Renderer = object
    nr.projection = None
    nr.lighting = None
    nr.vertices_to_faces = None
    sys.modules["neural_renderer"] = nr

# the 2019-era reference uses the removed np.int alias
if not hasattr(np, "int"):
    np.int = int  # type: ignore[attr-defined]

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax
import jax.numpy as jnp


def test_ray_sampler_vs_reference(rng):
    import network as ref_network

    from rnr_tpu.models.rays import RaySampler

    for mode in ("reflect", "diffuse"):
        tref = ref_network.RaySampler(num_azi=6, num_polar=2,
                                      interval_polar=5, mode=mode)
        ours = RaySampler(num_azi=6, num_polar=2, interval_polar=5, mode=mode)
        np.testing.assert_allclose(
            ours.Rs, tref.Rs.numpy(), atol=1e-6
        )
        np.testing.assert_allclose(
            ours.pivots_dir, tref.pivots_dir.numpy(), atol=1e-6
        )

        n, s = 2, 6
        tbn = rng.standard_normal((n, s, s, 3, 3)).astype(np.float32)
        vdt = rng.standard_normal((n, s, s, 3)).astype(np.float32)
        vdt /= np.linalg.norm(vdt, axis=-1, keepdims=True)
        alpha = (rng.uniform(size=(n, s, s, 1)) > 0.3).astype(np.float32)

        want_dir, want_uv, _ = tref(
            torch.from_numpy(tbn.copy()), torch.from_numpy(vdt.copy()),
            torch.from_numpy(alpha.copy()),
        )
        got_dir, got_uv, _ = ours(
            jnp.asarray(tbn), jnp.asarray(vdt), jnp.asarray(alpha)
        )
        np.testing.assert_allclose(
            np.asarray(got_dir), want_dir.numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_uv), want_uv.numpy(), atol=2e-5
        )


def test_texture_mapper_vs_reference(rng):
    import network as ref_network

    from rnr_tpu.models.texture import TextureMapper

    ts, ch, mips = 16, 12, 3
    tref = ref_network.TextureMapper(texture_size=ts, texture_num_ch=ch,
                                     mipmap_level=mips, apply_sh=True)
    # randomize the reference textures, then copy into our params
    with torch.no_grad():
        for t in tref.textures:
            t.copy_(torch.from_numpy(
                rng.standard_normal(tuple(t.shape)).astype(np.float32)
            ))
    tref.train()

    ours = TextureMapper(texture_size=ts, texture_num_ch=ch,
                         mipmap_level=mips, apply_sh=True)
    n, s = 2, 8
    uv = rng.uniform(0, 1, (n, s, s, 2)).astype(np.float32)
    shb = rng.uniform(-1, 1, (n, s, s, 9)).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(uv),
                          jnp.asarray(shb))
    params = dict(variables["params"])
    for i, t in enumerate(tref.textures):
        params[f"texture_{i}"] = jnp.asarray(t.detach().numpy()[0])

    with torch.no_grad():
        want = tref(torch.from_numpy(uv.copy()),
                    torch.from_numpy(shb.copy()), sh_start_ch=3).numpy()
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(uv), jnp.asarray(shb),
                   sh_start_ch=3)
    )
    # ours is NHWC, reference NCHW
    np.testing.assert_allclose(
        np.transpose(got, (0, 3, 1, 2)), want, atol=2e-5
    )


def test_chrom_loss_vs_reference(rng):
    import network as ref_network

    from rnr_tpu.models.rays import rays_lt_chrom_loss

    n, r, c, s = 1, 5, 3, 6
    rays_lt = rng.uniform(0.1, 2.0, (n, r, c, s, s)).astype(np.float32)
    alpha = (rng.uniform(size=(n, 1, s, s)) > 0.3).astype(np.float32)
    img = rng.uniform(0, 1, (n, c, s, s)).astype(np.float32)

    crit = ref_network.RaysLTChromLoss()
    want, *_ = crit(
        torch.from_numpy(rays_lt.copy()), torch.from_numpy(alpha.copy()),
        torch.from_numpy(img.copy()),
    )
    # ours: [N, H, W, R, C] layout + alpha [N, H, W, 1] + img NHWC
    got, *_ = rays_lt_chrom_loss(
        jnp.asarray(np.transpose(rays_lt, (0, 3, 4, 1, 2))),
        jnp.asarray(np.transpose(alpha, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_tbn_map_vs_reference(rng):
    import render as ref_render

    from rnr_tpu.ops.tbn import get_tbn_map

    f, n, s = 8, 1, 6
    faces_v = rng.standard_normal((f, 3, 3)).astype(np.float32)
    faces_uv = rng.uniform(0.1, 0.9, (f, 3, 2)).astype(np.float32)
    normal = rng.standard_normal((n, s, s, 3)).astype(np.float32)
    fim = rng.integers(0, f, (n, s, s)).astype(np.int64)

    want = ref_render.get_TBN_map(
        torch.from_numpy(normal.copy()), torch.from_numpy(fim),
        faces_v=torch.from_numpy(faces_v.copy()),
        faces_texcoord=torch.from_numpy(faces_uv.copy()),
    ).numpy()
    got = np.asarray(
        get_tbn_map(jnp.asarray(normal), jnp.asarray(fim.astype(np.int32)),
                    jnp.asarray(faces_v), jnp.asarray(faces_uv))
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("conv_type", ["edge", "mr"])
@pytest.mark.parametrize("act_type,norm_type,bias", [
    ("relu", "batch", True),       # reference CLI defaults (train_rnr.py:88-90)
    ("leakyrelu", "instance", True),
    ("prelu", None, False),
])
def test_graph_conv_vs_reference(rng, conv_type, act_type, norm_type, bias):
    """Weight-copied EdgeConv4D/MRConv4D parity incl. act/norm/bias knobs.

    The torch modules run in train() mode: the reference never .eval()s
    the GCN (train_rnr.py:405; at inference v_feature is restored from
    the checkpoint), so BatchNorm parity is against current-batch stats.
    """
    from gcn_lib.dense.torch_vertex import EdgeConv4D, MRConv4D

    from rnr_tpu.models.gcn import EdgeConv

    V, k, C, out = 40, 6, 10, 12
    x = rng.standard_normal((V, C)).astype(np.float32)
    idx = rng.integers(0, V, (V, k)).astype(np.int32)
    idx[:, 0] = np.arange(V)  # self like a kNN graph

    cls = EdgeConv4D if conv_type == "edge" else MRConv4D
    ref = cls(C, out, act_type=act_type, norm_type=norm_type, bias=bias)
    ref.train()

    # reference layout: x [1, C, V, 1]; edge_index [2, 1, V, k] with
    # row 0 = neighbors (x_j), row 1 = centers (x_i)
    tx = torch.from_numpy(x.T.copy())[None, :, :, None]
    nbr = torch.from_numpy(idx.astype(np.int64))[None]
    ctr = torch.arange(V, dtype=torch.int64)[None, :, None].expand(1, V, k)
    edge_index = torch.stack([nbr, ctr], dim=0)
    with torch.no_grad():
        want = ref(tx, edge_index).numpy()[0, :, :, 0].T  # -> [V, out]

    ours = EdgeConv(out, conv_type, act_type=act_type,
                    norm_type=norm_type, use_bias=bias)
    vars_ = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      jnp.asarray(idx))
    conv2d = ref.nn[0]
    params = dict(vars_["params"])
    params["Dense_0"] = dict(params["Dense_0"])
    params["Dense_0"]["kernel"] = jnp.asarray(
        conv2d.weight.detach().numpy()[:, :, 0, 0].T
    )
    if bias:
        params["Dense_0"]["bias"] = jnp.asarray(
            conv2d.bias.detach().numpy()
        )
    if act_type == "prelu":
        params["_Act_0"] = {"prelu_slope": jnp.asarray(
            float(ref.nn[1].weight.detach().numpy()[0])
        )}
    if norm_type == "batch":
        bn = ref.nn[2]
        params["norm_scale"] = jnp.asarray(bn.weight.detach().numpy())
        params["norm_bias"] = jnp.asarray(bn.bias.detach().numpy())
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x),
                                jnp.asarray(idx)))
    np.testing.assert_allclose(got, want, atol=2e-5)
