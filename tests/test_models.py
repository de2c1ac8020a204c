"""Model-layer tests: texture, U-Net, GCN, lighting, rays."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnr_tpu.models import (
    TextureMapper,
    RenderingNet,
    Unet,
    DenseDeepGCN,
    GCNConfig,
    LightingSH,
    LightingLP,
    RaySampler,
    rays_lt_chrom_loss,
)
from rnr_tpu.models.gcn import knn_graph, SNDense
from rnr_tpu.models.rays import ray_render
from rnr_tpu.ops.sh import evaluate_sh_basis, reconstruct_sh


KEY = jax.random.PRNGKey(0)


# --------------------------------------------------------------------------
# TextureMapper
# --------------------------------------------------------------------------

def test_texture_mapper_init_and_sample():
    tm = TextureMapper(texture_size=16, texture_num_ch=6, mipmap_level=3,
                       apply_sh=False)
    uv = jnp.full((1, 4, 4, 2), 0.5)
    params = tm.init(KEY, uv)
    p = params["params"]
    assert p["texture_0"].shape == (16, 16, 6)
    assert p["texture_1"].shape == (8, 8, 6)
    np.testing.assert_allclose(p["texture_0"], 1.0)
    np.testing.assert_allclose(p["texture_1"], 0.01)
    out = tm.apply(params, uv)
    # sum of levels: 1 + 0.01 + 0.01
    np.testing.assert_allclose(np.asarray(out), 1.02, atol=1e-6)


def test_texture_mapper_sh_modulation():
    tm = TextureMapper(texture_size=8, texture_num_ch=16, mipmap_level=1,
                       apply_sh=True)
    uv = jnp.full((1, 2, 2, 2), 0.25)
    sh = jnp.full((1, 2, 2, 9), 2.0)
    params = tm.init(KEY, uv, sh)
    out = np.asarray(tm.apply(params, uv, sh, sh_start_ch=3))
    np.testing.assert_allclose(out[..., :3], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 3:12], 2.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 12:], 1.0, atol=1e-6)


def test_texture_mapper_init_texture():
    init = np.full((8, 8, 3), 0.7, np.float32)
    tm = TextureMapper(texture_size=8, texture_num_ch=12, mipmap_level=1,
                       apply_sh=False, texture_init=init)
    uv = jnp.full((1, 2, 2, 2), 0.5)
    params = tm.init(KEY, uv)
    t0 = np.asarray(params["params"]["texture_0"])
    np.testing.assert_allclose(t0[..., :3], 0.7)
    np.testing.assert_allclose(t0[..., 3:6], 0.7)
    np.testing.assert_allclose(t0[..., 6:], 1.0)


def test_texture_mapper_flatten_mipmap():
    tm = TextureMapper(texture_size=8, texture_num_ch=6, mipmap_level=2,
                       apply_sh=False)
    uv = jnp.zeros((1, 2, 2, 2))
    params = tm.init(KEY, uv)
    flat = tm.flatten_mipmap(params["params"], 0, 6)
    assert flat.shape == (8, 8, 6)
    np.testing.assert_allclose(np.asarray(flat), 1.01, atol=1e-6)


def test_texture_gradient_flows():
    tm = TextureMapper(texture_size=8, texture_num_ch=4, mipmap_level=2,
                       apply_sh=False)
    uv = jax.random.uniform(KEY, (1, 4, 4, 2))
    params = tm.init(KEY, uv)

    def loss(p):
        return jnp.sum(tm.apply(p, uv) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["params"]["texture_0"]).sum()) > 0
    assert float(jnp.abs(g["params"]["texture_1"]).sum()) > 0


# --------------------------------------------------------------------------
# U-Net
# --------------------------------------------------------------------------

def test_unet_shapes_and_gcn_fusion():
    net = RenderingNet(nf0=8, in_channels=7, out_channels=5, num_down_unet=3,
                       out_channels_gcn=16, use_gcn=True)
    x = jax.random.normal(KEY, (1, 32, 32, 7))
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
    params = net.init({"params": KEY, "dropout": KEY}, x, v)
    y = net.apply(params, x, v, rngs={"dropout": jax.random.PRNGKey(2)})
    assert y.shape == (1, 32, 32, 5)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh
    # GCN feature must influence the output (the reference's shipped code
    # silently drops it; ours must not)
    y2 = net.apply(params, x, v * 10.0, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_unet_no_gcn_eval_deterministic():
    net = RenderingNet(nf0=8, in_channels=4, out_channels=3, num_down_unet=3,
                       use_gcn=False)
    x = jax.random.normal(KEY, (2, 16, 16, 4))
    params = net.init({"params": KEY, "dropout": KEY}, x, None)
    y1 = net.apply(params, x, None, train=False)
    y2 = net.apply(params, x, None, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))


def test_unet_channel_progression():
    net = Unet(in_channels=4, out_channels=2, nf0=4, num_down=5,
               max_channels=32, use_dropout=False, use_gcn=False)
    x = jax.random.normal(KEY, (1, 32, 32, 4))
    params = net.init(KEY, x)
    y = net.apply(params, x)
    assert y.shape == (1, 32, 32, 2)


# --------------------------------------------------------------------------
# GCN
# --------------------------------------------------------------------------

def test_knn_graph_correct(rng):
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    idx = np.asarray(knn_graph(jnp.asarray(pts), 5))
    d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    ref = np.argsort(d, axis=1)[:, :5]
    # first neighbor is self
    np.testing.assert_array_equal(idx[:, 0], np.arange(50))
    # sets match (order may differ on ties)
    for i in range(50):
        assert set(idx[i]) == set(ref[i])


def test_sndense_spectral_norm(rng):
    layer = SNDense(16, power_iters=30)
    x = jnp.asarray(rng.standard_normal((4, 12)).astype(np.float32))
    vars_ = layer.init(KEY, x)
    w = np.asarray(vars_["params"]["kernel"])
    y, updated = layer.apply(vars_, x, mutable=["spectral"])
    sigma = np.linalg.svd(w, compute_uv=False)[0]
    w_used = w / sigma
    want = x @ w_used + np.asarray(vars_["params"]["bias"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=1e-3)


def test_gcn_forward_shape(rng):
    cfg = GCNConfig(n_filters=8, kernel_size=4, n_blocks=3, num_v=64,
                    out_channels=32, stochastic=True, epsilon=0.5)
    gcn = DenseDeepGCN(cfg)
    pos = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32))
    vars_ = gcn.init({"params": KEY, "gcn": KEY}, pos)
    out, _ = gcn.apply(vars_, pos, rngs={"gcn": jax.random.PRNGKey(3)},
                       mutable=["spectral"])
    assert out.shape == (1, 32)
    # eval mode needs no rng and is deterministic
    o1 = gcn.apply(vars_, pos, train=False, mutable=["spectral"])[0]
    o2 = gcn.apply(vars_, pos, train=False, mutable=["spectral"])[0]
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


def test_gcn_gradients_flow(rng):
    cfg = GCNConfig(n_filters=4, kernel_size=3, n_blocks=2, num_v=32,
                    out_channels=8, stochastic=False)
    gcn = DenseDeepGCN(cfg)
    pos = jnp.asarray(rng.standard_normal((32, 3)).astype(np.float32))
    vars_ = gcn.init(KEY, pos)

    def loss(p):
        out, _ = gcn.apply({**vars_, "params": p}, pos, train=False,
                           mutable=["spectral"])
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(vars_["params"])
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert total > 0


# --------------------------------------------------------------------------
# Lighting
# --------------------------------------------------------------------------

def _fib_sphere(n):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)]
    )  # [3, n]


def test_lighting_sh_roundtrip(rng):
    l_dir = _fib_sphere(128).astype(np.float32)
    coeff0 = rng.standard_normal((2, 9, 3)).astype(np.float32)
    m = LightingSH(l_dir=l_dir, lmax=2, num_lighting=2, num_channel=3,
                   init_coeff=coeff0, lp_recon_h=16, lp_recon_w=32)
    vars_ = m.init(KEY)
    np.testing.assert_allclose(
        np.asarray(vars_["params"]["coeff"]), coeff0, atol=1e-6
    )
    samples = m.apply(vars_, 0)
    basis = evaluate_sh_basis(2, jnp.asarray(l_dir.T))
    want = reconstruct_sh(jnp.asarray(coeff0[0]), basis)
    np.testing.assert_allclose(np.asarray(samples[0]), np.asarray(want), atol=1e-5)
    lp = m.apply(vars_, 0, is_lp=True)
    assert lp.shape == (1, 16, 32, 3)
    lp_all = m.apply(vars_, None, is_lp=True)
    assert lp_all.shape == (1, 2, 16, 32, 3)


def test_lighting_lp_init_from_probes(rng):
    l_dir = _fib_sphere(64).astype(np.float32)
    lps = rng.uniform(0, 1, (2, 8, 16, 3)).astype(np.float32)
    m = LightingLP(l_dir=l_dir, lps=lps)
    vars_ = m.init(KEY)
    s = np.asarray(vars_["params"]["l_samples"])
    assert s.shape == (2, 64, 3)
    assert s.min() >= 0 and s.max() <= 1.0 + 1e-6
    # constant probe -> constant samples
    lps_c = np.full((1, 8, 16, 3), 0.25, np.float32)
    m2 = LightingLP(l_dir=l_dir, lps=lps_c)
    v2 = m2.init(KEY)
    np.testing.assert_allclose(
        np.asarray(v2["params"]["l_samples"]), 0.25, atol=1e-5
    )
    # fit_sh on constant light: only l=0 band nonzero
    coeff = m2.apply(v2, method=lambda mdl: mdl.fit_sh(2))
    c = np.asarray(coeff)
    assert c.shape == (1, 9, 3)
    np.testing.assert_allclose(c[0, 0], 0.25 * np.sqrt(4 * np.pi), atol=0.05)
    np.testing.assert_allclose(c[0, 1:], 0.0, atol=0.05)


# --------------------------------------------------------------------------
# Rays
# --------------------------------------------------------------------------

def test_ray_sampler_counts_and_identity_pivot():
    rs = RaySampler(num_azi=6, num_polar=2, interval_polar=5, mode="reflect")
    assert rs.num_ray == 13
    np.testing.assert_allclose(rs.pivots_dir[:, 0], [0, 0, 1], atol=1e-6)
    tbn = jnp.broadcast_to(jnp.eye(3), (1, 4, 4, 3, 3))
    vdt = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1, 4, 4, 3))
    alpha = jnp.ones((1, 4, 4, 1))
    rays_dir, rays_uv, rays_tan = rs(tbn, vdt, alpha)
    assert rays_dir.shape == (1, 4, 4, 3, 13)
    # pivot 0 is +z; reflecting the +z view dir around it gives +z back
    np.testing.assert_allclose(
        np.asarray(rays_dir[0, 0, 0, :, 0]), [0, 0, 1], atol=1e-5
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays_dir), axis=-2), 1.0, atol=1e-5
    )


def test_ray_sampler_masked_uv():
    rs = RaySampler(num_azi=2, num_polar=1, interval_polar=10, mode="diffuse")
    tbn = jnp.broadcast_to(jnp.eye(3), (1, 2, 2, 3, 3))
    vdt = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1, 2, 2, 3))
    alpha = jnp.zeros((1, 2, 2, 1)).at[0, 0, 0, 0].set(1.0)
    _, rays_uv, _ = rs(tbn, vdt, alpha)
    uv = np.asarray(rays_uv)
    np.testing.assert_allclose(uv[0, 1, 1], -1.0)
    assert (uv[0, 0, 0] >= 0).all()


def test_ray_render_uniform_light(rng):
    n, h, w, c, r = 1, 4, 4, 3, 5
    rays_uv = jnp.full((n, h, w, 2, r), 0.5)
    rays_lt = jnp.ones((n, h, w, r, c))
    albedo = jnp.full((n, h, w, c), 0.5)
    lp = jnp.full((1, 8, 16, c), 2.0)
    out = ray_render(albedo, rays_uv, rays_lt, lp, num_ray_diffuse=2,
                     albedo_diffuse=albedo, separate_albedo=True)
    # specular: mean over 3 rays of 1*2 = 2; *albedo = 1.  diffuse same.
    np.testing.assert_allclose(np.asarray(out["out_specular"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["out_diffuse"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["out"]), 2.0, atol=1e-5)


def test_chrom_loss_white_lt_is_zero(rng):
    # identical chromaticity across rays -> zero loss
    base = jnp.ones((1, 4, 4, 1, 3))
    rays_lt = jnp.broadcast_to(base, (1, 4, 4, 6, 3)) * jnp.asarray(
        rng.uniform(0.5, 2.0, (1, 4, 4, 6, 1)).astype(np.float32)
    )
    alpha = jnp.ones((1, 4, 4, 1))
    loss, *_ = rays_lt_chrom_loss(rays_lt, alpha)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)
    # non-uniform chromaticity -> positive loss
    rays_lt2 = jnp.asarray(rng.uniform(0.1, 1.0, (1, 4, 4, 6, 3)).astype(np.float32))
    loss2, *_ = rays_lt_chrom_loss(rays_lt2, alpha)
    assert float(loss2) > 1e-4


def test_gcn_graph_refresh_flag(rng):
    # graph_refresh_every > 1 must keep shapes valid for every block
    cfg = GCNConfig(n_filters=4, kernel_size=3, n_blocks=6, num_v=32,
                    out_channels=8, stochastic=False, graph_refresh_every=3)
    gcn = DenseDeepGCN(cfg)
    pos = jnp.asarray(rng.standard_normal((32, 3)).astype(np.float32))
    vars_ = gcn.init(KEY, pos)
    out, _ = gcn.apply(vars_, pos, train=False, mutable=["spectral"])
    assert out.shape == (1, 8)
    assert bool(jnp.isfinite(out).all())


def test_sparse_edge_conv_matches_dense(rng):
    from rnr_tpu.models.gcn import EdgeConv, knn_graph
    from rnr_tpu.models.gcn_sparse import SparseEdgeConv, knn_edges

    x = jnp.asarray(rng.standard_normal((20, 6)).astype(np.float32))
    idx = knn_graph(x, 4)
    edges = knn_edges(x, 4)
    dense = EdgeConv(8)
    vd = dense.init(KEY, x, idx)
    out_d = dense.apply(vd, x, idx)
    sparse = SparseEdgeConv(8)
    # same Dense kernel weights
    vs = {"params": {"Dense_0": vd["params"]["Dense_0"]}}
    out_s = sparse.apply(vs, x, edges)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s), atol=1e-5)


def test_sparse_res_dyn_block(rng):
    from rnr_tpu.models.gcn_sparse import SparseResDynBlock

    x = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    blk = SparseResDynBlock(8, kernel_size=3)
    v = blk.init(KEY, x)
    y = blk.apply(v, x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_ray_render_sh_matches_probe_path(rng):
    """Direct SH shading must agree with sampling a finely reconstructed
    probe of the same coefficients (up to probe discretization)."""
    from rnr_tpu.models.rays import ray_render, ray_render_sh
    from rnr_tpu.models.rays import RaySampler
    from rnr_tpu.ops.sh import evaluate_sh_basis, reconstruct_sh
    from rnr_tpu.models.lighting import _recon_grid_dirs

    lmax = 2
    coeff = jnp.asarray(rng.standard_normal((9, 3)).astype(np.float32) * 0.3)
    # reconstruct a fine probe from the same coeff
    h, w = 256, 512
    dirs = _recon_grid_dirs(h, w)
    basis = evaluate_sh_basis(lmax, dirs)
    lp = reconstruct_sh(coeff, basis).reshape(1, h, w, 3)

    rs = RaySampler(num_azi=4, num_polar=1)
    n, s = 1, 8
    tbn = jnp.broadcast_to(jnp.eye(3), (n, s, s, 3, 3))
    vd = rng.standard_normal((n, s, s, 3)).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    alpha = jnp.ones((n, s, s, 1))
    rays_dir, rays_uv, _ = rs(tbn, jnp.asarray(vd), alpha)
    rays_lt = jnp.asarray(rng.uniform(0.5, 1.5, (n, s, s, rs.num_ray, 3)).astype(np.float32))
    alb = jnp.full((n, s, s, 3), 0.5)

    out_probe = ray_render(alb, rays_uv, rays_lt, lp)
    out_sh = ray_render_sh(alb, rays_dir, alpha, rays_lt, coeff, lmax)
    np.testing.assert_allclose(
        np.asarray(out_sh["out"]), np.asarray(out_probe["out"]),
        atol=0.03, rtol=0.05,
    )


def test_unet_dense_fuse_mode():
    """GcnFuseBlock (fuse_mode='dense') matches the concat block's
    function class: with the dense set to the sum of the 9 v-tap kernels
    of an equivalent concat fusion, outputs are identical."""
    import jax
    import jax.numpy as jnp
    import flax
    from rnr_tpu.models.unet import Unet

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 5)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 8)).astype(np.float32))
    kw = dict(in_channels=5, out_channels=3, nf0=4, num_down=2,
              max_channels=8, use_dropout=False, use_gcn=True,
              out_channels_gcn=8, norm="none", compute_dtype="float32")
    net_c = Unet(fuse_mode="concat", **kw)
    net_d = Unet(fuse_mode="dense", **kw)
    pc = flax.traverse_util.flatten_dict(
        net_c.init(jax.random.PRNGKey(0), x, v, train=False)["params"]
    )
    pd = flax.traverse_util.flatten_dict(
        net_d.init(jax.random.PRNGKey(1), x, v, train=False)["params"]
    )

    h_ch = 4  # chs[0]=nf0 -> after DownBlock_0: chs[1]=8? no: fusion input
    # fusion input h has chs[1] channels; derive split from shapes instead
    fuse_c = {k: v_ for k, v_ in pc.items() if k[0] == "DownBlock_1"}
    fuse_d_keys = [k for k in pd if k[0] == "GcnFuseBlock_0"]
    w_prep = fuse_c[("DownBlock_1", "Conv_0", "kernel")]  # [3,3,h+v,mid]
    h_ch = pd[("GcnFuseBlock_0", "Conv_0", "kernel")].shape[2]
    pd[("GcnFuseBlock_0", "Conv_0", "kernel")] = w_prep[:, :, :h_ch, :]
    pd[("GcnFuseBlock_0", "Dense_0", "kernel")] = w_prep[:, :, h_ch:, :].sum(
        axis=(0, 1)
    )
    pd[("GcnFuseBlock_0", "Conv_0", "bias")] = fuse_c[
        ("DownBlock_1", "Conv_0", "bias")
    ]
    pd[("GcnFuseBlock_0", "Conv_1", "kernel")] = fuse_c[
        ("DownBlock_1", "Conv_1", "kernel")
    ]
    pd[("GcnFuseBlock_0", "Conv_1", "bias")] = fuse_c[
        ("DownBlock_1", "Conv_1", "bias")
    ]
    # every other param maps in creation order between the two trees
    rest_c = [k for k in pc if k[0] != "DownBlock_1"]
    rest_d = [k for k in pd if k[0] != "GcnFuseBlock_0"]
    assert len(rest_c) == len(rest_d)
    for kc, kd in zip(rest_c, rest_d):
        assert pc[kc].shape == pd[kd].shape, (kc, kd)
        pd[kd] = pc[kc]

    out_c = net_c.apply(
        {"params": flax.traverse_util.unflatten_dict(pc)}, x, v, train=False
    )
    out_d = net_d.apply(
        {"params": flax.traverse_util.unflatten_dict(pd)}, x, v, train=False
    )
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_c), atol=1e-5
    )


def test_chrom_loss_gradient_finite_at_zero_rays():
    """Regression: a ray with exactly-zero light transport (tanh
    saturated to -1) must NOT produce NaN gradients.  The old
    norm/maximum guard protected the value but sqrt'(0)=inf reached the
    backward pass; every long training run diverged at ~iter 1400
    through this gradient."""
    import jax
    import jax.numpy as jnp
    from rnr_tpu.models.rays import rays_lt_chrom_loss

    rng = np.random.default_rng(0)
    rl = jnp.asarray(rng.uniform(0.1, 1, (1, 4, 4, 3, 3)).astype(np.float32))
    rl = rl.at[0, 1, 1, 0].set(0.0)
    alpha = jnp.ones((1, 4, 4, 1))
    g = jax.grad(lambda r: rays_lt_chrom_loss(r, alpha)[0])(rl)
    assert bool(jnp.isfinite(g).all())


def test_gcn_bf16_compute_matches_f32():
    """EdgeConv bf16 compute vs f32: same graphs (built from f32
    features), v_feature agreement within bf16 tolerance."""
    import dataclasses
    from rnr_tpu.models.gcn import DenseDeepGCN, GCNConfig

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((256, 3)).astype(np.float32))
    cfg32 = GCNConfig(n_blocks=4, kernel_size=8, n_filters=16,
                      out_channels=32, stochastic=False, knn_approx=False,
                      strat_min_dilation=0)
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    m32, m16 = DenseDeepGCN(cfg32), DenseDeepGCN(cfg16)
    v = m32.init(jax.random.PRNGKey(0), pos, train=False)
    o32 = m32.apply(v, pos, train=False, mutable=["spectral"])[0]
    o16 = m16.apply(v, pos, train=False, mutable=["spectral"])[0]
    a, b = np.asarray(o32), np.asarray(o16)
    scale = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() / scale < 0.05, np.abs(a - b).max() / scale
