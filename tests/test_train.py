"""End-to-end training tests on synthetic data: loss must decrease."""

import numpy as np

import jax
import jax.numpy as jnp

from rnr_tpu.config import (
    RNRConfig, DNRConfig, TextureConfig, LightingConfig, RaysConfig,
    GCNTrainConfig, RenderNetConfig, LossConfig, TrainConfig,
)
from rnr_tpu.models.rnr import RNRModel
from rnr_tpu.train import (
    create_rnr_state, make_rnr_train_step, make_rnr_eval_step,
    create_dnr_state, make_dnr_train_step, make_dnr_eval_step,
    save_checkpoint, load_checkpoint,
)
from rnr_tpu.train.steps import build_dnr_modules, rnr_texture_flatten_init

KEY = jax.random.PRNGKey(0)


def _tiny_rnr_cfg():
    return RNRConfig(
        texture=TextureConfig(texture_size=32, texture_num_ch=24, mipmap_level=2),
        lighting=LightingConfig(sh_lmax=2, num_sample=64, num_lighting=2,
                                lp_recon_h=8, lp_recon_w=16),
        rays=RaysConfig(num_azi=2, num_polar=1),
        gcn=GCNTrainConfig(n_filters=8, kernel_size=4, n_blocks=2,
                           out_channels=16),
        # float32 compute keeps cross-device parity checks tight; bf16 is
        # the production default
        render_net=RenderNetConfig(nf0=8, num_down_unet=3,
                                   compute_dtype="float32"),
        loss=LossConfig(border_crop=2),
        train=TrainConfig(lr=2e-3, img_size=32),
    )


def _fib_sphere(n):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)]
    ).astype(np.float32)


def _rnr_batch(rng, s=32, v=32):
    normal = rng.standard_normal((1, s, s, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    tbn = np.broadcast_to(np.eye(3, dtype=np.float32), (1, s, s, 3, 3))
    vdt = np.broadcast_to(
        np.asarray([0, 0, 1], np.float32), (1, s, s, 3)
    )
    return {
        "uv_map": jnp.asarray(rng.uniform(0, 1, (1, s, s, 2)).astype(np.float32)),
        "sh_basis_map": jnp.asarray(
            rng.uniform(-1, 1, (1, s, s, 9)).astype(np.float32)
        ),
        "normal_map": jnp.asarray(normal),
        "view_dir_map": jnp.asarray(vdt.copy()),
        "view_dir_map_tangent": jnp.asarray(vdt.copy()),
        "TBN_map": jnp.asarray(tbn.copy()),
        "alpha_map": jnp.ones((1, s, s, 1)),
        "img_gt": jnp.asarray(
            rng.uniform(0, 1, (1, s, s, 3)).astype(np.float32)
        ),
        "gcn_pos": jnp.asarray(rng.standard_normal((v, 3)).astype(np.float32)),
    }


def test_rnr_train_loss_decreases(rng):
    cfg = _tiny_rnr_cfg()
    l_dir = _fib_sphere(64)
    model = RNRModel(cfg=cfg, l_dir=l_dir)
    batch = _rnr_batch(rng)
    state, tx = create_rnr_state(model, KEY, batch, cfg.train.lr)

    statics = {
        "l_samples_init": jnp.asarray(
            rng.uniform(0, 1, (64, 3)).astype(np.float32)
        ),
        "l_samples_mask": jnp.asarray(
            (rng.uniform(size=64) > 0.3).astype(np.float32)
        ),
        "tex_flatten_init": rnr_texture_flatten_init(model, state.params),
    }
    step = make_rnr_train_step(model, tx)
    losses = []
    k = KEY
    for i in range(8):
        k, sub = jax.random.split(k)
        state, metrics = step(state, batch, statics, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # The albedo prior is exactly zero at init (no texel has moved yet,
    # train_rnr.py:598-607) and activates after the first update, so the
    # decreasing trend starts at step 1.
    assert losses[-1] < losses[1], f"loss did not decrease: {losses}"
    assert float(state.step) == 8

    # eval + relighting
    ev = make_rnr_eval_step(model)
    out = ev(state, batch)
    assert out["img"].shape == (1, 32, 32, 3)
    lp = jnp.full((1, 8, 16, 3), 0.9)
    out_re = ev(state, batch, lp_override=lp, relight=True)
    assert not np.allclose(np.asarray(out["img"]), np.asarray(out_re["img"]))


def test_rnr_checkpoint_roundtrip(rng, tmp_path):
    cfg = _tiny_rnr_cfg()
    model = RNRModel(cfg=cfg, l_dir=_fib_sphere(64))
    batch = _rnr_batch(rng)
    state, tx = create_rnr_state(model, KEY, batch, cfg.train.lr)
    # params tree carries the reference's checkpoint part names
    for part in ["texture_mapper", "render_net", "gcn", "lighting"]:
        assert part in state.params, sorted(state.params)
    p = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(p, state)
    template, _ = create_rnr_state(model, jax.random.PRNGKey(7), batch, cfg.train.lr)
    restored = load_checkpoint(p, template)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    chex_equal = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )
    assert all(jax.tree.leaves(chex_equal))


def _dnr_batch(rng, s=32):
    return {
        "uv_map": jnp.asarray(rng.uniform(0, 1, (2, s, s, 2)).astype(np.float32)),
        "sh_basis_map": jnp.asarray(
            rng.uniform(-1, 1, (2, s, s, 9)).astype(np.float32)
        ),
        "alpha_map": jnp.ones((2, s, s, 1)),
        "img_gt": jnp.asarray(rng.uniform(0, 1, (2, s, s, 3)).astype(np.float32)),
    }


def test_dnr_train_loss_decreases(rng):
    cfg = DNRConfig(
        texture=TextureConfig(texture_size=32, texture_num_ch=12, mipmap_level=2),
        render_net=RenderNetConfig(nf0=8, num_down_unet=3),
        loss=LossConfig(border_crop=2),
        train=TrainConfig(lr=2e-3, img_size=32),
    )
    batch = _dnr_batch(rng)
    mods, state, tx = create_dnr_state(cfg, KEY, batch, cfg.train.lr)
    step = make_dnr_train_step(cfg, mods, tx)
    losses = []
    k = KEY
    for _ in range(10):
        k, sub = jax.random.split(k)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, f"loss did not decrease: {losses}"
    ev = make_dnr_eval_step(cfg, mods)
    out = ev(state, batch)
    assert out.shape == (2, 32, 32, 3)


def test_rnr_bf16_rays_match_f32():
    """bf16 ray storage (rays_dtype) must agree with f32 to bf16 tolerance
    and produce finite gradients (VERDICT r2 item 2's precision lever)."""
    import dataclasses

    rng = np.random.default_rng(3)
    batch = _rnr_batch(rng)
    cfg32 = _tiny_rnr_cfg()
    cfg16 = dataclasses.replace(
        cfg32, rays=dataclasses.replace(cfg32.rays, rays_dtype="bfloat16")
    )
    l_dir = _fib_sphere(64)
    m32 = RNRModel(cfg=cfg32, l_dir=l_dir)
    m16 = RNRModel(cfg=cfg16, l_dir=l_dir)
    state, tx = create_rnr_state(m32, KEY, batch, cfg32.train.lr)
    variables = {
        "params": state.params, "constants": state.constants,
        "spectral": state.spectral,
    }
    out32, _ = m32.apply(variables, batch, lighting_idx=0, train=False,
                         mutable=["spectral"])
    out16, _ = m16.apply(variables, batch, lighting_idx=0, train=False,
                         mutable=["spectral"])
    a, b = np.asarray(out32["img"]), np.asarray(out16["img"])
    scale = max(np.abs(a).max(), 1e-3)
    assert np.abs(a - b).max() / scale < 0.04, np.abs(a - b).max()

    # gradients flow and are finite through the bf16 ray path
    step16 = make_rnr_train_step(m16, tx)
    nprng = np.random.default_rng(1)
    statics = {
        "l_samples_init": jnp.asarray(
            nprng.uniform(0, 1, (64, 3)).astype(np.float32)),
        "l_samples_mask": jnp.asarray(
            (nprng.uniform(size=64) > 0.3).astype(np.float32)),
        "tex_flatten_init": rnr_texture_flatten_init(m16, state.params),
    }
    new_state, metrics = step16(state, batch, statics, KEY)
    assert np.isfinite(float(metrics["loss"]))


def test_dnr_texture_init_from_image():
    """--tex_fp analog: create_dnr_state(texture_init=...) copies the
    image into the level-0 texture's first two channel blocks
    (reference network.py:51-54, train_dnr.py --tex_fp)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from rnr_tpu.config import DNRConfig, TextureConfig, RenderNetConfig
    from rnr_tpu.train.steps import create_dnr_state

    cfg = DNRConfig(
        texture=TextureConfig(texture_size=16, texture_num_ch=8,
                              mipmap_level=2, apply_sh=False),
        render_net=RenderNetConfig(nf0=4, num_down_unet=2),
    )
    rng = np.random.default_rng(0)
    ti = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    batch = {
        "uv_map": jnp.asarray(
            rng.uniform(0, 1, (1, 8, 8, 2)).astype(np.float32)
        ),
    }
    _, state, _ = create_dnr_state(
        cfg, jax.random.PRNGKey(0), batch, 1e-3, texture_init=ti
    )
    tex0 = np.asarray(state.params["texture_mapper"]["texture_0"])
    np.testing.assert_allclose(tex0[..., :3], ti, atol=1e-6)
    np.testing.assert_allclose(tex0[..., 3:6], ti, atol=1e-6)
    assert np.all(tex0[..., 6:] == 1.0)  # untouched channels keep init


def test_rnr_train_step_with_gcn_structure_knobs(rng):
    """Full train step with the reference-default GCN structure (batch
    norm) plus prelu + mr conv: params include the new norm/act leaves
    and the step produces a finite decreasing loss."""
    import dataclasses

    cfg = _tiny_rnr_cfg()
    cfg = dataclasses.replace(
        cfg,
        gcn=GCNTrainConfig(n_filters=8, kernel_size=4, n_blocks=2,
                           out_channels=16, conv_type="mr",
                           act_type="prelu", norm_type="batch"),
    )
    l_dir = _fib_sphere(64)
    model = RNRModel(cfg=cfg, l_dir=l_dir)
    batch = _rnr_batch(rng)
    state, tx = create_rnr_state(model, KEY, batch, cfg.train.lr)
    flat = jax.tree_util.tree_leaves_with_path(state.params["gcn"])
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    assert any("norm_scale" in n for n in names), names
    assert any("prelu_slope" in n for n in names), names

    statics = {
        "l_samples_init": jnp.asarray(
            rng.uniform(0, 1, (64, 3)).astype(np.float32)
        ),
        "l_samples_mask": jnp.asarray(
            (rng.uniform(size=64) > 0.3).astype(np.float32)
        ),
        "tex_flatten_init": rnr_texture_flatten_init(model, state.params),
    }
    step = make_rnr_train_step(model, tx)
    k = KEY
    losses = []
    for _ in range(4):
        k, sub = jax.random.split(k)
        state, metrics = step(state, batch, statics, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses


def test_device_view_buffer_batches_match_host_path():
    """The device-resident view buffer must assemble byte-identical
    batches to make_rnr_batch (train_rnr round-4: on-device gather
    replaces the per-iteration ~35 MB host->device transfer)."""
    from rnr_tpu.drivers.train_rnr import (
        VIEW_KEYS, _synthetic_views, make_rnr_batch)

    rng = np.random.default_rng(7)
    views = _synthetic_views(rng, 5, 16)
    gcn_pos = rng.standard_normal((64, 3)).astype(np.float32)

    # host path
    order = np.asarray([3, 1, 4])
    host = make_rnr_batch([views[j] for j in order], gcn_pos)

    # device path (mirrors the driver's buffer construction + gather)
    views_dev = {
        k: jnp.asarray(np.stack([np.asarray(v[k]) for v in views]))
        for k in VIEW_KEYS + ("img_gt",)
    }
    views_dev["alpha_map"] = jnp.asarray(
        np.stack([np.asarray(v["alpha_map"]) for v in views])
    )[..., None]
    idx = jnp.asarray(order)
    dev = {k: a[idx] for k, a in views_dev.items()}
    dev["gcn_pos"] = jnp.asarray(gcn_pos)

    assert set(dev) == set(host)
    for k in host:
        np.testing.assert_array_equal(
            np.asarray(host[k]), np.asarray(dev[k]), err_msg=k)


def test_train_step_donates_state(rng):
    """The RNR train step must donate its incoming state (round-4 HBM
    lever: without donation the Adam update keeps params + moments
    double-resident, ~0.8 GB at canonical scale)."""
    import pytest

    from tests.test_parallel import _rnr_batch, _tiny_rnr_cfg, _fib_sphere

    cfg = _tiny_rnr_cfg()
    model = RNRModel(cfg=cfg, l_dir=_fib_sphere(64))
    batch = _rnr_batch(rng, s=32)
    state, tx = create_rnr_state(model, jax.random.PRNGKey(0), batch,
                                 cfg.train.lr)
    statics = {
        "l_samples_init": jnp.asarray(
            rng.uniform(0, 1, (64, 3)).astype(np.float32)),
        "l_samples_mask": jnp.asarray(
            (rng.uniform(size=64) > 0.3).astype(np.float32)),
        "tex_flatten_init": rnr_texture_flatten_init(model, state.params),
    }
    step = make_rnr_train_step(model, tx)
    old_leaf = jax.tree.leaves(state.params)[0]
    new_state, metrics = step(state, batch, statics, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # the donated input buffer must be gone
    with pytest.raises(RuntimeError):
        np.asarray(old_leaf)
