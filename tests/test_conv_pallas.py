"""Interpret-mode parity of the Pallas fused conv3x3 vs the XLA conv.

Covers forward values (same + reflect padding, fused LeakyReLU) and the
custom VJP's input/weight/bias gradients against autodiff of the XLA
reference — including the reflect-pad adjoint's border folds.
"""

import numpy as np

import jax
import jax.numpy as jnp

from rnr_tpu.ops.conv_pallas import conv3x3


def _xla_ref(x, w, b, pad_mode="same", fuse_act=False, slope=0.2):
    if pad_mode == "reflect":
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        pad = "VALID"
    else:
        pad = "SAME"
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b[None, None, None, :]
    if fuse_act:
        y = jnp.where(y > 0, y, slope * y)
    return y


def _data(h=32, w=32, c=8, o=16, n=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
    wgt = jnp.asarray(
        (rng.standard_normal((3, 3, c, o)) * 0.2).astype(np.float32)
    )
    b = jnp.asarray(rng.standard_normal(o).astype(np.float32))
    return x, wgt, b


class TestForward:
    def test_same_pad(self):
        x, w, b = _data()
        got = conv3x3(x, w, b, "same", False, 0.2, True)
        want = _xla_ref(x, w, b, "same")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-2
        )

    def test_reflect_pad(self):
        x, w, b = _data(seed=1)
        got = conv3x3(x, w, b, "reflect", False, 0.2, True)
        want = _xla_ref(x, w, b, "reflect")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-2
        )

    def test_fused_act(self):
        x, w, b = _data(seed=2)
        got = conv3x3(x, w, b, "same", True, 0.2, True)
        want = _xla_ref(x, w, b, "same", fuse_act=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-2
        )

    def test_row_remainder(self):
        # H not a multiple of the row tile: padded rows must be dropped
        x, w, b = _data(h=40, w=16, c=8, o=8, seed=3)
        got = conv3x3(x, w, b, "same", False, 0.2, True)
        want = _xla_ref(x, w, b, "same")
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-2
        )


class TestBackward:
    def _check_grads(self, pad_mode, fuse_act, seed):
        x, w, b = _data(h=16, w=16, c=4, o=8, n=1, seed=seed)
        rng = np.random.default_rng(seed + 10)
        cot = jnp.asarray(
            rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
        )
        if fuse_act:
            # bf16-vs-f32 conv rounding can flip the LeakyReLU kink sign
            # at near-zero pre-activations; zero the cotangent there so
            # the comparison tests the VJP rule, not kink tie-breaking
            pre = _xla_ref(x, w, b, pad_mode, fuse_act=False)
            cot = cot * (jnp.abs(pre) > 0.05)

        def loss_pallas(x, w, b):
            return jnp.sum(
                conv3x3(x, w, b, pad_mode, fuse_act, 0.2, True)
                .astype(jnp.float32) * cot
            )

        def loss_xla(x, w, b):
            return jnp.sum(_xla_ref(x, w, b, pad_mode, fuse_act) * cot)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
        for a, e, name in zip(gp, gx, ("dx", "dw", "db")):
            scale = np.abs(np.asarray(e)).max() + 1e-6
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(e) / scale,
                rtol=0, atol=3e-2, err_msg=f"{pad_mode} {name}",
            )

    def test_grads_same(self):
        self._check_grads("same", False, 0)

    def test_grads_reflect(self):
        self._check_grads("reflect", False, 1)

    def test_grads_fused_act(self):
        self._check_grads("same", True, 2)


def test_unet_conv_backend_parity():
    """Full U-Net forward: pallas conv backend (interpret) vs xla, same
    params — pins the integration (padding handled inside Conv, no
    double-pad; param tree identical across backends)."""
    from rnr_tpu.models.unet import Unet

    def build(backend):
        return Unet(
            in_channels=6, out_channels=4, nf0=8, num_down=2,
            max_channels=16, use_dropout=False, norm="batch",
            use_gcn=False, compute_dtype="float32",
            pad_mode="reflect", conv_backend=backend,
        )

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 16, 6))
        .astype(np.float32)
    )
    vx = build("xla").init(jax.random.PRNGKey(0), x, None, train=False)
    yx = build("xla").apply(vx, x, None, train=False)
    yp = build("pallas_interpret").apply(vx, x, None, train=False)
    np.testing.assert_allclose(
        np.asarray(yx), np.asarray(yp), rtol=0, atol=5e-2
    )
    # same param tree
    assert jax.tree.structure(vx) == jax.tree.structure(
        build("pallas_interpret").init(jax.random.PRNGKey(0), x, None,
                                       train=False)
    )


class TestDown4ConvT4:
    """Parity of the 4x4 stride-2 Pallas pair vs XLA (interpret mode)."""

    def _data4(self, h=16, w=16, c=4, o=8, n=2, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
        wgt = jnp.asarray(
            (rng.standard_normal((4, 4, c, o)) * 0.2).astype(np.float32)
        )
        return x, wgt

    def test_down4_same(self):
        from rnr_tpu.ops.conv_pallas import down4, _xla_down4

        x, w = self._data4()
        got = down4(x, w, "same", True)
        want = _xla_down4(x, w, "same")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-2
        )

    def test_down4_same_matches_flax_same(self):
        # _xla_down4("same") must equal flax nn.Conv(padding="SAME")
        import flax.linen as nn
        from rnr_tpu.ops.conv_pallas import _xla_down4

        x, w = self._data4(seed=3)
        want = jax.lax.conv_general_dilated(
            x, w, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = _xla_down4(x, w, "same")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_down4_reflect(self):
        from rnr_tpu.ops.conv_pallas import down4, _xla_down4

        x, w = self._data4(seed=1)
        got = down4(x, w, "reflect", True)
        want = _xla_down4(x, w, "reflect")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-2
        )

    def test_convt4(self):
        from rnr_tpu.ops.conv_pallas import convt4, _xla_convt4

        x, w = self._data4(seed=2)
        got = convt4(x, w, True)
        want = _xla_convt4(x, w)
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-2
        )

    def test_down4_grads_same(self):
        from rnr_tpu.ops.conv_pallas import down4, _xla_down4

        x, w = self._data4(h=8, w=8, c=4, o=4, n=1, seed=4)
        cot = jnp.asarray(
            np.random.default_rng(9).standard_normal((1, 4, 4, 4))
            .astype(np.float32)
        )
        gp = jax.grad(
            lambda x_, w_: jnp.sum(
                down4(x_, w_, "same", True).astype(jnp.float32) * cot),
            argnums=(0, 1),
        )(x, w)
        gx = jax.grad(
            lambda x_, w_: jnp.sum(_xla_down4(x_, w_, "same") * cot),
            argnums=(0, 1),
        )(x, w)
        for a, e, name in zip(gp, gx, ("dx", "dw")):
            scale = np.abs(np.asarray(e)).max() + 1e-6
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(e) / scale,
                rtol=0, atol=3e-2, err_msg=name,
            )

    def test_convt4_grads(self):
        from rnr_tpu.ops.conv_pallas import convt4, _xla_convt4

        x, w = self._data4(h=8, w=8, c=4, o=4, n=1, seed=5)
        cot = jnp.asarray(
            np.random.default_rng(8).standard_normal((1, 16, 16, 4))
            .astype(np.float32)
        )
        gp = jax.grad(
            lambda x_, w_: jnp.sum(
                convt4(x_, w_, True).astype(jnp.float32) * cot),
            argnums=(0, 1),
        )(x, w)
        gx = jax.grad(
            lambda x_, w_: jnp.sum(_xla_convt4(x_, w_) * cot),
            argnums=(0, 1),
        )(x, w)
        for a, e, name in zip(gp, gx, ("dx", "dw")):
            scale = np.abs(np.asarray(e)).max() + 1e-6
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(e) / scale,
                rtol=0, atol=3e-2, err_msg=name,
            )


def test_rnr_train_step_pallas_convs():
    """One full RNR train step with every U-Net conv on the Pallas path
    (interpret mode): finite loss + finite grads — pins the custom VJPs
    inside the real value_and_grad/optimizer program."""
    import dataclasses
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _build
    from rnr_tpu.train import create_rnr_state, make_rnr_train_step
    from rnr_tpu.train.steps import rnr_texture_flatten_init

    cfg, model, batch = _build(
        img_size=32, tex_size=32, lmax=2, num_sample=64, nf0=8,
        num_down=3, gcn_blocks=2, gcn_v=64, num_azi=2, num_polar=1,
        rays_dtype="bfloat16", conv_backend="pallas_interpret",
        # 'wide' remat wraps the Pallas custom-VJP convs in nn.remat —
        # covers the replay-forward interaction too
        remat="wide",
    )
    state, tx = create_rnr_state(model, jax.random.PRNGKey(0), batch,
                                 cfg.train.lr)
    rng = np.random.default_rng(1)
    statics = {
        "l_samples_init": jnp.asarray(
            rng.uniform(0, 1, (64, 3)).astype(np.float32)),
        "l_samples_mask": jnp.asarray(
            (rng.uniform(size=64) > 0.3).astype(np.float32)),
        "tex_flatten_init": rnr_texture_flatten_init(model, state.params),
    }
    step = make_rnr_train_step(model, tx)
    new_state, metrics = step(state, batch, statics, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    leaves = jax.tree.leaves(new_state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_conv_tile_budget_includes_per_tap_result():
    """_pick_th must count the per-tap [TH, W+2, O] f32 dot result AND
    the double-buffered output block at its ACTUAL dtype.

    The tap-wise formulation (round-3 Mosaic fix) materializes one
    full-width f32 result per dot before the shifted accumulation; the
    round-4 on-device failure was the f32-out dgrad reuse of the kernel
    overflowing scoped VMEM (16.61M > 16M at TH=16, W=514, C=128, O=64)
    because the budget modeled a single bf16 output block.
    """
    from rnr_tpu.ops.conv_pallas import _conv3x3_vmem_bytes, _pick_th

    shapes = ((512, 108, 64), (512, 64, 64), (514, 128, 64),
              (256, 128, 128), (128, 256, 256), (64, 512, 512),
              (1024, 64, 64))
    for x_item in (2, 4):           # bf16 and f32 activations
        for out_item in (2, 4):     # fwd (x dtype) and dgrad (f32) outs
            for w, c, o in shapes:
                th = _pick_th(w, c, o, x_item, out_item)
                fits = (_conv3x3_vmem_bytes(th, w, c, o, x_item, out_item)
                        <= 12 * 1024 * 1024)
                # over-budget at the minimal tile is allowed: the impl
                # detects it and falls back to the XLA conv
                assert fits or th == 2, (w, c, o, x_item, out_item, th)

    # the exact round-4 on-device OOM cell: bf16 in, f32 out, W=514,
    # C=128, O=64 — TH=16 modeled 13.4M (measured 16.61M on v5e); the
    # picker must drop to 8
    assert _pick_th(514, 128, 64, 2, 4) <= 8


def test_down4_convt4_tile_budget():
    """Budget assertions for the reworked down4/convt4 allocations.

    ADVICE r3: these reuse _pick_th via ad-hoc halving that no longer
    models the actual per-block working set — pin it here over every
    U-Net down/up shape (512^2 nf0=64 5-down config plus 1024-wide).

    down4 per block:  4 single-buffered row-parity scratch planes
    [TH+1, WPA, CA] at input dtype + the double-buffered output block
    [TH, WO, O] + per-tap f32 yfull/acc + weights [4,4,CA,O].
    convt4 per block: one scratch [TH+2, WPA, CA] + 4 double-buffered
    parity outputs [TH, WI, O] + f32 yfull/acc + weights.
    """
    from rnr_tpu.ops.conv_pallas import (
        _convt4_vmem_bytes, _down4_vmem_bytes, _pick_th)

    def down4_th(wo, c, o, x_item, out_item):
        th = max(_pick_th(wo, 4 * c, o) // 2, 1)
        while th > 1 and _down4_vmem_bytes(
                th, wo, c, o, x_item, out_item) > 13 * 1024 * 1024:
            th //= 2
        return th

    def convt4_th(wi, c, o, x_item, out_item):
        th = max(_pick_th(wi, 2 * c, 4 * o) // 2, 1)
        while th > 1 and _convt4_vmem_bytes(
                th, wi, c, o, x_item, out_item) > 13 * 1024 * 1024:
            th //= 2
        return th

    budget = 14 * 1024 * 1024
    # (input width to the op, C, O): down4 halves W; convt4 doubles it.
    # out_item covers the forward (x dtype) AND the f32-out dgrad reuse
    # (down4's dgrad runs convt4 with out f32 and vice versa).
    down_shapes = [(512, 64, 64), (256, 64, 128), (128, 128, 256),
                   (64, 256, 512), (32, 512, 512), (1024, 64, 64)]
    for x_item in (2, 4):
        for out_item in (2, 4):
            for width, c, o in down_shapes:
                wo = width // 2
                th = down4_th(wo, c, o, x_item, out_item)
                total = _down4_vmem_bytes(th, wo, c, o, x_item, out_item)
                # unfittable at TH=1 → the impl falls back to XLA
                assert total <= budget or th == 1, (
                    "down4", width, c, o, x_item, out_item, th, total)

            up_shapes = [(32, 512, 512), (64, 512, 256), (128, 256, 128),
                         (256, 128, 64), (512, 64, 64)]
            for width, c, o in up_shapes:
                th = convt4_th(width, c, o, x_item, out_item)
                total = _convt4_vmem_bytes(th, width, c, o, x_item,
                                           out_item)
                assert total <= budget or th == 1, (
                    "convt4", width, c, o, x_item, out_item, th, total)


def test_pallas3_backend_routes_3x3_only():
    """backend='pallas3' must use the Pallas 3x3 kernel but the XLA 4x4
    down/transpose (the round-4 isolation A/B mode); outputs must match
    the xla backend."""
    import jax

    from rnr_tpu.models.unet import Conv
    from rnr_tpu.ops.backend import use_pallas

    # ConvTranspose and down4 route through use_pallas, which must NOT
    # fire for pallas3 (3x3-only mode)
    assert not use_pallas("pallas3")

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32))

    # the k=4 stride-2 branch must be byte-identical to the xla backend
    # (it IS the xla path under pallas3); the 3x3 branch requires real
    # Mosaic codegen and is exercised on device by the step A/B cell
    m_x = Conv(features=8, kernel_size=4, stride=2, backend="xla",
               pad_mode="same")
    m_p = Conv(features=8, kernel_size=4, stride=2, backend="pallas3",
               pad_mode="same")
    v = m_x.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(
        np.asarray(m_x.apply(v, x)), np.asarray(m_p.apply(v, x)))


def test_wgrad_xla_fallback_dtypes(monkeypatch):
    """The over-budget wgrad fallback must handle bf16 activations (the
    round-4 1024^2 bench crashed on a bf16-vs-f32 conv dtype mismatch
    inside the fallback's vjp)."""
    import rnr_tpu.ops.conv_pallas as cp

    # force every wgrad (and dgrad fwd reuse) onto the fallback branch
    monkeypatch.setattr(
        cp, "_conv3x3_vmem_bytes", lambda *a, **k: 1 << 40
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((3, 3, 4, 8)) * 0.2)
                    .astype(np.float32))
    b = jnp.asarray(rng.standard_normal(8).astype(np.float32))

    def loss_p(x_, w_, b_):
        return jnp.sum(cp.conv3x3(x_, w_, b_, "same", False, 0.2, True)
                       .astype(jnp.float32) ** 2)

    def loss_x(x_, w_, b_):
        return jnp.sum(_xla_ref(x_.astype(jnp.float32), w_, b_, "same")
                       ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(x, w, b)
    for a, e, name in zip(gp, gx, ("dx", "dw", "db")):
        scale = np.abs(np.asarray(e)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(a).astype(np.float32) / scale,
            np.asarray(e) / scale, rtol=0, atol=3e-2, err_msg=name)


class TestSlabConv:
    """conv3x3s (row-im2col slab, one wide dot per tile) parity."""

    def test_forward_same_reflect_act(self):
        from rnr_tpu.ops.conv_pallas import conv3x3s

        for pad_mode, fuse, seed in (("same", False, 0),
                                     ("reflect", False, 1),
                                     ("same", True, 2)):
            x, w, b = _data(seed=seed)
            got = conv3x3s(x, w, b, pad_mode, fuse, 0.2, True)
            want = _xla_ref(x, w, b, pad_mode, fuse_act=fuse)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=0, atol=2e-2,
                err_msg=f"{pad_mode} fuse={fuse}",
            )

    def test_forward_matches_tapwise_kernel(self):
        """Same values as the tap-wise conv3x3 (fp association aside)."""
        from rnr_tpu.ops.conv_pallas import conv3x3s

        x, w, b = _data(h=24, w=40, c=108 // 4, o=16, seed=3)
        a = conv3x3s(x, w, b, "reflect", True, 0.2, True)
        e = conv3x3(x, w, b, "reflect", True, 0.2, True)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=0, atol=2e-2)

    def _check_grads(self, pad_mode, fuse_act, seed):
        from rnr_tpu.ops.conv_pallas import conv3x3s

        x, w, b = _data(h=16, w=16, c=4, o=8, n=1, seed=seed)
        rng = np.random.default_rng(seed + 10)
        cot = jnp.asarray(
            rng.standard_normal((1, 16, 16, 8)).astype(np.float32)
        )
        if fuse_act:
            pre = _xla_ref(x, w, b, pad_mode, fuse_act=False)
            cot = cot * (jnp.abs(pre) > 0.05)

        def loss_pallas(x, w, b):
            return jnp.sum(
                conv3x3s(x, w, b, pad_mode, fuse_act, 0.2, True)
                .astype(jnp.float32) * cot
            )

        def loss_xla(x, w, b):
            return jnp.sum(_xla_ref(x, w, b, pad_mode, fuse_act) * cot)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
        for a, e, name in zip(gp, gx, ("dx", "dw", "db")):
            scale = np.abs(np.asarray(e)).max() + 1e-6
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(e) / scale,
                rtol=0, atol=3e-2, err_msg=f"{pad_mode} {name}",
            )

    def test_grads_same(self):
        self._check_grads("same", False, 4)

    def test_grads_reflect(self):
        self._check_grads("reflect", False, 5)

    def test_grads_fused_act(self):
        self._check_grads("same", True, 6)

    def test_vmem_budget(self):
        """Slab kernel working sets at shipped conv shapes stay inside
        the v5e scoped-VMEM budget."""
        from rnr_tpu.ops.conv_pallas import (
            _conv3x3_slab_vmem_bytes, _pick_th_slab, _ru,
        )

        for w, c, o in ((512, 108, 64), (512, 64, 64), (256, 128, 128),
                        (128, 256, 256), (64, 512, 512),
                        (1024, 108, 64)):
            kc = _ru(3 * c, 128)
            for x_item, out_item in ((2, 2), (2, 4), (4, 4)):
                th = _pick_th_slab(w, kc, 3 * o, x_item, out_item)
                used = _conv3x3_slab_vmem_bytes(th, w, kc, 3 * o,
                                                x_item, out_item)
                assert used <= 13 * 1024 * 1024, (w, c, o, th, used)


class TestSlabDown4:
    def test_forward_parity(self):
        from rnr_tpu.ops.conv_pallas import _xla_down4, down4s

        rng = np.random.default_rng(11)
        for h, w, c, o in ((32, 32, 8, 16), (16, 24, 5, 7)):
            x = jnp.asarray(
                rng.standard_normal((2, h, w, c)).astype(np.float32))
            wt = jnp.asarray(
                (rng.standard_normal((4, 4, c, o)) * 0.2)
                .astype(np.float32))
            for pm in ("same", "reflect"):
                got = down4s(x, wt, pm, True)
                want = _xla_down4(x, wt, pm)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), atol=2e-4,
                    err_msg=f"{h}x{w} c{c} o{o} {pm}")

    def test_grads(self):
        from rnr_tpu.ops.conv_pallas import _xla_down4, down4s

        rng = np.random.default_rng(12)
        x = jnp.asarray(
            rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
        wt = jnp.asarray(
            (rng.standard_normal((4, 4, 4, 8)) * 0.2).astype(np.float32))
        cot = jnp.asarray(
            rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
        for pm in ("same", "reflect"):
            gp = jax.grad(
                lambda x_, w_: jnp.sum(
                    down4s(x_, w_, pm, True).astype(jnp.float32) * cot),
                argnums=(0, 1))(x, wt)
            gx = jax.grad(
                lambda x_, w_: jnp.sum(_xla_down4(x_, w_, pm) * cot),
                argnums=(0, 1))(x, wt)
            for a, e, name in zip(gp, gx, ("dx", "dw")):
                scale = np.abs(np.asarray(e)).max() + 1e-6
                np.testing.assert_allclose(
                    np.asarray(a) / scale, np.asarray(e) / scale,
                    rtol=0, atol=3e-2, err_msg=f"{pm} {name}")

    def test_vmem_budget(self):
        from rnr_tpu.ops.conv_pallas import (
            _down4s_vmem_bytes, _pick_th_down4s, _ru,
        )

        for wo, c, o in ((256, 64, 128), (128, 128, 256), (64, 256, 512),
                         (32, 512, 512), (512, 108, 64)):
            kc = _ru(4 * c, 128)
            for x_item, out_item in ((2, 2), (2, 4)):
                th = _pick_th_down4s(wo, kc, o, x_item, out_item)
                used = _down4s_vmem_bytes(th, wo, kc, o, x_item, out_item)
                assert used <= 13 * 1024 * 1024, (wo, c, o, th, used)


def test_slab_backend_routing():
    """backend='slab3' keeps the XLA 4x4 path (like pallas3); 'slab'
    additionally routes the down conv through down4s."""
    import jax

    from rnr_tpu.models.unet import Conv
    from rnr_tpu.ops.backend import use_pallas

    assert not use_pallas("slab3")
    assert not use_pallas("slab")

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)).astype(np.float32))

    m_x = Conv(features=8, kernel_size=4, stride=2, backend="xla",
               pad_mode="same")
    m_s3 = Conv(features=8, kernel_size=4, stride=2, backend="slab3",
                pad_mode="same")
    v = m_x.init(jax.random.PRNGKey(0), x)
    # slab3: 4x4 IS the xla path -> byte-identical
    np.testing.assert_array_equal(
        np.asarray(m_x.apply(v, x)), np.asarray(m_s3.apply(v, x)))


class TestSlabConvT4:
    def test_forward_parity(self):
        from rnr_tpu.ops.conv_pallas import _xla_convt4, convt4s

        rng = np.random.default_rng(13)
        for h, w, c, o in ((16, 16, 8, 4), (8, 24, 5, 7)):
            x = jnp.asarray(
                rng.standard_normal((2, h, w, c)).astype(np.float32))
            wt = jnp.asarray(
                (rng.standard_normal((4, 4, c, o)) * 0.2)
                .astype(np.float32))
            np.testing.assert_allclose(
                np.asarray(convt4s(x, wt, True)),
                np.asarray(_xla_convt4(x, wt)), atol=2e-4,
                err_msg=f"{h}x{w} c{c} o{o}")

    def test_grads(self):
        from rnr_tpu.ops.conv_pallas import _xla_convt4, convt4s

        rng = np.random.default_rng(14)
        x = jnp.asarray(
            rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
        wt = jnp.asarray(
            (rng.standard_normal((4, 4, 4, 8)) * 0.2).astype(np.float32))
        cot = jnp.asarray(
            rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
        gp = jax.grad(
            lambda x_, w_: jnp.sum(
                convt4s(x_, w_, True).astype(jnp.float32) * cot),
            argnums=(0, 1))(x, wt)
        gx = jax.grad(
            lambda x_, w_: jnp.sum(_xla_convt4(x_, w_) * cot),
            argnums=(0, 1))(x, wt)
        for a, e, name in zip(gp, gx, ("dx", "dw")):
            scale = np.abs(np.asarray(e)).max() + 1e-6
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(e) / scale,
                rtol=0, atol=3e-2, err_msg=name)

    def test_vmem_budget(self):
        from rnr_tpu.ops.conv_pallas import (
            _convt4s_vmem_bytes, _pick_th_convt4s, _ru,
        )

        for wi, c, o in ((16, 512, 512), (32, 512, 256), (64, 256, 128),
                         (256, 128, 64), (512, 64, 64)):
            kc = _ru(2 * c, 128)
            for x_item, out_item in ((2, 2), (2, 4)):
                th = _pick_th_convt4s(wi, kc, o, x_item, out_item)
                used = _convt4s_vmem_bytes(th, wi, kc, o, x_item,
                                           out_item)
                assert used <= 13 * 1024 * 1024, (wi, c, o, th, used)


def test_p3s4_backend_routing_interpret():
    """backend='p3s4' = tap Pallas 3x3 + slab 4x4 pair; CPU-driven via
    RNR_PALLAS_INTERPRET=1 through the real module dispatch."""
    import os

    import jax

    from rnr_tpu.models.unet import Conv, ConvTranspose

    rng = np.random.default_rng(21)
    os.environ["RNR_PALLAS_INTERPRET"] = "1"
    try:
        x = jnp.asarray(
            rng.standard_normal((1, 16, 16, 8)).astype(np.float32))
        for ks, stride in ((3, 1), (4, 2)):
            m_x = Conv(features=8, kernel_size=ks, stride=stride,
                       backend="xla", pad_mode="same")
            m_p = Conv(features=8, kernel_size=ks, stride=stride,
                       backend="p3s4", pad_mode="same")
            v = m_x.init(jax.random.PRNGKey(0), x)
            np.testing.assert_allclose(
                np.asarray(m_p.apply(v, x), np.float32),
                np.asarray(m_x.apply(v, x), np.float32), atol=2e-4,
                err_msg=f"k{ks}s{stride}")
        mt_x = ConvTranspose(features=4, backend="xla")
        mt_p = ConvTranspose(features=4, backend="p3s4")
        vt = mt_x.init(jax.random.PRNGKey(1), x)
        np.testing.assert_allclose(
            np.asarray(mt_p.apply(vt, x), np.float32),
            np.asarray(mt_x.apply(vt, x), np.float32), atol=2e-4)
    finally:
        os.environ.pop("RNR_PALLAS_INTERPRET", None)
