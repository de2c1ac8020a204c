"""Deferred-rendering U-Net with GCN feature fusion.

Architecture parity with the reference generator
(pytorch_prototyping/pytorch_prototyping.py:96-536): reflect-padded 3x3
in/out convs, DownBlock = [3x3 conv, norm, LeakyReLU(0.2), dropout] +
[4x4 stride-2 conv, norm, LeakyReLU, dropout], UpBlock = 4x4 stride-2
transpose conv + 3x3 post conv, per-level skip concatenation, innermost
level norm-free, and fusion of a global GCN feature vector at the
outermost level.

Design departures (deliberate, TPU-first):
  * NHWC layout, channels-last convs (MXU-friendly).
  * Norm options: "batch" uses *current-batch* statistics with no running
    averages — this matches the reference's observed behavior exactly,
    since it keeps BatchNorm in train mode even at inference
    (test_rnr.py:229-233), and removes all cross-replica state.  "group"
    is the recommended stateless alternative.
  * The reference's outermost block computes the GCN fusion branch and
    then unconditionally overwrites it with the plain branch
    (pytorch_prototyping.py:407-419 — the `if self.gcn:` result `y` is
    shadowed by the following `if self.flag_outer:` recompute), making the
    fusion a silent no-op in the shipped code.  Here the fusion is
    *active* as the paper intends; pass use_gcn=False for shipped-code
    parity.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import flax.linen as nn

from rnr_tpu.parallel.constraints import constrain

NormKind = Literal["batch", "group", "none"]


def _reflect_pad(x: jax.Array, p: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class Conv(nn.Module):
    """Conv with a selectable backend, param-compatible with nn.Conv
    (same auto-name prefix, same kernel/bias names, shapes and
    initializers — flax shares the "Conv_k" counter between this class
    and nn.Conv, so checkpoints are interchangeable across backends).

    backend "pallas" routes 3x3 stride-1 convs through the implicit-GEMM
    kernel and 4x4 stride-2 convs through the parity-decomposed down
    kernel (ops/conv_pallas.py) on TPU; "xla" (default) is the stock
    conv.  Padding (reflect or zero-SAME) is handled inside, so call
    sites do NOT pre-pad.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    pad_mode: str = "reflect"
    backend: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init,
            (k, k, c, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        from rnr_tpu.ops.backend import pallas_interpret, use_pallas

        dt = self.dtype or x.dtype
        x = x.astype(dt)
        # "pallas3": Pallas for 3x3 stride-1 only, XLA for the 4x4 pair.
        # The round-4 on-device A/B (tools/out/tpu_bench_r4.json):
        # pallas3 153.5 ms vs xla 157.5 vs full-pallas 163.2 for the
        # full 512^2 step — the 3x3 implicit-GEMM kernel wins (22.3 vs
        # 15.6 TF/s fwd+bwd in chains, convdot_probe_r4.json) while the
        # 4x4 parity-plane pair loses to XLA's stride-2 convs.  "auto"
        # therefore means pallas3 on TPU, xla elsewhere.
        from rnr_tpu.ops.backend import is_tpu_backend
        # "slab3": the row-im2col slab kernel (one [TH*W, 3C] @ [3C, 3O]
        # dot per tile — full MXU occupancy at C=O=64) for 3x3 stride-1,
        # XLA for the 4x4 pair; "slab" additionally routes the 4x4
        # stride-2 down conv through the slab kernel (down4s, two
        # [4C x 2O] dots per tile); candidates replacing pallas3.
        # "p3s4": tap-wise Pallas 3x3 (the measured 3x3 winner) + the
        # slab 4x4 pair (down4s/convt4s, K=4C occupancy) — the combo the
        # r5 section-E probe decides between XLA 4x4s and slab 4x4s
        slab_all = self.backend == "slab"
        p3s4 = self.backend == "p3s4"
        slab3_only = slab_all or self.backend == "slab3"
        pallas3_only = slab3_only or p3s4 or self.backend == "pallas3" \
            or (self.backend == "auto" and is_tpu_backend())
        pallas_on = pallas3_only or (
            use_pallas(self.backend) and self.backend != "auto"
        )
        interp = pallas_interpret(self.backend)
        if pallas_on and k == 3 and self.stride == 1:
            from rnr_tpu.ops.conv_pallas import conv3x3, conv3x3s

            b = bias if bias is not None else jnp.zeros(
                (self.features,), jnp.float32
            )
            op = conv3x3s if slab3_only else conv3x3
            return op(x, kernel, b, self.pad_mode, False, 0.2, interp)
        if (slab_all or p3s4) and k == 4 and self.stride == 2:
            from rnr_tpu.ops.conv_pallas import down4s

            y = down4s(x, kernel, self.pad_mode, interp)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        if pallas_on and not pallas3_only and k == 4 and self.stride == 2:
            from rnr_tpu.ops.conv_pallas import down4

            y = down4(x, kernel, self.pad_mode, interp)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        if self.pad_mode == "reflect":
            x = _reflect_pad(x, 1)
            pad = "VALID"
        else:
            pad = "SAME"
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(dt), (self.stride, self.stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(dt)
        return y


class ConvTranspose(nn.Module):
    """4x4 stride-2 SAME transpose conv, param-compatible with
    nn.ConvTranspose; backend "pallas" = the parity-decomposed kernel
    (ops/conv_pallas.py::convt4 — computes only the 4 useful taps per
    output pixel instead of XLA's zero-dilated conv)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    backend: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init,
            (4, 4, c, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        from rnr_tpu.ops.backend import pallas_interpret, use_pallas

        dt = self.dtype or x.dtype
        x = x.astype(dt)
        if self.backend in ("slab", "p3s4"):
            from rnr_tpu.ops.conv_pallas import convt4s

            y = convt4s(x, kernel, pallas_interpret(self.backend))
        elif use_pallas(self.backend) and self.backend != "auto":
            from rnr_tpu.ops.conv_pallas import convt4

            y = convt4(x, kernel, pallas_interpret(self.backend))
        else:
            y = jax.lax.conv_transpose(
                x, kernel.astype(dt), (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if bias is not None:
            y = y + bias.astype(dt)
        return y


class BatchActNorm(nn.Module):
    """Affine normalization by current-batch statistics over (N, H, W).

    Equivalent to BatchNorm permanently in training mode — the reference's
    effective semantics (it never switches `render_net` to eval BN stats,
    test_rnr.py:229-233).  Stateless: no running averages to synchronize
    across data-parallel replicas; under pjit the mean/var reductions
    become cross-replica psums automatically when the batch axis is
    sharded.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        in_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(x32, axis=(0, 1, 2), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(in_dtype)


def _make_norm(kind: NormKind):
    if kind == "batch":
        return BatchActNorm()
    if kind == "group":
        return nn.GroupNorm(num_groups=None, group_size=16)
    return None


class DownBlock(nn.Module):
    """[3x3 conv prep] + [kxk stride-s conv], reflect-padded, norm+LeakyReLU.

    Reference: pytorch_prototyping.py:209-277.
    """

    out_ch: int
    prep_conv: bool = True
    middle_ch: int | None = None
    norm: NormKind = "batch"
    use_dropout: bool = False
    dropout_prob: float = 0.1
    stride: int = 2
    kernel: int = 4
    dtype: jnp.dtype | None = None
    train: bool = True
    # "reflect" = reference parity; "same" = zero padding inside the
    # conv (no pre-pad materialization — faster on TPU, differs only in
    # the outermost pixel ring, which the training loss crops anyway)
    pad_mode: str = "reflect"
    conv_backend: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        train = self.train
        use_bias = self.norm == "none"
        if self.prep_conv:
            mid = self.middle_ch or x.shape[-1]
            x = Conv(mid, use_bias=use_bias, dtype=self.dtype,
                     pad_mode=self.pad_mode,
                     backend=self.conv_backend)(x)
            if (norm := _make_norm(self.norm)) is not None:
                x = norm(x)
            x = nn.leaky_relu(x, 0.2)
            if self.use_dropout:
                x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        x = Conv(self.out_ch, kernel_size=self.kernel, stride=self.stride,
                 use_bias=use_bias, dtype=self.dtype,
                 pad_mode=self.pad_mode,
                 backend=self.conv_backend)(x)
        if (norm := _make_norm(self.norm)) is not None:
            x = norm(x)
        x = nn.leaky_relu(x, 0.2)
        if self.use_dropout:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        return x


class UpBlock(nn.Module):
    """4x4 stride-2 transpose conv + 3x3 post conv, norm+ReLU.

    Reference: pytorch_prototyping.py:124-206 (upsampling_mode='transpose').
    """

    out_ch: int
    post_conv: bool = True
    norm: NormKind = "batch"
    use_dropout: bool = False
    dropout_prob: float = 0.1
    dtype: jnp.dtype | None = None
    train: bool = True
    pad_mode: str = "reflect"
    conv_backend: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        train = self.train
        use_bias = self.norm == "none"
        x = ConvTranspose(
            self.out_ch, use_bias=use_bias, dtype=self.dtype,
            backend=self.conv_backend,
        )(x)
        if (norm := _make_norm(self.norm)) is not None:
            x = norm(x)
        x = nn.relu(x)
        if self.use_dropout:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        if self.post_conv:
            x = Conv(self.out_ch, use_bias=use_bias, dtype=self.dtype,
                     pad_mode=self.pad_mode,
                     backend=self.conv_backend)(x)
            if (norm := _make_norm(self.norm)) is not None:
                x = norm(x)
            x = nn.relu(x)
            if self.use_dropout:
                x = nn.Dropout(0.1, deterministic=not train)(x)
        return x


class GcnFuseBlock(nn.Module):
    """GCN-feature fusion exploiting spatial constancy of v_fea.

    Functionally the reference's concat + DownBlock(stride=1, kernel=3)
    (pytorch_prototyping.py:396,408-413), but the v branch of the
    640-channel prep conv collapses: a 3x3 conv over a spatially-constant
    map (reflect-padding a constant is the same constant) equals one
    dense projection of v broadcast over space.  The prep conv therefore
    only convolves the h columns — a ~3x FLOP cut of the fusion block.
    Reparameterization, not approximation: the dense is the sum of the
    reference's 9 v-tap kernels, an identical function class with fewer
    parameters.

    Caveat: the collapse relies on padding preserving the constant map,
    which holds for reflect padding but NOT for pad_mode="same" (zero
    padding) — there the reference concat block's v contribution shrinks
    by the missing taps on the outermost pixel ring, while this block
    keeps it full-strength.  The deviation is confined to that border
    ring (which the training loss crops), on top of pad_mode="same"'s
    own border deviation.
    """

    out_ch: int
    norm: NormKind = "batch"
    use_dropout: bool = False
    dropout_prob: float = 0.1
    dtype: jnp.dtype | None = None
    train: bool = True
    pad_mode: str = "reflect"
    conv_backend: str = "xla"

    @nn.compact
    def __call__(self, h: jax.Array, v: jax.Array) -> jax.Array:
        train = self.train
        use_bias = self.norm == "none"
        mid = h.shape[-1] + v.shape[-1]  # = concat width, as reference
        x = Conv(mid, use_bias=use_bias, dtype=self.dtype,
                 pad_mode=self.pad_mode, backend=self.conv_backend)(h)
        x = x + nn.Dense(mid, use_bias=False, dtype=self.dtype)(
            v
        )[:, None, None, :]
        if (norm := _make_norm(self.norm)) is not None:
            x = norm(x)
        x = nn.leaky_relu(x, 0.2)
        if self.use_dropout:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        x = Conv(self.out_ch, use_bias=use_bias, dtype=self.dtype,
                 pad_mode=self.pad_mode, backend=self.conv_backend)(x)
        if (norm := _make_norm(self.norm)) is not None:
            x = norm(x)
        x = nn.leaky_relu(x, 0.2)
        if self.use_dropout:
            x = nn.Dropout(self.dropout_prob, deterministic=not train)(x)
        return x


class Unet(nn.Module):
    """Skip-connected encoder/decoder with optional GCN fusion.

    Reference: pytorch_prototyping.py:432-536 (iteratively unrolled here
    instead of the recursive module nesting; identical data flow).
    """

    in_channels: int
    out_channels: int
    nf0: int = 64
    num_down: int = 5
    max_channels: int = 512
    use_dropout: bool = True
    dropout_prob: float = 0.1
    norm: NormKind = "batch"
    outermost_linear: bool = True
    out_channels_gcn: int = 512
    use_gcn: bool = True
    outermost_highway_mode: Literal["concat", "residual", "no_highway"] = "concat"
    compute_dtype: str = "float32"
    # Rematerialize Down/Up blocks in the backward pass: activations
    # inside a block are recomputed instead of stored, cutting peak HBM.
    # False/"none" = store everything; True/"all" = remat every block
    # (max memory savings, ~+fwd FLOPs of recompute); "wide" = remat only
    # the two widest levels + the GCN fusion block — those hold ~85% of
    # the activation bytes (512^2 and 256^2 feature maps) but only ~half
    # the conv FLOPs, so batch>=4 still fits at a fraction of the
    # recompute cost (VERDICT r2 item 8: full remat made b4 slower
    # than b2).
    remat: bool | str = False
    # "concat" = reference structure (concat + 640-ch DownBlock);
    # "dense" = GcnFuseBlock (constant-map conv collapsed to a dense)
    fuse_mode: Literal["concat", "dense"] = "concat"
    # "reflect" = reference-parity reflect padding; "same" = zero-padded
    # convs (no pre-pad materialization; differs only in the outermost
    # pixel ring, which the training loss crops)
    pad_mode: Literal["reflect", "same"] = "reflect"
    # "xla" = stock conv; "pallas" = the implicit-GEMM fused kernel
    # (ops/conv_pallas.py) for every 3x3 stride-1 conv on TPU
    conv_backend: str = "xla"

    @nn.compact
    def __call__(
        self, x: jax.Array, v_fea: jax.Array | None = None, *, train: bool = True
    ) -> jax.Array:
        remat_mode = (
            "all" if self.remat is True
            else (self.remat or "none")
        )

        def maybe_remat(cls, level):
            if remat_mode == "all" or (remat_mode == "wide" and level <= 1):
                return nn.remat(cls)
            return cls

        cdtype = jnp.dtype(self.compute_dtype)
        x = x.astype(cdtype)
        if v_fea is not None:
            v_fea = v_fea.astype(cdtype)
        nd = self.num_down
        # channel schedule: doubles per level, capped at max_channels; the
        # innermost level keeps its channel count (reference
        # pytorch_prototyping.py:484-489 — inner_nc == outer_nc there)
        chs = [self.nf0] + [
            min(2 ** (i + 1) * self.nf0, self.max_channels)
            for i in range(nd - 1)
        ]
        chs.append(min(2 ** (nd - 1) * self.nf0, self.max_channels))

        # in layer (pytorch_prototyping.py:470-481)
        use_bias_in = self.norm == "none"
        h = Conv(self.nf0, use_bias=use_bias_in, dtype=cdtype,
                 pad_mode=self.pad_mode, backend=self.conv_backend)(x)
        if (norm := _make_norm(self.norm)) is not None:
            h = norm(h)
        h = nn.leaky_relu(h, 0.2)
        if self.use_dropout:
            h = nn.Dropout(self.dropout_prob, deterministic=not train)(h)

        # encoder
        skips = []
        for i in range(nd):
            skips.append(h)
            level_norm: NormKind = "none" if i == nd - 1 else self.norm
            h = maybe_remat(DownBlock, i)(
                chs[i + 1],
                norm=level_norm,
                use_dropout=self.use_dropout,
                dropout_prob=self.dropout_prob,
                dtype=cdtype,
                train=train,
                pad_mode=self.pad_mode,
                conv_backend=self.conv_backend,
            )(h)
            # under a device mesh, keep every level's activation
            # (dp, sp)-sharded — batch over dp, image rows over sp —
            # instead of letting the partitioner replicate it
            h = constrain(h, "dp", "sp")
            if i == 0 and self.use_gcn:
                if v_fea is None:
                    raise ValueError("use_gcn=True requires v_fea")
                if self.fuse_mode == "dense":
                    h = maybe_remat(GcnFuseBlock, 0)(
                        chs[1],
                        norm=self.norm,
                        use_dropout=self.use_dropout,
                        dropout_prob=self.dropout_prob,
                        dtype=cdtype,
                        train=train,
                        pad_mode=self.pad_mode,
                        conv_backend=self.conv_backend,
                    )(h, v_fea)
                else:
                    tiled = jnp.broadcast_to(
                        v_fea[:, None, None, :],
                        (h.shape[0], h.shape[1], h.shape[2],
                         v_fea.shape[-1]),
                    )
                    h = jnp.concatenate([h, tiled], axis=-1)
                    # stride-1 fusion conv (pytorch_prototyping.py:396)
                    h = maybe_remat(DownBlock, 0)(
                        chs[1],
                        norm=self.norm,
                        use_dropout=self.use_dropout,
                        dropout_prob=self.dropout_prob,
                        stride=1,
                        kernel=3,
                        dtype=cdtype,
                        train=train,
                        pad_mode=self.pad_mode,
                        conv_backend=self.conv_backend,
                    )(h)

        # decoder with per-level skip concat
        for i in reversed(range(nd)):
            level_norm = "none" if i == nd - 1 else self.norm
            h = maybe_remat(UpBlock, i)(
                chs[i],
                norm=level_norm,
                use_dropout=self.use_dropout,
                dropout_prob=self.dropout_prob,
                dtype=cdtype,
                train=train,
                pad_mode=self.pad_mode,
                conv_backend=self.conv_backend,
            )(h)
            h = constrain(h, "dp", "sp")
            if i == 0:
                mode = self.outermost_highway_mode
            else:
                mode = "concat"
            if mode == "concat":
                h = jnp.concatenate([skips[i], h], axis=-1)
            elif mode == "residual":
                h = skips[i] + h
            # no_highway: keep h

        # out layer (pytorch_prototyping.py:508-528)
        out_bias = self.outermost_linear or self.norm == "none"
        h = Conv(self.out_channels, use_bias=out_bias, dtype=cdtype,
                 pad_mode=self.pad_mode, backend=self.conv_backend)(h)
        if not self.outermost_linear:
            if (norm := _make_norm(self.norm)) is not None:
                h = norm(h)
            h = nn.relu(h)
            if self.use_dropout:
                h = nn.Dropout(self.dropout_prob, deterministic=not train)(h)
        return h


class RenderingNet(nn.Module):
    """U-Net + tanh output head (reference: network.py:219-253)."""

    nf0: int
    in_channels: int
    out_channels: int
    num_down_unet: int = 5
    out_channels_gcn: int = 512
    use_gcn: bool = True
    outermost_highway_mode: str = "concat"
    norm: NormKind = "batch"
    compute_dtype: str = "float32"
    remat: bool | str = False
    fuse_mode: str = "concat"
    pad_mode: str = "reflect"
    conv_backend: str = "xla"

    @nn.compact
    def __call__(
        self, x: jax.Array, v_fea: jax.Array | None = None, *, train: bool = True
    ) -> jax.Array:
        y = Unet(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            nf0=self.nf0,
            num_down=self.num_down_unet,
            max_channels=8 * self.nf0,
            use_dropout=True,
            dropout_prob=0.1,
            norm=self.norm,
            outermost_linear=True,
            out_channels_gcn=self.out_channels_gcn,
            use_gcn=self.use_gcn,
            outermost_highway_mode=self.outermost_highway_mode,  # type: ignore[arg-type]
            compute_dtype=self.compute_dtype,
            remat=self.remat,
            fuse_mode=self.fuse_mode,  # type: ignore[arg-type]
            pad_mode=self.pad_mode,  # type: ignore[arg-type]
            conv_backend=self.conv_backend,
        )(x, v_fea, train=train)
        return jnp.tanh(y.astype(jnp.float32))
