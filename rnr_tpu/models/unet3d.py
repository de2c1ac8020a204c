"""3D U-Net variants and feature-map up/downsampling stacks.

Counterparts of the remaining `pytorch_prototyping` building blocks
(pytorch_prototyping.py:14-68 DownBlock3D/UpBlock3D, :280-367 Unet3d +
UnetSkipConnectionBlock3d, :549-638 Down/UpsamplingNet).  Unused by the
shipped RNR/DNR drivers but part of the framework's prototyping surface.
Layout: volumes are NDHWC, images NHWC.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from rnr_tpu.models.unet import (
    BatchActNorm, DownBlock, UpBlock, NormKind, _make_norm,
)


def _replicate_pad3d(x: jax.Array, p: int) -> jax.Array:
    return jnp.pad(
        x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)), mode="edge"
    )


class DownBlock3D(nn.Module):
    """Replication-padded 4^3 stride-2 conv + norm + LeakyReLU."""

    out_ch: int
    norm: NormKind = "batch"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        use_bias = self.norm == "none"
        x = _replicate_pad3d(x, 1)
        x = nn.Conv(self.out_ch, (4, 4, 4), strides=(2, 2, 2),
                    padding="VALID", use_bias=use_bias)(x)
        if self.norm == "batch":
            x = BatchActNorm3D()(x)
        elif self.norm == "group":
            x = nn.GroupNorm(num_groups=None, group_size=16)(x)
        return nn.leaky_relu(x, 0.2)


class BatchActNorm3D(nn.Module):
    """Current-batch-statistics norm over (N, D, H, W)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = jnp.mean(x, axis=(0, 1, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(0, 1, 2, 3), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class UpBlock3D(nn.Module):
    """4^3 stride-2 transpose conv + norm + ReLU."""

    out_ch: int
    norm: NormKind = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, skipped: jax.Array | None = None
                 ) -> jax.Array:
        if skipped is not None:
            x = jnp.concatenate([skipped, x], axis=-1)
        use_bias = self.norm == "none"
        x = nn.ConvTranspose(self.out_ch, (4, 4, 4), strides=(2, 2, 2),
                             padding="SAME", use_bias=use_bias)(x)
        if self.norm == "batch":
            x = BatchActNorm3D()(x)
        elif self.norm == "group":
            x = nn.GroupNorm(num_groups=None, group_size=16)(x)
        return nn.relu(x)


class Unet3d(nn.Module):
    """3D U-Net with per-level skip concatenation (Unet3d parity)."""

    in_channels: int
    out_channels: int
    nf0: int = 16
    num_down: int = 3
    max_channels: int = 128
    norm: NormKind = "batch"
    outermost_linear: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        nd = self.num_down
        chs = [self.nf0] + [
            min(2 ** (i + 1) * self.nf0, self.max_channels)
            for i in range(nd)
        ]
        use_bias_in = self.norm == "none"
        h = _replicate_pad3d(x, 1)
        h = nn.Conv(self.nf0, (3, 3, 3), padding="VALID",
                    use_bias=use_bias_in)(h)
        if self.norm == "batch":
            h = BatchActNorm3D()(h)
        h = nn.leaky_relu(h, 0.2)

        skips = []
        for i in range(nd):
            skips.append(h)
            level_norm: NormKind = "none" if i == nd - 1 else self.norm
            h = DownBlock3D(chs[i + 1], norm=level_norm)(h)
        for i in reversed(range(nd)):
            level_norm = "none" if i == nd - 1 else self.norm
            h = UpBlock3D(chs[i], norm=level_norm)(h)
            h = jnp.concatenate([skips[i], h], axis=-1)

        h = _replicate_pad3d(h, 1)
        h = nn.Conv(self.out_channels, (3, 3, 3), padding="VALID",
                    use_bias=self.outermost_linear)(h)
        if not self.outermost_linear:
            if self.norm == "batch":
                h = BatchActNorm3D()(h)
            h = nn.relu(h)
        return h


class DownsamplingNet(nn.Module):
    """Stack of stride-2 DownBlocks (pytorch_prototyping.py:549-590)."""

    per_layer_out_ch: Sequence[int]
    use_dropout: bool = False
    dropout_prob: float = 0.1
    last_layer_one: bool = False
    norm: NormKind = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        chs = list(self.per_layer_out_ch)
        if not chs:
            return x
        x = DownBlock(
            chs[0], middle_ch=chs[0], norm=self.norm,
            use_dropout=self.use_dropout, dropout_prob=self.dropout_prob,
            train=train,
        )(x)
        for i in range(len(chs) - 1):
            norm = (
                "none"
                if self.last_layer_one and i == len(chs) - 2
                else self.norm
            )
            x = DownBlock(
                chs[i + 1], norm=norm, use_dropout=self.use_dropout,
                dropout_prob=self.dropout_prob, train=train,
            )(x)
        return x


class UpsamplingNet(nn.Module):
    """Stack of 2x UpBlocks (pytorch_prototyping.py:592-638)."""

    per_layer_out_ch: Sequence[int]
    use_dropout: bool = False
    dropout_prob: float = 0.1
    first_layer_one: bool = False
    norm: NormKind = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        chs = list(self.per_layer_out_ch)
        if not chs:
            return x
        x = UpBlock(
            chs[0], norm="none" if self.first_layer_one else self.norm,
            use_dropout=self.use_dropout, dropout_prob=self.dropout_prob,
            train=train,
        )(x)
        for i in range(len(chs) - 1):
            x = UpBlock(
                chs[i + 1], norm=self.norm, use_dropout=self.use_dropout,
                dropout_prob=self.dropout_prob, train=train,
            )(x)
        return x
