"""Laplacian-mipmap neural texture.

Re-design of the reference `TextureMapper` (network.py:20-99): a pyramid of
learnable feature images; a sample is the *sum* of bilinear taps at every
level, so coarse levels carry low-frequency content and fine levels carry
residuals.  Optional SH modulation multiplies 9 of the sampled channels by
the per-pixel SH basis map.

TPU notes: all mipmap levels are sampled in one traced program — the four
gathers per level fuse with the weighting arithmetic; channels-last layout
keeps the gather stride contiguous in the lane dimension.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from rnr_tpu.ops.interpolate import interpolate_bilinear, resize_bilinear


def _pallas_ok(texs, uv_map) -> bool:
    """Pallas texture-gradient path: TPU backend + tileable shapes."""
    if jax.default_backend() != "tpu":
        return False
    if uv_map.shape[1] % 32 or uv_map.shape[2] % 32:
        return False
    return all(
        t.shape[0] <= 128 or t.shape[0] % 128 == 0 for t in texs
    )


class TextureMapper(nn.Module):
    """Mipmapped neural texture sampler.

    Attributes:
      texture_size: level-0 side length.
      texture_num_ch: channels per texel.
      mipmap_level: number of pyramid levels (level i has size /2^i).
      apply_sh: multiply channels [sh_start_ch, sh_start_ch+9) by the SH
        basis map when one is passed.
      texture_init: optional [H, W, C0] array written into channels
        [0, C0) and [C0, 2*C0) of level 0 (reference: network.py:51-54).
      fix_texture: stop gradients into the texture parameters.
      pallas_grad: route the texture gradient through the Pallas
        scatter-as-matmul kernel (ops/texture_pallas.py) instead of XLA
        scatter when running on TPU with compatible shapes.
    """

    texture_size: int
    texture_num_ch: int
    mipmap_level: int = 4
    apply_sh: bool = True
    texture_init: np.ndarray | None = None
    fix_texture: bool = False
    pallas_grad: bool = True

    def level_size(self, level: int) -> int:
        return int(np.round(self.texture_size / (2.0 ** level)))

    def _init_level(self, level: int):
        size = self.level_size(level)

        def init(key):
            del key
            t = jnp.ones((size, size, self.texture_num_ch), jnp.float32)
            if level != 0:
                t = t * 0.01
            if level == 0 and self.texture_init is not None:
                ti = jnp.asarray(self.texture_init, jnp.float32)
                c0 = ti.shape[-1]
                t = t.at[..., :c0].set(ti)
                t = t.at[..., c0:2 * c0].set(ti)
            return t

        return self.param(f"texture_{level}", init)

    @nn.compact
    def __call__(
        self,
        uv_map: jax.Array,
        sh_basis_map: jax.Array | None = None,
        sh_start_ch: int = 3,
    ) -> jax.Array:
        """Sample the texture pyramid.

        Args:
          uv_map: [N, H, W, 2] in [0, 1] (u right, v up in texture space).
          sh_basis_map: optional [N, H, W, 9].

        Returns: [N, H, W, C] feature map (channels-last).
        """
        texs = []
        for level in range(self.mipmap_level):
            tex = self._init_level(level)
            if self.fix_texture:
                tex = jax.lax.stop_gradient(tex)
            texs.append(tex)

        # uv is G-buffer data, never differentiated; the Pallas path's
        # custom VJP returns zero for it, so stop the gradient here too to
        # keep both backends' gradient semantics identical (ADVICE r2).
        uv_map = jax.lax.stop_gradient(uv_map)
        from rnr_tpu.ops.shmap import active_mesh, shards_divide

        mesh = active_mesh()
        pl_ok = self.pallas_grad and _pallas_ok(texs, uv_map)
        if pl_ok and mesh is not None:
            # shard-local rows must still chunk into 32x32 tiles
            axes = dict(zip(mesh.axis_names, mesh.axis_sizes))
            pl_ok = (
                shards_divide(mesh, uv_map.shape,
                              ("dp", "sp", None, None))
                and (uv_map.shape[1] // axes.get("sp", 1)) % 32 == 0
            )
        if pl_ok:
            from rnr_tpu.ops.texture_pallas import mipmap_sample

            if mesh is not None:
                # per-row-shard kernel; texture levels replicated, their
                # gradients psum over the mesh via shard_map's transpose
                from rnr_tpu.ops.shmap import row_shard_map

                out = row_shard_map(
                    lambda uv, *ts: mipmap_sample(tuple(ts), uv),
                    in_specs=[("dp", "sp", None, None)]
                    + [(None,) * t.ndim for t in texs],
                    out_specs=[("dp", "sp", None, None)],
                )(uv_map, *texs)
            else:
                out = mipmap_sample(tuple(texs), uv_map)
        else:
            out = None
            for level, tex in enumerate(texs):
                size = self.level_size(level)
                # uv in texel units; v flipped so v=0 is the bottom texel
                # row (reference: network.py:78-79).
                x = uv_map[..., 0] * (size - 1)
                y = (size - 1) - uv_map[..., 1] * (size - 1)
                sample = interpolate_bilinear(tex, x, y)
                out = sample if out is None else out + sample

        if self.apply_sh and sh_basis_map is not None:
            nb = sh_basis_map.shape[-1]
            mod = out[..., sh_start_ch:sh_start_ch + nb] * sh_basis_map
            out = jnp.concatenate(
                [out[..., :sh_start_ch], mod, out[..., sh_start_ch + nb:]],
                axis=-1,
            )
        return out

    def flatten_mipmap(self, params, start_ch: int, end_ch: int) -> jax.Array:
        """Sum all levels upsampled to level-0 resolution.

        Used by the albedo mean prior (reference: network.py:93-99).
        params: this module's parameter dict. Returns [H0, W0, end-start].
        """
        size0 = self.level_size(0)
        out = None
        for level in range(self.mipmap_level):
            t = params[f"texture_{level}"][..., start_ch:end_ch]
            if level != 0:
                t = resize_bilinear(t, (size0, size0))
            out = t if out is None else out + t
        return out
