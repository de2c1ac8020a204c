"""Ray-fan sampling and physically-based ray composition.

Reference: network.py:417-527 (`RaySampler`, `RayRenderer`) and
network.py:391-411 (`RaysLTChromLoss`).

Layout note: everything here is channels-last.  Per-pixel ray quantities
use [..., 3, R] (xyz by num_ray) matching the reference; the light
transport maps use [N, H, W, R, C] instead of the reference's
[N, R, C, H, W] so the per-ray reductions contract the trailing
(lane-resident) dims on the VPU.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from rnr_tpu.ops.cameras import euler_to_rot, get_reflect_dir
from rnr_tpu.ops.spherical import spherical_mapping_batch
from rnr_tpu.ops.interpolate import interpolate_bilinear_batch


@dataclasses.dataclass
class RaySampler:
    """Fixed fan of ray pivots around the tangent-space normal.

    num_ray = num_azi * num_polar + 1 (the +1 is the identity pivot).
    mode='reflect' reflects the per-pixel tangent-space view direction
    around each pivot (specular fan); mode='diffuse' uses the pivots
    directly.  Reference: network.py:417-472.
    """

    num_azi: int
    num_polar: int
    interval_polar: float = 5.0
    mode: str = "reflect"

    def __post_init__(self):
        roty = (
            np.arange(1, self.num_polar + 1) * self.interval_polar * np.pi / 180.0
        )
        rotz = np.arange(self.num_azi) * 2.0 * np.pi / self.num_azi
        roty, rotz = np.meshgrid(roty, rotz, sparse=False)
        rot = np.stack(
            [np.zeros(roty.size), roty.flatten(), rotz.flatten()], axis=0
        )  # [3, num_ray-1]
        self.num_ray = rot.shape[1] + 1
        Rs = np.zeros((self.num_ray, 3, 3), np.float32)
        Rs[0] = np.eye(3)
        for i in range(self.num_ray - 1):
            Rs[i + 1] = euler_to_rot(rot[:, i])
        self.Rs = Rs
        # pivot directions = Rs @ +z, transposed to [3, num_ray]
        self.pivots_dir = np.einsum("rij,j->ir", Rs, np.array([0.0, 0.0, 1.0]))

    def __call__(
        self,
        tbn_matrices: jax.Array,
        view_dir_tangent: jax.Array,
        alpha_map: jax.Array,
        with_uv: bool = True,
    ):
        """Sample the ray fan per pixel.

        Args:
          tbn_matrices: [N, ..., 3, 3] tangent->world frames.
          view_dir_tangent: [N, ..., 3].
          alpha_map: [N, ..., 1].
          with_uv: also compute the equirect probe UVs (atan2/acos per
            ray — skip when shading directly from SH coefficients, which
            never touches a probe).

        Returns:
          rays_dir [N, ..., 3, R] world-space,
          rays_uv [N, ..., 2, R] probe UVs (= -1 at masked pixels; None
            when with_uv=False),
          rays_dir_tangent ([N, ..., 3, R] or [3, R] in diffuse mode).
        """
        pivots = jnp.asarray(self.pivots_dir)  # [3, R]
        if self.mode == "reflect":
            rays_dir_tangent = (
                get_reflect_dir(view_dir_tangent[..., None], pivots, axis=-2)
                * alpha_map[..., None]
            )  # [N, ..., 3, R]
            rays_dir = jnp.einsum(
                "...ij,...jr->...ir", tbn_matrices, rays_dir_tangent
            )
        else:
            rays_dir_tangent = pivots
            rays_dir = jnp.einsum("...ij,jr->...ir", tbn_matrices, pivots)

        rays_dir = rays_dir / jnp.maximum(
            jnp.linalg.norm(rays_dir, axis=-2, keepdims=True), 1e-12
        )
        if not with_uv:
            return rays_dir, None, rays_dir_tangent
        # [N, 3, ...] expected by the batch spherical mapping: move the xyz
        # axis to position 1 (reference transposes the same way,
        # network.py:469).
        rd = jnp.moveaxis(rays_dir, -2, 1)
        uv = spherical_mapping_batch(rd)
        rays_uv = jnp.moveaxis(uv, 1, -2)  # [N, ..., 2, R]
        masked = (alpha_map[..., None] == 0).astype(rays_uv.dtype)
        rays_uv = rays_uv * alpha_map[..., None] - masked
        return rays_dir, rays_uv, rays_dir_tangent


def ray_render(
    albedo_specular: jax.Array,
    rays_uv: jax.Array,
    rays_lt: jax.Array,
    lp: jax.Array,
    num_ray_diffuse: int = 0,
    albedo_diffuse: jax.Array | None = None,
    no_albedo: bool = False,
    separate_albedo: bool = False,
    lp_scale_factor: float = 1.0,
):
    """Compose the final image from per-ray light transport and a probe.

    Args:
      albedo_specular: [N, H, W, C].
      rays_uv: [N, H, W, 2, R] probe UVs (-1 marks masked pixels).
      rays_lt: [N, H, W, R, C] light transport per ray.
      lp: [N, Hl, Wl, C] or [1, Hl, Wl, C] light probe.
      num_ray_diffuse: trailing rays treated as the diffuse fan.

    Returns dict(out, out_specular, out_diffuse, ltt_specular_map,
    ltt_diffuse_map, rays_color, lp) — the reference's 7-tuple
    (network.py:481-527).
    """
    r_total = rays_uv.shape[-1]
    r_spec = r_total - num_ray_diffuse
    lp = lp * lp_scale_factor
    hl, wl = lp.shape[1], lp.shape[2]

    x = jnp.clip(rays_uv[..., 0, :] * wl, None, wl - 1)
    y = jnp.clip(rays_uv[..., 1, :] * hl, None, hl - 1)
    rays_color = interpolate_bilinear_batch(lp, x, y)  # [N, H, W, R, C]

    ltt_specular = (
        jnp.sum(rays_lt[..., :r_spec, :] * rays_color[..., :r_spec, :], axis=-2)
        / r_spec
    )
    out_specular = ltt_specular if no_albedo else albedo_specular * ltt_specular

    if num_ray_diffuse > 0:
        ltt_diffuse = (
            jnp.sum(
                rays_lt[..., r_spec:, :] * rays_color[..., r_spec:, :], axis=-2
            )
            / num_ray_diffuse
        )
        if no_albedo:
            out_diffuse = ltt_diffuse
        elif separate_albedo:
            if albedo_diffuse is None:
                raise ValueError("separate_albedo requires albedo_diffuse")
            out_diffuse = albedo_diffuse * ltt_diffuse
        else:
            out_diffuse = albedo_specular * ltt_diffuse
    else:
        ltt_diffuse = jnp.zeros_like(ltt_specular)
        out_diffuse = jnp.zeros_like(out_specular)

    return {
        "out": out_specular + out_diffuse,
        "out_specular": out_specular,
        "out_diffuse": out_diffuse,
        "ltt_specular_map": ltt_specular,
        "ltt_diffuse_map": ltt_diffuse,
        "rays_color": rays_color,
        "lp": lp,
    }


class RayRenderer:
    """Thin stateful wrapper pairing a lighting model with `ray_render`.

    Mirrors the reference module interface (network.py:475-527); the
    lighting model supplies the probe when `lp` is not given.
    """

    def __init__(self, lighting_apply):
        # lighting_apply(lighting_idx, is_lp=True) -> [1, H, W, C]
        self.lighting_apply = lighting_apply

    def __call__(self, albedo_specular, rays_uv, rays_lt, lighting_idx=None,
                 lp=None, **kw):
        if lp is None:
            lp = self.lighting_apply(lighting_idx, is_lp=True)
        return ray_render(albedo_specular, rays_uv, rays_lt, lp, **kw)


def rays_lt_chrom_loss(
    rays_lt: jax.Array,
    alpha_map: jax.Array,
    img: jax.Array | None = None,
):
    """White-light-transport chromaticity prior (network.py:391-411).

    Args:
      rays_lt: [N, H, W, R, C].
      alpha_map: [N, H, W, 1].
      img: optional [N, H, W, C] for intensity weighting.

    Returns (loss, chrom, chrom_mean, chrom_diff).
    """
    # chromaticity math in f32 even when rays_lt is stored bf16
    rays_lt = rays_lt.astype(jnp.float32)
    # NaN trap: norm/maximum guards the VALUE at 0 but sqrt'(0) = inf
    # still reaches the backward pass (inf * 0 = NaN), and rays_lt hits
    # exactly (0,0,0) once the U-Net's tanh saturates to -1 late in
    # training — every long run diverged at ~iter 1400 through this
    # gradient.  rsqrt of the eps-shifted square is finite everywhere.
    sq = jnp.sum(rays_lt * rays_lt, axis=-1, keepdims=True)
    chrom = rays_lt * jax.lax.rsqrt(sq + 1e-20)
    chrom_mean = jnp.mean(chrom, axis=-2, keepdims=True)
    sq_m = jnp.sum(chrom_mean * chrom_mean, axis=-1, keepdims=True)
    chrom_mean = chrom_mean * jax.lax.rsqrt(sq_m + 1e-20)
    diff = (1.0 - jnp.sum(chrom * chrom_mean, axis=-1)) * alpha_map  # [N,H,W,R]
    if img is not None:
        weight = jnp.clip(
            jnp.linalg.norm(img, axis=-1, keepdims=True) * 20.0, None, 1.0
        )
        diff = diff * weight
    loss = (
        jnp.sum(diff)
        / jnp.maximum(jnp.sum(alpha_map), 1.0)
        / rays_lt.shape[-2]
    )
    return loss, chrom, chrom_mean, diff


def ray_render_sh(
    albedo_specular: jax.Array,
    rays_dir: jax.Array,
    alpha_map: jax.Array,
    rays_lt: jax.Array,
    sh_coeff: jax.Array,
    sh_lmax: int,
    num_ray_diffuse: int = 0,
    albedo_diffuse: jax.Array | None = None,
    no_albedo: bool = False,
    separate_albedo: bool = False,
    lp_scale_factor: float = 1.0,
    backend: str = "auto",
    fan_inputs: tuple[jax.Array, jax.Array, jax.Array] | None = None,
):
    """SH-direct ray composition: shade rays straight from SH coefficients.

    TPU-native replacement for the probe-sampling path when the lighting is
    the SH model: instead of reconstructing a 256x512 equirect probe and
    bilinear-gathering it per ray (whose backward is a multi-hundred-
    million-update scatter into a tiny array -- pathological on TPU), the
    radiance of each ray is evaluated as basis(dir) . coeff.  The gradient
    w.r.t. the lighting coefficients becomes a plain matmul (basis^T g),
    and the result is *more* exact than the reference's probe path (no
    equirect discretization).  Rays are processed in chunks via lax.map so
    the [P, R, (lmax+1)^2] basis tensor never materializes.

    Args:
      albedo_specular: [N, H, W, C].
      rays_dir: [N, H, W, 3, R] world-space unit rays.
      alpha_map: [N, H, W, 1].
      rays_lt: [N, H, W, R, C].
      sh_coeff: [B, C] coefficients of the active lighting.
      sh_lmax: SH degree (static).
      fan_inputs: optional (tbn [N,H,W,3,3], view_dir_tangent [N,H,W,3],
        pivots [R,3]) — when given and the Pallas path is active, the
        kernel constructs the ray fan itself (sh_shade_fan) and never
        reads `rays_dir` (VERDICT r4 item 7; reference fan math
        network.py:445-472).

    Returns the same dict as `ray_render` (lp is the coeff here).
    """
    from rnr_tpu.ops.sh import evaluate_sh_basis

    r_total = rays_dir.shape[-1]
    r_spec = r_total - num_ray_diffuse
    coeff = sh_coeff * lp_scale_factor

    # both implementations treat alpha/directions as data (the Pallas
    # VJP returns zero for them); stop the gradient here so the XLA path
    # has identical gradient semantics (code-review r3)
    alpha_map = jax.lax.stop_gradient(alpha_map)
    rays_dir = jax.lax.stop_gradient(rays_dir)

    # fused Pallas kernel: ladder + radiance + fan reduction all in VMEM
    # (ops/sh_pallas.py) — rays_color never materializes in HBM, in
    # either direction.  "auto" = on for TPU-class backends.
    from rnr_tpu.ops.backend import pallas_interpret, use_pallas

    use_kernel = use_pallas(backend)
    if use_kernel:
        # under a sharded trace the kernel runs per row-shard via
        # shard_map (ops/shmap.py); that needs the sharded dims to
        # divide — otherwise fall back to the XLA formulation
        from rnr_tpu.ops.shmap import active_mesh, shards_divide

        mesh = active_mesh()
        if mesh is not None and not shards_divide(
                mesh, rays_dir.shape, ("dp", "sp", None, None, None)):
            use_kernel = False
    if use_kernel:
        if fan_inputs is not None:
            from rnr_tpu.ops.sh_pallas import sh_shade_fan

            tbn, vdt, pivots = fan_inputs
            ltt_specular, ltt_diffuse = sh_shade_fan(
                jax.lax.stop_gradient(tbn),
                jax.lax.stop_gradient(vdt),
                alpha_map, rays_lt, coeff, pivots, sh_lmax, r_spec,
                pallas_interpret(backend),
            )
        else:
            from rnr_tpu.ops.sh_pallas import sh_shade

            ltt_specular, ltt_diffuse = sh_shade(
                rays_dir, rays_lt, alpha_map, coeff, sh_lmax, r_spec,
                pallas_interpret(backend),
            )
        out_specular = (
            ltt_specular if no_albedo else albedo_specular * ltt_specular
        )
        if num_ray_diffuse > 0:
            if no_albedo:
                out_diffuse = ltt_diffuse
            elif separate_albedo:
                if albedo_diffuse is None:
                    raise ValueError(
                        "separate_albedo requires albedo_diffuse"
                    )
                out_diffuse = albedo_diffuse * ltt_diffuse
            else:
                out_diffuse = albedo_specular * ltt_diffuse
        else:
            out_diffuse = jnp.zeros_like(out_specular)
        return {
            "out": out_specular + out_diffuse,
            "out_specular": out_specular,
            "out_diffuse": out_diffuse,
            "ltt_specular_map": ltt_specular,
            "ltt_diffuse_map": ltt_diffuse,
            "rays_color": None,  # not materialized on the fused path
            "lp": coeff,
        }

    # one transpose up front so every scan step reads a CONTIGUOUS
    # [N, H, W, 3] slab — slicing rays_dir[..., r] inside the scan is a
    # stride-R gather repeated R times over the largest tensor of the
    # step (trailing-axis ray layout keeps the VPU reductions fast
    # elsewhere; the scan is the one consumer that wants rays leading)
    rays_dir_r = jnp.moveaxis(rays_dir, -1, 0)            # [R, N, H, W, 3]

    def shade_one(r):
        # basis evaluation in f32 regardless of ray storage dtype: the
        # lmax-10 Legendre ladder loses ~all precision in bf16
        d = rays_dir_r[r].astype(jnp.float32)             # [N, H, W, 3]
        basis = evaluate_sh_basis(sh_lmax, d)             # [N, H, W, B]
        rc = jnp.einsum(
            "nhwb,bc->nhwc", basis, coeff.astype(jnp.float32)
        )
        # store at the ray dtype (halves the [R,N,H,W,C] stack in bf16)
        return rc.astype(rays_lt.dtype)

    # lax.map over the (static, small) ray axis keeps peak memory at one
    # [N, H, W, B] block.  jax.checkpoint: without it the scan's VJP
    # stores every ray's basis tensor as a residual — R x [N, H, W, 121]
    # f32 is ~3.3 GB/frame at 512^2, the dominant HBM blowup of the whole
    # step (and the batch-4 OOM).  Recomputing the basis in backward is
    # nearly free: its VJP needs the basis anyway to form basis^T . g.
    rays_color = jax.lax.map(
        jax.checkpoint(shade_one), jnp.arange(r_total)
    )                                                     # [R, N, H, W, C]
    rays_color = jnp.moveaxis(rays_color, 0, -2)          # [N, H, W, R, C]
    rays_color = rays_color * alpha_map[..., None, :].astype(rays_color.dtype)

    # per-ray reductions accumulate in f32 (the casts fuse into the
    # reduction — no f32 materialization of the big tensors)
    def _sum_rays(lt, color):
        return jnp.sum(
            lt.astype(jnp.float32) * color.astype(jnp.float32), axis=-2
        )

    ltt_specular = (
        _sum_rays(rays_lt[..., :r_spec, :], rays_color[..., :r_spec, :])
        / r_spec
    )
    out_specular = ltt_specular if no_albedo else albedo_specular * ltt_specular

    if num_ray_diffuse > 0:
        ltt_diffuse = (
            _sum_rays(rays_lt[..., r_spec:, :], rays_color[..., r_spec:, :])
            / num_ray_diffuse
        )
        if no_albedo:
            out_diffuse = ltt_diffuse
        elif separate_albedo:
            if albedo_diffuse is None:
                raise ValueError("separate_albedo requires albedo_diffuse")
            out_diffuse = albedo_diffuse * ltt_diffuse
        else:
            out_diffuse = albedo_specular * ltt_diffuse
    else:
        ltt_diffuse = jnp.zeros_like(ltt_specular)
        out_diffuse = jnp.zeros_like(out_specular)

    return {
        "out": out_specular + out_diffuse,
        "out_specular": out_specular,
        "out_diffuse": out_diffuse,
        "ltt_specular_map": ltt_specular,
        "ltt_diffuse_map": ltt_diffuse,
        "rays_color": rays_color,
        "lp": coeff,
    }


def build_fan_channels(
    tbn: jax.Array,
    vdt: jax.Array,
    alpha: jax.Array,
    pivots: jax.Array,
    r_spec: int,
):
    """Elementwise fan builder: U-Net ray channels + rays_dir in one pass.

    Computes exactly the spec-fan + diffuse-fan composition of
    `RaySampler` (reflect around pivots * alpha, TBN transform,
    normalize — reference network.py:445-472) as pure lane-resident
    [N, H, W, R] broadcasts: no per-pixel batched 3x3 einsum, and the
    U-Net's [N, H, W, R*3] input block (per-ray xyz grouping,
    train_rnr.py:530) is emitted directly instead of via a
    swapaxes+reshape of the [..., 3, R] tensor.

    Args:
      tbn: [N, H, W, 3, 3], vdt: [N, H, W, 3], alpha: [N, H, W, 1].
      pivots: [R, 3] — spec fan pivots first, then diffuse.
      r_spec: number of specular rays (reflect mode); the rest use the
        pivots directly (diffuse mode).

    Returns (net_rays [N, H, W, R*3], rays_dir [N, H, W, 3, R]).  In
    the SH-direct training path only net_rays is consumed, so XLA DCEs
    the rays_dir layout.
    """
    r_total = pivots.shape[0]
    px = pivots[:, 0][None, None, None]
    py = pivots[:, 1][None, None, None]
    pz = pivots[:, 2][None, None, None]
    vx, vy, vz = vdt[..., 0:1], vdt[..., 1:2], vdt[..., 2:3]
    dot = vx * px + vy * py + vz * pz
    rx = 2.0 * dot * px - vx
    ry = 2.0 * dot * py - vy
    rz = 2.0 * dot * pz - vz
    # reflect normalize (cameras._normalize) then the alpha mask
    inv = alpha / jnp.maximum(
        jnp.sqrt(rx * rx + ry * ry + rz * rz), 1e-12
    )
    spec = jnp.arange(r_total) < r_spec
    tx = jnp.where(spec, rx * inv, px)
    ty = jnp.where(spec, ry * inv, py)
    tz = jnp.where(spec, rz * inv, pz)
    wx = tbn[..., 0, 0:1] * tx + tbn[..., 0, 1:2] * ty + tbn[..., 0, 2:3] * tz
    wy = tbn[..., 1, 0:1] * tx + tbn[..., 1, 1:2] * ty + tbn[..., 1, 2:3] * tz
    wz = tbn[..., 2, 0:1] * tx + tbn[..., 2, 1:2] * ty + tbn[..., 2, 2:3] * tz
    inv_w = 1.0 / jnp.maximum(
        jnp.sqrt(wx * wx + wy * wy + wz * wz), 1e-12
    )
    wx, wy, wz = wx * inv_w, wy * inv_w, wz * inv_w
    n, h, w = vdt.shape[:3]
    net_rays = jnp.stack([wx, wy, wz], axis=-1).reshape(
        n, h, w, r_total * 3
    )
    rays_dir = jnp.stack([wx, wy, wz], axis=-2)
    return net_rays, rays_dir
