"""Loss terms of the RNR/DNR objectives.

Reference: train_rnr.py:564-611 and train_dnr.py:258-271.  Every loss is a
static-shape masked reduction — the reference's boolean-mask indexing
(dynamic shapes) becomes mask-weighted sums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def image_l1_loss(
    out_img: jax.Array,
    img_gt: jax.Array,
    alpha_map: jax.Array,
    border_crop: int = 5,
) -> jax.Array:
    """Alpha-masked L1 with the outermost pixels excluded.

    The reference crops `border` pixels before the mean so boundary
    rasterization errors don't dominate (train_rnr.py:564-585).

    Args: out_img/img_gt [N, H, W, C]; alpha_map [N, H, W, 1].
    """
    b = border_crop
    if b > 0:
        out_img = out_img[:, b:-b, b:-b]
        img_gt = img_gt[:, b:-b, b:-b]
        alpha_map = alpha_map[:, b:-b, b:-b]
    return jnp.mean(jnp.abs(out_img * alpha_map - img_gt * alpha_map))


def lighting_loss(
    l_samples_est: jax.Array,
    l_samples_init: jax.Array,
    covered_mask: jax.Array,
    covered_weight: float = 1.0,
    uncovered_weight: float = 0.1,
) -> jax.Array:
    """L1 between estimated and stitched-probe light samples.

    Directions covered by the stitched probe carry full weight; uncovered
    directions are weakly regularized toward the fill value
    (train_rnr.py:575-579).

    Args:
      l_samples_est / l_samples_init: [S, C].
      covered_mask: [S] float 0/1.
    """
    diff = jnp.abs(l_samples_init - l_samples_est)  # [S, C]
    m = covered_mask[:, None]
    n_cov = jnp.maximum(jnp.sum(covered_mask), 1.0)
    n_unc = jnp.maximum(jnp.sum(1.0 - covered_mask), 1.0)
    cov = jnp.sum(diff * m) / n_cov
    unc = jnp.sum(diff * (1.0 - m)) / n_unc
    return cov * covered_weight + unc * uncovered_weight


def albedo_prior_loss(
    albedo_tex: jax.Array,
    albedo_tex_init: jax.Array,
) -> jax.Array:
    """Prior pulling the mean of *touched* albedo texels toward 0.5.

    A texel counts as touched once any of its channels moved away from the
    initialization (train_rnr.py:596-607).

    Args: albedo_tex / albedo_tex_init: [H, W, C] flattened-mipmap albedo.
    """
    changed = jnp.any(albedo_tex != albedo_tex_init, axis=-1, keepdims=True)
    mask = changed.astype(albedo_tex.dtype)
    denom = jnp.sum(mask)
    mean_per_ch = jnp.sum(albedo_tex * mask, axis=(0, 1)) / jnp.maximum(
        denom, 1.0
    )
    loss = jnp.sum(jnp.abs(mean_per_ch - 0.5)) / albedo_tex.shape[-1]
    return jnp.where(denom == 0, 0.0, loss)
