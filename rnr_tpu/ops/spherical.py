"""Equirectangular (light-probe) direction <-> UV mappings.

Convention parity with the reference (render.py:87-121):
  u = atan2(z, x) / (2*pi) + 0.5
  v = acos(y) / pi
so +y is the probe's "up"; u wraps around the x/z great circle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PI = jnp.pi


def spherical_mapping(l_dir: jax.Array) -> jax.Array:
    """Directions -> equirect UV.  l_dir: [3, ...] -> [2, ...].

    Reference: render.py:87-93.
    """
    u = jnp.arctan2(l_dir[2], l_dir[0]) * (0.5 / _PI) + 0.5
    v = jnp.arccos(jnp.clip(l_dir[1], -1.0, 1.0)) / _PI
    return jnp.stack((u, v), axis=0)


def spherical_mapping_batch(l_dir: jax.Array) -> jax.Array:
    """Batched directions -> UV.  l_dir: [N, 3, ...] -> [N, 2, ...].

    Reference: render.py:96-102.
    """
    u = jnp.arctan2(l_dir[:, 2], l_dir[:, 0]) * (0.5 / _PI) + 0.5
    v = jnp.arccos(jnp.clip(l_dir[:, 1], -1.0, 1.0)) / _PI
    return jnp.stack((u, v), axis=1)


def spherical_mapping_inv(uv: jax.Array) -> jax.Array:
    """Equirect UV -> unit directions.  uv: [2, ...] -> [3, ...].

    Includes the boundary sign fix-ups of the reference so that u == 0 or 1
    maps exactly onto the -x axis seam (reference: render.py:105-121).
    """
    y = jnp.cos(uv[1] * _PI)
    r = jnp.sqrt(jnp.clip(1.0 - y * y, 0.0, None))
    t = uv[0] * 2.0 - 1.0
    x = r * jnp.cos(t * _PI)
    z = r * jnp.sin(t * _PI)
    # sin(+-pi) is not exactly zero in floating point; flip sign at the seam
    # exactly like the reference does (render.py:116-117).
    z = z * jnp.where(t == 1.0, -1.0, 1.0)
    z = z * jnp.where(t == -1.0, -1.0, 1.0)
    d = jnp.stack((x, y, z), axis=0)
    n = jnp.linalg.norm(d, axis=0, keepdims=True)
    return d / jnp.maximum(n, 1e-12)


def cart2sph(x, y, z):
    """Cartesian -> (azimuth, elevation, radius).  Reference: sph_harm.py:6-18."""
    azimuth = jnp.arctan2(y, x)
    elevation = jnp.arctan2(z, jnp.sqrt(x * x + y * y))
    r = jnp.sqrt(x * x + y * y + z * z)
    return azimuth, elevation, r


def sph2cart(azimuth, elevation, r):
    """(azimuth, elevation, radius) -> Cartesian.  Reference: sph_harm.py:21-38."""
    x = r * jnp.cos(elevation) * jnp.cos(azimuth)
    y = r * jnp.cos(elevation) * jnp.sin(azimuth)
    z = r * jnp.sin(elevation)
    return x, y, z


def sample_light_dir(azi_deg: jax.Array, pol_deg: jax.Array):
    """Sample light directions on the sphere from azimuth/polar grids.

    Returns (l_dir world "z-out" space, l_dir z-up space), each [3, S].
    Reference: render.py:62-84.
    """
    azi, pol = jnp.meshgrid(azi_deg, pol_deg, indexing="ij")
    azi = azi * (_PI / 180.0)
    ele = _PI / 2.0 - pol * (_PI / 180.0)
    x, y, z = sph2cart(azi, ele, 1.0)
    d = jnp.stack((x, y, z), axis=0)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=0, keepdims=True), 1e-12)
    d_zup = d.reshape(3, -1)
    # z-up -> world (z-out): y_world = z_zup, z_world = -y_zup.
    d_world = jnp.stack((d[0], d[2], -d[1]), axis=0).reshape(3, -1)
    return d_world, d_zup
