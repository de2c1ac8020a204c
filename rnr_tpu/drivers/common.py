"""Shared driver utilities: path resolution, device setup, logging."""

from __future__ import annotations

import os

import numpy as np


def resolve(path: str | None, data_root: str) -> str | None:
    """Expand the reference's `_/` data-root-relative prefix
    (train_rnr.py:122-135)."""
    if path is None:
        return None
    if path.startswith("_/"):
        return os.path.join(data_root, path[2:])
    return path


def cond_mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def setup_jax(platform: str | None = None, num_cpu_devices: int | None = None):
    """Configure the jax platform BEFORE backend init.

    Needed because this container's sitecustomize force-selects the TPU
    plugin; pass platform='cpu' for host runs.
    """
    import jax

    if platform is not None:
        try:
            jax.config.update("jax_platforms", platform)
        except RuntimeError:
            pass
    if num_cpu_devices is not None:
        try:
            jax.config.update("jax_num_cpu_devices", num_cpu_devices)
        except RuntimeError:
            pass
    return jax


def load_sphere_samples(path: str) -> np.ndarray:
    """[3, num_sample] unit directions from a sphere_samples .mat file
    (reference: train_rnr.py:167-169) or generated Fibonacci fallback."""
    import scipy.io

    if path and os.path.isfile(path):
        return scipy.io.loadmat(path)["sphere_samples"].T.astype(np.float32)
    n = 4096
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)]
    ).astype(np.float32)


def save_png(path: str, img: np.ndarray) -> None:
    """Write a float [H, W, C] RGB image in [0, 1] as PNG (BGR on disk)."""
    import cv2

    arr = np.clip(np.asarray(img), 0.0, 1.0) * 255.0
    if arr.ndim == 3:
        arr = arr[:, :, ::-1]
    cv2.imwrite(path, arr.astype(np.uint8))
