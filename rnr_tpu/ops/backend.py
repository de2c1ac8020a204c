"""Shared Pallas-vs-XLA backend selection.

One idiom for every dual-backend op (rasterizer, texture, convs, SH
shading): "auto" picks the Pallas kernel on TPU-class backends and the
XLA formulation on CPU; "pallas_interpret" runs the kernel in
interpreter mode (CPU-testable); "xla" forces the XLA path.
"""

from __future__ import annotations

import jax


def use_pallas(backend: str) -> bool:
    """Whether the Pallas path should run for this backend selector."""
    if backend in ("pallas", "pallas_interpret"):
        return True
    return backend == "auto" and jax.default_backend() not in ("cpu",)


def pallas_interpret(backend: str) -> bool:
    return backend == "pallas_interpret"
