"""Shared Pallas-vs-XLA backend selection.

One idiom for every dual-backend op (rasterizer, texture, convs, SH
shading): "auto" picks the Pallas kernel on TPU-class backends and the
XLA formulation on CPU; "pallas_interpret" runs the kernel in
interpreter mode (CPU-testable); "xla" forces the XLA path.
"""

from __future__ import annotations

import os

import jax


# Platforms whose compiler is Mosaic-TPU capable.  "auto" must never
# route Mosaic kernels to a non-TPU accelerator (e.g. a GPU backend
# would accept the trace then fail at compile time) — ADVICE r4.
_TPU_PLATFORMS = ("tpu", "axon")


def is_tpu_backend() -> bool:
    return jax.default_backend() in _TPU_PLATFORMS


def use_pallas(backend: str) -> bool:
    """Whether the Pallas path should run for this backend selector."""
    if backend in ("pallas", "pallas_interpret"):
        return True
    return backend == "auto" and is_tpu_backend()


def pallas_interpret(backend: str) -> bool:
    # RNR_PALLAS_INTERPRET=1 forces interpreter mode for EVERY backend
    # selector — lets CPU tests drive any Pallas-routing mode (pallas3,
    # slab, p3s4, ...) through the real dispatch logic.
    if os.environ.get("RNR_PALLAS_INTERPRET") == "1":
        return True
    return backend == "pallas_interpret"
