"""Collective accounting from compiled HLO.

BASELINE.md targets >=85% rays/s scaling efficiency over ICI, but the
virtual-CPU harness cannot measure ICI — shared host cores make wall
time meaningless for scaling (VERDICT r3 item 9).  What CAN be computed
exactly off-hardware is the per-step collective traffic of the compiled
SPMD program: bytes all-reduced / all-gathered / reduce-scattered /
permuted.  Combined with an ICI bandwidth figure, that turns the
efficiency target into a calculation:

    t_comm >= bytes_on_wire / ici_bw;  eff ~ t_comp / (t_comp + t_comm)

`collective_stats` parses the optimized HLO of a compiled (lowered)
sharded step and returns bytes per collective kind; `scaling_bench.py`
emits it per device count.
"""

from __future__ import annotations

import re
from typing import Any

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)

# one output shape: `f32[2,64,64]{3,2,1,0}` (layout suffix optional)
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    nbytes = _DTYPE_BYTES.get(dtype)
    if nbytes is None:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * nbytes


def collective_stats(hlo_text: str) -> dict[str, Any]:
    """Sum output bytes of every collective op in optimized HLO text.

    Returns {kind: {"count": n, "bytes": b}, ..., "total_bytes": t}.
    `-start`/`-done` async pairs are counted once (on the start op).
    """
    stats: dict[str, Any] = {}
    total = 0
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"%?[\w.\-]+\s*=\s*(.*)$", line)
        if not m:
            continue
        rhs = m.group(1)
        for kind in _COLLECTIVES:
            # match the op name with an optional -start suffix; skip
            # -done ops (the start op carries the shape already)
            if re.search(rf"\b{kind}(-start)?\(", rhs):
                if re.search(rf"\b{kind}-done\(", rhs):
                    continue
                # shapes are everything before the op name
                head = rhs.split(kind)[0]
                shapes = _SHAPE_RE.findall(head)
                if re.search(rf"\b{kind}-start\(", rhs) and len(shapes) >= 2:
                    # async -start ops return a tuple
                    # (operand-alias, result[, scratch...]); only the
                    # result element is bytes-on-wire — summing the whole
                    # tuple double-counts (ADVICE r4).
                    shapes = [shapes[1]]
                nbytes = sum(
                    _shape_bytes(dt, dims) for dt, dims in shapes
                )
                ent = stats.setdefault(kind, {"count": 0, "bytes": 0})
                ent["count"] += 1
                ent["bytes"] += nbytes
                total += nbytes
                break
    stats["total_bytes"] = total
    return stats


def step_collective_stats(jitted_step, *args, **kwargs) -> dict[str, Any]:
    """Lower+compile a jitted step on its (sharded) args and account its
    collectives.  Static in time: no execution happens."""
    compiled = jitted_step.lower(*args, **kwargs).compile()
    texts = compiled.as_text()
    if isinstance(texts, (list, tuple)):
        texts = "\n".join(texts)
    return collective_stats(texts)
