"""Sharding constraints for model internals.

Input-sharding propagation alone lets XLA resolve large intermediates
(U-Net activations, the [V, V] GCN distance matrix) to full replication.
`constrain` pins the layout of those intermediates whenever the
surrounding jit is traced under a mesh context
(`jax.sharding.use_abstract_mesh` / `set_mesh`); with no mesh — the
single-chip path — it is the identity, so model code can call it
unconditionally.

The reference has no analog: its parallelism is DataParallel module
replication (SURVEY §2.7).  Here the constraints are the contract that
the sp axis really partitions image rows / GCN vertices on every device,
verified by `tests/test_parallel.py::test_sharding_constraints_in_hlo`
and the `dryrun_multichip` collective check.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P


def _active_axes() -> frozenset[str]:
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or not mesh.axis_names:
        return frozenset()
    return frozenset(mesh.axis_names)


def constrain(x: jax.Array, *spec) -> jax.Array:
    """`with_sharding_constraint(x, P(*spec))` under an active mesh.

    Axes named in `spec` that the active mesh does not define make the
    constraint a no-op (so e.g. "sp" constraints vanish on a dp-only
    mesh).  With no active mesh the input is returned unchanged.
    """
    axes = _active_axes()
    if not axes:
        return x
    named = {
        s
        for part in spec
        if part is not None
        for s in (part if isinstance(part, tuple) else (part,))
    }
    if not named <= axes:
        return x
    return jax.lax.with_sharding_constraint(x, P(*spec))
