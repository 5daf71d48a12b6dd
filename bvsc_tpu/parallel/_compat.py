"""shard_map version compatibility.

jax 0.8 promoted ``jax.experimental.shard_map.shard_map`` to
``jax.shard_map`` and renamed ``check_rep`` to ``check_vma``.  This wrapper
presents one signature (accepting ``check_rep``) across both.
"""

from __future__ import annotations

import inspect

try:  # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

_HAS_CHECK_VMA = "check_vma" in inspect.signature(_shard_map).parameters


def shard_map(f, *, mesh, in_specs, out_specs, check_rep: bool = True):
    kw = {"check_vma" if _HAS_CHECK_VMA else "check_rep": check_rep}
    return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)
