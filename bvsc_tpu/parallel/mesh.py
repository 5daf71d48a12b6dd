"""Mesh construction and sharding helpers.

The reference scales with torch DDP over NCCL (reference
``third_party/BigVGAN/train.py:35-38,82-85,438-441``).  The TPU-native
equivalent is a ``jax.sharding.Mesh`` with a ``data`` axis: parameters are
replicated, batches are sharded over ``data``, and XLA inserts the gradient
``psum`` over ICI automatically when the loss is jitted with these shardings
(no user-level backend config — SURVEY §2.11).

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
``jax.devices()`` then spans all hosts and the same code scales across DCN.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # fall back to the (virtual) CPU devices — the multi-chip dry-run
            # path under --xla_force_host_platform_device_count=N
            cpu = jax.devices("cpu")
            if n_devices <= len(cpu):
                devices = cpu
            else:
                raise ValueError(
                    f"requested {n_devices} devices, only {len(devices)} "
                    f"default + {len(cpu)} cpu available"
                )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place a host batch onto the mesh, sharded on the leading axis.

    Single-process: a plain sharded ``device_put``.  Multi-process
    (``jax.distributed``): each process passes its LOCAL rows (its
    per-host dataset shard) and the global batch is assembled across
    processes — the DistributedSampler+DDP input path, TPU-style."""
    sh = batch_sharded(mesh, axis_name)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
