"""Checkpoint I/O: Orbax pytree save/restore with scan-latest resume.

Replaces the reference's ``torch.save/load`` + glob-scan flow
(``third_party/BigVGAN/utils.py:55-74``; schemas in SURVEY §2.13) with
Orbax — preemption-safe, async-capable, TPU-native.  Directory layout:

  <ckpt_dir>/<prefix><step:08d>/   (one Orbax checkpoint per step)

``scan_checkpoint`` mirrors the reference's latest-by-glob semantics
(``utils.py:69-74``).
"""

from __future__ import annotations

import glob
import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_pytree(path: str, tree) -> None:
    """Save a pytree of arrays to an Orbax checkpoint directory."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_pytree(path: str, target=None):
    """Restore a pytree; ``target`` (a matching pytree of arrays/ShapeDtype
    structs) enables sharding-aware restore when given.

    Targetless restore is topology-portable: a checkpoint saved on one
    device mesh (e.g. an 8-device data-parallel trainer) restores on any
    other (e.g. a 1-device inference host) — Orbax's recorded shardings
    are replaced by local ones from the checkpoint's own metadata when the
    saved devices don't exist here."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, target)
    try:
        return ckptr.restore(path)
    except ValueError as e:
        if "device" not in str(e).lower():
            raise
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        meta = ckptr.metadata(path)
        meta = getattr(meta, "item_metadata", meta)
        target = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
            meta,
        )
        return ckptr.restore(path, target)


def checkpoint_name(prefix: str, step: int) -> str:
    """Reference naming scheme ``g_00050000`` / ``do_00050000``
    (``train.py:327,330``)."""
    return f"{prefix}{step:08d}"


def scan_checkpoint(cp_dir: str, prefix: str) -> str | None:
    """Latest checkpoint path by name sort (reference ``utils.py:69-74``)."""
    pattern = os.path.join(cp_dir, prefix + "????????")
    cp_list = [p for p in glob.glob(pattern) if re.search(r"\d{8}$", p)]
    if not cp_list:
        return None
    return sorted(cp_list)[-1]


def step_of(path: str) -> int:
    m = re.search(r"(\d{8})$", path)
    return int(m.group(1)) if m else 0


def save_step(cp_dir: str, prefix: str, step: int, tree) -> str:
    os.makedirs(cp_dir, exist_ok=True)
    path = os.path.join(cp_dir, checkpoint_name(prefix, step))
    save_pytree(path, tree)
    return path


def restore_latest(cp_dir: str, prefix: str, target=None):
    """(tree, step) of the newest checkpoint, or (None, 0)."""
    path = scan_checkpoint(cp_dir, prefix)
    if path is None:
        return None, 0
    return restore_pytree(path, target), step_of(path)
