"""Device mesh construction over ICI/DCN.

The reference's entire "distributed backend" is a gloo/NCCL process group
whose non-zero ranks immediately exit (generate.py:41-52 — "we don't support
parallel inference yet"). This module is the TPU-native replacement
(SURVEY §2.11): a ``jax.sharding.Mesh`` with named axes

  * ``dp`` — data parallel (batch)
  * ``tp`` — tensor parallel (attention heads / MLP features / vocab)

GSPMD inserts the collectives; shardings are declared in
``layerskip_tpu.parallel.sharding``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: int = 1,
    tp: int = 1,
    ep: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a [dp, tp] (or [dp, ep, tp]) mesh over ``dp*ep*tp`` devices.

    ``ep > 1`` adds an expert-parallel axis between dp and tp (MoE expert
    weights shard their [E] dim over it — parallel/sharding.py); dense
    models keep the two-axis mesh for cache-key stability.

    On real hardware, ``jax.devices()`` already orders devices so that the
    trailing mesh axis (``tp``) lands on the fastest ICI links; use
    ``jax.experimental.mesh_utils.create_device_mesh`` when topology-aware
    placement matters (multi-host).
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = (dp, ep, tp) if ep > 1 else (dp, tp)
    names = ("dp", "ep", "tp") if ep > 1 else ("dp", "tp")
    if dp * ep * tp != len(devices):
        raise ValueError(
            f"dp*ep*tp={dp * ep * tp} != #devices={len(devices)}"
        )
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh(shape, devices=devices)
    except Exception:
        arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=names)


def make_train_mesh(
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """[dp, fsdp, tp] mesh for training/large-scale runs.

    * ``dp``   — pure data parallel (gradient all-reduce)
    * ``fsdp`` — stacked-layer weight sharding (ZeRO-3-style: each scan step
                 all-gathers one layer's shard); the same axis doubles as the
                 sequence-parallel axis for activations (Megatron-SP style —
                 norms/elementwise run sequence-sharded, matmuls gather)
    * ``tp``   — Megatron tensor parallel (feature dims)
    """
    devices = list(devices if devices is not None else jax.devices())
    if dp * fsdp * tp != len(devices):
        raise ValueError(
            f"dp*fsdp*tp={dp * fsdp * tp} != #devices={len(devices)}"
        )
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_device_mesh((dp, fsdp, tp), devices=devices)
    except Exception:
        arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, axis_names=("dp", "fsdp", "tp"))


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, devices=jax.devices()[:1])
