"""Device mesh construction for tensor parallelism.

The reference's parallel runtime is one CUDA process per GPU with NCCL + a
shared-memory RPC control plane (nanovllm/engine/model_runner.py:19-104). On
TPU that collapses into a single logical SPMD program over a
`jax.sharding.Mesh` (SURVEY §5.8): every host runs the same engine loop, the
compiler places ICI collectives, and no control-plane messaging exists.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(tensor_parallel_size: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= tensor_parallel_size, (
        f"need {tensor_parallel_size} devices, have {len(devices)}"
    )
    dev = np.asarray(devices[:tensor_parallel_size])
    return Mesh(dev, axis_names=("tp",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Trace-time tensor-parallel mesh registry: Pallas calls are opaque to
# GSPMD, so quantized matmuls (ops/quant.qmm) shard_map themselves over the
# current tp mesh. ModelRunner sets this at construction AND right before
# every step-fn trace (multi-runner processes — tests — re-point it).
_CURRENT_TP_MESH: Mesh | None = None


def set_current_tp_mesh(mesh: Mesh | None) -> None:
    global _CURRENT_TP_MESH
    tp = mesh.shape.get("tp", 1) if mesh is not None else 1
    _CURRENT_TP_MESH = mesh if tp > 1 else None


def current_tp_mesh() -> Mesh | None:
    return _CURRENT_TP_MESH
