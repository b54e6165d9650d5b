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
