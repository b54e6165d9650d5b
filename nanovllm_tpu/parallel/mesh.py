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
# GSPMD, so quantized matmuls (ops/quant.qmm) and the fused sampler
# shard_map themselves over the current tp mesh. ModelRunner SCOPES it to
# each step-fn trace (tp_mesh_scope wraps the traced body, so the set/
# restore side effects run exactly at trace time) — a tp>1 runner must not
# leak its mesh into unrelated later qmm/fused_sample calls in the same
# process (tests, tools, library use).
import threading

_TLS = threading.local()  # thread-local: warmup traces run in a thread pool


def set_current_tp_mesh(mesh: Mesh | None) -> None:
    tp = mesh.shape.get("tp", 1) if mesh is not None else 1
    _TLS.mesh = mesh if tp > 1 else None


def current_tp_mesh() -> Mesh | None:
    return getattr(_TLS, "mesh", None)


class tp_mesh_scope:
    """Context manager: point the registry at `mesh`, restore on exit.
    Thread-local so concurrent warmup traces can't interleave restores."""

    def __init__(self, mesh: Mesh | None):
        self.mesh = mesh

    def __enter__(self):
        self.prev = current_tp_mesh()
        set_current_tp_mesh(self.mesh)

    def __exit__(self, *exc):
        _TLS.mesh = self.prev
        return False


def shard_map():
    """jax.shard_map with the jax.experimental fallback — ONE copy of the
    import dance (quant, sampler, and the attention wrapper all need it)."""
    try:
        return jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map as sm
        return sm
