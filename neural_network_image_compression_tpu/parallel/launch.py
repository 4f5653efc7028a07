"""Multi-host launcher: jax.distributed wiring for pod-slice runs.

The reference is single-process (SURVEY.md section 2b); this is the DCN side
of the framework's communication backend. One process per host calls
:func:`initialize_distributed` before any other JAX call; after that,
``jax.devices()`` spans every host's chips, the mesh constructors in
parallel/mesh.py produce a pod mesh, and the XLA collectives (gradient psum,
halo ppermute, bitstream segment all_gather) ride ICI within a slice and DCN
across hosts — the JAX equivalent of a NCCL/MPI launcher.

Environment auto-detection: on Cloud TPU pods, ``jax.distributed.initialize()``
with no arguments reads the TPU metadata. Elsewhere (including the CPU
simulation used by tests), pass coordinator/process_id/num_processes
explicitly or via the standard JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID /
JAX_NUM_PROCESSES env vars.

Typical pod training invocation (same command on every host):

    python -m neural_network_image_compression_tpu train \
        --distributed --data ... --run-dir runs/pod \
        --data-parallel <total_chips>
"""
from __future__ import annotations

import os


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    Must run before the first JAX computation in the process. Explicit args
    win over JAX_* env vars, which win over cloud auto-detection."""
    import jax

    if jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def process_info() -> dict:
    """Topology snapshot for logs/metrics: process index/count, device
    counts, and which devices are host-local (addressable)."""
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }


def global_mesh(data: int | None = None, spatial: int = 1):
    """Pod-slice mesh over ALL processes' devices (call after
    :func:`initialize_distributed`). ``data=None`` uses every device on the
    data axis. Device order follows jax.devices(), so each host's chips are
    contiguous on the data axis and the gradient psum's DCN hop count is
    minimal (hierarchical reduce: ICI within a host's slice, DCN across)."""
    import jax

    from neural_network_image_compression_tpu.parallel.mesh import make_mesh

    if data is None:
        data = len(jax.devices()) // spatial
    return make_mesh(data=data, spatial=spatial)
