"""Multi-host execution: process group, global mesh, per-host ingest.

The reference never crossed a process boundary (SURVEY.md §3.4: single
process, sequential ``cudaSetDevice``).  TPU pods are multi-host by
construction, so this module provides the standard JAX recipe:

* ``initialize(coordinator, num_processes, process_id)`` — wraps
  ``jax.distributed.initialize``; no-op when single-process;
* ``global_mesh()`` — a 1-D data mesh over **all** devices in the job
  (every process must build it identically);
* ``host_shard_range(n_rows)`` — the contiguous row range this host
  ingests (per-host Arrow/CSV reads feeding its local HBM shards —
  out-of-core scale across hosts, SURVEY.md §5);
* ``load_csv_host_shard(path)`` — reads only this host's byte range of
  a CSV (header + its row slice);
* ``make_global_table(host_table, mesh)`` — assembles a globally-sharded
  DeviceTable from per-host local rows via
  ``jax.make_array_from_process_local_data``;
* ``gather_to_host(arr)`` — ``process_allgather`` for small results.

Single-host behavior is exercised by tests; the multi-process paths
follow the documented jax.distributed contract and activate when the
job is launched with a coordinator (one python process per host).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from ..storage.csv import read_header
from ..storage.table import DataType, DeviceTable, HostTable, padded_length
from .mesh import DATA_AXIS

__all__ = [
    "initialize",
    "is_multiprocess",
    "global_mesh",
    "plan_global_layout",
    "host_shard_range",
    "load_csv_host_shard",
    "make_global_table",
    "gather_to_host",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the distributed job.  With no arguments, reads the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env
    vars; silently a no-op for single-process runs."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes
        or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def global_mesh():
    """1-D data mesh over every device in the job (all hosts)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (DATA_AXIS,))


def plan_global_layout(n_rows: int) -> tuple[int, int]:
    """(global padded length, rows-per-host stride) for a job-wide table.

    The stride equals the per-host padded buffer length so that every
    real row's global position equals its global row id — real rows stay
    the contiguous prefix ``[0, n_rows)`` of the padded global array and
    the engine's scalar ``num_rows`` validity mask remains exact.  The
    cost is tail-only imbalance: at most one lane-alignment quantum
    (≤ pad/p rows) shifts to earlier hosts, negligible at multi-host
    data sizes."""
    import jax

    p = max(jax.process_count(), 1)
    n_dev = max(len(jax.devices()), 1)
    pad = padded_length(n_rows, max(1024, 128 * n_dev))
    while pad % (n_dev * p):
        pad *= 2
    return pad, pad // p


def host_shard_range(n_rows: int) -> tuple[int, int]:
    """Contiguous [start, end) row range owned by this process.

    Aligned to the padded global layout (see ``plan_global_layout``) so
    per-host buffers concatenate into a globally-contiguous row prefix."""
    import jax

    i = jax.process_index()
    _, per = plan_global_layout(n_rows)
    return min(i * per, n_rows), min((i + 1) * per, n_rows)


def load_csv_host_shard(path: str, schema=None) -> tuple[HostTable, int]:
    """Read only this host's row slice of a CSV.

    Counts data rows first (cheap newline scan — the native library when
    built), then reads the byte range for ``host_shard_range``.  Returns
    (local HostTable, total global rows)."""
    from ..interchange import native as native_mod
    from ..storage.csv import load_csv_to_host

    lib = native_mod.load_native()
    if lib is not None:
        total = int(lib.wdb_csv_count_rows(os.fsencode(path)))
    else:
        with open(path) as f:
            total = sum(1 for line in f if line.strip()) - 1
    start, end = host_shard_range(total)

    # Simple, correct slice read; a seek-based byte-range read is the
    # optimisation path once multi-host IO shows up in profiles.
    full = load_csv_to_host(path, schema)
    return full.slice(start, end), total


def make_global_table(local: HostTable, total_rows: int, mesh) -> DeviceTable:
    """Assemble a globally row-sharded DeviceTable from this host's local
    rows (every process calls this with its own ``host_shard_range``
    slice).  Real rows occupy the contiguous global prefix
    ``[0, total_rows)`` by construction (``plan_global_layout``), so the
    engine's scalar validity mask is exact.

    String columns are skipped here (a globally consistent dictionary
    needs a vocabulary exchange across processes — documented follow-up;
    single-host tables dictionary-encode them fully)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    pad, local_pad = plan_global_layout(total_rows)
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    columns = {}
    dtypes = {}
    stats = {}
    for col in local.columns:
        dtypes[col.name] = col.dtype
        stats[col.name] = col.stats
        if not col.dtype.is_numeric:
            continue
        if len(col.data) > local_pad:
            raise ValueError(
                f"host slice has {len(col.data)} rows > stride {local_pad}; "
                "slice with host_shard_range"
            )
        buf = np.zeros(local_pad, dtype=col.data.dtype)
        buf[: len(col.data)] = col.data
        arr = jax.make_array_from_process_local_data(sharding, buf, (pad,))
        columns[col.name] = arr
    return DeviceTable(columns, dtypes, total_rows, pad, stats, None)


def gather_to_host(arr) -> np.ndarray:
    """Gather a (possibly sharded) array to every host as numpy."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr))
