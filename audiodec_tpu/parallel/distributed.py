"""Multi-host (multi-process) runtime support.

The reference is strictly single-process/single-device (ref bin/train.py:39-50
picks one cpu/cuda device; slurm requests one GPU).  Multi-host batch
transcode is a new TPU-native capability (SURVEY.md §2.1): utterance batches
shard over the 'data' mesh axis across hosts, and long utterances shard their
time axis over 'seq' with chunk-halo `ppermute`s that ride ICI within a host
and DCN across hosts.  This module owns the process bootstrap and the
host-local <-> global array plumbing; the math lives in parallel/codec.py and
is mesh-topology agnostic.

Bootstrap contract (mirrors jax.distributed):
  every participating process calls `init_distributed(coordinator, nprocs,
  pid)` before any other JAX API touches the backend.  On TPU pods the three
  values come from the TPU metadata server and may all be None; on CPU/GSPMD
  test rigs they are passed explicitly (see tools/multihost_probe.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Join the multi-process JAX runtime.

    With all-None arguments this defers to the environment (TPU pod metadata /
    JAX_COORDINATOR_ADDRESS etc.); explicit values are for CPU test rigs and
    manual launches.  Must run before the backend is initialized.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id,
                      # Gloo's default 60s rendezvous window times out on
                      # heavily loaded CPU rigs (N python processes cold-
                      # starting jax concurrently); a longer window removes
                      # the need for launch retries
                      initialization_timeout=300)
    jax.distributed.initialize(**kwargs)


def global_mesh(data: int = -1, seq: int = 1) -> Mesh:
    """('data','seq') mesh over ALL processes' devices.

    Device order is jax.devices() (process-major), so contiguous 'seq' groups
    stay within one host where possible — halo `ppermute`s then ride
    intra-host links and only the seam between hosts crosses DCN.
    """
    devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % seq == 0, f"{n} devices not divisible by seq={seq}"
        data = n // seq
    assert data * seq == n, (
        f"multi-host mesh must use every device: {data}x{seq} != {n}")
    return Mesh(np.array(devices).reshape(data, seq), ("data", "seq"))


def host_local_to_global(mesh: Mesh, spec: P, local: np.ndarray) -> jax.Array:
    """Assemble per-process host-local data into one global jax.Array.

    `local` holds this process's rows of the sharded axes (e.g. its slice of
    the utterance batch); the result is a global array laid out by `spec`
    whose addressable shards are exactly this process's data.
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local)


def global_to_host_local(arr: jax.Array) -> np.ndarray:
    """Fetch the full value of a (possibly multi-host-sharded) array onto
    every process.  Cross-host shards travel over the distributed runtime."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def host_local_rows(arr: jax.Array) -> tuple:
    """Stitch this process's addressable shards of a batch-sharded global
    array into its contiguous block of rows.

    Returns (row_offset, block): `block` is a numpy array of the rows this
    process owns (mesh laid out process-major, so the block is contiguous);
    no cross-host traffic.
    """
    by_row = {}
    for s in arr.addressable_shards:
        r0 = s.index[0].start or 0
        c0 = (s.index[1].start or 0) if arr.ndim > 1 else 0
        by_row.setdefault(r0, {})[c0] = np.asarray(s.data)
    lo = min(by_row)
    rows = []
    for r0 in sorted(by_row):
        parts = by_row[r0]
        rows.append(np.concatenate([parts[c] for c in sorted(parts)], axis=1)
                    if len(parts) > 1 else next(iter(parts.values())))
    return lo, np.concatenate(rows, axis=0)


def process_shard(items: Sequence, pid: Optional[int] = None,
                  nprocs: Optional[int] = None) -> list:
    """Strided split of a work list across processes (file-level data
    parallelism for independent per-host work, e.g. output wav writing)."""
    pid = jax.process_index() if pid is None else pid
    nprocs = jax.process_count() if nprocs is None else nprocs
    return list(items[pid::nprocs])
