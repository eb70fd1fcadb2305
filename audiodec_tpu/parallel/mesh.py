"""Device mesh helpers for data x sequence parallelism (SURVEY.md §2.1, §7).

The canonical mesh is Mesh(devices, ('data', 'seq')): utterance batches shard
over 'data', long utterances shard their time axis over 'seq' with
receptive-field halo exchange (audiodec_tpu.parallel.codec).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int = -1, seq: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ('data', 'seq') mesh.  data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % seq == 0, f"{n} devices not divisible by seq={seq}"
        data = n // seq
    assert data * seq <= n, f"mesh {data}x{seq} > {n} devices"
    arr = np.array(devices[: data * seq]).reshape(data, seq)
    return Mesh(arr, ("data", "seq"))
