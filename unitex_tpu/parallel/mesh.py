"""Device-mesh construction.

The reference scales with NCCL DDP through HF accelerate
(/root/reference/flux_piplines/texturing/trainer.py:262-266,
TSD_SR/basicsr/utils/dist_util.py:10-77).  The TPU-native equivalent is a
``jax.sharding.Mesh`` with a data axis (batch/views) and a model axis
(tensor parallelism over attention heads / MLP columns); XLA inserts the
all-reduce/all-gather collectives over ICI from the NamedSharding
annotations.  On a v5e-8 the default inference layout is (data=1, model=8)
so the 12B FLUX weights shard to ~3 GB/chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: int = -1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names=("data", "model"),
) -> Mesh:
    """Create a (data, model) mesh.  ``model=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model == -1:
        assert n % data == 0, f"{n} devices not divisible by data={data}"
        model = n // data
    assert data * model <= n, f"mesh {data}x{model} needs {data*model} devices, have {n}"
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names)
