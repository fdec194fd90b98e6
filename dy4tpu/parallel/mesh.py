"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

CH_AXIS = "ch"
TIME_AXIS = "time"


def make_mesh(ch: int = 1, time: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(ch, time)`` mesh over ``ch*time`` devices.

    ``ch`` is the channel data-parallel axis; ``time`` the stream
    (sequence-parallel) axis.  Halo collectives ride neighbouring devices on
    the ``time`` axis, so it should map to physically adjacent chips (ICI);
    JAX's default device order on a TPU slice already gives that for the
    minor-most axis, which is why ``time`` is minor here.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = ch * time
    if len(devs) < n:
        raise ValueError(f"need {n} devices for mesh ({ch},{time}); "
                         f"have {len(devs)}")
    grid = np.array(devs[:n]).reshape(ch, time)
    return Mesh(grid, (CH_AXIS, TIME_AXIS))
