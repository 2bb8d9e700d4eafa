"""Device mesh construction for amplitude sharding."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "amp") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (must be a power of
    two — the shard count maps onto the top log2(D) qubit index bits)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = 1 << (len(devices).bit_length() - 1)  # largest power of two
    if n_devices & (n_devices - 1):
        raise ValueError(f"n_devices must be a power of two, got {n_devices}")
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    import numpy as np

    return Mesh(np.array(devices[:n_devices]), (axis,))
