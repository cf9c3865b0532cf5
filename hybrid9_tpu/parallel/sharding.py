"""Device-mesh construction and cell-axis sharding.

TPU-native replacement for the reference's static sqrt(P) x sqrt(P) MPI
domain decomposition (SOURCE/INIT.f90:266-284, 424-467): instead of
carving the (lon, lat) grid into per-rank tiles (leaving ocean-heavy ranks
idle), we shard the packed land-cell axis across a 1-D ``jax.sharding``
mesh — perfect load balance by construction, and GSPMD inserts the (zero)
compute-phase collectives.  Cross-cell reductions for global diagnostics
use ``psum``-style reductions that XLA maps onto ICI (SURVEY.md C13).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class CellSharding:
    """1-D sharding of the packed land-cell axis over all devices."""

    mesh: Mesh
    axis: str = "cells"

    @classmethod
    def create(cls, devices: Optional[Sequence[jax.Device]] = None,
               axis: str = "cells") -> "CellSharding":
        devices = list(devices) if devices is not None else jax.devices()
        mesh = Mesh(np.asarray(devices), (axis,))
        return cls(mesh=mesh, axis=axis)

    @property
    def n_devices(self) -> int:
        return self.mesh.size

    def spec_for(self, leaf) -> NamedSharding:
        """Shard the leading (cell) axis; replicate scalars."""
        ndim = np.ndim(leaf)
        if ndim == 0:
            return NamedSharding(self.mesh, P())
        return NamedSharding(self.mesh,
                             P(self.axis, *([None] * (ndim - 1))))

    def state_sharding(self, pytree):
        """A sharding pytree matching ``pytree`` (cell axis sharded)."""
        return jax.tree_util.tree_map(self.spec_for, pytree)

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def put(self, pytree):
        """Device-put a host pytree with cell-axis sharding."""
        return jax.device_put(pytree, self.state_sharding(pytree))

    def check_divisible(self, n: int) -> None:
        if n % self.n_devices != 0:
            raise ValueError(
                f"packed cell count {n} not divisible by device count "
                f"{self.n_devices}; raise Config.cell_block")
