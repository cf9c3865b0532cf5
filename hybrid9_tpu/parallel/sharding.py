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

    def block_spec(self, leaf) -> NamedSharding:
        """Sharding for a [days, n, ...] forcing block (cells = axis 1)."""
        ndim = np.ndim(leaf)
        return NamedSharding(self.mesh,
                             P(None, self.axis, *([None] * (ndim - 2))))

    def put(self, pytree):
        """Device-put a host pytree with cell-axis sharding.

        Single-process: a plain ``device_put``.  Multi-host: each process
        contributes only its own slab of the cell axis and the global
        array is assembled with ``jax.make_array_from_process_local_data``
        — no host holds (or transfers) the full array, the same ownership
        pattern as the reference's per-rank tiles (INIT.f90:271-284).
        """
        if jax.process_count() == 1:
            return jax.device_put(pytree, self.state_sharding(pytree))
        from .launch import host_shard_bounds

        def one(x):
            spec = self.spec_for(x)
            if isinstance(x, jax.Array) and x.sharding == spec:
                # Already a correctly-sharded global array (e.g. a
                # sharded checkpoint restore): np.asarray would fail on
                # the non-addressable shards, and no data needs to move.
                return x
            x = np.asarray(x)
            if x.ndim == 0:
                return jax.make_array_from_process_local_data(
                    spec, x, x.shape)
            lo, hi = host_shard_bounds(x.shape[0])
            return jax.make_array_from_process_local_data(
                spec, x[lo:hi], x.shape)

        return jax.tree_util.tree_map(one, pytree)

    def put_block(self, pytree):
        """Device-put ``[days, n, ...]`` blocks (cells = axis 1).

        The block-axis counterpart of :meth:`put`, for stacked forcing /
        observation records consumed by the auxiliary drivers
        (assimilate/calibrate).  Multi-host: each process contributes
        its own cell-slab columns (``x[:, lo:hi]``), mirroring the
        per-host forcing reads; already-sharded global arrays (e.g.
        from ``HostShardedProvider``) pass through untouched.
        """
        if jax.process_count() == 1:
            return jax.tree_util.tree_map(
                lambda x: (x if (isinstance(x, jax.Array)
                                 and x.sharding == self.block_spec(x))
                           else jax.device_put(x, self.block_spec(x))),
                pytree)
        from .launch import host_shard_bounds

        def one(x):
            spec = self.block_spec(x)
            if isinstance(x, jax.Array) and x.sharding == spec:
                return x
            x = np.asarray(x)
            lo, hi = host_shard_bounds(x.shape[1])
            return jax.make_array_from_process_local_data(
                spec, x[:, lo:hi], x.shape)

        return jax.tree_util.tree_map(one, pytree)

    def host_local(self, arr) -> np.ndarray:
        """This process's contiguous slab of a cell-sharded global array.

        Inverse of :meth:`put` for output: shards addressable by this
        process, concatenated in cell order.  Single-process, the whole
        array.
        """
        if jax.process_count() == 1:
            return np.asarray(arr)
        shards = sorted(arr.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards],
                              axis=0)

    def check_divisible(self, n: int) -> None:
        if n % self.n_devices != 0:
            raise ValueError(
                f"packed cell count {n} not divisible by device count "
                f"{self.n_devices}; raise Config.cell_block")
