"""Lateral routed flow: daily linear-reservoir river routing.

NEW capability beyond the reference (SURVEY.md C14: the reference has no
inter-cell physics; lateral/routed flow is a build goal from
BASELINE.json).  Each cell carries a river store S (mm over the cell);
every day it receives the cell's own runoff (surface + baseflow, the
``rnf_day`` diagnostic) plus the previous day's outflow of its upstream
neighbours, and releases ``k * S`` downstream:

    out_i   = k * S_i
    S_i'    = S_i + local_i + sum_{j: down(j)=i} out_j - out_i

The one-day lag on inter-cell transfer makes the update order-free — a
single segment-sum over the downstream-index map (grids/routing.py), with
no topological sort.  Under a sharded cell axis the segment-sum lowers to
XLA collectives, the GSPMD analog of a halo exchange; water leaving the
network at ocean outlets is the discharge diagnostic.  Mass is conserved
exactly: sum(S') - sum(S) = sum(local) - discharge.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RoutingParams(NamedTuple):
    downstream: jnp.ndarray   # [n] int32 packed downstream index; n=outlet
    k: float = 0.2            # Linear-reservoir release fraction per day.


def route_daily(store: jnp.ndarray, local_runoff_mm: jnp.ndarray,
                routing: RoutingParams
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One daily routing step.

    Args:
      store: ``[n]`` river store (mm).
      local_runoff_mm: ``[n]`` the day's local runoff (mm).
      routing: downstream map and release coefficient.

    Returns ``(new_store, discharge)`` where ``discharge`` is the ``[n]``
    water delivered to the ocean outlet by each cell this day (mm; only
    outlet-draining cells are nonzero).
    """
    n = store.shape[0]
    out = routing.k * store
    # Inflow from upstream neighbours; index n is the ocean outlet bucket.
    inflow_all = jax.ops.segment_sum(out, routing.downstream,
                                     num_segments=n + 1)
    inflow = inflow_all[:n]
    new_store = store + local_runoff_mm + inflow - out
    to_ocean = routing.downstream >= n
    discharge = jnp.where(to_ocean, out, 0.0)
    return new_store, discharge
