"""Lateral groundwater flow: halo-exchange stencil on the lon/lat grid.

NEW capability beyond the reference (the BASELINE target names "halo
exchange for lateral/routed flow overlapped with per-column stencil
compute"; the reference has no inter-cell physics).  Complementing the
D8 river routing (routing.py), this module moves *groundwater* between
4-neighbour cells down water-table head gradients, Darcy style:

    head  h = z_surf - 1000 * zwt                       (mm)
    q_e   = k_lat * (h_i - h_j)                         (mm/day), edge e

The default k_lat = 1e-6/day is sized for continental relief: head
differences reach ~1e6 mm, so per-edge fluxes are ~1 mm/day — the
magnitude of real large-scale groundwater convergence.  Larger values
drain donor aquifers unphysically fast.

Fluxes are computed in flux form on the dense [ny, nx] grid with
``jnp.roll`` neighbour shifts — under a 2-D ``NamedSharding`` of the
grid axes XLA lowers the rolls to collective-permutes, i.e. genuine
halo exchanges between the devices owning adjacent blocks.  Each cell's
total outflow is limited to its available aquifer store with a scale
factor applied per directed edge, so conservation is exact even at the
limiter.  Longitude wraps; fluxes across the polar wrap row are masked.

The daily step costs one scatter + one 4-point stencil + one gather —
negligible next to the 48 hydrology substeps it overlaps with.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class LateralParams(NamedTuple):
    land_flat_idx: jnp.ndarray   # [n_land] flat indices into ny*nx
    land_mask: jnp.ndarray       # [ny, nx] bool
    z_surf: jnp.ndarray          # [ny, nx] surface elevation      (mm)
    k_lat: float = 1.0e-6        # Exchange coefficient            (/day)
    n_padded: int = 0


def make_lateral_params(land_grid, elevation_m=None,
                        k_lat: float = 1.0e-6) -> LateralParams:
    """Build LateralParams from a LandGrid (+ optional elevation in m)."""
    import numpy as np

    from ..grids.routing import synthetic_elevation

    mask = np.zeros(land_grid.ny * land_grid.nx, bool)
    mask[land_grid.land_idx] = True
    mask = mask.reshape(land_grid.ny, land_grid.nx)
    if elevation_m is None:
        elevation_m = synthetic_elevation(mask)
    return LateralParams(
        land_flat_idx=jnp.asarray(land_grid.land_idx),
        land_mask=jnp.asarray(mask),
        z_surf=jnp.asarray(elevation_m * 1000.0, jnp.float32),
        k_lat=k_lat,
        n_padded=land_grid.n_padded,
    )


def lateral_groundwater_step(wa: jnp.ndarray, zwt: jnp.ndarray,
                             p: LateralParams
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One daily lateral-exchange step on the packed aquifer store.

    Args:
      wa: ``[n_padded]`` aquifer water (mm).
      zwt: ``[n_padded]`` water-table depth (m).
    Returns ``(wa_new, net_gain)`` both ``[n_padded]`` (mm); the sum of
    ``net_gain`` over land is exactly 0.
    """
    ny, nx = p.land_mask.shape
    size = ny * nx
    n_land = p.land_flat_idx.shape[0]

    # Scatter packed fields onto the dense grid.
    wa_g = jnp.zeros(size, wa.dtype).at[p.land_flat_idx].set(
        wa[:n_land]).reshape(ny, nx)
    zwt_g = jnp.zeros(size, zwt.dtype).at[p.land_flat_idx].set(
        zwt[:n_land]).reshape(ny, nx)
    head = jnp.where(p.land_mask, p.z_surf - 1000.0 * zwt_g, 0.0)

    # Directed outflow on the 4 edges; rolls become halo exchanges under
    # 2-D grid sharding.  Edge valid only between two land cells; the
    # latitude wrap row (pole) is masked.
    lat_ids = jnp.arange(ny)[:, None]
    not_top = lat_ids > 0
    not_bot = lat_ids < ny - 1

    def edge(shift, axis, valid_extra):
        nb_head = jnp.roll(head, shift, axis)
        nb_land = jnp.roll(p.land_mask, shift, axis)
        valid = p.land_mask & nb_land & valid_extra
        out = jnp.where(valid, p.k_lat * jnp.maximum(head - nb_head, 0.0),
                        0.0)
        return out

    out_e = edge(-1, 1, True)
    out_w = edge(1, 1, True)
    out_n = edge(1, 0, not_top)     # roll +1 on lat brings row above
    out_s = edge(-1, 0, not_bot)

    total_out = out_e + out_w + out_n + out_s
    # Limit outflow to the available store; scale all four edges alike so
    # antisymmetry (and hence conservation) is preserved.
    avail = jnp.maximum(wa_g, 0.0)
    scale = jnp.where(total_out > 0.0,
                      jnp.minimum(1.0, avail / jnp.maximum(total_out,
                                                           1e-30)),
                      0.0)
    out_e, out_w, out_n, out_s = (out_e * scale, out_w * scale,
                                  out_n * scale, out_s * scale)
    total_out = out_e + out_w + out_n + out_s

    # Inflow = neighbours' outflow toward us (reverse shifts).
    inflow = (jnp.roll(out_e, 1, 1) + jnp.roll(out_w, -1, 1)
              + jnp.roll(out_n, -1, 0) + jnp.roll(out_s, 1, 0))
    inflow = jnp.where(p.land_mask, inflow, 0.0)

    net = inflow - total_out
    wa_new_g = wa_g + net

    # Gather back to the packed axis (padding cells unchanged).
    flat_new = wa_new_g.reshape(-1)[p.land_flat_idx]
    flat_net = net.reshape(-1)[p.land_flat_idx]
    wa_new = wa.at[:n_land].set(flat_new)
    net_gain = jnp.zeros_like(wa).at[:n_land].set(flat_net)
    return wa_new, net_gain
