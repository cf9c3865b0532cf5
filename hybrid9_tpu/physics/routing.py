"""Lateral routed flow: river routing over the D8 network.

NEW capability beyond the reference (SURVEY.md C14: the reference has no
inter-cell physics; lateral/routed flow is a build goal from
BASELINE.json).  Each cell carries a river store S (mm over the cell)
that receives the cell's own runoff (surface + baseflow, the ``rnf_day``
diagnostic) plus inflow from upstream neighbours, and releases water
downstream.  Three schemes, in increasing fidelity:

1. **Daily linear reservoir** (``route_daily``): out = k * S once per
   day.  The one-day lag on inter-cell transfer makes the update
   order-free — a single segment-sum over the downstream-index map
   (grids/routing.py), no topological sort.  Simple, but water moves at
   most one cell per day, so continental travel times are wrong at high
   resolution — which is why the kinematic wave is the production
   default since r5 (Config.routing_scheme; measured cost in
   DEVIATIONS.md "routing default").

2. **Sub-daily kinematic wave** (``route_kinematic_day``): ``n_substeps``
   transfer steps per day with a storage-dependent wave celerity

       c_i = clip(c0 * (S_i / s_ref)^beta, c_min, c_max)   (m/s)
       f_i = min(1, c_i * dt_r / L_i)                      per substep
       out_i = f_i * S_i

   where L_i is the physical D8 hop length (grids/routing.py
   flow_length_m).  Water traverses up to ``n_substeps`` cells per day
   at a resolution-independent physical speed, and the celerity rises
   with storage as in kinematic-wave theory (c = dQ/dA; beta ~ 0.6 for
   Manning channels).  f <= 1 is the CFL bound, so the scheme is
   unconditionally stable and exactly conservative.

3. **Variable-parameter Muskingum-Cunge** (``route_muskingum_day``):
   per-reach channel geometry (DEM slope, drainage-area-scaled width)
   sets a Manning kinematic celerity and a Cunge weighting X per reach
   per substep; outflow comes from the Muskingum storage relation.
   Adds physical wave attenuation (diffusion) on top of translation.

Both are order-free segment-sums over the downstream map; under a
sharded cell axis XLA lowers them to collectives, the GSPMD analog of a
halo exchange.  ``route_kinematic_day_grid`` is the same kinematic step
in dense [ny, nx] form with ``jnp.roll`` neighbour shifts — under a 2-D
``NamedSharding`` of the grid the rolls become collective-permutes,
i.e. true ICI halo exchanges between devices owning adjacent blocks.
Mass is conserved exactly in every scheme:
sum(S') - sum(S) = sum(local) - discharge.
"""

from __future__ import annotations

import dataclasses
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
    # A store in reclaim deficit (negative, see route_kinematic_day's
    # contract) releases nothing.
    out = routing.k * jnp.maximum(store, 0.0)
    # Inflow from upstream neighbours; index n is the ocean outlet bucket.
    inflow_all = jax.ops.segment_sum(out, routing.downstream,
                                     num_segments=n + 1)
    inflow = inflow_all[:n]
    # (store - out) first: out = k*store <= store in f32, so every
    # partial sum is a rounding of a non-negative real and the store
    # cannot round one ulp below zero (r5 fix, see route_kinematic_day).
    new_store = (store - out) + local_runoff_mm + inflow
    to_ocean = routing.downstream >= n
    discharge = jnp.where(to_ocean, out, 0.0)
    return new_store, discharge


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KinematicParams:
    """Sub-daily kinematic-wave routing parameters.

    Array fields are pytree data; the scalars are static metadata so
    ``n_substeps`` can drive a ``lax.scan`` length under jit.
    """

    downstream: jnp.ndarray           # [n] int32 packed downstream index
    flow_length: jnp.ndarray          # [n] D8 hop length (m)
    n_substeps: int = dataclasses.field(default=8,
                                        metadata=dict(static=True))
    c0: float = dataclasses.field(default=0.8,      # ref celerity (m/s)
                                  metadata=dict(static=True))
    s_ref: float = dataclasses.field(default=20.0,  # ref store (mm)
                                     metadata=dict(static=True))
    beta: float = dataclasses.field(default=0.6,    # celerity exponent
                                    metadata=dict(static=True))
    c_min: float = dataclasses.field(default=0.05,  # m/s
                                     metadata=dict(static=True))
    c_max: float = dataclasses.field(default=3.0,   # m/s
                                     metadata=dict(static=True))


def _celerity_fraction(store, flow_length, dt_r, c0, s_ref, beta, c_min,
                       c_max):
    """CFL-bounded per-substep transfer fraction f = min(1, c dt / L)."""
    s = jnp.maximum(store, 0.0) / s_ref
    c = jnp.clip(c0 * jnp.power(s + 1e-12, beta), c_min, c_max)
    return jnp.minimum(1.0, c * dt_r / flow_length)


def route_kinematic_day(store: jnp.ndarray, local_runoff_mm: jnp.ndarray,
                        p: KinematicParams
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One day of sub-daily kinematic-wave routing.

    Args:
      store: ``[n]`` river store (mm).
      local_runoff_mm: ``[n]`` the day's local runoff (mm), injected
        evenly across the substeps.
      p: network + wave parameters.

    Returns ``(new_store, discharge)``; ``discharge`` is the ``[n]``
    water delivered to the ocean outlet by each cell over the day (mm).

    ``local_runoff_mm`` may be slightly NEGATIVE on drainage-fixup days
    (the reference takes unmet soil deficits back out of drainage,
    HYDROLOGY.f90:1204-1211); the router conserves that by debiting the
    store, which may therefore carry a transient micro-negative balance
    (observed < 3e-3 mm) until runoff returns.  All routers here share
    that contract.
    """
    n = store.shape[0]
    dt_r = 86400.0 / p.n_substeps
    local_sub = local_runoff_mm / p.n_substeps
    to_ocean = p.downstream >= n

    def substep(carry, _):
        s, dis = carry
        out = _celerity_fraction(s, p.flow_length, dt_r, p.c0, p.s_ref,
                                 p.beta, p.c_min, p.c_max) \
            * jnp.maximum(s, 0.0)
        inflow = jax.ops.segment_sum(out, p.downstream,
                                     num_segments=n + 1)[:n]
        # (s - out) first: out <= s in f32, so every partial sum is a
        # rounding of a non-negative real — the store cannot round one
        # ulp below zero the way s + local + inflow - out can when the
        # true result is ~0 (r5 fix; the invariant soaks check >= 0).
        s = (s - out) + local_sub + inflow
        dis = dis + jnp.where(to_ocean, out, 0.0)
        return (s, dis), None

    (store, discharge), _ = jax.lax.scan(
        substep, (store, jnp.zeros_like(store)), None,
        length=p.n_substeps)
    return store, discharge


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MuskingumParams:
    """Variable-parameter Muskingum-Cunge routing with per-reach geometry.

    The fidelity step above the celerity-law kinematic wave: each reach
    carries its own channel slope (from the DEM drop,
    grids/routing.py reach_slope), bankfull width (from drainage-area
    hydraulic geometry, flow_accumulation + bankfull_width_m) and hop
    length, and the Cunge weighting X is diagnosed per reach per substep
    from the local hydraulic state, so flood waves both translate (at the
    Manning kinematic celerity) and attenuate (X < 0.5) as in the full
    diffusive-wave limit.
    """

    downstream: jnp.ndarray           # [n] int32 packed downstream index
    flow_length: jnp.ndarray          # [n] D8 hop length (m)
    slope: jnp.ndarray                # [n] channel slope (-)
    width: jnp.ndarray                # [n] bankfull width (m)
    cell_area: jnp.ndarray            # [n] cell area (m^2)
    n_substeps: int = dataclasses.field(default=8,
                                        metadata=dict(static=True))
    n_manning: float = dataclasses.field(default=0.035,  # channel Manning
                                         metadata=dict(static=True))
    c_min: float = dataclasses.field(default=0.05,       # m/s
                                     metadata=dict(static=True))
    c_max: float = dataclasses.field(default=5.0,        # m/s
                                     metadata=dict(static=True))


def route_muskingum_day(store: jnp.ndarray, local_runoff_mm: jnp.ndarray,
                        p: MuskingumParams
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One day of variable-parameter Muskingum-Cunge routing.

    Per substep, per reach: channel depth from storage over the w x L
    rectangular channel; Manning velocity v = h^(2/3) sqrt(S0) / n;
    kinematic celerity c = (5/3) v; travel time K = L / c; Cunge
    weighting X = 1/2 (1 - q / (S0 c L)) with unit discharge q = v h
    (Cunge 1969, the Muskingum parameters matched to the diffusive
    wave).  Outflow from the Muskingum storage relation
    S = K [X I + (1-X) O]  =>  O = (S/K - X I) / (1 - X), with the
    inflow I estimated by a same-substep kinematic pass (order-free —
    no topological sort), then clipped to [0, S] so the storage update
    S' = S + local + inflow - out is exactly conservative and
    positivity-preserving.  X -> 0 recovers the linear reservoir with
    physical travel time; X -> 1/2 recovers pure translation.

    Returns ``(new_store, discharge)``; ``discharge`` is the ``[n]``
    water delivered to the ocean outlet by each cell over the day (mm).
    """
    n = store.shape[0]
    dt_r = 86400.0 / p.n_substeps
    local_sub = local_runoff_mm / p.n_substeps
    to_ocean = p.downstream >= n
    # Guard against slope == 0 from direct MuskingumParams constructors
    # (grids/routing.py reach_slope already floors at 1e-5, but a flat
    # reach with an empty store would otherwise produce 0/0 in x_w).
    slope = jnp.maximum(p.slope, 1.0e-6)
    sqrt_s0 = jnp.sqrt(slope)

    def substep(carry, _):
        s, dis = carry
        k_t, x_w = _mc_hydraulics(s, p.flow_length, p.width,
                                  p.cell_area, slope, sqrt_s0,
                                  p.n_manning, p.c_min, p.c_max)
        # Pass 1: kinematic outflow estimate -> same-substep inflow.
        out_kin = jnp.minimum(1.0, dt_r / k_t) * s
        i_rate = (jax.ops.segment_sum(out_kin, p.downstream,
                                      num_segments=n + 1)[:n]
                  + local_sub) / dt_r                        # mm/s
        # Pass 2: Muskingum storage relation, conservative clip.
        o_rate = (s / k_t - x_w * i_rate) / (1.0 - x_w)      # mm/s
        out = jnp.clip(o_rate * dt_r, 0.0, jnp.maximum(s, 0.0))
        inflow = jax.ops.segment_sum(out, p.downstream,
                                     num_segments=n + 1)[:n]
        # (s - out) first keeps the store non-negative in f32 (see
        # route_kinematic_day).
        s = (s - out) + local_sub + inflow
        dis = dis + jnp.where(to_ocean, out, 0.0)
        return (s, dis), None

    (store, discharge), _ = jax.lax.scan(
        substep, (store, jnp.zeros_like(store)), None,
        length=p.n_substeps)
    return store, discharge


def _mc_hydraulics(s, length, width, area, slope, sqrt_s0, n_manning,
                   c_min, c_max):
    """Per-reach Muskingum-Cunge hydraulic state from storage.

    One definition shared by the packed ([n]) and dense ([ny, nx])
    forms so the hydraulics can never diverge between them: channel
    depth from storage over the w x L rectangular channel; Manning
    velocity v = h^(2/3) sqrt(S0) / n; kinematic celerity c = (5/3) v;
    travel time K = L / c; Cunge weighting X = 1/2 (1 - q / (S0 c L))
    with unit discharge q = v h (Cunge 1969).  Returns ``(k_t, x_w)``.
    """
    vol = jnp.maximum(s, 0.0) * 1.0e-3 * area                # mm -> m^3
    h = jnp.maximum(vol / (width * length), 1.0e-4)          # m
    v = jnp.power(h, 2.0 / 3.0) * sqrt_s0 / n_manning        # m/s
    cel = jnp.clip(5.0 / 3.0 * v, c_min, c_max)
    k_t = length / cel                                       # s
    x_w = jnp.clip(0.5 * (1.0 - (v * h) / (slope * cel * length)),
                   0.0, 0.5)
    return k_t, x_w


# D8 offsets (dy, dx) — must match grids/routing.py _D8 order.
_D8 = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0),
       (1, 1))


def _d8_inflow(out, masks):
    """Dense D8 inflow stencil: cells with direction code k send ``out``
    to the (dy, dx) neighbour, i.e. shift their (mask-selected) outflow
    by (+dy, +dx).  ``masks[k]`` are the loop-invariant f32 direction
    weights (hoisted by the callers; see route_kinematic_day_grid).
    Under a sharded [ny, nx] layout each roll lowers to a
    collective-permute halo exchange."""
    inflow = jnp.zeros_like(out)
    for k, (dy, dx) in enumerate(_D8):
        inflow = inflow + jnp.roll(jnp.roll(masks[k] * out, dy, 0),
                                   dx, 1)
    return inflow


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridKinematicParams:
    """Dense-grid (halo-exchange) form of the kinematic-wave router.

    ``dir_code[ny, nx]``: 0..7 = index into the D8 offset table of the
    draining direction, 8 = drains to the ocean outlet, -1 = ocean (from
    grids/routing.py direction_codes).  Under a 2-D ``NamedSharding`` of
    (lat, lon) the per-direction ``jnp.roll``s lower to
    collective-permutes — genuine halo exchanges over ICI.
    """

    dir_code: jnp.ndarray             # [ny, nx] int32
    flow_length: jnp.ndarray          # [ny, nx] hop length (m)
    n_substeps: int = dataclasses.field(default=8,
                                        metadata=dict(static=True))
    c0: float = dataclasses.field(default=0.8,
                                  metadata=dict(static=True))
    s_ref: float = dataclasses.field(default=20.0,
                                     metadata=dict(static=True))
    beta: float = dataclasses.field(default=0.6,
                                    metadata=dict(static=True))
    c_min: float = dataclasses.field(default=0.05,
                                     metadata=dict(static=True))
    c_max: float = dataclasses.field(default=3.0,
                                     metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridMuskingumParams:
    """Dense-grid (halo-exchange) form of the Muskingum-Cunge router.

    The per-reach geometry fields of :class:`MuskingumParams` scattered
    onto the [ny, nx] grid (ocean/fill cells carry harmless defaults —
    they are masked out of every flux by the direction codes).  Same
    hydraulics as :func:`route_muskingum_day`; the two per-substep
    inflow passes ride the roll stencil instead of segment-sums, so the
    premium router runs at the dense form's speed on one chip and its
    halos are collective-permutes under a sharded mesh.
    """

    dir_code: jnp.ndarray             # [ny, nx] int32 (0..7, 8=ocean,
                                      # -1 = not land)
    flow_length: jnp.ndarray          # [ny, nx] D8 hop length (m)
    slope: jnp.ndarray                # [ny, nx] channel slope (-)
    width: jnp.ndarray                # [ny, nx] bankfull width (m)
    cell_area: jnp.ndarray            # [ny, nx] cell area (m^2)
    n_substeps: int = dataclasses.field(default=8,
                                        metadata=dict(static=True))
    n_manning: float = dataclasses.field(default=0.035,
                                         metadata=dict(static=True))
    c_min: float = dataclasses.field(default=0.05,
                                     metadata=dict(static=True))
    c_max: float = dataclasses.field(default=5.0,
                                     metadata=dict(static=True))


def route_muskingum_day_grid(store: jnp.ndarray, local_mm: jnp.ndarray,
                             p: GridMuskingumParams
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense [ny, nx] Muskingum-Cunge day step via roll halo exchanges.

    Semantically identical to :func:`route_muskingum_day` on the same
    network (same per-reach hydraulics, Cunge weighting and conservative
    clip; equivalence pinned in tests/test_routing.py).  Masks are
    hoisted out of the scan as f32 weights for the same reason as the
    kinematic form.
    """
    land = p.dir_code >= 0
    dt_r = 86400.0 / p.n_substeps
    local_sub = jnp.where(land, local_mm / p.n_substeps, 0.0)
    masks = [(p.dir_code == k).astype(store.dtype) for k in range(8)]
    landf = land.astype(store.dtype)
    oceanf = (p.dir_code == 8).astype(store.dtype)
    # Fill-cell sanitisation (hoisted, loop-invariant): ocean/fill
    # positions never contribute (masked by landf/masks), but the
    # mask-MULTIPLY algebra needs their hydraulic intermediates finite —
    # 0 * NaN is NaN and one NaN rolls into a land neighbour's inflow.
    # On LAND cells the values pass through untouched so the packed
    # equivalence is exact; the slope floor matches the packed form.
    slope = jnp.where(land, jnp.maximum(p.slope, 1.0e-6), 1.0e-3)
    sqrt_s0 = jnp.sqrt(slope)
    length = jnp.where(land, p.flow_length, 1.0)
    width = jnp.where(land, p.width, 1.0)
    area = jnp.where(land, p.cell_area, 1.0)

    def substep(carry, _):
        s, dis = carry
        k_t, x_w = _mc_hydraulics(s, length, width, area, slope,
                                  sqrt_s0, p.n_manning, p.c_min,
                                  p.c_max)
        # Pass 1: kinematic outflow estimate -> same-substep inflow.
        out_kin = landf * jnp.minimum(1.0, dt_r / k_t) * s
        i_rate = (_d8_inflow(out_kin, masks) + local_sub) / dt_r
        # Pass 2: Muskingum storage relation, conservative clip.
        o_rate = (s / k_t - x_w * i_rate) / (1.0 - x_w)      # mm/s
        out = landf * jnp.clip(o_rate * dt_r, 0.0, jnp.maximum(s, 0.0))
        inflow = _d8_inflow(out, masks)
        # (s - out) first keeps the store non-negative in f32 (see
        # route_kinematic_day).
        s = (s - out) + local_sub + landf * inflow
        dis = dis + oceanf * out
        return (s, dis), None

    (store, discharge), _ = jax.lax.scan(
        substep, (store, jnp.zeros_like(store)), None,
        length=p.n_substeps)
    return store, discharge


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridRouting:
    """Production (packed-axis) wrapper around the dense halo router.

    Selected by ``Config.routing_form = "grid"`` (or the "auto"
    default): the day's packed ``[n]`` runoff is scattered onto the
    dense ``[ny, nx]`` grid, routed by :func:`route_kinematic_day_grid`
    or :func:`route_muskingum_day_grid` (by the type of ``params``;
    their per-direction rolls lower to collective-permute halo
    exchanges under a 2-D or row sharding), and the updated
    store/discharge are gathered back to the packed axis.  The scatter/gather pair is the one resharding per day between
    the 1-D cell sharding and the dense grid layout.

    ``flat_idx[n]``: flattened ``ny*nx`` grid index of each packed lane;
    padding lanes carry an out-of-range index (``ny*nx``) so the
    mode="drop" scatter discards them (no dump cell — safe even on an
    all-land grid) and the gather-back clamp is masked by ``n_land``.  ``dense_sharding`` (optional, static) pins the dense
    intermediates' layout so the halos actually cross shard boundaries
    instead of GSPMD replicating the grid.
    """

    params: object                    # GridKinematicParams | GridMuskingumParams
    flat_idx: jnp.ndarray             # [n] int32 flattened grid index
    n_land: int = dataclasses.field(default=0,
                                    metadata=dict(static=True))
    ny: int = dataclasses.field(default=0, metadata=dict(static=True))
    nx: int = dataclasses.field(default=0, metadata=dict(static=True))
    dense_sharding: object = dataclasses.field(
        default=None, metadata=dict(static=True))


def route_grid_day(store: jnp.ndarray, local_runoff_mm: jnp.ndarray,
                   r: GridRouting) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One day of halo-exchange routing on the packed axis.

    Scatter packed -> dense, run the roll/ppermute kinematic router,
    gather dense -> packed.  Semantics match
    :func:`route_kinematic_day` on the same network (same topology and
    celerity law; tests/test_routing.py equivalence).
    """
    lane = jnp.arange(store.shape[0])
    real = lane < r.n_land
    s_m = jnp.where(real, store, 0.0)
    l_m = jnp.where(real, local_runoff_mm, 0.0)
    nyx = r.ny * r.nx
    # One 2-channel scatter instead of two: TPU scatters pay per-op
    # overhead, and store/runoff share the same index vector.
    stacked = jnp.zeros((nyx, 2), store.dtype).at[r.flat_idx].set(
        jnp.stack([s_m, l_m], axis=-1), mode="drop")
    dense_s = stacked[:, 0].reshape(r.ny, r.nx)
    dense_l = stacked[:, 1].reshape(r.ny, r.nx)
    if r.dense_sharding is not None:
        dense_s = jax.lax.with_sharding_constraint(dense_s,
                                                   r.dense_sharding)
        dense_l = jax.lax.with_sharding_constraint(dense_l,
                                                   r.dense_sharding)
    route_dense = (route_muskingum_day_grid
                   if isinstance(r.params, GridMuskingumParams)
                   else route_kinematic_day_grid)
    s2, dis = route_dense(dense_s, dense_l, r.params)
    # Gather-back likewise shares indices: one [nyx, 2] lookup.
    flat = jnp.stack([s2.reshape(-1), dis.reshape(-1)],
                     axis=-1)[r.flat_idx]
    new_store = jnp.where(real, flat[:, 0], store)
    discharge = jnp.where(real, flat[:, 1], 0.0)
    return new_store, discharge


def route_kinematic_day_grid(store: jnp.ndarray, local_mm: jnp.ndarray,
                             p: GridKinematicParams
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense [ny, nx] kinematic-wave day step via roll halo exchanges.

    Semantically identical to ``route_kinematic_day`` on the packed axis
    (same topology, same celerity law); exists so a 2-D block-sharded
    configuration exchanges water through ppermute halos instead of a
    global segment-sum.  Longitude wraps (real — the grid is periodic in
    lon); D8 never crosses the poles because direction codes are built
    with latitude clamped (grids/routing.py build_downstream_index).
    Returns ``(new_store, discharge)`` as [ny, nx] fields.
    """
    land = p.dir_code >= 0
    dt_r = 86400.0 / p.n_substeps
    local_sub = jnp.where(land, local_mm / p.n_substeps, 0.0)
    # Direction/land/ocean masks are loop-invariant; materialise them as
    # f32 weights OUTSIDE the scan.  XLA does not hoist the int compares
    # out of the while body on TPU, and the per-substep compare+select
    # chain costs ~4x the rolls themselves (measured r5: 1.39 -> 0.32
    # ms/day for the 360x720 day; bitwise-identical output).
    masks = [(p.dir_code == k).astype(store.dtype) for k in range(8)]
    landf = land.astype(store.dtype)
    oceanf = (p.dir_code == 8).astype(store.dtype)
    # Fill-cell sanitisation (hoisted): with mask-MULTIPLY algebra a
    # NaN/0-length fill value off-land would poison frac (0 * NaN is
    # NaN, and one NaN rolls into a land neighbour's inflow); land
    # values pass through untouched.
    length = jnp.where(land, p.flow_length, 1.0)

    def substep(carry, _):
        s, dis = carry
        frac = _celerity_fraction(s, length, dt_r, p.c0, p.s_ref,
                                  p.beta, p.c_min, p.c_max)
        out = landf * frac * jnp.maximum(s, 0.0)
        inflow = _d8_inflow(out, masks)
        # (s - out) first keeps the store non-negative in f32 (see
        # route_kinematic_day).
        s = (s - out) + local_sub + landf * inflow
        dis = dis + oceanf * out
        return (s, dis), None

    (store, discharge), _ = jax.lax.scan(
        substep, (store, jnp.zeros_like(store)), None,
        length=p.n_substeps)
    return store, discharge
