"""Vmapped ensemble runs for uncertainty quantification.

Second TPU-native capability beyond the reference: running an ensemble
of parameter-perturbed simulations is a single ``jax.vmap`` over a
stacked member axis — one compiled kernel integrates all members at
once, filling the VPU lanes, instead of the reference's one-SLURM-job-
per-member workflow (its notebook records exactly that: whole output
dirs saved to /save1../save6 and diffed by hand, reference
notes.txt Nov-Dec 2016).

The member axis composes with the cell sharding: members are
independent, so on a mesh the stacked params/state shard along cells
exactly like a single run and the ensemble adds pure batch work.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from .calibrate import CALIBRATABLE, apply_multipliers
from .physics import constants as c
from .physics.hydrology import Geometry
from .state import Forcing, ModelState, SoilParams
from .step import day_step


def perturbed_multipliers(key: jax.Array,
                          n_members: int,
                          fields: Sequence[str] = ("hksat", "psi_s",
                                                   "bsw"),
                          sigma: float = 0.3) -> Dict[str, jnp.ndarray]:
    """Log-normal multiplier ensemble: ``[n_members]`` per field.

    Member 0 is always the unperturbed control (theta = 0), so the
    control trajectory is recoverable from every ensemble run.
    """
    for f in fields:
        if f not in CALIBRATABLE:
            raise ValueError(f"{f} is not calibratable "
                             f"(allowed: {CALIBRATABLE})")
    keys = jax.random.split(key, len(fields))
    theta = {}
    for f, k in zip(fields, keys):
        t = sigma * jax.random.normal(k, (n_members,))
        theta[f] = t.at[0].set(0.0)
    return theta


class EnsembleResult(NamedTuple):
    """Stacked outputs, member axis leading."""

    evap: jnp.ndarray       # [members, days, n] daily ET        (mm/day)
    runoff: jnp.ndarray     # [members, days, n] daily runoff    (mm/day)
    npp: jnp.ndarray        # [members, days, n] daily NPP  (g DM/plant)
    final_states: ModelState  # member-stacked end states


def run_ensemble(theta: Dict[str, jnp.ndarray],
                 params: SoilParams,
                 state0: ModelState,
                 forcing_days: Forcing,
                 geom: Geometry,
                 nisurf: int = c.NISURF_DEFAULT,
                 vegetation: bool = True) -> EnsembleResult:
    """Integrate all members of a parameter ensemble in one vmap.

    ``theta``: per-field ``[n_members]`` log-multipliers (e.g. from
    ``perturbed_multipliers`` or posterior samples around a
    ``calibrate`` fit).  All members share ``state0`` and the forcing;
    the scan over days happens inside the vmap, so XLA emits one fused
    program with a members x cells batch.
    """
    dt = c.SDAY / nisurf

    def one_member(theta_m):
        p = apply_multipliers(params, theta_m)

        def body(state, f_day):
            state, diags = day_step(state, f_day, p, geom, dt, nisurf,
                                    vegetation=vegetation)
            return state, (diags["evap_day"], diags["rnf_day"],
                           diags["npp"])

        final, (evap, rnf, npp) = jax.lax.scan(body, state0,
                                               forcing_days)
        return final, evap, rnf, npp

    final, evap, rnf, npp = jax.jit(jax.vmap(one_member))(theta)
    return EnsembleResult(evap=evap, runoff=rnf, npp=npp,
                          final_states=final)


def ensemble_spread(x: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean, std) over the member axis of a stacked diagnostic."""
    return jnp.mean(x, axis=0), jnp.std(x, axis=0)


def run_ensemble_annual(theta: Dict[str, jnp.ndarray],
                        params: SoilParams,
                        state0: ModelState,
                        forcing_days: Forcing,
                        geom: Geometry,
                        nisurf: int = c.NISURF_DEFAULT,
                        vegetation: bool = True,
                        use_pallas: bool = False,
                        pallas_block: int = 1024,
                        zd09_every: int = 1,
                        sharding=None
                        ) -> Dict[str, jnp.ndarray]:
    """Ensemble with annual totals only: memory O(members x cells).

    The production-scale variant of :func:`run_ensemble`, TPU-first in
    two ways.  First, the day scan carries running sums instead of
    stacking ``[members, days, n]`` dailies (GBs of HBM at 0.5 deg) —
    the annual-accumulator pattern of the production driver.  Second,
    the member axis is FOLDED INTO THE CELL AXIS rather than vmapped:
    an ensemble is literally "more cells" with per-member parameters,
    so the VMEM-resident Pallas day kernel (``use_pallas``) runs
    ensembles at full production speed — the member dimension is
    indistinguishable from batch.  The fold is CELL-MAJOR (folded index
    ``j = cell*m + member``, like assimilate.py), so under the
    production 1-D cell sharding each device holds whole ensembles for
    its cells and the folded run shards collective-free; pass
    ``sharding=`` to run on the mesh.  Forcing is tiled per day inside
    the scan body (a broadcast in-compute, never materialised for the
    year), so HBM holds one [days, n] forcing block regardless of
    ensemble size.

    Returns ``{"evap", "runoff", "npp"}`` as ``[members, n]`` annual
    totals (mm/yr and g DM/yr).
    """
    dt = c.SDAY / nisurf
    m = len(next(iter(theta.values())))
    n = state0.veg.lai.shape[0]

    def fold(x):
        return jnp.repeat(x, m, axis=0)

    params_m = apply_multipliers(
        jax.tree_util.tree_map(fold, params),
        # Cell-major: folded index j = cell*m + member -> theta[j % m].
        {f: jnp.tile(v, n) for f, v in theta.items()})
    state_m = jax.tree_util.tree_map(
        lambda x: fold(x) if (hasattr(x, "ndim") and x.ndim >= 1
                              and x.shape[0] == n) else x, state0)

    mesh = None
    if sharding is not None:
        mesh = sharding.mesh
        params_m = sharding.put(params_m)
        state_m = sharding.put(state_m)
        forcing_days = sharding.put_block(forcing_days)

    ev, rn, np_ = _run_annual_folded(
        state_m, forcing_days, params_m, geom, dt, m, nisurf,
        vegetation, use_pallas, pallas_block, zd09_every, mesh)
    # [n*m] -> [n, m] splits the (sharded) outer cell factor from the
    # unsharded member factor; the transpose to the [m, n] contract is
    # layout-only.
    return dict(evap=ev.reshape(n, m).T, runoff=rn.reshape(n, m).T,
                npp=np_.reshape(n, m).T)


@functools.partial(jax.jit, static_argnames=(
    "geom", "dt", "m", "nisurf", "vegetation", "use_pallas",
    "pallas_block", "zd09_every", "mesh"))
def _run_annual_folded(state_m, forcing_days, params_m, geom, dt, m,
                       nisurf, vegetation, use_pallas, pallas_block,
                       zd09_every, mesh=None):
    """Module-level jit of the folded annual ensemble scan (a fresh
    inner ``@jax.jit`` per call would retrace/recompile every
    invocation — this caches on the static configuration instead)."""
    zeros = jnp.zeros_like(state_m.veg.lai)

    def body(carry, f_day):
        state, ev, rn, np_ = carry
        f_m = jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, m, axis=0), f_day)
        state, diags = day_step(state, f_m, params_m, geom, dt,
                                nisurf, vegetation=vegetation,
                                use_pallas=use_pallas,
                                pallas_block=pallas_block,
                                zd09_every=zd09_every, mesh=mesh)
        return (state, ev + diags["evap_day"],
                rn + diags["rnf_day"], np_ + diags["npp"]), None

    (_, ev, rn, np_), _ = jax.lax.scan(
        body, (state_m, zeros, zeros, zeros), forcing_days)
    return ev, rn, np_
