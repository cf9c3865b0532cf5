"""Gradient-based parameter calibration (adjoint sensitivity).

A capability the Fortran reference could never offer: because the whole
day step is a pure, differentiable JAX function, the sensitivity of any
simulated diagnostic to any soil parameter is one ``jax.grad`` away, and
fitting soil parameters to observations is a standard first-order
optimisation instead of the reference's hand-tuning loop (the lab
notebook records weeks of manual parameterisation sweeps,
reference notes.txt Nov-Dec 2016; the LCLIM harness compares model vs
observed ET by eye, HYBRID9.f90:449).  Here the same comparison is a
differentiable loss and the optimiser closes the loop.

Design notes (TPU-first):

- Parameters are calibrated through **log-space multipliers** on the
  positive-magnitude soil properties (``hksat``, ``|psi_s|``, ``bsw``,
  ``fmax``): positivity is guaranteed by construction, a zero multiplier
  is the identity, and the optimisation is scale-free across parameters
  whose raw magnitudes span 10 orders.  ``lambda_ = 1/bsw`` is kept
  consistent.
- The forward model is the production XLA day step (`step.day_step`,
  vegetation coupled), scanned over days with ``jax.checkpoint`` on the
  day body so reverse-mode memory stays O(days + one day's substeps)
  instead of O(days * substeps).
- Everything is jitted once; the optimiser loop re-uses the compiled
  value-and-grad.  On a TPU mesh the cell axis shards exactly like the
  forward model (the loss is a mean, i.e. one ``psum``).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .physics import constants as c
from .physics.hydrology import Geometry
from .state import Forcing, ModelState, SoilParams
from .step import day_step

# Fields eligible for log-multiplier calibration.  theta_s / theta_m are
# deliberately excluded from the default set: scaling them can violate
# theta_m < theta_s and the saturation bound that initial_state assumes.
CALIBRATABLE = ("hksat", "psi_s", "bsw", "fmax")


class CalibrationSpec(NamedTuple):
    """Which parameters to fit and whether multipliers are per-cell.

    ``fields``: subset of CALIBRATABLE.
    ``per_cell``: False -> one global scalar multiplier per field (the
    robust default for short observation records); True -> one
    multiplier per packed cell (a spatial inversion; needs dense obs).
    """

    fields: Tuple[str, ...] = ("hksat", "psi_s", "bsw")
    per_cell: bool = False

    def init_theta(self, n_cells: int, dtype=jnp.float32
                   ) -> Dict[str, jnp.ndarray]:
        shape = (n_cells,) if self.per_cell else ()
        return {f: jnp.zeros(shape, dtype) for f in self.fields}


def apply_multipliers(params: SoilParams,
                      theta: Dict[str, jnp.ndarray]) -> SoilParams:
    """Scale soil parameters by ``exp(theta)`` per field.

    ``psi_s`` is negative (saturated matric potential in mm); its
    *magnitude* is scaled so the sign convention is preserved.  Scaling
    ``bsw`` updates ``lambda_ = 1/bsw`` to keep the pair consistent
    (INIT.f90:611-631 derives bsw from lambda the same way).
    """
    updates = {}
    for field, t in theta.items():
        if field not in CALIBRATABLE:
            raise ValueError(f"{field} is not calibratable "
                             f"(allowed: {CALIBRATABLE})")
        base = getattr(params, field)
        mult = jnp.exp(t)
        if mult.ndim == 1:                       # per-cell -> broadcast
            mult = mult.reshape((-1,) + (1,) * (base.ndim - 1))
        updates[field] = base * mult
        if field == "bsw":
            updates["lambda_"] = 1.0 / updates[field]
    return params.replace(**updates)


def simulate_daily_et(theta: Dict[str, jnp.ndarray],
                      params: SoilParams,
                      state0: ModelState,
                      forcing_days: Forcing,
                      geom: Geometry,
                      nisurf: int = c.NISURF_DEFAULT,
                      vegetation: bool = True) -> jnp.ndarray:
    """Forward model: daily ET ``[days, n]`` (mm/day) under multipliers.

    ``forcing_days`` holds stacked ``[days, n]`` arrays (one scan step
    per day).  Uses the XLA day-step path (fully differentiable); the
    day body is rematerialised so reverse mode over a year fits memory.
    """
    p = apply_multipliers(params, theta)
    dt = c.SDAY / nisurf

    @jax.checkpoint
    def body(state, f_day):
        state, diags = day_step(state, f_day, p, geom, dt, nisurf,
                                vegetation=vegetation)
        return state, diags["evap_day"]

    _, evap = jax.lax.scan(body, state0, forcing_days)
    return evap


def et_loss(theta, params, state0, forcing_days, geom, obs_et,
            nisurf: int = c.NISURF_DEFAULT,
            obs_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean-squared error of simulated vs observed daily ET (mm/day).

    ``obs_et``: ``[days, n]`` observations (the analog of the LCLIM
    harness's ``evap_obs`` column, HYBRID9.f90:449); ``obs_mask``
    optionally marks valid observations (missing data -> 0 weight).
    """
    sim = simulate_daily_et(theta, params, state0, forcing_days, geom,
                            nisurf)
    err2 = (sim - obs_et) ** 2
    if obs_mask is not None:
        w = obs_mask.astype(err2.dtype)
        return jnp.sum(err2 * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(err2)


class CalibrationResult(NamedTuple):
    theta: Dict[str, jnp.ndarray]      # fitted log-multipliers
    params: SoilParams                 # calibrated parameter set
    loss_history: jnp.ndarray          # [steps + 1] (includes initial)


def calibrate(params: SoilParams,
              state0: ModelState,
              forcing_days: Forcing,
              geom: Geometry,
              obs_et: jnp.ndarray,
              spec: CalibrationSpec = CalibrationSpec(),
              nisurf: int = c.NISURF_DEFAULT,
              steps: int = 50,
              learning_rate: float = 0.1,
              obs_mask: Optional[jnp.ndarray] = None,
              sharding=None) -> CalibrationResult:
    """Fit soil-parameter multipliers to observed daily ET with Adam.

    One jit of the value-and-grad; the optimiser loop runs as a
    ``lax.scan`` so the whole calibration is a single compiled program
    (no per-step dispatch overhead on TPU).

    ``sharding``: optional ``parallel.sharding.CellSharding`` — inputs
    (and per-cell multipliers) are placed cell-sharded and GSPMD runs
    the whole fit over the mesh: the forward/adjoint model is
    cell-local, per-cell theta gradients stay on their shards, and a
    scalar theta's gradient is the one ``psum`` of the loss reduction.
    """
    import optax

    theta0 = spec.init_theta(params.n_cells, params.hksat.dtype)
    if sharding is not None:
        params = sharding.put(params)
        state0 = sharding.put(state0)
        forcing_days = sharding.put_block(forcing_days)
        obs_et = sharding.put_block(obs_et)
        if obs_mask is not None:
            obs_mask = sharding.put_block(obs_mask)
        theta0 = {k: jax.device_put(v, sharding.spec_for(v))
                  for k, v in theta0.items()}
    opt = optax.adam(learning_rate)

    # Data arrays are jit ARGUMENTS, not closures: multi-host-sharded
    # jax.Arrays span non-addressable devices and cannot be baked into
    # the program as constants.
    @jax.jit
    def run(theta, params, state0, forcing_days, obs_et, obs_mask):
        def value_and_grad(theta):
            return jax.value_and_grad(et_loss)(
                theta, params, state0, forcing_days, geom, obs_et,
                nisurf, obs_mask)

        def step(carry, _):
            theta, opt_state = carry
            loss, g = value_and_grad(theta)       # loss BEFORE the update
            updates, opt_state = opt.update(g, opt_state, theta)
            theta = optax.apply_updates(theta, updates)
            return (theta, opt_state), loss

        (theta, _), losses = jax.lax.scan(
            step, (theta, opt.init(theta)), None, length=steps)
        final, _ = value_and_grad(theta)
        return theta, jnp.concatenate([losses, final[None]])

    theta, history = run(theta0, params, state0, forcing_days, obs_et,
                         obs_mask)
    return CalibrationResult(theta=theta,
                             params=apply_multipliers(params, theta),
                             loss_history=history)


def parameter_sensitivity(params: SoilParams,
                          state0: ModelState,
                          forcing_days: Forcing,
                          geom: Geometry,
                          fields: Sequence[str] = CALIBRATABLE,
                          nisurf: int = c.NISURF_DEFAULT
                          ) -> Dict[str, jnp.ndarray]:
    """d(mean ET)/d(log parameter) for each field — a one-call adjoint
    sensitivity analysis (per-cell), impossible in the Fortran reference
    without finite-differencing one run per parameter per cell."""
    spec = CalibrationSpec(fields=tuple(fields), per_cell=True)
    theta0 = spec.init_theta(params.n_cells, params.hksat.dtype)

    def mean_et(theta):
        return jnp.mean(simulate_daily_et(theta, params, state0,
                                          forcing_days, geom, nisurf))

    return jax.jit(jax.grad(mean_et))(theta0)
