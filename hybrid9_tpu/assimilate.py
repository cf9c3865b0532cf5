"""Ensemble Kalman data assimilation (EnSRF) for states and parameters.

Third closed-loop capability beyond the reference (after adjoint
calibration and vmapped ensembles): sequentially assimilate observed
daily ET into a running parameter-perturbed ensemble, updating both the
soil-water state and per-cell soil-parameter multipliers.  The
reference's only use of observations was a visual model-vs-obs CSV
comparison at one site (HYBRID9.f90:449).

Design (TPU-first, and the standard land-DA configuration):

- **Cell-local scalar-observation square-root filter.**  Land-surface
  DA treats grid cells as independent (the model physics is cell-local,
  SURVEY.md C14), and the observation at a cell is a scalar (daily ET).
  The Kalman update then needs no matrix algebra at all: per cell,

      K_i     = cov_m(x_i, y_i) / (var_m(y_i) + r_i)       (mean gain)
      K~_i    = K_i / (1 + sqrt(r_i / (var_m(y_i) + r_i)))  (anomaly)
      mean_i += K_i  (obs_i - mean(y_i))
      dx_i   -= K~_i dy_i                  (per member, deterministic)

  with all moments taken over the member axis (the scalar-observation
  EnSRF of Whitaker & Hamill 2002 — exact, no perturbed-observation
  sampling noise).  Every quantity is an ``[m, n]`` array and the
  update is fused elementwise over cells — exactly the shape the VPU
  wants, no per-cell solves, no halos.
- **Relaxation to prior spread (RTPS)** replaces blanket multiplicative
  inflation: after the analysis, anomalies are rescaled so the
  posterior spread is ``(1-a)·sigma_analysis + a·sigma_prior``
  (Whitaker & Hamill 2012).  Because the relaxation only acts where an
  observation actually contracted the ensemble, unobserved cells are
  left exactly unchanged — spread cannot grow without bound in cells
  that are never observed, and the analysis strictly tightens
  (``sigma_post < sigma_prior`` wherever the observation carries
  information).
- **Augmented state.**  The update applies to any pytree of ``[m, n]``
  ensemble anomalies: prognostic water stores AND log-parameter
  multipliers (state augmentation — the standard route to online
  parameter estimation).  Parameters have no dynamics; they change only
  through their covariance with predicted ET.
- **The forecast step is the folded ensemble** (ensemble.py): members
  ride the packed cell axis through the production Pallas kernel, so a
  DA cycle costs one model day at ensemble width plus an elementwise
  update.
- **The fold is cell-major** (folded index ``j = cell*m + member``), so
  a contiguous block of the folded axis carries ALL members of a block
  of cells.  Under the production 1-D cell sharding
  (``parallel.sharding.CellSharding``) the folded axis then shards
  cell-locally: each device holds whole ensembles for its cells, the
  member-axis moments in the analysis reduce over an UNSHARDED axis,
  and the entire DA cycle adds zero collectives to the forecast — the
  same cell-independence the model itself scales by (INIT.f90:271-284,
  SURVEY.md C14).  Pass ``sharding=`` to run the whole sequential
  filter sharded (forecast through the shard_map'd Pallas kernel when
  on TPU, analysis under GSPMD).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .calibrate import apply_multipliers
from .physics import constants as c
from .physics.hydrology import Geometry
from .state import Forcing, ModelState, SoilParams
from .step import day_step


class EnKFConfig(NamedTuple):
    obs_err_std: float = 0.3     # observation error, mm/day
    rtps: float = 0.5            # relaxation-to-prior-spread coefficient
    theta_min: float = -2.0      # clamp on log-multipliers
    theta_max: float = 2.0


def _moments(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Member-axis (mean, anomaly) of an ``[m, ...]`` array."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    return mean, x - mean


def enkf_update_scalar_obs(aug: Dict[str, jnp.ndarray],
                           y_pred: jnp.ndarray,
                           obs: jnp.ndarray,
                           obs_mask: jnp.ndarray,
                           cfg: EnKFConfig = EnKFConfig()
                           ) -> Dict[str, jnp.ndarray]:
    """One cell-local scalar-observation EnSRF analysis step.

    Args:
      aug: augmented ensemble — a dict of ``[m, n]`` (or ``[m, n, l]``)
        arrays (water stores, log-multipliers, ...).
      y_pred: ``[m, n]`` predicted observation per member (daily ET).
      obs: ``[n]`` observed values; ``obs_mask``: ``[n]`` validity.
      cfg: EnKF tuning.

    Returns the analysis ensemble (same structure as ``aug``).  Cells
    where ``obs_mask`` is false are returned bit-identical: no mean
    shift, no anomaly scaling (unobserved cells must not drift).
    """
    m = y_pred.shape[0]
    y_mean, dy = _moments(y_pred)
    var_y = jnp.sum(dy * dy, axis=0) / (m - 1)          # [n]
    r = cfg.obs_err_std ** 2
    denom = var_y + r                                   # [n]
    # Scalar-obs square-root anomaly factor (Whitaker & Hamill 2002
    # Eq. 13): the anomaly gain is the mean gain shrunk by this.
    sqrt_fac = 1.0 / (1.0 + jnp.sqrt(r / denom))        # [n]
    innov = obs.astype(y_pred.dtype) - y_mean[0]        # [n]

    def update(x):
        mean, dx = _moments(x)
        if x.ndim == 3:                                 # [m, n, l]
            cov = jnp.einsum("mn,mnl->nl", dy, dx) / (m - 1)
            gain = cov / denom[:, None]
            mean_a = mean + (gain * innov[:, None])[None]
            dx_a = dx - (sqrt_fac[:, None] * gain)[None] * dy[:, :, None]
            mask = obs_mask[None, :, None]
        else:                                           # [m, n]
            cov = jnp.sum(dy * dx, axis=0) / (m - 1)
            gain = cov / denom
            mean_a = mean + (gain * innov)[None]
            dx_a = dx - (sqrt_fac * gain)[None] * dy
            mask = obs_mask[None, :]
        # RTPS: relax the analysis spread part-way back toward the
        # prior spread.  sigma_post = (1-a)·sigma_a + a·sigma_f, so the
        # analysis still strictly tightens wherever it contracted, and
        # the factor is exactly 1 where the update was a no-op.
        sig_f = jnp.sqrt(jnp.sum(dx * dx, axis=0) / (m - 1))
        sig_a = jnp.sqrt(jnp.sum(dx_a * dx_a, axis=0) / (m - 1))
        relax = 1.0 + cfg.rtps * (sig_f - sig_a) / jnp.maximum(
            sig_a, jnp.asarray(1.0e-12, sig_a.dtype))
        x_a = mean_a + dx_a * relax[None]
        return jnp.where(mask, x_a, x)

    return {k: update(v) for k, v in aug.items()}


@functools.partial(jax.jit, static_argnames=(
    "geom", "dt", "m", "nisurf", "vegetation", "use_pallas",
    "pallas_block", "zd09_every", "cfg", "mesh", "pallas_interpret"))
def _enkf_cycle(state_m: ModelState, theta_m: jnp.ndarray,
                params_tiled: SoilParams, f_day: Forcing,
                obs: jnp.ndarray, obs_mask: jnp.ndarray,
                geom: Geometry, dt: float, m: int, nisurf: int,
                vegetation: bool, use_pallas: bool, pallas_block: int,
                zd09_every: int, cfg: EnKFConfig, mesh=None,
                pallas_interpret: bool = False):
    """Forecast one day at ensemble width, then analyse.

    ``state_m``: cell-major folded ``[n*m]`` model state (``j = cell*m
    + member``); ``theta_m``: ``[m, n]`` per-cell hksat
    log-multipliers; ``params_tiled``: base params folded to ``[n*m]``
    (multipliers applied inside, so the analysed theta takes effect on
    the next forecast); ``f_day``: ``[n]`` forcing (shared across
    members).  Returns (state_m', theta_m', y_pred).

    All member-axis views below are reshape/transpose of the folded
    axis: with the cell-major fold and a cell sharding on the folded
    axis, the reshape splits the SHARDED outer factor (cells) from the
    unsharded inner factor (members), so none of them moves data
    between devices.
    """
    n = obs.shape[0]

    def fold(x):
        return jnp.repeat(x, m, axis=0)

    p = apply_multipliers(params_tiled,
                          {"hksat": theta_m.T.reshape(n * m)})
    f_m = jax.tree_util.tree_map(fold, f_day)
    state_m, diags = day_step(state_m, f_m, p, geom, dt, nisurf,
                              vegetation=vegetation,
                              use_pallas=use_pallas,
                              pallas_block=pallas_block,
                              zd09_every=zd09_every, mesh=mesh,
                              pallas_interpret=pallas_interpret)
    y_pred = diags["evap_day"].reshape(n, m).T

    nl = state_m.soil.h2osoi_liq.shape[1]
    aug = dict(
        h2osoi=state_m.soil.h2osoi_liq.reshape(n, m, nl)
               .transpose(1, 0, 2),
        wa=state_m.soil.wa.reshape(n, m).T,
        theta=theta_m,
    )
    aug = enkf_update_scalar_obs(aug, y_pred, obs, obs_mask, cfg)

    # Physical guards: non-negative stores, bounded multipliers.
    h = jnp.maximum(aug["h2osoi"], 1.0e-3).transpose(1, 0, 2) \
        .reshape(n * m, nl)
    wa = jnp.clip(aug["wa"], 0.0, 5000.0).T.reshape(n * m)
    theta_m = jnp.clip(aug["theta"], cfg.theta_min, cfg.theta_max)
    # Recompute smp from the ANALYSED moisture (same Clapp-Hornberger
    # form as initial_state / _conductivity_and_potential, O13 Eqn
    # 7.94): smp is a cross-step carry the next substep's beta-stress
    # reads (HYDROLOGY.f90:271), so leaving the prior value would mix
    # posterior moisture with prior matric potential for one substep.
    dz = jnp.asarray(geom.dz_soil, h.dtype)
    s_node = jnp.clip((h / dz[None, :]) / p.theta_s, 0.01, 1.0)
    smp = jnp.maximum(jnp.asarray(c.SMPMIN, h.dtype),
                      p.psi_s * s_node ** (-p.bsw))
    state_m = state_m.replace(soil=state_m.soil.replace(
        h2osoi_liq=h, wa=wa, smp=smp))
    return state_m, theta_m, y_pred


def assimilate(params: SoilParams, state0: ModelState,
               forcing_days: Forcing, obs_et: jnp.ndarray,
               geom: Geometry, n_members: int = 16,
               obs_mask: Optional[jnp.ndarray] = None,
               nisurf: int = c.NISURF_DEFAULT,
               theta_spread: float = 0.3, seed: int = 0,
               vegetation: bool = True, use_pallas: bool = False,
               pallas_block: int = 1024, zd09_every: int = 1,
               cfg: EnKFConfig = EnKFConfig(),
               sharding=None,
               pallas_interpret: bool = False) -> Dict[str, jnp.ndarray]:
    """Sequential EnSRF over a daily-ET observation record.

    Args:
      forcing_days: ``[days, n]`` Forcing pytree.
      obs_et: ``[days, n]`` observed daily ET (mm/day).
      obs_mask: ``[days, n]`` validity (default: all valid).
      n_members: ensemble width m.
      theta_spread: initial std of the per-cell hksat log-multipliers.
      sharding: optional ``parallel.sharding.CellSharding`` — runs the
        whole sequential filter cell-sharded over the device mesh (the
        cell-major fold makes every analysis quantity device-local; the
        forecast dispatches through the shard_map'd Pallas kernel when
        ``use_pallas``).

    Returns a dict with the posterior ``theta_mean``/``theta_std``
    ``[n]``, the final folded ensemble state, and the ``[days, n]``
    ensemble-mean predicted ET (for innovation diagnostics).
    """
    m = n_members
    n = state0.veg.lai.shape[0]
    ndays = obs_et.shape[0]
    if obs_mask is None:
        obs_mask = jnp.ones((ndays, n), bool)
    key = jax.random.PRNGKey(seed)
    theta_m = theta_spread * jax.random.normal(key, (m, n),
                                               state0.veg.lai.dtype)

    def fold(x):
        # Cell-major: j = cell*m + member (see the module docstring).
        return jnp.repeat(x, m, axis=0)

    params_tiled = jax.tree_util.tree_map(fold, params)
    state_m = jax.tree_util.tree_map(
        lambda x: fold(x) if (hasattr(x, "ndim") and x.ndim >= 1
                              and x.shape[0] == n) else x, state0)

    mesh = None
    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = sharding.mesh
        params_tiled = sharding.put(params_tiled)
        state_m = sharding.put(state_m)
        theta_m = jax.device_put(
            theta_m, NamedSharding(mesh, P(None, sharding.axis)))
        forcing_days = sharding.put_block(forcing_days)
        obs_et = sharding.put_block(obs_et)
        obs_mask = sharding.put_block(obs_mask)

    # The whole DA window is ONE lax.scan over days (the square-root
    # analysis is deterministic — no per-day PRNG — so forecast +
    # analysis compile once and the per-day host dispatch disappears;
    # the cycle body is rematerialised so reverse use stays bounded).
    @jax.checkpoint
    def cycle(carry, inp):
        state_m, theta_m = carry
        f_day, obs_d, mask_d = inp
        state_m, theta_m, y_pred = _enkf_cycle(
            state_m, theta_m, params_tiled, f_day, obs_d, mask_d,
            geom, c.SDAY / nisurf, m, nisurf, vegetation, use_pallas,
            pallas_block, zd09_every, cfg, mesh=mesh,
            pallas_interpret=pallas_interpret)
        return (state_m, theta_m), jnp.mean(y_pred, axis=0)

    (state_m, theta_m), y_means = jax.lax.scan(
        cycle, (state_m, theta_m), (forcing_days, obs_et, obs_mask))

    return dict(theta_mean=jnp.mean(theta_m, axis=0),
                theta_std=jnp.std(theta_m, axis=0),
                state=state_m,
                y_pred_mean=y_means)
