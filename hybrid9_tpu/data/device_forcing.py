"""On-device synthetic forcing generation.

For synthetic-forcing runs and benchmarks, generating the climate on the
TPU removes the host->device transfer entirely (~680 MB per simulated
year at 0.5 degrees, ~2.9 GB at 0.25 degrees — the dominant wall-clock
cost of the host generator).  Statistics mirror data/synthetic.py (same
seasonal structure and ranges) but use ``jax.random`` with per-(year,
day) key folding, so streams are reproducible on any device mesh and any
shard of the cell axis; they are NOT bit-identical to the NumPy
generator (tests that need the oracle-matched stream use the host one).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..physics import constants as c
from ..state import Forcing


@functools.partial(jax.jit,
                   static_argnames=("n", "n_days", "start_doy", "dtype"))
def generate_block(seed: int, year: int, start_doy: int, n_days: int,
                   n: int, lat: jnp.ndarray,
                   dtype=jnp.float32) -> Forcing:
    """A [n_days, n] forcing block generated on device."""
    lat = jnp.asarray(lat, dtype)
    days = start_doy + jnp.arange(n_days)
    phase = 2.0 * jnp.pi * (days[:, None] - 15) / 365.0
    season = jnp.cos(phase) * jnp.where(lat >= 0.0, -1.0, 1.0)[None, :]

    base = jax.random.fold_in(jax.random.PRNGKey(seed), year)
    keys = jax.random.split(base, 6)
    shape = (n_days, n)

    def noise(k, scale):
        return scale * jax.random.normal(k, shape, dtype)

    abs_lat = jnp.abs(lat)[None, :]
    tas = (288.0 - 0.4 * abs_lat + 10.0 * season
           + noise(keys[0], 2.0)).astype(dtype)
    rsds = jnp.clip(220.0 - 2.0 * abs_lat + 120.0 * season
                    + noise(keys[1], 15.0), 5.0, 420.0)
    rlds = jnp.clip(1.2 * (tas - 210.0) + noise(keys[2], 10.0),
                    120.0, 460.0)
    wet = jax.random.uniform(keys[3], shape) < 0.35
    pr = jnp.where(wet,
                   6.0e-5 * -jnp.log(
                       jax.random.uniform(keys[4], shape,
                                          minval=1e-7, maxval=1.0)),
                   0.0).astype(dtype)
    rhs = jnp.clip(65.0 + 20.0 * jnp.sin(phase + lat[None, :] / 30.0)
                   + noise(keys[5], 8.0), 20.0, 100.0)
    ps = (101325.0 - 40.0 * abs_lat) * jnp.ones(shape, dtype)
    esat_pa = 610.8 * jnp.exp(17.27 * (tas - c.TF) / (tas - c.TF + 237.3))
    huss = 0.622 * (rhs / 100.0) * esat_pa / ps

    return Forcing(tas=tas, rlds=rlds.astype(dtype),
                   rsds=rsds.astype(dtype), huss=huss.astype(dtype),
                   ps=ps, pr=pr, rhs=rhs.astype(dtype))


class DeviceSyntheticForcingProvider:
    """Provider interface over the on-device generator."""

    def __init__(self, n: int, seed: int = 0, lat=None,
                 dtype=jnp.float32, sharding=None):
        import numpy as np
        self.n = n
        self.seed = seed
        lat = np.linspace(-55.0, 65.0, n) if lat is None else lat
        self.lat = jnp.asarray(lat, dtype)
        if sharding is not None:
            self.lat = jax.device_put(lat, sharding.spec_for(self.lat))
        self.dtype = dtype

    def __call__(self, year: int, start_doy: int, n_days: int) -> Forcing:
        return generate_block(self.seed, year, start_doy, n_days,
                              self.n, self.lat, self.dtype)
