"""Pallas TPU day kernel: one full model day per VMEM-resident cell block.

The scan-based day step re-reads state + parameters from HBM on every one
of the 48 substeps.  This kernel instead tiles the packed cell axis into
blocks, DMAs each block's state, parameters, vegetation and forcing into
VMEM once, runs all ``nisurf`` substeps in a ``fori_loop`` whose carry
never leaves VMEM, and writes back the final state plus the daily flux
sums — HBM traffic drops from 48x to 1x per day, and the whole day is a
single Mosaic kernel with no inter-kernel overhead.

The physics inside the loop is the SAME value-level function the XLA path
uses (hydrology.substep_values) — everything in it is elementwise over
cells, which is exactly what a Pallas block kernel wants.  Layered fields
travel as ``[nl, n]`` (layer-major) so each layer's row is a contiguous
``[block]`` vector in VMEM.

Reference: the NISURF loop at SOURCE/HYBRID9.f90:193-211.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .hydrology import Geometry, derive_forcing, substep_values
from ..state import Forcing, SoilParams, SoilState

# Derived-forcing field order for the kernel's flat argument list.
_FD_KEYS = ("tak", "rh", "rnet", "par", "forc_rain", "lamb", "huss", "ps")


def _day_kernel(h_ref, smp_ref, zwt_ref, wa_ref,
                rootr_ref, lai_ref, litter_ref,
                ts_ref, hk_ref, ps_ref, bs_ref, fmax_ref,
                *fd_refs_and_outs, geom: Geometry, dt: float,
                nisurf: int, nl: int, with_imp: bool = False,
                zd09_every: int = 1):
    rows = lambda ref: [ref[i, :] for i in range(nl)]
    imp = None
    if with_imp:
        imp_ref, *fd_refs_and_outs = fd_refs_and_outs
        imp = rows(imp_ref)
    (tak_ref, rh_ref, rnet_ref, par_ref, rain_ref, lamb_ref, huss_ref,
     psair_ref,
     h_out, smp_out, zwt_out, wa_out,
     evap_out, evap_grnd_out, rnf_out, res_out) = fd_refs_and_outs

    rootr = rows(rootr_ref)
    p_ts, p_hk, p_ps, p_bs = (rows(ts_ref), rows(hk_ref), rows(ps_ref),
                              rows(bs_ref))
    lai, litter, fmax = lai_ref[:], litter_ref[:], fmax_ref[:]
    fd = dict(tak=tak_ref[:], rh=rh_ref[:], rnet=rnet_ref[:],
              par=par_ref[:], forc_rain=rain_ref[:], lamb=lamb_ref[:],
              huss=huss_ref[:], ps=psair_ref[:])

    zero = jnp.zeros_like(lai)
    # Forcing/LAI-only ET terms, constant across the day's substeps
    # (bitwise-neutral hoist; et.daily_et_context).
    from .et import daily_et_context
    et_ctx = daily_et_context(fd, lai)

    if zd09_every > 1:
        # The ZD09 equilibrium profile (~26 of the substep's ~44 pow
        # evaluations) and the drainage specific-yield profile (16 more
        # pows) both depend only on zwt + static params; refresh them
        # every zd09_every substeps via one scalar-predicate cond (the
        # water table moves millimetres per day; conservation is
        # unaffected — see soilwater.compute_equilibrium_zq and
        # drainage.compute_specific_yields).
        from .drainage import compute_specific_yields
        from .soilwater import compute_equilibrium_zq

        def body(it, carry):
            (h, smp, zwt, wa, zq, sy, evap, evap_grnd, rnf,
             max_res) = carry
            zq, sy = jax.lax.cond(
                it % zd09_every == 0,
                lambda z: (tuple(compute_equilibrium_zq(
                               z, p_ts, p_ps, p_bs, geom.zi)),
                           tuple(compute_specific_yields(
                               z, p_ts, p_ps, p_bs))),
                lambda _: (zq, sy), zwt)
            out = substep_values(list(h), list(smp), zwt, wa, rootr,
                                 lai, litter, p_ts, p_hk, p_ps, p_bs,
                                 fmax, fd, geom, dt, imp=imp,
                                 zq=list(zq), et_ctx=et_ctx,
                                 sy=list(sy))
            evap = evap + (out["qflx_evap_grnd"]
                           + out["qflx_tran_veg"]) * dt
            evap_grnd = evap_grnd + out["qflx_evap_grnd"] * dt
            rnf = rnf + (out["qflx_surf"] + out["rsub_top"]) * dt
            max_res = jnp.maximum(max_res, jnp.abs(out["residual"]))
            return (tuple(out["h"]), tuple(out["smp"]), out["zwt"],
                    out["wa"], zq, sy, evap, evap_grnd, rnf, max_res)

        zq0 = tuple(jnp.zeros_like(lai) for _ in range(nl + 1))
        sy0 = tuple(jnp.zeros_like(lai) for _ in range(nl))
        carry0 = (tuple(rows(h_ref)), tuple(rows(smp_ref)), zwt_ref[:],
                  wa_ref[:], zq0, sy0, zero, zero, zero, zero)
        (h, smp, zwt, wa, _zq, _sy, evap, evap_grnd, rnf,
         max_res) = jax.lax.fori_loop(0, nisurf, body, carry0)
    else:
        def body(_, carry):
            h, smp, zwt, wa, evap, evap_grnd, rnf, max_res = carry
            out = substep_values(list(h), list(smp), zwt, wa, rootr,
                                 lai, litter, p_ts, p_hk, p_ps, p_bs,
                                 fmax, fd, geom, dt, imp=imp,
                                 et_ctx=et_ctx)
            evap = evap + (out["qflx_evap_grnd"]
                           + out["qflx_tran_veg"]) * dt
            evap_grnd = evap_grnd + out["qflx_evap_grnd"] * dt
            rnf = rnf + (out["qflx_surf"] + out["rsub_top"]) * dt
            max_res = jnp.maximum(max_res, jnp.abs(out["residual"]))
            return (tuple(out["h"]), tuple(out["smp"]), out["zwt"],
                    out["wa"], evap, evap_grnd, rnf, max_res)

        carry0 = (tuple(rows(h_ref)), tuple(rows(smp_ref)), zwt_ref[:],
                  wa_ref[:], zero, zero, zero, zero)
        h, smp, zwt, wa, evap, evap_grnd, rnf, max_res = \
            jax.lax.fori_loop(0, nisurf, body, carry0)

    for i in range(nl):
        h_out[i, :] = h[i]
        smp_out[i, :] = smp[i]
    zwt_out[:] = zwt
    wa_out[:] = wa
    evap_out[:] = evap
    evap_grnd_out[:] = evap_grnd
    rnf_out[:] = rnf
    res_out[:] = max_res


@functools.partial(jax.jit,
                   static_argnames=("geom", "dt", "nisurf", "block",
                                    "interpret", "zd09_every"))
def pallas_hydrology_day(soil: SoilState, veg, params: SoilParams,
                         forcing: Forcing, geom: Geometry, dt: float,
                         nisurf: int, block: int = 2048,
                         interpret: bool = False, imp=None,
                         zd09_every: int = 1, sw_abs=None
                         ) -> Tuple[SoilState, Dict[str, jnp.ndarray]]:
    """Run ``nisurf`` hydrology substeps for one day via the Pallas kernel.

    Returns the updated SoilState and the daily flux sums.  ``block`` is
    the number of cells per VMEM tile; the packed cell count must divide
    by it.  ``interpret=True`` runs the kernel in interpreter mode (for
    CPU tests).  ``imp`` optionally adds the ``[n, nl]`` frozen-soil
    impedance as one more VMEM-resident operand.  ``zd09_every > 1``
    refreshes the ZD09 equilibrium profile only every that many substeps
    (an accuracy/speed knob; conservation is unaffected).
    """
    n, nl = soil.h2osoi_liq.shape
    if n % block:
        raise ValueError(f"cell count {n} not divisible by block {block}")
    dtype = soil.h2osoi_liq.dtype
    fd = derive_forcing(forcing, sw_abs)

    # Layer-major [nl, n] views so each layer row is a contiguous block.
    t = lambda x: x.T

    grid = (n // block,)
    lay_spec = pl.BlockSpec((nl, block), lambda i: (0, i))
    flat_spec = pl.BlockSpec((block,), lambda i: (i,))

    in_specs = [
        lay_spec,                # h2osoi
        lay_spec,                # smp
        flat_spec, flat_spec,    # zwt, wa
        lay_spec,                # rootr
        flat_spec, flat_spec,    # lai, litter
        lay_spec, lay_spec, lay_spec, lay_spec,  # theta_s/hksat/psi_s/bsw
        flat_spec,               # fmax
    ] + ([lay_spec] if imp is not None else []) \
      + [flat_spec] * len(_FD_KEYS)

    out_shape = (
        jax.ShapeDtypeStruct((nl, n), dtype),   # h2osoi
        jax.ShapeDtypeStruct((nl, n), dtype),   # smp
        jax.ShapeDtypeStruct((n,), dtype),      # zwt
        jax.ShapeDtypeStruct((n,), dtype),      # wa
        jax.ShapeDtypeStruct((n,), dtype),      # evap_day
        jax.ShapeDtypeStruct((n,), dtype),      # evap_grnd_day
        jax.ShapeDtypeStruct((n,), dtype),      # rnf_day
        jax.ShapeDtypeStruct((n,), dtype),      # max_abs_residual
    )
    out_specs = (lay_spec, lay_spec, flat_spec, flat_spec, flat_spec,
                 flat_spec, flat_spec, flat_spec)

    kernel = functools.partial(_day_kernel, geom=geom, dt=dt,
                               nisurf=nisurf, nl=nl,
                               with_imp=imp is not None,
                               zd09_every=zd09_every)
    imp_ops = (t(imp),) if imp is not None else ()
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(t(soil.h2osoi_liq), t(soil.smp), soil.zwt, soil.wa,
      t(veg.rootr), veg.lai, veg.lai_litter,
      t(params.theta_s), t(params.hksat), t(params.psi_s),
      t(params.bsw), params.fmax, *imp_ops,
      *[fd[k] for k in _FD_KEYS])

    (h_t, smp_t, zwt, wa, evap_day, evap_grnd_day, rnf_day,
     max_res) = outs
    new_soil = SoilState(h2osoi_liq=h_t.T, zwt=zwt, wa=wa, smp=smp_t.T,
                         h2osoi_liq_ma=soil.h2osoi_liq_ma)
    diags = dict(evap_day=evap_day, evap_grnd_day=evap_grnd_day,
                 rnf_day=rnf_day, max_abs_residual=max_res)
    return new_soil, diags


def pallas_hydrology_day_sharded(soil: SoilState, veg, params: SoilParams,
                                 forcing: Forcing, geom: Geometry,
                                 dt: float, nisurf: int, mesh,
                                 axis: str = "cells", block: int = 1024,
                                 interpret: bool = False, imp=None,
                                 zd09_every: int = 1, sw_abs=None):
    """Multi-chip variant: shard_map the day kernel over the cell axis.

    Every input/output is partitioned on its leading (cell) axis; each
    device runs the Pallas kernel on its local shard, with zero
    communication (the physics is cell-local — SURVEY.md C14).  The
    per-device cell count must divide ``block``-evenly.
    """
    from jax.sharding import PartitionSpec as P
    shard_map = jax.shard_map

    def spec_of(leaf):
        nd = jnp.ndim(leaf)
        if nd == 0:
            return P()
        return P(axis, *([None] * (nd - 1)))

    args = (soil, veg, params, forcing)
    has_imp = imp is not None
    has_abs = sw_abs is not None
    if has_imp:
        args = args + (imp,)
    if has_abs:
        args = args + (sw_abs,)
    in_specs = jax.tree_util.tree_map(spec_of, args)

    def local_fn(soil_l, veg_l, params_l, forcing_l, *rest):
        rest = list(rest)
        imp_l = rest.pop(0) if has_imp else None
        abs_l = rest.pop(0) if has_abs else None
        return pallas_hydrology_day(soil_l, veg_l, params_l, forcing_l,
                                    geom, dt, nisurf, block=block,
                                    interpret=interpret, imp=imp_l,
                                    zd09_every=zd09_every, sw_abs=abs_l)

    out_shape = jax.eval_shape(local_fn, *args)
    out_specs = jax.tree_util.tree_map(spec_of, out_shape)
    fn = shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    return fn(*args)
