"""Layer-list helpers: struct-of-arrays over the (tiny) layer axis.

The hot kernels keep per-layer fields as Python lists of ``[n]`` arrays
instead of ``[n, 8]`` arrays.  With the layer axis unrolled at trace time,
every per-layer update is a pure elementwise op over cells — no
dynamic-update-slice, no gather — so XLA fuses the whole substep into a
handful of VPU kernels.  (Scatter/gather ops on the layer axis were the
dominant cost of the first implementation: they fragment fusion clusters
into ~hundreds of kernel launches.)
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp


def unstack(x: jnp.ndarray) -> List[jnp.ndarray]:
    """[n, L] -> list of L [n] arrays (one boundary slice per layer)."""
    return [x[:, i] for i in range(x.shape[1])]


def stack(cols: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """List of L [n] arrays -> [n, L]."""
    return jnp.stack(list(cols), axis=1)


def select_layer(cols: Sequence[jnp.ndarray], idx: jnp.ndarray,
                 fill=0.0) -> jnp.ndarray:
    """cols[idx[c]][c] for each cell c, as a fusible select chain.

    Replaces ``take_along_axis`` (a gather) with L elementwise selects.
    Cells whose idx is out of [0, L) get ``fill``.
    """
    out = jnp.full_like(cols[0], fill)
    for i, col in enumerate(cols):
        out = jnp.where(idx == i, col, out)
    return out
