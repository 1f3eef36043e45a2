"""Orbax-based checkpointing (params + optimizer state + step + data iter).

Replaces the reference's `tf.train.Checkpoint` object graphs
(model_runners.py:200-205, :222-223, :684-686; run_ldm_sampler.py:70-75)
with named pytrees under an Orbax `CheckpointManager`:

* training state checkpoints are saved every `persist_per_iterations` and
  auto-resumed from the latest step at startup (the reference restores only
  at startup too, model_runners.py:200-205);
* pretrained weights keep the reference's **3-artifact split** —
  `transformer` / `unet` / `autoencoder` — for config-surface parity with
  `pre_ckpt_paths` (all_in_one_config.yaml:33-36);
* saves are **async** (Orbax background thread) so the TPU never idles on
  host I/O — functionality the reference lacks entirely (SURVEY.md §5
  failure-detection row).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def _resolve(directory: str) -> str:
    """Absolutize local paths; pass URI-style paths (gs://...) through —
    os.path.abspath would mangle them into a local './gs:/...' directory,
    silently writing per-host shards to local disk on a multi-host run."""
    return directory if "://" in directory else os.path.abspath(directory)


class CheckpointManager:
    """Thin wrapper around orbax CheckpointManager for train states."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            _resolve(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(self, abstract_state: Any) -> tuple[int, Any] | None:
        """Restore the newest checkpoint, or None when starting fresh.

        Training-state checkpoints saved before the GEGLU value/gate split
        carry fused ``geglu/dense`` leaves everywhere the param tree is
        mirrored (params, EMA, Adam moments) and fail a StandardRestore
        against the new abstract tree with a structure mismatch (ADVICE
        r3).  On that failure, re-restore against a legacy-shaped abstract
        tree (value/gate leaves re-fused) and split the restored arrays
        with `migrate_legacy_params` — so pre-split runs resume exactly.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None
        try:
            state = self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract_state)
            )
        except Exception as e:
            # Only a structure/tree mismatch indicates a pre-split legacy
            # checkpoint; transient failures (IO flake, interrupted
            # restore) must surface as themselves, not as a confusing
            # second-restore mismatch (ADVICE r4).
            msg = str(e).lower()
            if not any(
                s in msg
                for s in ("structure", "mismatch", "tree", "not found",
                          "missing")
            ):
                raise
            legacy = fuse_abstract_geglu(abstract_state)
            import jax

            if jax.tree_util.tree_structure(
                legacy
            ) == jax.tree_util.tree_structure(abstract_state):
                raise  # no geglu leaves to migrate — a genuine mismatch
            try:
                state = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(legacy)
                )
            except Exception as e2:
                raise e2 from e  # preserve the original mismatch cause
            state = migrate_legacy_state(state)
        return step, state

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_params(directory: str, params: Any, overwrite: bool = False) -> None:
    """Save a bare param pytree (pretrained-weight artifact).

    overwrite=True replaces an existing artifact atomically (Orbax
    `force`), for re-runnable export flows."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_resolve(directory), params, force=overwrite)
    ckptr.wait_until_finished()


def migrate_legacy_params(params: Any) -> Any:
    """In-place upgrade of param trees saved before the GEGLU value/gate
    split (models/unet.py GEGLU): a fused ``geglu/dense`` leaf pair
    [D, 2F]/[2F] becomes ``geglu/value`` + ``geglu/gate`` halves
    (value columns first — the reference's split(h, 2, -1) order,
    unet.py:322-324).  New-format trees pass through untouched."""
    if not isinstance(params, dict):
        return params
    for key, child in params.items():
        if (
            key == "geglu"
            and isinstance(child, dict)
            and set(child) == {"dense"}
            and "kernel" in child["dense"]
        ):
            kernel = child["dense"]["kernel"]
            bias = child["dense"]["bias"]
            half = kernel.shape[-1] // 2
            params[key] = {
                "value": {"kernel": kernel[..., :half], "bias": bias[:half]},
                "gate": {"kernel": kernel[..., half:], "bias": bias[half:]},
            }
        else:
            migrate_legacy_params(child)
    return params


def _fuse_geglu_dict(d: dict) -> dict:
    """Reverse migration over a pure-dict subtree: value/gate abstract
    leaves re-fused into the legacy single ``dense`` leaf (value columns
    first), so a pre-split checkpoint's tree structure can be restored."""
    import jax

    out = {}
    for key, child in d.items():
        if (
            key == "geglu"
            and isinstance(child, dict)
            and set(child) == {"value", "gate"}
        ):
            fused = {}
            for leaf in child["value"]:
                val, gate = child["value"][leaf], child["gate"][leaf]
                shape = tuple(val.shape[:-1]) + (
                    val.shape[-1] + gate.shape[-1],
                )
                fused[leaf] = jax.ShapeDtypeStruct(
                    shape, val.dtype, sharding=getattr(val, "sharding", None)
                )
            out[key] = {"dense": fused}
        elif isinstance(child, dict):
            out[key] = _fuse_geglu_dict(child)
        else:
            out[key] = child
    return out


def _map_dict_subtrees(fn, tree: Any) -> Any:
    """Apply `fn` to every maximal pure-dict subtree of an arbitrary
    pytree (train states are dataclasses/NamedTuples whose param trees —
    params, EMA, optimizer moments — are the dict subtrees)."""
    import jax

    is_dict = lambda x: isinstance(x, dict)  # noqa: E731
    leaves, treedef = jax.tree_util.tree_flatten(tree, is_leaf=is_dict)
    leaves = [fn(l) if isinstance(l, dict) else l for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def fuse_abstract_geglu(abstract_state: Any) -> Any:
    """Legacy-shaped abstract train state: every geglu value/gate pair in
    any dict subtree (params, EMA, Adam mu/nu) re-fused to ``dense``."""
    return _map_dict_subtrees(_fuse_geglu_dict, abstract_state)


def migrate_legacy_state(state: Any) -> Any:
    """`migrate_legacy_params` over every dict subtree of a train state."""
    return _map_dict_subtrees(migrate_legacy_params, state)


def load_params(directory: str, abstract_params: Any = None) -> Any:
    """Load a bare param pytree saved by `save_params` (legacy fused-GEGLU
    artifacts are migrated to the value/gate layout on load)."""
    ckptr = ocp.StandardCheckpointer()
    return migrate_legacy_params(
        ckptr.restore(_resolve(directory), abstract_params)
    )
