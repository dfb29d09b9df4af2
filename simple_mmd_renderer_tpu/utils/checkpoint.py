"""Scene-state checkpointing.

The reference has no checkpoint/resume; its only resumable state is the
animation clock and the physics pose (SURVEY.md §5). Here the whole sim state
is a pytree, so save/restore is exact: the animation clock, every rigid-body
position/orientation/velocity — a paused simulation resumes bit-identically.

Format (v2): one .npz with a `__format_version__` marker and one array per
pytree leaf, keyed by the leaf's KEY PATH (e.g. ``leaf:.physics.pos``). Keys
are the schema: loading matches leaves BY NAME against the template, so a
reordered dataclass still loads, and a renamed/added/removed field fails with
an error naming the exact field — not a whole-tree repr mismatch. Legacy v1
files (positional ``leaf_<i>`` + a ``repr(treedef)`` blob) still load when
their structure matches; on mismatch the error says the file is v1 and must
be re-saved, instead of dumping two treedef reprs.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

FORMAT_VERSION = 2
_LEAF_PREFIX = "leaf:"


def _leaf_paths(tree):
    """Flatten with string key paths: [(".physics.pos", leaf), ...]."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(kp), leaf) for kp, leaf in flat], treedef


def save_state(path: str, state) -> None:
    """Serialize a SimState (or any pytree of arrays) to an .npz file."""
    named, _ = _leaf_paths(state)
    arrays = {}
    for name, leaf in named:
        key = _LEAF_PREFIX + name
        if key in arrays:
            raise ValueError(f"duplicate checkpoint leaf path {name!r}")
        arrays[key] = np.asarray(leaf)
    arrays["__format_version__"] = np.asarray(FORMAT_VERSION, np.int32)
    np.savez(path, **arrays)


def _load_v1(data, template):
    """Legacy positional format: load only when the treedef repr matches."""
    leaves, treedef = jax.tree.flatten(template)
    saved_treedef = bytes(data["__treedef__"]).decode()
    if saved_treedef != repr(treedef):
        raise ValueError(
            "checkpoint is the legacy v1 format and its structure no longer "
            "matches the current SimState (fields were added, removed or "
            "reordered since it was written). v1 files cannot be migrated "
            "field-by-field — re-create the checkpoint with this version "
            "(saves now use the named v2 format).")
    restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    for old, new in zip(leaves, restored):
        if jnp.shape(old) != jnp.shape(new) or (
                jnp.result_type(old) != jnp.result_type(new)):
            raise ValueError(
                f"v1 checkpoint leaf mismatch: saved "
                f"{jnp.shape(new)}/{jnp.result_type(new)} vs template "
                f"{jnp.shape(old)}/{jnp.result_type(old)}")
    return jax.tree.unflatten(treedef, restored)


def load_state(path: str, template):
    """Restore into the structure of `template` (a matching pytree).

    Leaves are matched by key path. Errors name the offending field:
    a leaf present in the file but not the template, a template field
    missing from the file, or a shape/dtype change on a matching field.
    """
    data = np.load(path)
    if "__format_version__" not in data.files:
        if "__treedef__" in data.files:
            return _load_v1(data, template)
        raise ValueError(
            f"{path!r} is not a checkpoint file (no format marker)")
    version = int(data["__format_version__"])
    if version > FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format v{version} is newer than this build "
            f"(supports up to v{FORMAT_VERSION}) — update the renderer or "
            "re-save the checkpoint with the older build")

    named, treedef = _leaf_paths(template)
    saved_names = {k[len(_LEAF_PREFIX):] for k in data.files
                   if k.startswith(_LEAF_PREFIX)}
    want_names = [name for name, _ in named]
    missing = [n for n in want_names if n not in saved_names]
    unknown = sorted(saved_names - set(want_names))
    if missing or unknown:
        parts = []
        if missing:
            parts.append(
                "fields missing from the checkpoint (added to SimState "
                f"since it was saved?): {', '.join(missing)}")
        if unknown:
            parts.append(
                "checkpoint fields unknown to this SimState (removed or "
                f"renamed?): {', '.join(unknown)}")
        raise ValueError("checkpoint structure mismatch: " + "; ".join(parts))

    restored = []
    for name, old in named:
        new = jnp.asarray(data[_LEAF_PREFIX + name])
        if jnp.shape(old) != jnp.shape(new):
            raise ValueError(
                f"checkpoint field {name!r}: shape {jnp.shape(new)} does "
                f"not match template {jnp.shape(old)}")
        if jnp.result_type(old) != jnp.result_type(new):
            raise ValueError(
                f"checkpoint field {name!r}: dtype {jnp.result_type(new)} "
                f"does not match template {jnp.result_type(old)}")
        restored.append(new)
    return jax.tree.unflatten(treedef, restored)
