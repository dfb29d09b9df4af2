"""Scene-state checkpointing.

The reference has no checkpoint/resume; its only resumable state is the
animation clock and the physics pose (SURVEY.md §5). Here the whole sim state
is a pytree, so save/restore is exact: the animation clock, every rigid-body
position/orientation/velocity — a paused simulation resumes bit-identically.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def save_state(path: str, state) -> None:
    """Serialize a SimState (or any pytree of arrays) to an .npz file."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_state(path: str, template):
    """Restore into the structure of `template` (a matching pytree)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    saved_treedef = bytes(data["__treedef__"]).decode()
    if saved_treedef != repr(treedef):
        raise ValueError(
            "checkpoint structure mismatch: saved pytree\n"
            f"  {saved_treedef}\ndoes not match template\n  {repr(treedef)}")
    n = len(leaves)
    restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    for old, new in zip(leaves, restored):
        if jnp.shape(old) != jnp.shape(new):
            raise ValueError(
                f"checkpoint shape mismatch: {jnp.shape(new)} vs "
                f"{jnp.shape(old)}")
        if jnp.result_type(old) != jnp.result_type(new):
            raise ValueError(
                f"checkpoint dtype mismatch: {jnp.result_type(new)} vs "
                f"{jnp.result_type(old)}")
    return jax.tree.unflatten(treedef, restored)
