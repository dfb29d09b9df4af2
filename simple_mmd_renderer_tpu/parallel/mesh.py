"""Multi-instance (crowd) execution and device-mesh sharding.

The reference is a single-model desktop app; the TPU-native scaling dimension
(SURVEY.md §2.6) is the *instance batch*: one jitted program steps and renders
many characters. Intra-chip, vmap batches every stage (skinning, IK, physics,
raster); across chips, the instance axis is sharded over a 1-D `jax.sharding`
mesh so XLA keeps all compute local and inserts no collectives on the hot
path (embarrassingly parallel over ICI; DCN only for host I/O).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.scene import Scene, SimState


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (axis,))


def crowd_init(scene: Scene, n: int, phase_frames: float = 7.0) -> SimState:
    """n instance states with staggered animation clocks (independent-looking
    motion from one motion track)."""
    base = scene.init_state()

    def tile(x):
        return jnp.broadcast_to(x, (n,) + x.shape).copy()

    state = jax.tree.map(tile, base)
    times = jnp.arange(n, dtype=jnp.float32) * (phase_frames / scene.config.fps)
    return state.replace(time=times)


def crowd_step_fn(scene: Scene, render: bool = True, width=None, height=None):
    """Per-frame crowd function over the instance axis.

    When the config allows it, rendering goes through the FUSED
    multi-instance raster (render.pipeline.crowd_render_frame): one binning
    sort and one kernel launch across all instances, instead of vmapping
    the single-instance pipeline (whose per-instance fixed costs dominate
    at crowd viewport sizes). Textures and native 4x MSAA are fused; what
    the fused path doesn't cover (skybox, VMD camera, edge outlines,
    double-sided materials, extended morphs, MMD toon shading) falls back
    to the vmap."""
    if not render:
        return jax.vmap(scene.step_pose)

    from ..render.pipeline import (crowd_render_frame,
                                   crowd_render_supported)
    st = scene.static
    uses_ext_morphs = bool(
        scene.config.apply_extended_morphs
        and (len(st.um_morph) or len(st.mm_morph)))
    if scene.mmd_maps is None and not uses_ext_morphs \
            and crowd_render_supported(
                scene.config.render, scene.part_textures, scene.cubemap,
                scene.camera):
        def step(state):
            state, pose, positions, normals = jax.vmap(scene.step_pose)(state)
            images = crowd_render_frame(scene.static, positions, normals,
                                        scene.config.render, width, height,
                                        part_textures=scene.part_textures)
            return state, images
        return step

    return jax.vmap(partial(scene.step_and_render, width=width,
                            height=height))


def shard_crowd(state: SimState, mesh: Mesh, axis: str = "data") -> SimState:
    """Place a crowd state with the instance axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, state)


def crowd_jit(scene: Scene, mesh: Mesh, render: bool = True, width=None,
              height=None, axis: str = "data"):
    """jit the crowd step with the instance axis sharded over the mesh via
    shard_map: every stage — including the FUSED multi-instance raster's
    global sort and kernel launch — runs on its device-local instance
    shard, so XLA inserts no collectives on the hot path (the instance
    batch is embarrassingly parallel; ICI carries nothing per frame)."""
    from jax.experimental.shard_map import shard_map
    fn = crowd_step_fn(scene, render=render, width=width, height=height)
    sharded = shard_map(fn, mesh=mesh, in_specs=(P(axis),),
                        out_specs=P(axis), check_rep=False)
    return jax.jit(sharded)
