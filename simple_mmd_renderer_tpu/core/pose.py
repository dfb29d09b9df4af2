"""Posing pipeline: morph application -> bone FK (level-parallel) -> CCD IK ->
skinning matrices.

Runtime rebuild of libmmd's `Poser` (`motion/poser_impl.inl:130-461`) as pure
jnp functions over a static `ModelStatic` program. The rig topology, processing
order and IK programs are baked into the traced computation (host constants);
per-frame inputs are the sampled bone poses and morph rates, so the whole
pipeline jits once per model and vmaps over instances.

Convention notes (docs/CONVENTIONS.md): column-vector affines, Hamilton
quaternions (x,y,z,w); `world` here corresponds to the reference's
`local_matrix_` after its in-place parent multiplication, and `skin` to
`skinning_matrix_ = global_offset * local` i.e. world @ T(-rest).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..utils import math3d as m3
from .model import FIX_ALL, FIX_NONE, FIX_X, FIX_Y, FIX_Z, IKProgram, ModelStatic

_EPS = 1e-8


@struct.dataclass
class PoseArrays:
    """Mutable pose state (the reference's per-bone BoneImage fields + vertex
    morph accumulator), as arrays."""
    world: jnp.ndarray          # [B,4,4] chain matrices (local_matrix_)
    skin: jnp.ndarray           # [B,4,4] skinning matrices
    total_rot: jnp.ndarray      # [B,4]
    total_trans: jnp.ndarray    # [B,3]
    pre_ik_rot: jnp.ndarray     # [B,4]
    ik_rot: jnp.ndarray         # [B,4]
    vertex_offsets: jnp.ndarray # [N,3] vertex morph accumulator


def init_pose(static: ModelStatic) -> PoseArrays:
    b = static.n_bones
    n = len(static.positions)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
    return PoseArrays(
        world=eye, skin=eye,
        total_rot=m3.quat_identity((b,)),
        total_trans=jnp.zeros((b, 3), jnp.float32),
        pre_ik_rot=m3.quat_identity((b,)),
        ik_rot=m3.quat_identity((b,)),
        vertex_offsets=jnp.zeros((n, 3), jnp.float32),
    )


# ---------------------------------------------------------------------------
# Morphs (poser_impl.inl:328-360)
# ---------------------------------------------------------------------------

def apply_morphs(static: ModelStatic, morph_rates: jnp.ndarray):
    """-> (vertex_offsets [N,3], morph_rot [B,4], morph_trans [B,3]).

    Group morphs are pre-expanded into leaf rates (model.build_model); the
    reference's `rate < eps` skip is applied to the summed leaf rate.
    """
    n = len(static.positions)
    b = static.n_bones
    vertex_offsets = jnp.zeros((n, 3), jnp.float32)
    morph_rot = m3.quat_identity((b,))
    morph_trans = jnp.zeros((b, 3), jnp.float32)
    if static.n_morphs == 0:
        return vertex_offsets, morph_rot, morph_trans

    leaf = morph_rates @ jnp.asarray(static.morph_expand)
    leaf = jnp.where(leaf >= _EPS, leaf, 0.0)

    if len(static.vm_morph):
        rates = leaf[jnp.asarray(static.vm_morph)]
        vertex_offsets = vertex_offsets.at[jnp.asarray(static.vm_vertex)].add(
            jnp.asarray(static.vm_offset) * rates[:, None])

    if len(static.bm_morph):
        rates = leaf[jnp.asarray(static.bm_morph)]
        bones = jnp.asarray(static.bm_bone)
        morph_trans = morph_trans.at[bones].add(
            jnp.asarray(static.bm_trans) * rates[:, None])

        # rotations compose in morph order:
        # morph_rotation = morph_rotation ⊗ slerp(id, q, rate)
        rots = jnp.asarray(static.bm_rot)
        ident = m3.quat_identity(())

        def step(acc, inp):
            bone, q, rate = inp
            delta = m3.quat_slerp(ident, q, rate)
            delta = jnp.where(rate >= _EPS, delta, ident)
            cur = acc[bone]
            return acc.at[bone].set(m3.quat_mul(cur, delta)), None

        morph_rot, _ = jax.lax.scan(step, morph_rot, (bones, rots, rates))

    return vertex_offsets, morph_rot, morph_trans


# ---------------------------------------------------------------------------
# FK (UpdateBoneTransform, poser_impl.inl:142-166)
# ---------------------------------------------------------------------------

def _fk_bones(static: ModelStatic, pose: PoseArrays, idx, anim_rot, anim_trans,
              morph_rot, morph_trans) -> PoseArrays:
    """Batched FK update of the bones in `idx` (same-level: dependencies are
    already up to date in `pose`)."""
    idx = jnp.asarray(idx)
    parent = jnp.asarray(static.bone_parent)[idx]
    app = jnp.asarray(static.append_parent)[idx]
    app_ratio = jnp.asarray(static.append_ratio)[idx][:, None]
    app_rot_m = jnp.asarray(static.append_rotate)[idx][:, None]
    app_trn_m = jnp.asarray(static.append_translate)[idx][:, None]
    is_link = jnp.asarray(static.is_ik_link)[idx][:, None]
    offset = jnp.asarray(static.local_offset)[idx]

    total_rot = m3.quat_mul(morph_rot[idx], anim_rot[idx])
    total_trans = morph_trans[idx] + anim_trans[idx]

    app_safe = jnp.maximum(app, 0)
    ident = m3.quat_identity((idx.shape[0],))
    app_q = m3.quat_slerp(ident, pose.total_rot[app_safe],
                          app_ratio[:, 0])
    total_rot = jnp.where(app_rot_m & (app[:, None] >= 0),
                          m3.quat_mul(total_rot, app_q), total_rot)
    total_trans = total_trans + jnp.where(
        app_trn_m & (app[:, None] >= 0),
        app_ratio * pose.total_trans[app_safe], 0.0)

    pre_ik = jnp.where(is_link, total_rot, pose.pre_ik_rot[idx])
    total_rot = jnp.where(is_link, m3.quat_mul(pose.ik_rot[idx], total_rot),
                          total_rot)

    local = m3.affine(m3.quat_to_mat3(total_rot), total_trans + offset)
    parent_safe = jnp.maximum(parent, 0)
    pw = jnp.where((parent >= 0)[:, None, None], pose.world[parent_safe],
                   jnp.eye(4, dtype=jnp.float32))
    world = pw @ local

    return pose.replace(
        world=pose.world.at[idx].set(world),
        total_rot=pose.total_rot.at[idx].set(total_rot),
        total_trans=pose.total_trans.at[idx].set(total_trans),
        pre_ik_rot=pose.pre_ik_rot.at[idx].set(pre_ik),
    )


def _refresh_link_world(static: ModelStatic, world, total_rot, total_trans,
                        ik_rot, pre_ik_rot, bone: int):
    """CCD inner chain refresh (poser_impl.inl:292-300):
    total = ik ⊗ pre_ik; rebuild world from parent."""
    tr = m3.quat_mul(ik_rot[bone], pre_ik_rot[bone])
    local = m3.affine(m3.quat_to_mat3(tr),
                      total_trans[bone] + jnp.asarray(static.local_offset[bone]))
    p = int(static.bone_parent[bone])
    pw = world[p] if p >= 0 else jnp.eye(4, dtype=jnp.float32)
    return world.at[bone].set(pw @ local), total_rot.at[bone].set(tr)


def _limit_euler(euler, emin, emax, mirror):
    """LimitEulerAngle (poser_impl.inl:178-193); `mirror` is the i<ikt flag."""
    def clamp_lo(e):
        tf = 2 * emin - e
        return jnp.where(e < emin, jnp.where((tf <= emax) & mirror, tf, emin), e)

    def clamp_hi(e):
        tf = 2 * emax - e
        return jnp.where(e > emax, jnp.where((tf >= emin) & mirror, tf, emax), e)

    return clamp_hi(clamp_lo(euler))


def _solve_ik(static: ModelStatic, pose: PoseArrays, ik: IKProgram,
              anim_rot, anim_trans, morph_rot, morph_trans) -> PoseArrays:
    """CCD IK (poser_impl.inl:168-310) for one IK bone. The link loop is
    statically unrolled (2-3 links); iterations run in a fori_loop with a
    convergence freeze mask replacing the reference's early return."""
    links = [int(b) for b in ik.links]
    nl = len(links)

    # reset link ik rotations, then re-FK links root-most-first and the target
    pose = pose.replace(
        ik_rot=pose.ik_rot.at[jnp.asarray(ik.links)].set(
            jnp.broadcast_to(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (nl, 4))))
    ik_position = pose.world[ik.bone, :3, 3]
    for b in reversed(links):
        pose = _fk_bones(static, pose, jnp.asarray([b], jnp.int32),
                         anim_rot, anim_trans, morph_rot, morph_trans)
    pose = _fk_bones(static, pose, jnp.asarray([ik.target], jnp.int32),
                     anim_rot, anim_trans, morph_rot, morph_trans)
    target_pos = pose.world[ik.target, :3, 3]

    err = ik_position - target_pos
    done0 = jnp.sum(err * err) < _EPS

    ikt = ik.loop // 2
    angle_limit = jnp.float32(ik.angle_limit)

    def fk_target(world, total_rot, total_trans, pre_ik_rot, ik_rot):
        """Full single-bone FK for the target (UpdateBoneTransform)."""
        tmp = pose.replace(world=world, total_rot=total_rot,
                           total_trans=total_trans, pre_ik_rot=pre_ik_rot,
                           ik_rot=ik_rot)
        tmp = _fk_bones(static, tmp, jnp.asarray([ik.target], jnp.int32),
                        anim_rot, anim_trans, morph_rot, morph_trans)
        return tmp.world, tmp.total_rot, tmp.total_trans, tmp.pre_ik_rot

    def iteration(i, carry):
        world, total_rot, ik_rot, target_pos, done = carry
        old = (world, total_rot, ik_rot, target_pos)
        mirror = i < ikt
        total_trans = pose.total_trans
        pre_ik_rot = pose.pre_ik_rot

        for j, b in enumerate(links):
            if ik.fix_types[j] == FIX_ALL:
                continue  # statically skipped (poser_impl.inl:215)
            link_pos = world[b, :3, 3]
            target_dir = link_pos - target_pos
            ik_dir = link_pos - ik_position
            target_dir = target_dir / jnp.maximum(jnp.linalg.norm(target_dir), _EPS)
            ik_dir = ik_dir / jnp.maximum(jnp.linalg.norm(ik_dir), _EPS)

            axis = jnp.cross(target_dir, ik_dir)
            axis = jnp.where(jnp.abs(axis) < _EPS, jnp.float32(_EPS), axis)

            p = int(static.bone_parent[b])
            loc = world[p] if p >= 0 else jnp.eye(4, dtype=jnp.float32)

            if bool(ik.limited[j]) and ik.fix_types[j] != FIX_NONE:
                # axis pinned to the parent-local fixed axis while i < ikt
                axis_idx = {FIX_X: 0, FIX_Y: 1, FIX_Z: 2}[int(ik.fix_types[j])]
                sign = jnp.where(jnp.dot(axis, loc[:3, axis_idx]) >= 0, 1.0, -1.0)
                fixed_axis = jnp.zeros(3, jnp.float32).at[axis_idx].set(sign)
                free_axis = loc[:3, :3].T @ axis
                free_axis = free_axis / jnp.maximum(jnp.linalg.norm(free_axis), _EPS)
                axis = jnp.where(mirror, fixed_axis, free_axis)
            else:
                axis = loc[:3, :3].T @ axis
                axis = axis / jnp.maximum(jnp.linalg.norm(axis), _EPS)

            cosang = jnp.clip(jnp.dot(target_dir, ik_dir), -1.0, 1.0)
            angle = jnp.minimum(jnp.arccos(cosang), angle_limit * (j + 1))
            q = m3.axis_angle_to_quat(axis, angle)
            new_ik = m3.quat_mul(q, ik_rot[b])

            if bool(ik.limited[j]):
                local_rotation = m3.quat_mul(new_ik, pre_ik_rot[b])
                order = ik.orders[j]
                euler = m3.quat_to_euler(local_rotation, order)
                euler = _limit_euler(euler, jnp.asarray(ik.limits_min[j]),
                                     jnp.asarray(ik.limits_max[j]), mirror)
                local_rotation = m3.euler_to_quat(euler, order)
                new_ik = m3.quat_mul(local_rotation,
                                     m3.quat_conj(pre_ik_rot[b]))
            ik_rot = ik_rot.at[b].set(new_ik)

            # refresh chain worlds from this link down to links[0]
            for k in range(j, -1, -1):
                world, total_rot = _refresh_link_world(
                    static, world, total_rot, total_trans, ik_rot, pre_ik_rot,
                    links[k])
            world, total_rot, _, _ = fk_target(world, total_rot, total_trans,
                                               pre_ik_rot, ik_rot)
            target_pos = world[ik.target, :3, 3]

        err = ik_position - target_pos
        new_done = done | (jnp.sum(err * err) < _EPS)
        sel = lambda n, o: jnp.where(done, o, n)
        world = sel(world, old[0])
        total_rot = sel(total_rot, old[1])
        ik_rot = sel(ik_rot, old[2])
        target_pos = sel(target_pos, old[3])
        return world, total_rot, ik_rot, target_pos, new_done

    world, total_rot, ik_rot, target_pos, _ = jax.lax.fori_loop(
        0, ik.loop, iteration,
        (pose.world, pose.total_rot, pose.ik_rot, target_pos, done0))
    return pose.replace(world=world, total_rot=total_rot, ik_rot=ik_rot)


def _run_segments(static: ModelStatic, pose: PoseArrays, segments,
                  anim_rot, anim_trans, morph_rot, morph_trans) -> PoseArrays:
    for seg in segments:
        if seg.kind == "fk":
            for level in seg.levels:
                pose = _fk_bones(static, pose, level, anim_rot, anim_trans,
                                 morph_rot, morph_trans)
        else:
            pose = _fk_bones(static, pose,
                             jnp.asarray([seg.ik.bone], jnp.int32),
                             anim_rot, anim_trans, morph_rot, morph_trans)
            pose = _solve_ik(static, pose, seg.ik, anim_rot, anim_trans,
                             morph_rot, morph_trans)
    return pose


def _update_skin(static: ModelStatic, pose: PoseArrays, bones) -> PoseArrays:
    """skinning = world @ T(-rest) (UpdateBoneSkinningMatrix, only for the
    listed bones — physics-written matrices of other bones must survive)."""
    if len(bones) == 0:
        return pose
    idx = jnp.asarray(bones)
    w = pose.world[idx]
    rest = jnp.asarray(static.bone_rest)[idx]
    trans = w[:, :3, 3] - jnp.einsum("bij,bj->bi", w[:, :3, :3], rest)
    skin = w.at[:, :3, 3].set(trans)
    return pose.replace(skin=pose.skin.at[idx].set(skin))


def _segment_bones(segments) -> list[int]:
    out = []
    for seg in segments:
        if seg.kind == "fk":
            for level in seg.levels:
                out.extend(int(b) for b in level)
        else:
            out.append(seg.ik.bone)
    return out


def pre_physics_posing(static: ModelStatic, anim_rot, anim_trans,
                       morph_rates) -> PoseArrays:
    """PrePhysicsPosing (poser_impl.inl:362-389): clear, morphs, FK+IK over
    pre-physics bones, skinning matrices for those bones."""
    pose = init_pose(static)
    vertex_offsets, morph_rot, morph_trans = apply_morphs(static, morph_rates)
    pose = pose.replace(vertex_offsets=vertex_offsets)
    pose = _run_segments(static, pose, static.pre_segments,
                         anim_rot, anim_trans, morph_rot, morph_trans)
    pre_bones = _segment_bones(static.pre_segments)
    return _update_skin(static, pose, pre_bones)


def post_physics_posing(static: ModelStatic, pose: PoseArrays, anim_rot,
                        anim_trans, morph_rates) -> PoseArrays:
    """PostPhysicsPosing (poser_impl.inl:391-394)."""
    if static.n_morphs:
        _, morph_rot, morph_trans = apply_morphs(static, morph_rates)
    else:
        morph_rot = m3.quat_identity((static.n_bones,))
        morph_trans = jnp.zeros((static.n_bones, 3), jnp.float32)
    pose = _run_segments(static, pose, static.post_segments,
                         anim_rot, anim_trans, morph_rot, morph_trans)
    post_bones = _segment_bones(static.post_segments)
    return _update_skin(static, pose, post_bones)


# ---------------------------------------------------------------------------
# Deform (poser_impl.inl:396-461): uniform 4-wide linear blend skinning
# ---------------------------------------------------------------------------

def deform(static: ModelStatic, pose: PoseArrays):
    """-> (positions [N,3], normals [N,3]) in MMD units.

    BDEF1/BDEF2/BDEF4 and the reference's SDEF->BDEF2 matrix-lerp fallback all
    reduce to M = sum_k w_k * skin[b_k] on 4-wide normalized tables."""
    bones = jnp.asarray(static.skin_bones)      # [N,4]
    weights = jnp.asarray(static.skin_weights)  # [N,4]
    mats = pose.skin[bones]                     # [N,4,4,4]
    blend = jnp.einsum("nk,nkij->nij", weights, mats)
    p = jnp.asarray(static.positions) + pose.vertex_offsets
    out_pos = jnp.einsum("nij,nj->ni", blend[:, :3, :3], p) + blend[:, :3, 3]
    out_nrm = jnp.einsum("nij,nj->ni", blend[:, :3, :3],
                         jnp.asarray(static.normals))
    return out_pos, out_nrm
