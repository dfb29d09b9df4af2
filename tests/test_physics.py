import numpy as np
import jax.numpy as jnp

from simple_mmd_renderer_tpu.formats import pmx as P
from simple_mmd_renderer_tpu.core import model as M
from simple_mmd_renderer_tpu.core import pose as PO
from simple_mmd_renderer_tpu.core import physics as PH
from simple_mmd_renderer_tpu.config import PhysicsConfig

from fixtures import two_bone_arm
from simple_mmd_renderer_tpu.utils import math3d as m3


def _body(name, bone, shape=P.SHAPE_SPHERE, dims=(1.0, 0, 0), pos=(0, 10, 0),
          rot=(0, 0, 0), mass=1.0, btype=P.RIGID_PHYSICS, group=0,
          mask=0xFFFF, damp=0.0, restitution=0.0, friction=0.5):
    return P.RigidBody(name, name, bone, group, mask, shape,
                       np.asarray(dims, np.float32),
                       np.asarray(pos, np.float32),
                       np.asarray(rot, np.float32),
                       mass, damp, damp, restitution, friction, btype)


def _joint(a, b, pos, lin_lo=(0, 0, 0), lin_hi=(0, 0, 0),
           ang_lo=(0, 0, 0), ang_hi=(0, 0, 0), k_lin=(0, 0, 0),
           k_ang=(0, 0, 0), rot=(0, 0, 0)):
    return P.Constraint("j", "j", a, b, np.asarray(pos, np.float32),
                        np.asarray(rot, np.float32),
                        np.asarray(lin_lo, np.float32),
                        np.asarray(lin_hi, np.float32),
                        np.asarray(ang_lo, np.float32),
                        np.asarray(ang_hi, np.float32),
                        np.asarray(k_lin, np.float32),
                        np.asarray(k_ang, np.float32))


def _setup(bodies, joints=()):
    pm = two_bone_arm()
    pm.rigid_bodies = list(bodies)
    pm.constraints = list(joints)
    static = M.build_model(pm)
    ps = PH.build_physics(static)
    b = static.n_bones
    rot = jnp.tile(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (b, 1))
    trans = jnp.zeros((b, 3), jnp.float32)
    rates = jnp.zeros(static.n_morphs, jnp.float32)
    pose = PO.pre_physics_posing(static, rot, trans, rates)
    return pm, static, ps, pose


def _jit_react(static, ps, cfg):
    import jax

    @jax.jit
    def step(state, pose):
        return PH.physics_react(static, ps, state, pose, cfg)

    return step


def test_free_fall():
    pm, static, ps, pose = _setup(
        [_body("ball", -1, pos=(0, 100, 0), mask=0)])
    cfg = PhysicsConfig(has_floor=False)
    state = PH.physics_reset(ps, pose)
    y0 = float(state.pos[0, 1])
    t = 0.0
    step = _jit_react(static, ps, cfg)
    for _ in range(30):  # 1 second
        state, pose = step(state, pose)
        t += cfg.dt
    # y ~ y0 - 0.5*g*t^2 with g = 98 (x10 world scale)
    expect = y0 - 0.5 * 98.0 * t * t
    assert abs(float(state.pos[0, 1]) - expect) < 5.0
    assert abs(float(state.vel[0, 1]) + 98.0) < 5.0


def test_sphere_settles_on_floor():
    pm, static, ps, pose = _setup(
        [_body("ball", -1, dims=(1.5, 0, 0), pos=(0, 6, 0), mask=0)])
    cfg = PhysicsConfig()
    state = PH.physics_reset(ps, pose)
    step = _jit_react(static, ps, cfg)
    for _ in range(90):  # 3 seconds
        state, pose = step(state, pose)
    assert abs(float(state.pos[0, 1]) - 1.5) < 0.1
    assert abs(float(state.vel[0, 1])) < 2.0


def test_kinematic_follows_bone():
    pm, static, ps, pose0 = _setup(
        [_body("anchor", 0, pos=(0, 0, 0), btype=P.RIGID_KINEMATIC, mass=0.0)])
    cfg = PhysicsConfig()
    state = PH.physics_reset(ps, pose0)
    # move bone 0 up by 3
    b = static.n_bones
    rot = jnp.tile(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (b, 1))
    trans = jnp.zeros((b, 3), jnp.float32).at[0, 1].set(3.0)
    rates = jnp.zeros(static.n_morphs, jnp.float32)
    pose = PO.pre_physics_posing(static, rot, trans, rates)
    state, pose = PH.physics_react(static, ps, state, pose, cfg)
    np.testing.assert_allclose(state.pos[0], [0, 3, 0], atol=1e-5)


def test_locked_joint_hangs_and_swings():
    # kinematic anchor at bone0 origin; dynamic ball 2 units along +x,
    # joint at the anchor with locked linear axes and free angular axes
    bodies = [
        _body("anchor", 0, pos=(0, 0, 0), btype=P.RIGID_KINEMATIC, mass=0.0,
              group=0, mask=0),
        _body("ball", -1, dims=(0.5, 0, 0), pos=(2, 0, 0), mass=1.0,
              group=1, mask=0),
    ]
    joints = [_joint(0, 1, pos=(0, 0, 0),
                     ang_lo=(1, 1, 1), ang_hi=(-1, -1, -1))]  # lo>hi: free
    pm, static, ps, pose = _setup(bodies, joints)
    cfg = PhysicsConfig(has_floor=False)
    state = PH.physics_reset(ps, pose)
    dist0 = float(jnp.linalg.norm(state.pos[1] - state.pos[0]))
    step = _jit_react(static, ps, cfg)
    for _ in range(60):
        state, pose = step(state, pose)
    # the ball swings down around the anchor, roughly preserving distance
    dist = float(jnp.linalg.norm(state.pos[1] - state.pos[0]))
    assert abs(dist - dist0) < 0.5
    assert float(state.pos[1, 1]) < -0.5  # fell below the anchor


def test_angular_spring_resists_gravity():
    bodies = [
        _body("anchor", 0, pos=(0, 0, 0), btype=P.RIGID_KINEMATIC, mass=0.0,
              group=0, mask=0),
        _body("ball", -1, dims=(0.5, 0, 0), pos=(2, 0, 0), mass=1.0,
              group=1, mask=0),
    ]
    stiff = [_joint(0, 1, pos=(0, 0, 0), ang_lo=(1, 1, 1),
                    ang_hi=(-1, -1, -1), k_ang=(5000.0, 5000.0, 5000.0))]
    loose = [_joint(0, 1, pos=(0, 0, 0), ang_lo=(1, 1, 1),
                    ang_hi=(-1, -1, -1))]
    drops = []
    for joints in (stiff, loose):
        pm, static, ps, pose = _setup(bodies, joints)
        cfg = PhysicsConfig(has_floor=False)
        state = PH.physics_reset(ps, pose)
        step = _jit_react(static, ps, cfg)
        for _ in range(30):
            state, pose = step(state, pose)
        drops.append(-float(state.pos[1, 1]))
    assert drops[0] < drops[1] - 0.2, f"spring should resist sag: {drops}"


def test_writeback_dynamic_vs_ghost():
    for btype, expect_write in ((P.RIGID_PHYSICS, True),
                                (P.RIGID_PHYSICS_GHOST, False),
                                (P.RIGID_KINEMATIC, False)):
        pm, static, ps, pose = _setup(
            [_body("b", 1, pos=(1, 0, 0), btype=btype,
                   mass=0.0 if btype == P.RIGID_KINEMATIC else 1.0, mask=0)])
        cfg = PhysicsConfig(has_floor=False)
        state = PH.physics_reset(ps, pose)
        skin_before = np.asarray(pose.skin[1])
        state, pose2 = PH.physics_react(static, ps, state, pose, cfg)
        moved = not np.allclose(np.asarray(pose2.skin[1]), skin_before,
                                atol=1e-4)
        assert moved == expect_write, (btype, moved)


def test_sphere_sphere_contact_separates():
    bodies = [
        _body("a", -1, dims=(1.0, 0, 0), pos=(0, 5, 0), group=0, mask=0xFFFF),
        _body("b", -1, dims=(1.0, 0, 0), pos=(0.5, 5.3, 0), group=0,
              mask=0xFFFF),
    ]
    pm, static, ps, pose = _setup(bodies)
    assert len(ps.pair_i) == 1
    cfg = PhysicsConfig(has_floor=False)
    state = PH.physics_reset(ps, pose)
    state, pose = PH.physics_react(static, ps, state, pose, cfg)
    d = float(jnp.linalg.norm(state.pos[0] - state.pos[1]))
    assert d > 1.6  # overlapping spheres pushed apart toward r0+r1=2


def test_collision_mask_filtering():
    bodies = [
        _body("a", -1, group=0, mask=0xFFFE),  # doesn't collide with group 0
        _body("b", -1, group=0, mask=0xFFFF),
    ]
    pm, static, ps, pose = _setup(bodies)
    assert len(ps.pair_i) == 0


def test_hair_chain_stable_10s():
    # kinematic root + 3-link chain of capsules with limited joints, driven by
    # a waving bone — must not explode over 10 simulated seconds
    bodies = [_body("root", 0, btype=P.RIGID_KINEMATIC, mass=0.0,
                    pos=(0, 0, 0), group=0, mask=0)]
    joints = []
    for k in range(3):
        bodies.append(_body(f"link{k}", -1, shape=P.SHAPE_CAPSULE,
                            dims=(0.3, 1.0, 0), pos=(0, -1.5 * (k + 1), 0),
                            mass=0.2, damp=0.5, group=1, mask=0))
        joints.append(_joint(k, k + 1, pos=(0, -1.5 * k - 0.75, 0),
                             ang_lo=(-0.5, -0.5, -0.5), ang_hi=(0.5, 0.5, 0.5),
                             k_ang=(50.0, 50.0, 50.0)))
    pm, static, ps, pose = _setup(bodies, joints)
    cfg = PhysicsConfig()
    state = PH.physics_reset(ps, pose)
    b = static.n_bones
    rates = jnp.zeros(static.n_morphs, jnp.float32)
    rot0 = jnp.tile(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (b, 1))
    import jax

    @jax.jit
    def frame(state, rot):
        pose = PO.pre_physics_posing(static, rot, jnp.zeros((b, 3)), rates)
        return PH.physics_react(static, ps, state, pose, cfg)

    for f in range(300):
        ang = 0.6 * np.sin(f / 15.0)
        rot = rot0.at[0].set(jnp.asarray(
            [0, 0, np.sin(ang / 2), np.cos(ang / 2)], jnp.float32))
        state, pose = frame(state, rot)
        if f % 30 == 0:
            assert np.isfinite(np.asarray(state.pos)).all()
    assert float(jnp.abs(state.pos).max()) < 50.0, "chain exploded"
    # chain stays connected
    gaps = np.linalg.norm(np.diff(np.asarray(state.pos), axis=0), axis=-1)
    assert (gaps < 4.0).all()


def test_sample_character_hair_hangs():
    """Regression: separated pairs must not act as phantom contacts (a cached
    depth clamp once sent the sample character's hair floating above its
    head)."""
    from simple_mmd_renderer_tpu.app.sample import (sample_character,
                                                    sample_motion)
    from simple_mmd_renderer_tpu.core import anim as A
    from simple_mmd_renderer_tpu.core.scene import Scene
    from simple_mmd_renderer_tpu.config import AppConfig

    pm = sample_character(density=0.25)
    static = M.build_model(pm)
    mo = A.bind_motion(static, sample_motion(90, fps_keys=10))
    ps = PH.build_physics(static)
    scene = Scene(static, ps, mo, AppConfig())
    state = scene.init_state()
    step = scene.jit_step(render=False, donate=False)
    hair = [i for i, b in enumerate(pm.rigid_bodies)
            if b.name.startswith("髪")]
    rest_top = float(np.asarray(state.physics.pos)[hair][:, 1].max())
    for _ in range(45):
        state, *_ = step(state)
    hp = np.asarray(state.physics.pos)[hair]
    assert np.isfinite(hp).all()
    assert hp[:, 1].max() < rest_top + 1.5, "hair climbed above its anchors"
    assert hp[:, 1].min() > 5.0, "hair fell through the body"


def _slide_distance(friction, frames=45):
    """Horizontal distance a sphere with initial +x velocity slides on the
    floor before the measurement window ends."""
    pm, static, ps, pose = _setup(
        [_body("ball", -1, dims=(1.0, 0, 0), pos=(0, 1.0, 0), mask=0,
               friction=friction)])
    cfg = PhysicsConfig()
    state = PH.physics_reset(ps, pose)
    state = state.replace(vel=state.vel.at[0, 0].set(15.0))
    step = _jit_react(static, ps, cfg)
    for _ in range(frames):
        state, pose = step(state, pose)
    return float(state.pos[0, 0]), float(state.vel[0, 0])


def test_floor_friction_coulomb():
    """Sliding decelerates at ~mu*g (mu = body * floor per Bullet's combine),
    so high-mu bodies stop and low-mu bodies keep sliding
    (mmd-bullet_impl.inl:88, :195)."""
    x_hi, v_hi = _slide_distance(friction=4.0)   # mu = 4.0 * 0.265 ~ 1.06
    x_lo, v_lo = _slide_distance(friction=0.2)   # mu = 0.2 * 0.265 ~ 0.05
    # mu*g decel: the high-mu ball stops within a couple of units (friction
    # acts at the contact point like Bullet's manifold solver, so part of
    # the correction spins the ball up — it travels farther than a pure
    # center-translation model before stopping); the low-mu ball barely
    # slows over 1.5 s (~17 u)
    assert v_hi < 0.5, f"high-friction ball still sliding: v={v_hi}"
    assert x_hi < 4.5, f"high-friction ball slid too far: x={x_hi}"
    assert x_lo > 2.0 * x_hi, f"low-friction ball should slide farther: " \
        f"{x_lo} vs {x_hi}"
    assert v_lo > 5.0, f"low-friction ball decelerated too hard: v={v_lo}"


def test_frictionless_floor_slides_freely():
    pm, static, ps, pose = _setup(
        [_body("ball", -1, dims=(1.0, 0, 0), pos=(0, 1.0, 0), mask=0,
               friction=0.0)])
    cfg = PhysicsConfig()
    state = PH.physics_reset(ps, pose)
    state = state.replace(vel=state.vel.at[0, 0].set(10.0))
    step = _jit_react(static, ps, cfg)
    for _ in range(30):
        state, pose = step(state, pose)
    # 1 second at 10 u/s, zero tangential resistance
    assert abs(float(state.pos[0, 0]) - 10.0) < 0.5
    assert abs(float(state.vel[0, 0]) - 10.0) < 0.5


def test_floor_restitution_bounces():
    """With floor restitution enabled a bouncy sphere rebounds to ~e^2 of the
    drop height; with the reference's floor (restitution 0) it does not."""
    def peak_after_bounce(floor_restitution):
        pm, static, ps, pose = _setup(
            [_body("ball", -1, dims=(1.0, 0, 0), pos=(0, 15.0, 0), mask=0,
                   restitution=0.9)])
        cfg = PhysicsConfig(floor_restitution=floor_restitution)
        state = PH.physics_reset(ps, pose)
        step = _jit_react(static, ps, cfg)
        ys, touched = [], False
        for _ in range(90):
            state, pose = step(state, pose)
            y = float(state.pos[0, 1])
            touched = touched or y < 1.2
            if touched:
                ys.append(y)
        return max(ys)

    bouncy = peak_after_bounce(1.0)       # e = 0.9 * 1.0
    dead = peak_after_bounce(0.0)         # the reference's ground
    assert bouncy > 6.0, f"no rebound: peak {bouncy}"
    assert dead < 2.0, f"restitution-0 floor rebounded: peak {dead}"


def test_pair_restitution_bounces():
    """Body-body restitution: a bouncy ball dropped on a heavy kinematic box
    rebounds; a dead ball stays."""
    def peak(rest):
        bodies = [
            _body("slab", 0, shape=P.SHAPE_BOX, dims=(4.0, 1.0, 4.0),
                  pos=(0, 1.0, 0), btype=P.RIGID_KINEMATIC, mass=0.0,
                  restitution=1.0),
            _body("ball", -1, dims=(0.5, 0, 0), pos=(0, 10.0, 0), mass=1.0,
                  restitution=rest),
        ]
        pm, static, ps, pose = _setup(bodies)
        assert len(ps.pair_i) == 1
        cfg = PhysicsConfig(has_floor=False)
        state = PH.physics_reset(ps, pose)
        step = _jit_react(static, ps, cfg)
        ys, touched = [], False
        for _ in range(90):
            state, pose = step(state, pose)
            y = float(state.pos[1, 1])
            touched = touched or y < 3.0
            if touched:
                ys.append(y)
        return max(ys)

    assert peak(0.9) > 4.5, "bouncy ball did not rebound off the box"
    assert peak(0.0) < 3.5, "dead ball rebounded"


def test_tilted_capsule_topples():
    """Ground contacts resolve at the contact point with inertia weighting
    (Bullet's manifold solver): a capsule leaning 25 deg off vertical,
    resting with its lower cap on the floor, must fall over — the off-center
    floor push produces the toppling torque. A pure center-of-mass
    translation (the r2 implementation) keeps it levitating at its initial
    tilt forever."""
    # capsule: radius 0.3, half-height 1.2, tilted about z, lower cap at
    # floor level; rot (0,0,zz) is YXZ euler
    tilt = np.deg2rad(25.0)
    # center so the lower cap just touches: cap center sits at h*cos(tilt)
    # below body center; touch when center_y = h*cos + r
    cy = 1.2 * np.cos(tilt) + 0.3
    pm, static, ps, pose = _setup(
        [_body("cap", -1, shape=P.SHAPE_CAPSULE, dims=(0.3, 2.4, 0),
               pos=(0, cy, 0), rot=(0, 0, tilt), mask=0, friction=2.0)])
    cfg = PhysicsConfig()
    state = PH.physics_reset(ps, pose)
    step = _jit_react(static, ps, cfg)
    up0 = np.asarray(m3.quat_rotate(state.quat[0],
                                    jnp.asarray([0.0, 1.0, 0.0])))
    for _ in range(90):                      # 3 s
        state, pose = step(state, pose)
    up = np.asarray(m3.quat_rotate(state.quat[0],
                                   jnp.asarray([0.0, 1.0, 0.0])))
    # fell over: the long axis is now closer to horizontal than vertical
    assert up[1] < 0.6, f"capsule did not topple: up_y={up[1]} (start " \
        f"{up0[1]:.3f})"
    # and came to rest near the floor rather than sinking/exploding
    assert -0.5 < float(state.pos[0, 1]) < 1.0


def test_tilted_box_rests_flat():
    """Box-floor contacts are 4-corner manifolds (r3 VERDICT weak #3): a
    box dropped slightly tilted settles FLAT on the floor — torque-balanced
    on its face like Bullet's persistent manifold — without sinking below
    its rest height or jittering. The old single-deepest-corner contact
    could only rock on one corner."""
    tilt = np.deg2rad(12.0)
    pm, static, ps, pose = _setup(
        [_body("box", -1, shape=P.SHAPE_BOX, dims=(1.0, 0.5, 1.5),
               pos=(0, 1.6, 0), rot=(0, 0, tilt), mask=0, friction=0.8)])
    cfg = PhysicsConfig()
    state = PH.physics_reset(ps, pose)
    step = _jit_react(static, ps, cfg)
    for _ in range(90):                      # 3 s
        state, pose = step(state, pose)
    up = np.asarray(m3.quat_rotate(state.quat[0],
                                   jnp.asarray([0.0, 1.0, 0.0])))
    assert up[1] > 0.99, f"box did not settle flat: up_y={up[1]}"
    # rest height = the y half extent; no sinking, no levitation
    assert abs(float(state.pos[0, 1]) - 0.5) < 0.08, \
        f"rest height {float(state.pos[0, 1])} (expected 0.5)"
    # at rest: near-zero residual motion over a further second
    ys = []
    for _ in range(30):
        state, pose = step(state, pose)
        ys.append(float(state.pos[0, 1]))
    assert max(ys) - min(ys) < 0.02, f"resting box jitters: {ys[:8]}"


def test_elongated_boxes_contact_at_face_distance():
    """Box-box SAT manifold (r3 VERDICT weak #3): a tall box dropped onto a
    kinematic tall box along their LONG axes must rest at face distance
    (center gap = sum of the y half extents). The old min-half-extent
    center-distance proxy only detected contact once the centers were
    within the sum of the THINNEST half extents — here 2.0 of the needed
    4.0 — so the falling box sank halfway into the other."""
    bodies = [
        _body("pillar", 0, shape=P.SHAPE_BOX, dims=(1.0, 2.0, 1.0),
              pos=(0, 2.0, 0), btype=P.RIGID_KINEMATIC, mass=0.0),
        _body("stack", -1, shape=P.SHAPE_BOX, dims=(1.0, 2.0, 1.0),
              pos=(0, 7.0, 0), mass=1.0, friction=0.8),
    ]
    pm, static, ps, pose = _setup(bodies)
    assert len(ps.pair_i) == 1
    cfg = PhysicsConfig(has_floor=False)
    state = PH.physics_reset(ps, pose)
    step = _jit_react(static, ps, cfg)
    for _ in range(120):                     # 4 s
        state, pose = step(state, pose)
    y = float(state.pos[1, 1])
    # face contact: pillar top at y=4, stack half extent 2 -> center at 6
    assert abs(y - 6.0) < 0.15, f"stacked box rests at {y}, expected 6.0"
    up = np.asarray(m3.quat_rotate(state.quat[1],
                                   jnp.asarray([0.0, 1.0, 0.0])))
    assert up[1] > 0.98, f"stacked box tipped: up_y={up[1]}"


def test_lying_capsule_rests_level():
    """Capsule-floor contacts carry both axis endpoints: a capsule lying
    horizontally rests level instead of see-sawing on whichever endpoint
    the single-contact picked."""
    pm, static, ps, pose = _setup(
        [_body("cap", -1, shape=P.SHAPE_CAPSULE, dims=(0.3, 2.0, 0),
               pos=(0, 0.5, 0), rot=(0, 0, np.pi / 2), mask=0,
               friction=0.8)])
    cfg = PhysicsConfig()
    state = PH.physics_reset(ps, pose)
    step = _jit_react(static, ps, cfg)
    for _ in range(60):
        state, pose = step(state, pose)
    # long axis (local Y, rotated to world X) stays horizontal
    axis = np.asarray(m3.quat_rotate(state.quat[0],
                                     jnp.asarray([0.0, 1.0, 0.0])))
    assert abs(axis[1]) < 0.1, f"lying capsule tilted: axis_y={axis[1]}"
    assert abs(float(state.pos[0, 1]) - 0.3) < 0.08
