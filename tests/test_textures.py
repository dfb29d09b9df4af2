import numpy as np
import jax.numpy as jnp

from simple_mmd_renderer_tpu.formats.textures import (sample_bilinear,
                                                      resolve_texture_path,
                                                      load_texture, WHITE_1X1)
from simple_mmd_renderer_tpu.render import raster
from simple_mmd_renderer_tpu.render.pipeline import (character_albedo,
                                                     _albedo_atlas)
from simple_mmd_renderer_tpu.core import model as M

from fixtures import two_bone_arm


def test_bilinear_sampling_basics():
    tex = np.zeros((4, 4, 3), np.float32)
    tex[:, :2] = [1, 0, 0]
    tex[:, 2:] = [0, 1, 0]
    uv = jnp.asarray([[0.125, 0.125], [0.875, 0.125], [0.5, 0.5]])
    out = np.asarray(sample_bilinear(tex, uv))
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)  # texel center
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], [0.5, 0.5, 0], atol=1e-6)  # boundary


def test_texture_fallback_white():
    assert load_texture("definitely_missing.png", "/nonexistent").shape == (1, 1, 3)
    assert resolve_texture_path("nope.png", "/nonexistent") is None


def _two_part_model():
    pm = two_bone_arm()
    pm.materials = [pm.materials[0], pm.materials[0].__class__(
        **{**pm.materials[0].__dict__})]
    pm.materials[0].n_triangles = 1
    pm.materials[0].base_shift = 0
    pm.materials[1].n_triangles = 1
    pm.materials[1].base_shift = 1
    return M.build_model(pm)


def test_atlas_matches_per_part():
    static = _two_part_model()
    rng = np.random.default_rng(0)
    tex_a = rng.random((8, 8, 3)).astype(np.float32)
    tex_b = rng.random((16, 4, 3)).astype(np.float32)
    textures = [tex_a, tex_b]

    h, w = 24, 32
    vis = raster.VisBuffer(
        depth=jnp.zeros((h, w)),
        tri=jnp.asarray(rng.integers(0, 2, (h, w)).astype(np.int32)),
        bary=jnp.zeros((h, w, 2)))
    uv = jnp.asarray(rng.random((h, w, 2)).astype(np.float32)) * 0.9

    atlas_out = np.asarray(_albedo_atlas(static, vis.tri, uv, textures))
    # per-part reference (force the loop path with a white dummy difference)
    ref = np.ones((h, w, 3), np.float32)
    for p, (base, count) in enumerate([(0, 1), (1, 1)]):
        mask = (np.asarray(vis.tri) >= base) & (np.asarray(vis.tri) < base + count)
        col = np.asarray(sample_bilinear(textures[p], uv))
        ref[mask] = col[mask]
    # the atlas path filters in bf16 (1-gather packed neighborhoods); the
    # error bound is ~1 color level of 8-bit source data
    np.testing.assert_allclose(atlas_out, ref, atol=2.5 / 255.0)


def test_character_albedo_dispatches_to_atlas():
    static = _two_part_model()
    rng = np.random.default_rng(1)
    textures = [rng.random((8, 8, 3)).astype(np.float32),
                rng.random((8, 8, 3)).astype(np.float32)]
    h, w = 8, 8
    vis = raster.VisBuffer(
        depth=jnp.zeros((h, w)),
        tri=jnp.zeros((h, w), jnp.int32),
        bary=jnp.zeros((h, w, 2)))
    uv = jnp.full((h, w, 2), 0.3)
    out = np.asarray(character_albedo(static, vis.tri, uv, textures))
    assert out.shape == (h, w, 3)
    assert np.isfinite(out).all()


def test_shelf_atlas_packing_memory_and_placement():
    """Shelf packing allocates ~sum of areas, not n_parts * max_area, and
    never overlaps parts."""
    from simple_mmd_renderer_tpu.render.pipeline import _pack_atlas
    rng = np.random.default_rng(0)
    texs = [rng.random((256, 256, 3), np.float32)] + \
           [rng.random((32, 32, 3), np.float32) for _ in range(10)]
    atlas, offs, sizes = _pack_atlas(texs)
    assert atlas.shape[0] * atlas.shape[1] < 3 * sum(
        t.shape[0] * t.shape[1] for t in texs)
    seen = np.zeros(atlas.shape[:2], bool)
    for p, t in enumerate(texs):
        y, x = offs[p].astype(int)
        h, w = sizes[p].astype(int)
        assert (h, w) == t.shape[:2]
        assert not seen[y:y + h, x:x + w].any()
        seen[y:y + h, x:x + w] = True
        # channels 0:3 of the packed atlas are the texel's own color
        np.testing.assert_array_equal(atlas[y:y + h, x:x + w, :3], t)


def test_textured_sample_renders():
    """End-to-end textured frame through the shelf atlas (sample character +
    procedural per-part textures)."""
    import jax
    from simple_mmd_renderer_tpu.app.sample import (sample_character,
                                                    sample_motion,
                                                    sample_textures)
    from simple_mmd_renderer_tpu.config import AppConfig, RenderConfig
    from simple_mmd_renderer_tpu.core import anim as A
    from simple_mmd_renderer_tpu.core import model as M
    from simple_mmd_renderer_tpu.core import physics as PH
    from simple_mmd_renderer_tpu.core.scene import Scene

    pm = sample_character(density=0.25)
    static = M.build_model(pm)
    mo = A.bind_motion(static, sample_motion(30, fps_keys=10))
    cfg = AppConfig()
    cfg.render = RenderConfig(width=96, height=72, shadow_map_size=64,
                              show_skybox=False)
    scene = Scene(static, PH.build_physics(static), mo, cfg,
                  part_textures=sample_textures(sizes=(64, 32)))
    state, image = jax.jit(scene.step_and_render)(scene.init_state())
    img = np.asarray(image)
    assert np.isfinite(img).all() and img.min() >= 0 and img.max() <= 1
    # textured character must actually show texture variation (not all-white)
    assert img.std() > 0.02


def test_windowed_albedo_matches_full_frame():
    """The bbox-window albedo (lax.switch over static window sizes) must be
    exact (to f32 fusion rounding) on every covered pixel and white outside the character bbox."""
    from simple_mmd_renderer_tpu.render.pipeline import (
        character_albedo_windowed)
    static = _two_part_model()
    rng = np.random.default_rng(5)
    textures = [rng.random((16, 16, 3)).astype(np.float32),
                rng.random((8, 8, 3)).astype(np.float32)]
    h, w = 544, 1024
    tri = np.full((h, w), -1, np.int32)
    # character patch away from the origin (forces nonzero window offsets)
    tri[200:330, 500:700] = rng.integers(0, 2, (130, 200))
    tri_j = jnp.asarray(tri)
    uv = jnp.asarray(rng.random((h, w, 2)).astype(np.float32))
    got = np.asarray(character_albedo_windowed(static, tri_j, uv, textures))
    ref = np.asarray(character_albedo(static, tri_j, uv, textures))
    covered = tri >= 0
    np.testing.assert_allclose(got[covered], ref[covered], atol=1e-6)
    # outside the WINDOW (offsets align down to the (8, 128) register
    # tile: y=200, x=384): exact white (masked downstream anyway)
    assert (got[:200] == 1.0).all() and (got[:, :384] == 1.0).all()


def test_float_textures_take_exact_f32_atlas():
    """Textures off the 8-bit grid must sample bit-exactly (r2 ADVICE: the
    u32 atlas silently quantized procedural float textures)."""
    static = _two_part_model()
    rng = np.random.default_rng(9)
    textures = [rng.random((8, 8, 3)).astype(np.float32),
                rng.random((4, 4, 3)).astype(np.float32)]
    h, w = 16, 24
    tri = jnp.asarray(rng.integers(0, 2, (h, w)).astype(np.int32))
    uv = jnp.asarray(rng.random((h, w, 2)).astype(np.float32)) * 0.9
    out = np.asarray(_albedo_atlas(static, tri, uv, textures))
    ref = np.ones((h, w, 3), np.float32)
    for p in range(2):
        mask = np.asarray(tri) == p
        col = np.asarray(sample_bilinear(textures[p], uv))
        ref[mask] = col[mask]
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # and 8-bit-exact textures still produce 8-bit-exact results
    textures8 = [np.round(t * 255.0) / 255.0 for t in textures]
    out8 = np.asarray(_albedo_atlas(static, tri, uv,
                                    [t.astype(np.float32)
                                     for t in textures8]))
    ref8 = np.ones((h, w, 3), np.float32)
    for p in range(2):
        mask = np.asarray(tri) == p
        col = np.asarray(sample_bilinear(textures8[p].astype(np.float32), uv))
        ref8[mask] = col[mask]
    np.testing.assert_allclose(out8, ref8, atol=1.5 / 255.0)


import pytest


@pytest.mark.parametrize("n_parts", [2, 16])
def test_deferred_uv_matches_kernel_uv_channels(n_parts):
    """The windowed deferred-UV path (affine reconstruction from the
    visibility buffer; fused part-placement rows when >1 part,
    affine_uv_part_rows/_albedo_rows) must match carrying UV through the
    raster kernel to sub-texel accuracy on character-scale triangles."""
    import dataclasses
    import jax
    from simple_mmd_renderer_tpu.app.sample import (sample_character,
                                                    sample_textures)
    from simple_mmd_renderer_tpu.config import RenderConfig
    from simple_mmd_renderer_tpu.core import pose as PO
    from simple_mmd_renderer_tpu.render.pipeline import render_frame
    import jax.numpy as jnp

    pm = sample_character(density=0.3, n_parts=n_parts)
    static = M.build_model(pm)
    b = static.n_bones
    rot = jnp.broadcast_to(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (b, 4))
    pose = PO.pre_physics_posing(
        static, rot, jnp.zeros((b, 3), jnp.float32),
        jnp.zeros((static.n_morphs,), jnp.float32))
    pos, nrm = PO.deform(static, pose)
    sizes = tuple((64, 32, 48, 16)[i % 4] for i in range(n_parts))
    textures = sample_textures(sizes=sizes)
    cfg = RenderConfig(width=640, height=416, shadow_map_size=64,
                       show_skybox=False, raster_mode="tiled",
                       shadows_enabled=False)
    img_win = np.asarray(render_frame(static, pos, nrm, cfg,
                                      part_textures=textures))
    cfg_full = dataclasses.replace(cfg, albedo_window=False)
    img_full = np.asarray(render_frame(static, pos, nrm, cfg_full,
                                       part_textures=textures))
    diff = np.abs(img_win - img_full)
    assert (diff > 2.5 / 255.0).mean() < 1e-3, (diff.max(), diff.mean())


def test_textured_msaa_native_composes_with_deferred_uv():
    """Textures + native per-sample 4x MSAA (the reference's complete
    operating quality, main.cpp:2093-2146 + 2502-2504) must compose: the
    MS kernel's visibility buffer feeds the fused-row albedo path."""
    import dataclasses
    from simple_mmd_renderer_tpu.app.sample import (sample_character,
                                                    sample_textures)
    from simple_mmd_renderer_tpu.config import RenderConfig
    from simple_mmd_renderer_tpu.core import pose as PO
    from simple_mmd_renderer_tpu.render.pipeline import render_frame

    pm = sample_character(density=0.3)
    static = M.build_model(pm)
    b = static.n_bones
    rot = jnp.broadcast_to(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (b, 4))
    pose = PO.pre_physics_posing(
        static, rot, jnp.zeros((b, 3), jnp.float32),
        jnp.zeros((static.n_morphs,), jnp.float32))
    pos, nrm = PO.deform(static, pose)
    textures = sample_textures(sizes=(64, 32))
    cfg = RenderConfig(width=320, height=240, shadow_map_size=64,
                       show_skybox=False, raster_mode="tiled",
                       shadows_enabled=False, msaa=4)
    img_ms = np.asarray(render_frame(static, pos, nrm, cfg,
                                     part_textures=textures))
    cfg1 = dataclasses.replace(cfg, msaa=1)
    img_1 = np.asarray(render_frame(static, pos, nrm, cfg1,
                                    part_textures=textures))
    assert np.isfinite(img_ms).all()
    # antialiasing: close overall, fractional coverage at edges
    assert np.abs(img_ms - img_1).mean() < 0.05
    d = np.abs(img_ms - img_1).max(-1)
    assert (d > 0.02).any(), "MSAA changed no edge pixels"


def test_mip_atlas_chain_tables():
    """build_packed_atlas(mip_levels=L): every level of every part is
    packed; level sizes halve (box filter, 8-bit-requantized for 8-bit
    sources); exhausted chains repeat their last level."""
    from simple_mmd_renderer_tpu.render.pipeline import (build_packed_atlas,
                                                         _downsample2)
    rng = np.random.default_rng(11)
    t0 = (np.round(rng.random((32, 16, 3)) * 255) / 255).astype(np.float32)
    t1 = (np.round(rng.random((4, 4, 3)) * 255) / 255).astype(np.float32)
    atlas = build_packed_atlas([t0, t1], mip_levels=4)
    assert atlas.n_mips == 4
    assert atlas.mip_offsets.shape == (2, 4, 2)
    ms = np.asarray(atlas.mip_sizes)
    np.testing.assert_array_equal(ms[0], [[32, 16], [16, 8], [8, 4], [4, 2]])
    # part 1 runs out after level 2 (1x1) and repeats it
    np.testing.assert_array_equal(ms[1], [[4, 4], [2, 2], [1, 1], [1, 1]])
    # level-1 region of part 0 holds the quantized box-filtered texels
    # (decode channel 0:3 of the u32 packing at that offset)
    oy, ox = np.asarray(atlas.mip_offsets)[0, 1]
    q = np.asarray(atlas.data)[oy:oy + 16, ox:ox + 8, 0]
    dec = np.stack([q & 0xFF, (q >> 8) & 0xFF, (q >> 16) & 0xFF],
                   -1).astype(np.float32) / 255.0
    want = np.round(_downsample2(t0) * 255) / 255
    np.testing.assert_allclose(dec, want, atol=0.6 / 255.0)


def test_mip_rows_select_level_from_screen_area():
    """affine_uv_part_rows + screen_xy: magnified triangles keep level 0
    (rows identical to the no-mip atlas); minified triangles address a
    higher level, scaling UVs into that level's texel space."""
    import jax.numpy as jnp
    from simple_mmd_renderer_tpu.render.pipeline import (affine_uv_part_rows,
                                                         build_packed_atlas)
    static = _two_part_model()
    rng = np.random.default_rng(12)
    t = (np.round(rng.random((64, 64, 3)) * 255) / 255).astype(np.float32)
    texs = [t, t]
    atlas0 = build_packed_atlas(texs)
    atlasm = build_packed_atlas(texs, mip_levels=5)
    uvs = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], jnp.float32)
    tris = jnp.asarray([[0, 1, 2], [0, 1, 2]], jnp.int32)
    # tri 0 magnified: 64 texels span 512 px -> level 0
    # tri 1 minified by reuse of the same verts? need distinct screens ->
    # use per-call screen tables
    screen_big = jnp.asarray([[0, 0], [512, 0], [0, 512]], jnp.float32)
    screen_small = jnp.asarray([[0, 0], [8, 0], [0, 8]], jnp.float32)
    rows_big = np.asarray(affine_uv_part_rows(uvs, tris, atlasm, static,
                                              screen_xy=screen_big))
    rows0 = np.asarray(affine_uv_part_rows(uvs, tris, atlas0, static))
    # same level-0 size/uv scale (offsets may differ between the two
    # atlases; compare sizes and texel-space uv deltas)
    np.testing.assert_allclose(rows_big[:, :6], rows0[:, :6], atol=1e-5)
    np.testing.assert_allclose(rows_big[:, 8:10], rows0[:, 8:10])
    rows_small = np.asarray(affine_uv_part_rows(uvs, tris, atlasm, static,
                                                screen_xy=screen_small))
    # 64 texels over 8 px -> rho = 8 -> level 3 -> 8x8 texel space
    np.testing.assert_allclose(rows_small[:, 8:10], [[8, 8], [8, 8]])
    np.testing.assert_allclose(rows_small[:, 2], [8.0, 8.0], atol=1e-4)


def test_mip_textured_frame_matches_at_magnification():
    """A textured frame whose triangles are magnified matches the no-mip
    render except at sub-pixel sliver triangles on the silhouette (those
    legitimately select a higher level — per-triangle LOD); a strongly
    minified frame must still render finite and non-white."""
    import dataclasses
    import jax.numpy as jnp
    from simple_mmd_renderer_tpu.app.sample import (sample_character,
                                                    sample_textures)
    from simple_mmd_renderer_tpu.config import RenderConfig
    from simple_mmd_renderer_tpu.core import pose as PO
    from simple_mmd_renderer_tpu.render.pipeline import render_frame

    pm = sample_character(density=0.3)
    static = M.build_model(pm)
    b = static.n_bones
    rot = jnp.broadcast_to(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (b, 4))
    pose = PO.pre_physics_posing(
        static, rot, jnp.zeros((b, 3), jnp.float32),
        jnp.zeros((static.n_morphs,), jnp.float32))
    pos, nrm = PO.deform(static, pose)
    textures = sample_textures(sizes=(8, 4))   # tiny: always magnified
    cfg = RenderConfig(width=320, height=240, shadow_map_size=64,
                       show_skybox=False, raster_mode="tiled",
                       shadows_enabled=False)
    img0 = np.asarray(render_frame(static, pos, nrm, cfg,
                                   part_textures=textures))
    cfgm = dataclasses.replace(cfg, texture_mips=4)
    imgm = np.asarray(render_frame(static, pos, nrm, cfgm,
                                   part_textures=textures))
    frac = (np.abs(imgm - img0) > 1e-6).any(-1).mean()
    assert frac < 1e-3, frac  # only silhouette slivers may move levels
    # minified: big textures on a small frame
    big = sample_textures(sizes=(256, 128))
    cfg_s = dataclasses.replace(cfg, width=128, height=96, texture_mips=6)
    img_s = np.asarray(render_frame(static, pos, nrm, cfg_s,
                                    part_textures=big))
    assert np.isfinite(img_s).all()
    assert img_s.std() > 0.01


def test_resident_atlas_matches_level0_at_magnification():
    """texture_resident: when every part's needed level is 0 and fits the
    slot, the per-frame resident mini-atlas must reproduce the plain
    atlas render EXACTLY (same texels, relocated addressing); minified
    frames stay finite and close to the mip render."""
    import dataclasses
    import jax.numpy as jnp
    from simple_mmd_renderer_tpu.app.sample import (sample_character,
                                                    sample_textures)
    from simple_mmd_renderer_tpu.config import RenderConfig
    from simple_mmd_renderer_tpu.core import pose as PO
    from simple_mmd_renderer_tpu.render.pipeline import render_frame

    pm = sample_character(density=0.3)
    static = M.build_model(pm)
    b = static.n_bones
    rot = jnp.broadcast_to(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (b, 4))
    pose = PO.pre_physics_posing(
        static, rot, jnp.zeros((b, 3), jnp.float32),
        jnp.zeros((static.n_morphs,), jnp.float32))
    pos, nrm = PO.deform(static, pose)
    textures = sample_textures(sizes=(16, 8))  # tiny: level 0 fits any slot
    cfg = RenderConfig(width=320, height=240, shadow_map_size=64,
                       show_skybox=False, raster_mode="tiled",
                       shadows_enabled=False, texture_mips=3)
    cfg0 = dataclasses.replace(cfg, texture_mips=0)
    img_l0 = np.asarray(render_frame(static, pos, nrm, cfg0,
                                     part_textures=textures))
    cfg_res = dataclasses.replace(cfg, texture_resident=True)
    img_res = np.asarray(render_frame(static, pos, nrm, cfg_res,
                                      part_textures=textures))
    # resident level = most-detailed needed level per part, applied to ALL
    # of the part's triangles; with tiny magnified textures that is level 0
    # everywhere (even silhouette slivers) -> must EXACTLY equal the
    # no-mip render (same texels, relocated addresses)
    np.testing.assert_allclose(img_res, img_l0, atol=1e-6)

    # minified: large textures on a small frame, resident mini-atlas
    big = sample_textures(sizes=(256, 128))
    cfg_s = dataclasses.replace(cfg, width=128, height=96, texture_mips=6,
                                texture_resident=True)
    img_s = np.asarray(render_frame(static, pos, nrm, cfg_s,
                                    part_textures=big))
    assert np.isfinite(img_s).all()
    assert img_s.std() > 0.01
    cfg_s0 = dataclasses.replace(cfg_s, texture_resident=False)
    img_s0 = np.asarray(render_frame(static, pos, nrm, cfg_s0,
                                     part_textures=big))
    # resident forces each part to ONE (its most detailed needed) level;
    # per-triangle mips may pick coarser levels per triangle — close, not
    # equal
    assert np.abs(img_s - img_s0).mean() < 0.03


def test_resident_atlas_rejects_too_shallow_mip_chain():
    """build_resident_atlas: if a part has NO mip level that fits the
    resident slot (texture_mips too shallow for the texture size), setup
    must fail with an actionable ValueError instead of StopIteration at
    trace time (sz_hw addressing would otherwise overrun the slot)."""
    import jax.numpy as jnp
    import pytest
    from simple_mmd_renderer_tpu.app.sample import sample_textures
    from simple_mmd_renderer_tpu.render.pipeline import (
        build_packed_atlas, build_resident_atlas)

    textures = sample_textures(sizes=(64, 64))
    atlas = build_packed_atlas(textures, mip_levels=2)  # levels 64 / 32 px
    need = jnp.zeros((len(textures),), jnp.int32)
    with pytest.raises(ValueError, match="texture_mips"):
        build_resident_atlas(atlas, need, slot=16)


def test_atlas_argument_matches_traced_constant():
    """Passing the PackedAtlas through jit as an argument must produce the
    SAME image as letting the render trace it as a constant (the two paths
    crowd_jit/frame_jit vs. direct render take)."""
    import jax
    import jax.numpy as jnp
    from simple_mmd_renderer_tpu.app.sample import (sample_character,
                                                    sample_textures)
    from simple_mmd_renderer_tpu.config import RenderConfig
    from simple_mmd_renderer_tpu.core import pose as PO
    from simple_mmd_renderer_tpu.render.pipeline import (build_packed_atlas,
                                                         render_frame)

    pm = sample_character(density=0.3)
    static = M.build_model(pm)
    b = static.n_bones
    rot = jnp.broadcast_to(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (b, 4))
    pose = PO.pre_physics_posing(
        static, rot, jnp.zeros((b, 3), jnp.float32),
        jnp.zeros((static.n_morphs,), jnp.float32))
    pos, nrm = PO.deform(static, pose)
    textures = sample_textures(sizes=(16, 8))
    cfg = RenderConfig(width=160, height=120, shadow_map_size=64,
                       show_skybox=False, raster_mode="tiled",
                       shadows_enabled=False)
    const_img = np.asarray(render_frame(static, pos, nrm, cfg,
                                        part_textures=textures))
    atlas = build_packed_atlas(textures)
    arg_img = np.asarray(jax.jit(
        lambda a: render_frame(static, pos, nrm, cfg,
                               part_textures=textures, atlas=a))(atlas))
    # constant-folding reorders some f32 arithmetic: equal to fusion
    # rounding (measured max 6e-7), not bitwise
    np.testing.assert_allclose(arg_img, const_img, atol=1e-5)


def test_resident_capped_frame_falls_back_exact():
    """texture_resident default-on exactness (r3 VERDICT weak #2 / PARITY
    D7 closed): when any part's needed mip level is FINER than its
    resident slot holds (strong magnification), the frame must sample the
    big atlas via the lax.cond fallback and EXACTLY match
    texture_resident=0 — no detail cap. With mips too shallow for the
    slot, the resident path must degrade to off statically (no error)."""
    import dataclasses
    import jax.numpy as jnp
    from simple_mmd_renderer_tpu.app.sample import (sample_character,
                                                    sample_textures)
    from simple_mmd_renderer_tpu.config import RenderConfig
    from simple_mmd_renderer_tpu.core import model as M
    from simple_mmd_renderer_tpu.core import pose as PO
    from simple_mmd_renderer_tpu.render.pipeline import (
        build_packed_atlas, render_frame, resident_fit_levels)

    pm = sample_character(density=0.3)
    static = M.build_model(pm)
    b = static.n_bones
    rot = jnp.broadcast_to(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (b, 4))
    pose = PO.pre_physics_posing(
        static, rot, jnp.zeros((b, 3), jnp.float32),
        jnp.zeros((static.n_morphs,), jnp.float32))
    pos, nrm = PO.deform(static, pose)

    # 512px textures + slot 128: level 0 does NOT fit the slot, and at a
    # close-up framing the needed level is 0 -> the capped branch fires
    textures = sample_textures(sizes=(512, 256))
    cfg = RenderConfig(width=320, height=240, shadow_map_size=64,
                       show_skybox=False, raster_mode="tiled",
                       shadows_enabled=False, texture_mips=4,
                       camera_pos=(0.0, 1.3, -0.6),
                       camera_target=(0.0, 1.3, 0.0))
    atlas = build_packed_atlas(textures, mip_levels=4)
    fit = resident_fit_levels(atlas, 128)
    assert fit is not None and (fit > 0).any(), \
        "test setup: slot must not fit level 0"
    cfg_res = dataclasses.replace(cfg, texture_resident=128)
    cfg_off = dataclasses.replace(cfg, texture_resident=0)
    img_res = np.asarray(render_frame(static, pos, nrm, cfg_res,
                                      part_textures=textures, atlas=atlas))
    img_off = np.asarray(render_frame(static, pos, nrm, cfg_off,
                                      part_textures=textures, atlas=atlas))
    # same texels, same sampling math; the cond-wrapped program fuses
    # slightly differently than the plain one (XLA reassociation), so
    # equality is to float noise, not bitwise (measured max 7e-6)
    np.testing.assert_allclose(img_res, img_off, atol=5e-5)

    # mip chain too shallow for the slot: static graceful degrade (the
    # resident path turns itself off; output still exact, no ValueError)
    cfg_shallow = dataclasses.replace(cfg, texture_mips=2,
                                      texture_resident=64)
    atlas2 = build_packed_atlas(textures, mip_levels=2)
    assert resident_fit_levels(atlas2, 64) is None
    img_sh = np.asarray(render_frame(static, pos, nrm, cfg_shallow,
                                     part_textures=textures, atlas=atlas2))
    cfg_sh_off = dataclasses.replace(cfg_shallow, texture_resident=0)
    img_sh0 = np.asarray(render_frame(static, pos, nrm, cfg_sh_off,
                                      part_textures=textures, atlas=atlas2))
    np.testing.assert_allclose(img_sh, img_sh0, atol=5e-5)
