import numpy as np
import jax.numpy as jnp

from simple_mmd_renderer_tpu.render import raster
from simple_mmd_renderer_tpu.ops import tiled_raster


def _random_mesh(rng, t=200, spread=0.9, z=(0.1, 0.9), size=0.25):
    v0 = rng.uniform(-spread, spread, (t, 2))
    d1 = rng.uniform(-size, size, (t, 2))
    d2 = rng.uniform(-size, size, (t, 2))
    verts = np.stack([v0, v0 + d1, v0 + d2], 1).reshape(-1, 2)
    zs = rng.uniform(*z, (t, 1)).repeat(3, 1).reshape(-1)
    clip = np.concatenate(
        [verts, zs[:, None], np.ones((t * 3, 1))], -1).astype(np.float32)
    tris = np.arange(t * 3, dtype=np.int32).reshape(t, 3)
    return jnp.asarray(clip), jnp.asarray(tris)


def _assert_vis_equal(a: raster.VisBuffer, b: raster.VisBuffer):
    # depth ties between different triangles may pick a different winner only
    # if depths are exactly equal; random z makes that measure-zero
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=2e-5)
    mism = (np.asarray(a.tri) != np.asarray(b.tri)).mean()
    assert mism < 1e-3, f"tri id mismatch ratio {mism}"
    same_tri = np.asarray(a.tri) == np.asarray(b.tri)
    # the tiled kernel evaluates anchored plane equations (like GPU hardware
    # rasterizers) while the scan path computes edge functions from vertex
    # coordinates; both round in f32 at the same order, so a handful of
    # pixels differ by ~1 ulp of the barycentric scale
    np.testing.assert_allclose(np.asarray(a.bary)[same_tri],
                               np.asarray(b.bary)[same_tri], atol=2e-5)


def test_tiled_matches_scan_small_tris():
    rng = np.random.default_rng(0)
    clip, tris = _random_mesh(rng, t=300)
    w, h = 320, 192
    ref = raster.rasterize(clip, tris, w, h, raster.CULL_NONE)
    got = tiled_raster.rasterize_tiled(clip, tris, w, h, raster.CULL_NONE)
    assert (np.asarray(ref.tri) >= 0).mean() > 0.2  # scene has coverage
    _assert_vis_equal(got, ref)


def test_tiled_big_triangle_fallback():
    rng = np.random.default_rng(1)
    clip_s, tris_s = _random_mesh(rng, t=50)
    # one screen-filling triangle behind everything
    big = np.array([[-3, -3, 0.95, 1], [3, -3, 0.95, 1], [0, 3, 0.95, 1]],
                   np.float32)
    clip = jnp.concatenate([clip_s, jnp.asarray(big)])
    tris = jnp.concatenate(
        [tris_s, jnp.asarray([[150, 151, 152]], jnp.int32)])
    w, h = 256, 128
    ref = raster.rasterize(clip, tris, w, h, raster.CULL_NONE)
    got = tiled_raster.rasterize_tiled(clip, tris, w, h, raster.CULL_NONE)
    # the big tri must be visible in the background
    assert (np.asarray(got.tri) == 50).any()
    _assert_vis_equal(got, ref)


def test_tiled_respects_culling():
    rng = np.random.default_rng(2)
    clip, tris = _random_mesh(rng, t=100)
    w, h = 128, 64
    for cull in (raster.CULL_BACK, raster.CULL_FRONT):
        ref = raster.rasterize(clip, tris, w, h, cull)
        got = tiled_raster.rasterize_tiled(clip, tris, w, h, cull)
        _assert_vis_equal(got, ref)


def test_tiled_overflow_cap_graceful():
    # 600 tris piled into one tile with k_max=64: must not crash; nearest
    # surface may be imperfect but depth must be monotone-reasonable
    rng = np.random.default_rng(3)
    clip, tris = _random_mesh(rng, t=600, spread=0.05, size=0.05)
    got = tiled_raster.rasterize_tiled(clip, tris, 128, 64, raster.CULL_NONE,
                                       9, 64)
    assert np.isfinite(np.asarray(got.depth)).all()


def test_tiled_tuned_params_match_scan():
    """The pipeline's tuned (e_max=6, k_max=128/192) settings stay exact."""
    rng = np.random.default_rng(7)
    clip, tris = _random_mesh(rng, t=250)
    w, h = 256, 128
    ref = raster.rasterize(clip, tris, w, h, raster.CULL_NONE)
    got = tiled_raster.rasterize_tiled(clip, tris, w, h, raster.CULL_NONE,
                                       6, 128)
    _assert_vis_equal(got, ref)


def test_binning_stats_reports_overflow_headroom():
    rng = np.random.default_rng(11)
    clip, tris = _random_mesh(rng, t=150)
    stats = tiled_raster.binning_stats(clip, tris, 256, 128,
                                       raster.CULL_NONE, 6, 128)
    assert stats["big_dropped"] == 0
    assert stats["total_entries"] >= stats["max_tile_entries"] > 0


def test_dense_tile_exceeding_chunk_renders_exactly():
    """Per-tile capacity is unbounded: a tile with far more entries than the
    streaming chunk must match the scan raster exactly (round 1 silently
    dropped the excess)."""
    rng = np.random.default_rng(12)
    clip, tris = _random_mesh(rng, t=500, spread=0.05, size=0.08)
    w, h = 128, 64
    stats = tiled_raster.binning_stats(clip, tris, w, h, raster.CULL_NONE,
                                       6, 32)
    assert stats["max_tile_entries"] > 32, "scene must overload the chunk"
    ref = raster.rasterize(clip, tris, w, h, raster.CULL_NONE)
    got = tiled_raster.rasterize_tiled(clip, tris, w, h, raster.CULL_NONE,
                                       6, 32)
    _assert_vis_equal(got, ref)


def test_bench_scene_has_binning_headroom():
    """The flagship sample scene must not silently drop triangles at the
    pipeline's tuned raster parameters (ADVICE r1: overflow was invisible)."""
    import jax.numpy as jnp
    from simple_mmd_renderer_tpu.app.sample import sample_character
    from simple_mmd_renderer_tpu.core import model as M
    from simple_mmd_renderer_tpu.render.pipeline import build_matrices
    from simple_mmd_renderer_tpu.config import RenderConfig

    pm = sample_character(density=0.5)
    static = M.build_model(pm)
    cfg = RenderConfig(width=640, height=360)
    mats = build_matrices(cfg, aspect=640 / 360)
    verts = jnp.asarray(static.positions) * cfg.mmd_to_meter
    tris = jnp.asarray(static.triangles)[:, ::-1]
    clip = raster.transform_clip(verts, mats["mvp"])
    stats = tiled_raster.binning_stats(clip, tris, 640, 360,
                                       raster.CULL_BACK, 6, 192)
    assert stats["big_dropped"] == 0, stats


def test_depth_only_matches_full_tiled():
    """rasterize_depth_tiled (shadow path) == rasterize_tiled().depth,
    including the big-triangle fallback and both cull modes."""
    rng = np.random.default_rng(13)
    clip_s, tris_s = _random_mesh(rng, t=120)
    big = np.array([[-3, -3, 0.95, 1], [3, -3, 0.95, 1], [0, 3, 0.95, 1]],
                   np.float32)
    clip = jnp.concatenate([clip_s, jnp.asarray(big)])
    tris = jnp.concatenate(
        [tris_s, jnp.asarray([[360, 361, 362]], jnp.int32)])
    w, h = 256, 128
    for cull in (raster.CULL_NONE, raster.CULL_FRONT, raster.CULL_BACK):
        ref = tiled_raster.rasterize_tiled(clip, tris, w, h, cull)
        got = tiled_raster.rasterize_depth_tiled(clip, tris, w, h, cull)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref.depth),
                                   atol=2e-5)


def test_depth_only_dense_tile_chunking():
    rng = np.random.default_rng(14)
    clip, tris = _random_mesh(rng, t=400, spread=0.05, size=0.08)
    w, h = 128, 64
    ref = raster.rasterize(clip, tris, w, h, raster.CULL_NONE)
    got = tiled_raster.rasterize_depth_tiled(clip, tris, w, h,
                                             raster.CULL_NONE, 6, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref.depth),
                               atol=2e-5)


def test_covers_all_e_max_handles_giant_tris_without_merge():
    """When e_max >= n_tiles the big-tri fallback is skipped at trace time;
    screen-filling triangles must render exactly through the bins alone."""
    rng = np.random.default_rng(15)
    clip_s, tris_s = _random_mesh(rng, t=60)
    big = np.array([[-3, -3, 0.95, 1], [3, -3, 0.95, 1], [0, 3, 0.95, 1]],
                   np.float32)
    clip = jnp.concatenate([clip_s, jnp.asarray(big)])
    tris = jnp.concatenate(
        [tris_s, jnp.asarray([[180, 181, 182]], jnp.int32)])
    w, h = 256, 128  # 2x4 = 8 tiles
    n_tiles = 8
    assert tiled_raster._covers_all(n_tiles, w, h)
    ref = raster.rasterize(clip, tris, w, h, raster.CULL_NONE)
    got = tiled_raster.rasterize_tiled(clip, tris, w, h, raster.CULL_NONE,
                                       n_tiles, 64)
    _assert_vis_equal(got, ref)
    gotd = tiled_raster.rasterize_depth_tiled(clip, tris, w, h,
                                              raster.CULL_NONE, n_tiles, 64)
    np.testing.assert_allclose(np.asarray(gotd), np.asarray(ref.depth),
                               atol=2e-5)


def test_big_tri_merge_still_active_at_large_targets():
    """At targets larger than the covers-all threshold the scan fallback
    still merges oversized triangles exactly."""
    rng = np.random.default_rng(16)
    clip_s, tris_s = _random_mesh(rng, t=40)
    big = np.array([[-3, -3, 0.95, 1], [3, -3, 0.95, 1], [0, 3, 0.95, 1]],
                   np.float32)
    clip = jnp.concatenate([clip_s, jnp.asarray(big)])
    tris = jnp.concatenate(
        [tris_s, jnp.asarray([[120, 121, 122]], jnp.int32)])
    w, h = 384, 256  # 3x8 = 24 tiles > e_max=6 -> merge path live
    assert not tiled_raster._covers_all(6, w, h)
    ref = raster.rasterize(clip, tris, w, h, raster.CULL_NONE)
    got = tiled_raster.rasterize_tiled(clip, tris, w, h, raster.CULL_NONE,
                                       6, 64)
    assert (np.asarray(got.tri) == 40).any()
    _assert_vis_equal(got, ref)


def test_windowed_depth_matches_full():
    """rasterize_depth_tiled_window (shadow path: caster-bbox window +
    short tiles + paste-back) == rasterize_depth_tiled, for clustered
    geometry (small window branch), spread geometry (full-grid branch) and
    an oversized triangle through the merge fallback."""
    rng = np.random.default_rng(23)
    w, h = 512, 512
    # clustered casters in one corner: exercises a small ladder branch
    clip_c, tris_c = _random_mesh(rng, t=150, spread=0.3, size=0.1)
    c = np.array(clip_c)
    c[:, 0] = c[:, 0] * 0.4 - 0.55
    c[:, 1] = c[:, 1] * 0.4 + 0.55
    clip_c = jnp.asarray(c)
    # spread small casters + one big triangle: full branch + merge path.
    # (Shadow-scale triangles: at 8 px tiles, triangles taller than ~44 px
    # overflow e_max and fall to the BIG_TRI_CAP-bounded merge — the same
    # cliff as the base path, just earlier; the shadow scenes this path
    # serves measure n_big=0, see rasterize_depth_tiled_window.)
    clip_s, tris_s = _random_mesh(rng, t=150, size=0.08)
    big = np.array([[-2, -2, 0.9, 1], [2, -2, 0.9, 1], [0, 2, 0.9, 1]],
                   np.float32)
    clip_b = jnp.concatenate([clip_s, jnp.asarray(big)])
    tris_b = jnp.concatenate(
        [tris_s, jnp.asarray([[450, 451, 452]], jnp.int32)])
    for clip, tris in ((clip_c, tris_c), (clip_b, tris_b)):
        for cull in (raster.CULL_NONE, raster.CULL_FRONT):
            ref = tiled_raster.rasterize_depth_tiled(clip, tris, w, h, cull,
                                                     6, 64)
            got = tiled_raster.rasterize_depth_tiled_window(
                clip, tris, w, h, cull, 6, 64, 8)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5)


def test_windowed_depth_empty_scene():
    """No valid casters: the windowed raster must return an all-far map."""
    clip = jnp.asarray([[0.0, 0.0, -5.0, 1.0]] * 3)   # z far outside
    tris = jnp.asarray([[0, 1, 2]], jnp.int32)
    got = tiled_raster.rasterize_depth_tiled_window(
        clip, tris, 256, 256, raster.CULL_NONE, 6, 64, 8)
    assert (np.asarray(got) == 1.0).all()


def _shift_clip(clip, ox, oy, w, h):
    """Clip-space translation that moves the pixel-center sample grid onto
    the (ox, oy)-offset sample positions (y is screen-down)."""
    c = np.asarray(clip).copy()
    c[:, 0] -= (2.0 * ox / w) * c[:, 3]
    c[:, 1] += (2.0 * oy / h) * c[:, 3]
    return jnp.asarray(c)


def test_msaa_per_sample_depth_matches_shifted_scan():
    rng = np.random.default_rng(17)
    clip, tris = _random_mesh(rng, t=160)
    attrs = jnp.asarray(rng.uniform(0, 1, (clip.shape[0], 3)).astype(
        np.float32))
    w, h = 256, 128
    vis, attr, sdepth = tiled_raster.rasterize_attrs_tiled_msaa(
        clip, tris, attrs, w, h, raster.CULL_NONE)
    for s, (ox, oy) in enumerate(tiled_raster.MSAA4_OFFSETS):
        ref = raster.rasterize(_shift_clip(clip, ox, oy, w, h), tris, w, h,
                               raster.CULL_NONE)
        ref_cov = np.asarray(ref.tri) >= 0
        got_cov = np.asarray(sdepth[s]) < 1.0 - 1e-7
        assert (ref_cov != got_cov).mean() < 2e-3, f"sample {s} coverage"
        both = ref_cov & got_cov
        np.testing.assert_allclose(np.asarray(sdepth[s])[both],
                                   np.asarray(ref.depth)[both], atol=3e-5)


def test_msaa_center_visibility_supersets_standard():
    """Where the standard center raster has coverage, the MSAA kernel's
    center visibility must agree exactly (its extra any-sample coverage only
    ADDS edge pixels)."""
    rng = np.random.default_rng(18)
    clip, tris = _random_mesh(rng, t=120)
    attrs = jnp.asarray(rng.uniform(0, 1, (clip.shape[0], 2)).astype(
        np.float32))
    w, h = 256, 128
    ref_vis, ref_attr = tiled_raster.rasterize_attrs_tiled(
        clip, tris, attrs, w, h, raster.CULL_NONE)
    vis, attr, _ = tiled_raster.rasterize_attrs_tiled_msaa(
        clip, tris, attrs, w, h, raster.CULL_NONE)
    cov = np.asarray(ref_vis.tri) >= 0
    # residual mismatches are pixels whose center-covering triangle hits no
    # sample (correct MSAA semantics: invisible to sample-based raster, so
    # another sample-covered triangle fills the pixel's attributes)
    assert (np.asarray(vis.tri)[cov] == np.asarray(ref_vis.tri)[cov]).mean() \
        > 0.99
    same = cov & (np.asarray(vis.tri) == np.asarray(ref_vis.tri))
    np.testing.assert_allclose(np.asarray(vis.depth)[same],
                               np.asarray(ref_vis.depth)[same], atol=2e-5)
    np.testing.assert_allclose(np.asarray(attr)[same],
                               np.asarray(ref_attr)[same], atol=2e-4)
    # near-superset: a center-covered pixel goes empty only when its
    # triangle hits none of the 4 samples (sample-based raster semantics)
    assert (np.asarray(vis.tri)[cov] >= 0).mean() > 0.99


def test_crowd_fused_raster_matches_per_instance():
    """The fused multi-instance raster must equal the single-instance tiled
    raster run per instance (same covers-all binning)."""
    rng = np.random.default_rng(21)
    n_inst, w, h = 3, 256, 128
    n_tiles = 2 * 4
    clips, attrs = [], []
    for _ in range(n_inst):
        c, tris = _random_mesh(rng, t=80)
        clips.append(np.asarray(c))
        attrs.append(rng.uniform(0, 1, (c.shape[0], 3)).astype(np.float32))
    clip_b = jnp.asarray(np.stack(clips))
    attr_b = jnp.asarray(np.stack(attrs))
    vis, attr = tiled_raster.rasterize_attrs_tiled_crowd(
        clip_b, tris, attr_b, w, h, raster.CULL_NONE)
    for i in range(n_inst):
        ref_vis, ref_attr = tiled_raster.rasterize_attrs_tiled(
            clip_b[i], tris, attr_b[i], w, h, raster.CULL_NONE, n_tiles, 64)
        np.testing.assert_allclose(np.asarray(vis.depth[i]),
                                   np.asarray(ref_vis.depth), atol=2e-5)
        assert (np.asarray(vis.tri[i]) != np.asarray(ref_vis.tri)).mean() \
            < 1e-3
        same = np.asarray(vis.tri[i]) == np.asarray(ref_vis.tri)
        np.testing.assert_allclose(np.asarray(attr[i])[same],
                                   np.asarray(ref_attr)[same], atol=2e-4)


def test_crowd_fused_depth_matches_per_instance():
    rng = np.random.default_rng(22)
    n_inst, w, h = 3, 128, 128
    clips = []
    for _ in range(n_inst):
        c, tris = _random_mesh(rng, t=60)
        clips.append(np.asarray(c))
    clip_b = jnp.asarray(np.stack(clips))
    for cull in (raster.CULL_NONE, raster.CULL_FRONT):
        depth = tiled_raster.rasterize_depth_tiled_crowd(
            clip_b, tris, w, h, cull)
        for i in range(n_inst):
            ref = tiled_raster.rasterize_depth_tiled(
                clip_b[i], tris, w, h, cull, 4, 64)
            np.testing.assert_allclose(np.asarray(depth[i]),
                                       np.asarray(ref), atol=2e-5)


def test_crowd_compaction_mostly_culled():
    """The validity-compacted crowd binning (CROWD_COMPACT_DIV passes,
    later ones cond-skipped) must stay exact when most triangles are
    culled — the crowd regime it exists for — including instances that are
    entirely offscreen, and when every pass fires (all-valid scenes are
    covered by the other crowd tests)."""
    rng = np.random.default_rng(31)
    n_inst, w, h = 4, 256, 128
    clips, attrs = [], []
    for k in range(n_inst):
        c, tris = _random_mesh(rng, t=100)
        c = np.array(c)
        if k == 1:
            c[:, 0] += 10.0          # entirely offscreen
        if k == 3:
            c[:, 2] = -5.0           # entirely behind the depth range
        clips.append(c)
        attrs.append(rng.uniform(0, 1, (c.shape[0], 2)).astype(np.float32))
    clip_b = jnp.asarray(np.stack(clips))
    attr_b = jnp.asarray(np.stack(attrs))
    vis, attr = tiled_raster.rasterize_attrs_tiled_crowd(
        clip_b, tris, attr_b, w, h, raster.CULL_NONE)
    assert (np.asarray(vis.tri[1]) == -1).all()
    for i in (0, 2):
        ref_vis, ref_attr = tiled_raster.rasterize_attrs_tiled(
            clip_b[i], tris, attr_b[i], w, h, raster.CULL_NONE, 8, 64)
        np.testing.assert_allclose(np.asarray(vis.depth[i]),
                                   np.asarray(ref_vis.depth), atol=2e-5)
        same = np.asarray(vis.tri[i]) == np.asarray(ref_vis.tri)
        assert (~same).mean() < 1e-3
        np.testing.assert_allclose(np.asarray(attr[i])[same],
                                   np.asarray(ref_attr)[same], atol=2e-4)


def test_packed_sort_paths_agree():
    """The int32 single-key fast path and the lexicographic two-key fallback
    must produce identical segment tables (r2 VERDICT #3: the fixed 18-bit
    key capped triangles at 262144)."""
    rng = np.random.default_rng(11)
    n_seg = 37
    tile = jnp.asarray(rng.integers(0, n_seg + 1, 5000), jnp.int32)
    tri = jnp.asarray(rng.permutation(5000), jnp.int32)
    ref_order = np.lexsort((np.asarray(tri), np.asarray(tile)))
    ref_tri = np.asarray(tri)[ref_order]
    # i32 fast path (t=5000 -> 13 tri bits, plenty of headroom)
    got_tri, start = tiled_raster._packed_sort(tile, tri, 5000, n_seg)
    np.testing.assert_array_equal(np.asarray(got_tri), ref_tri)
    # force the fallback: a pretended t of 2^29 leaves no room for segments
    got2_tri, start2 = tiled_raster._packed_sort(tile, tri, 1 << 29, n_seg)
    np.testing.assert_array_equal(np.asarray(got2_tri), ref_tri)
    np.testing.assert_array_equal(np.asarray(start), np.asarray(start2))
    counts = np.asarray(start)[1:] - np.asarray(start)[:-1]
    np.testing.assert_array_equal(
        counts, np.bincount(np.asarray(tile), minlength=n_seg + 1)[:n_seg])


def test_tiled_beyond_262k_triangles():
    """A mesh past the old 2^18 packed-key ceiling rasterizes exactly: 300k
    triangles (mostly degenerate pad) must match the same scene with only
    its live triangles."""
    rng = np.random.default_rng(12)
    clip_s, tris_s = _random_mesh(rng, t=40)
    w, h = 256, 64
    ref = tiled_raster.rasterize_tiled(clip_s, tris_s, w, h,
                                       raster.CULL_NONE)
    t_total = 300_000
    # live triangles first, degenerate (zero-area, culled in setup) padding
    # referencing vertex 0 after them
    pad = jnp.zeros((t_total - 40, 3), jnp.int32)
    tris = jnp.concatenate([tris_s, pad])
    got = tiled_raster.rasterize_tiled(clip_s, tris, w, h, raster.CULL_NONE)
    assert (np.asarray(ref.tri) >= 0).mean() > 0.1
    _assert_vis_equal(got, ref)


def test_crowd_big_triangle_fallback():
    """Fused crowd binning is bbox-limited (r3: covers-all OOM'd at dense
    crowds); a screen-filling triangle in ONE instance must still render
    exactly via the capped per-instance scan fallback — in the attr, msaa,
    and depth crowd paths."""
    rng = np.random.default_rng(33)
    n_inst, w, h = 3, 384, 128  # 3x4 = 12 tiles > CROWD_E_MAX
    assert tiled_raster._crowd_e_max(w, h) < 12
    clips, attrs = [], []
    for k in range(n_inst):
        c, tris = _random_mesh(rng, t=40)
        c = np.array(c)
        if k == 1:  # instance 1 gets a screen-filling triangle (tri 0)
            c[0] = [-2.0, -2.0, 0.05, 1.0]
            c[1] = [4.0, -2.0, 0.05, 1.0]
            c[2] = [-2.0, 4.0, 0.05, 1.0]
        clips.append(c)
        attrs.append(rng.uniform(0, 1, (c.shape[0], 3)).astype(np.float32))
    clip_b = jnp.asarray(np.stack(clips))
    attr_b = jnp.asarray(np.stack(attrs))

    vis, attr = tiled_raster.rasterize_attrs_tiled_crowd(
        clip_b, tris, attr_b, w, h, raster.CULL_NONE)
    # the giant triangle wins everywhere it is closest; specifically the
    # whole frame of instance 1 is covered
    assert (np.asarray(vis.tri[1]) >= 0).all()
    for i in range(n_inst):
        ref_vis, ref_attr = tiled_raster.rasterize_attrs_tiled(
            clip_b[i], tris, attr_b[i], w, h, raster.CULL_NONE, 12, 64)
        np.testing.assert_allclose(np.asarray(vis.depth[i]),
                                   np.asarray(ref_vis.depth), atol=2e-5)
        assert (np.asarray(vis.tri[i]) != np.asarray(ref_vis.tri)).mean() \
            < 1e-3

    depth = tiled_raster.rasterize_depth_tiled_crowd(
        clip_b, tris, w, h, raster.CULL_NONE)
    for i in range(n_inst):
        ref = tiled_raster.rasterize_depth_tiled(
            clip_b[i], tris, w, h, raster.CULL_NONE, 12, 64)
        np.testing.assert_allclose(np.asarray(depth[i]), np.asarray(ref),
                                   atol=2e-5)

    vis_m, attr_m, sdepth = tiled_raster.rasterize_attrs_tiled_msaa_crowd(
        clip_b, tris, attr_b, w, h, raster.CULL_NONE)
    ref_vis, ref_attr, ref_sd = tiled_raster.rasterize_attrs_tiled_msaa(
        clip_b[1], tris, attr_b[1], w, h, raster.CULL_NONE, 12, 64)
    np.testing.assert_allclose(np.asarray(vis_m.depth[1]),
                               np.asarray(ref_vis.depth), atol=2e-5)
    assert (np.asarray(sdepth[1]) < 1.0).all()  # all samples hit


def test_prefix_compaction_bit_exact():
    """Validity-compacted prefix binning (_bin_prefix: one id sort + a
    lax.switch over static prefix rungs) must be BIT-exact vs the
    uncompacted bin on every single-instance entry point — same kernel,
    same rows, only fewer pad slots. Covers the mid rung (random culled
    fraction), the smallest rung (mostly offscreen), the full-T rung
    (nothing culled), and both multis-window rungs of the two-level bin
    (tiny all-single triangles vs large mostly-multi triangles, including
    the spillover-duplicate case where the singles prefix overlaps
    multis)."""
    import jax

    rng = np.random.default_rng(47)
    w, h = 256, 160
    t = tiled_raster.COMPACT_MIN_T + 500

    def variants():
        clip, tris = _random_mesh(rng, t=t, size=0.12)
        yield clip, tris, raster.CULL_BACK      # ~half culled -> mid rung
        yield clip, tris, raster.CULL_NONE      # all valid -> full rung
        c = np.array(clip)
        c[: 3 * (t - 64), 0] += 10.0            # mostly offscreen -> rung 0
        yield jnp.asarray(c), tris, raster.CULL_NONE
        # tiny triangles: every valid one covers ONE tile (multis rung 0)
        clip2, tris2 = _random_mesh(rng, t=t, size=0.01)
        yield clip2, tris2, raster.CULL_BACK
        # large triangles: most cover many tiles (multis past the first
        # rung -> full-T multis window; also exercises the big-tri merge)
        clip3, tris3 = _random_mesh(rng, t=t, size=0.45)
        yield clip3, tris3, raster.CULL_BACK

    for clip, tris, cull in variants():
        attrs = jnp.asarray(
            rng.uniform(0, 1, (clip.shape[0], 3)).astype(np.float32))
        for fn in (
            lambda c: tiled_raster.rasterize_attrs_tiled(
                clip, tris, attrs, w, h, cull, compact=c),
            lambda c: tiled_raster.rasterize_depth_tiled(
                clip, tris, w, h, cull, compact=c),
            lambda c: tiled_raster.rasterize_attrs_tiled_msaa(
                clip, tris, attrs, w, h, cull, compact=c),
        ):
            got = jax.tree.leaves(fn(True))
            ref = jax.tree.leaves(fn(False))
            for a, b in zip(got, ref):
                assert np.array_equal(np.asarray(a), np.asarray(b))
