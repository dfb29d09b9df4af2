"""Tiled/binned triangle rasterizer — the hot-path raster for TPU.

Same visibility-buffer semantics as `render.raster.rasterize` (LESS_EQUAL
z-test, y-down screen, guard-band near clip) but organized for the hardware:

1. XLA binning: each triangle's screen bbox is expanded into (tile, entry)
   pairs (capped at E_MAX tiles/tri) and sorted by tile with a stable sort
   (which preserves draw order for z-ties); the setup rows are gathered into
   sorted order so every tile's entries are CONTIGUOUS in HBM.
2. Pallas kernel: one grid step per 32x128-pixel tile; the tile's entry
   window is DMA'd from HBM into VMEM in one sequential copy, then a
   dynamic-trip fori_loop updates depth/tri/attribute accumulators per
   entry. Every interpolated quantity (barycentrics, z, attribute
   numerators, 1/w denominator) is an affine function of pixel coords, so
   setup bakes PLANE COEFFICIENTS into the rows and the kernel evaluates
   each channel with 2 FMA (w0 comes free as 1 - w1 - w2). Only the final
   tile buffers are written to HBM.
3. `rasterize_attrs_tiled` additionally interpolates per-vertex attributes
   perspective-correctly INSIDE the kernel: attribute numerator planes
   (pre-multiplied by 1/w) ride the binned setup rows, so shading needs no
   random vertex gathers at all — TPU gathers are the pathology this design
   removes.
4. Triangles bigger than E_MAX tiles (close-ups, the rare giant polygon) fall
   back to the exact scan rasterizer and merge by depth.

On non-TPU backends the kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..render import raster

import os

# 32x128 tiles: (8,128) is the VPU-native register shape, so a (32,128)
# elementwise op costs 4 issue slots; smaller tiles lower per-entry cost but
# raise entry counts and grid overhead. Overridable for experiments.
TILE_H = int(os.environ.get("SMR_TILE_H", "32"))
TILE_W = 128
BASE_WIDTH = 16


def _setup_rows(s, tri_ids, attrs=None):
    """Pack per-triangle setup into [T, W] f32 rows of screen-space PLANE
    coefficients, ANCHORED at vertex 0: every interpolated quantity is
    affine in pixel coords, so the kernel evaluates each channel as
    v0 + vx*(px-ax) + vy*(py-ay) (2 FMA after a shared dx/dy) instead of
    edge functions from vertex coordinates. Anchoring makes the constant
    term exact (w1(a) = w2(a) = 0, z(a) = z0), so precision matches the
    edge-function form; w0 comes free as 1 - w1 - w2.

    Base layout (16 lanes): ax, ay, w1x, w1y, w2x, w2y, z0, zx, zy, valid,
    tri_id, ymin, ymax, pad (3). With attrs [V,A]: den plane (3) + per-attr numerator
    planes (3A) appended (den = sum w_i/w_clip_i, num_a = sum w_i a_i/w_i —
    perspective-correct interpolation as in raster.interpolate), padded to a
    multiple of 8 lanes."""
    xy = s["xy"]
    z = s["z"]
    inv_area = jnp.where(jnp.abs(s["area2"]) > 1e-12, 1.0 / s["area2"], 0.0)
    ax, ay = xy[:, 0, 0], xy[:, 0, 1]
    bx, by = xy[:, 1, 0], xy[:, 1, 1]
    cx, cy = xy[:, 2, 0], xy[:, 2, 1]
    # vertical screen bbox (lanes 11/12): the kernel restricts each entry
    # GROUP's plane evaluation to the rows its triangles can cover (most
    # triangles span a few rows of a 32-row tile). Clamped to a safe int
    # range — invalid triangles carry arbitrary screen coords.
    ymin_r = jnp.clip(jnp.minimum(jnp.minimum(ay, by), cy), 0.0, 65535.0)
    ymax_r = jnp.clip(jnp.maximum(jnp.maximum(ay, by), cy), 0.0, 65535.0)

    # slopes of the barycentric planes (constants vanish at the anchor):
    # w1 = e20/area has gradient ((cy-ay), (ax-cx))/area
    w1x = (cy - ay) * inv_area
    w1y = (ax - cx) * inv_area
    # w2 = e01/area has gradient ((ay-by), (bx-ax))/area
    w2x = (ay - by) * inv_area
    w2y = (bx - ax) * inv_area

    def combo(v0, v1, v2):
        """Anchored plane of w0*v0 + w1*v1 + w2*v2 (w0 = 1 - w1 - w2):
        value(a) = v0 exactly, slopes from the barycentric gradients."""
        d1 = v1 - v0
        d2 = v2 - v0
        return (v0,
                d1 * w1x + d2 * w2x,
                d1 * w1y + d2 * w2y)

    z0, zx, zy = combo(z[:, 0], z[:, 1], z[:, 2])
    cols = [
        ax, ay, w1x, w1y, w2x, w2y, z0, zx, zy,
        s["valid"].astype(jnp.float32),
        tri_ids.astype(jnp.float32),
        ymin_r, ymax_r,
        jnp.zeros_like(z0), jnp.zeros_like(z0), jnp.zeros_like(z0),
    ]
    if attrs is not None:
        assert attrs.shape[1] <= 36, "attr payload exceeds one 128-lane row"
        va = s.get("va")
        if va is None:
            va = attrs[s["tris_v"]]              # [T,3,A]
        iw = s["inv_w"]                          # [T,3]
        cols.extend(combo(iw[:, 0], iw[:, 1], iw[:, 2]))
        for a in range(attrs.shape[1]):
            cols.extend(combo(va[:, 0, a] * iw[:, 0],
                              va[:, 1, a] * iw[:, 1],
                              va[:, 2, a] * iw[:, 2]))
    width = len(cols)
    pad = (-width) % 8
    for _ in range(pad):
        cols.append(jnp.zeros_like(z0))
    return jnp.stack(cols, axis=-1)


def _expand_tiles(s, width, height, e_max, tile_h=None):
    """Per-triangle covered-tile enumeration -> (tile [T, E] with n_tiles
    for invalid/pad slots, band [T, E] 8-row band of the triangle's first
    covered row within each tile, big [T] oversized-triangle mask).

    `band` feeds the sort key so a tile's entries arrive grouped by
    vertical position — entry GROUPs then share tight row windows in the
    kernel. Purely a locality hint: correctness never depends on it."""
    tile_h = tile_h or TILE_H
    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // tile_h)
    n_tiles = tiles_x * tiles_y

    xy = s["xy"]
    valid = s["valid"]
    xmin = jnp.clip(jnp.min(xy[:, :, 0], 1), 0.0, width - 1.0)
    xmax = jnp.clip(jnp.max(xy[:, :, 0], 1), 0.0, width - 1.0)
    ymin = jnp.clip(jnp.min(xy[:, :, 1], 1), 0.0, height - 1.0)
    ymax = jnp.clip(jnp.max(xy[:, :, 1], 1), 0.0, height - 1.0)
    on = ((jnp.max(xy[:, :, 0], 1) >= 0) & (jnp.min(xy[:, :, 0], 1) < width) &
          (jnp.max(xy[:, :, 1], 1) >= 0) & (jnp.min(xy[:, :, 1], 1) < height))
    valid = valid & on

    tx0 = (xmin // TILE_W).astype(jnp.int32)
    tx1 = (xmax // TILE_W).astype(jnp.int32)
    ty0 = (ymin // tile_h).astype(jnp.int32)
    ty1 = (ymax // tile_h).astype(jnp.int32)
    bw = tx1 - tx0 + 1
    bh = ty1 - ty0 + 1
    n_cover = bw * bh
    big = valid & (n_cover > e_max)
    small = valid & ~big

    # enumerate the bbox cells row-major without integer div/mod (TPU int
    # division is emulated and slow at 200k+ elements): bw is tiny (1..e_max),
    # select from precomputed (dx, dy) tables per bw
    e = jnp.arange(e_max, dtype=jnp.int32)[None, :]          # [1,E]
    bwc = jnp.clip(bw, 1, e_max)[:, None]
    dx = e
    dy = jnp.zeros_like(e)
    for width_c in range(1, e_max + 1):
        dxc = jnp.asarray([k % width_c for k in range(e_max)], jnp.int32)
        dyc = jnp.asarray([k // width_c for k in range(e_max)], jnp.int32)
        sel = bwc == width_c
        dx = jnp.where(sel, dxc[None, :], dx)
        dy = jnp.where(sel, dyc[None, :], dy)
    tile = (ty0[:, None] + dy) * tiles_x + (tx0[:, None] + dx)  # [T,E]
    mask = small[:, None] & (e < n_cover[:, None])
    tile = jnp.where(mask, tile, n_tiles)                     # invalid -> pad
    # row-window CATEGORY of each entry within its tile: 0/1/2 = every
    # coverable row fits the static WIN-row window at rows [8k, 8k+WIN),
    # 3 = spans beyond any window (evaluated full-tile). The kernel runs
    # one branch-free loop per category with STATIC window offsets; the
    # +-1 row pad covers pixel-center and MSAA sample offsets (<= 0.5 px).
    if _n_cats(tile_h) > 1:
        lo = jnp.floor(ymin).astype(jnp.int32)[:, None] - 1 \
            - (ty0[:, None] + dy) * tile_h
        hi = jnp.floor(ymax).astype(jnp.int32)[:, None] + 1 \
            - (ty0[:, None] + dy) * tile_h
        o = jnp.clip((lo // 8) * 8, 0, tile_h - WIN)
        fits = jnp.minimum(hi, tile_h - 1) < o + WIN
        cat = jnp.where(fits, o >> 3, (tile_h - WIN) // 8 + 1)
    else:
        cat = jnp.zeros_like(tile)
    return tile, cat, big


def _n_cats(tile_h) -> int:
    """Number of row-window categories per tile (see _expand_tiles): one
    per static WIN-row window position plus the full-span class. 1 unless
    the experimental window path is enabled (see RASTER_WINDOWS)."""
    return ((tile_h - WIN) // 8 + 2
            if RASTER_WINDOWS and tile_h > WIN else 1)


def _packed_sort(flat_tile, flat_tri, t, n_segments, flat_band=None, nb=1):
    """Sort (tile[, cat], tri) tuples lexicographically -> (sorted_tri [N],
    SUB-segment starts [n_segments*nb + 1]): starts[s*nb + k] bounds tile
    s's category-k entries; starts[s*nb] is the tile's first entry and
    starts[n_segments*nb] the pad-segment boundary. nb = 1 reproduces the
    plain per-tile starts.

    Fast path: ONE packed int32 key (tile << tri_bits | tri) through an
    unstable single-operand sort — keys are unique, so this is equivalent
    to a stable pair sort and markedly cheaper; the pair sort + two
    permutation gathers was the most expensive piece of this whole pass.
    (A histogram+cumsum formulation is ~3x slower still: scatter-add with
    ~100k collisions into 2k bins serializes on TPU.) Entry order within a
    tile does NOT affect results: the kernel breaks z-ties by triangle id
    (max id wins — exactly the scan raster's later-draw-wins rule), so the
    `cat` bits may group entries by row-window category; when the widened
    key would overflow int32, categories are dropped and the sub-starts
    degenerate to repeated tile starts (every entry lands in the full-span
    loop — exact, just unwindowed).

    tri_bits is sized to the actual triangle count (trace-time constant),
    so the int32 budget covers (segments+1) * t up to 2^31 — e.g. 4.2M
    triangles at a 510-tile 1080p grid, or 1.6M fused crowd entries at a
    10-tile viewport. Beyond that the lexicographic two-operand sort takes
    over (exact, ~3x the sort cost; int64 keys are unavailable without
    jax_enable_x64)."""
    tri_bits = max(int(t - 1).bit_length(), 1)
    bound = jnp.arange(n_segments + 1, dtype=jnp.int32)
    if (flat_band is not None and nb > 1
            and (n_segments + 1) * nb <= (1 << (31 - tri_bits))):
        sub_bound = jnp.arange(n_segments * nb + 1, dtype=jnp.int32)
        packed = jax.lax.sort(
            (flat_tile * nb + flat_band) * (1 << tri_bits) + flat_tri,
            is_stable=False)
        sorted_tri = packed & ((1 << tri_bits) - 1)
        return sorted_tri, jnp.searchsorted(
            packed, sub_bound * (1 << tri_bits),
            side="left").astype(jnp.int32)
    if (n_segments + 1) <= (1 << (31 - tri_bits)):
        packed = jax.lax.sort(flat_tile * (1 << tri_bits) + flat_tri,
                              is_stable=False)
        sorted_tri = packed & ((1 << tri_bits) - 1)
        start = jnp.searchsorted(packed, bound * (1 << tri_bits),
                                 side="left").astype(jnp.int32)
    else:
        sorted_tile, sorted_tri = jax.lax.sort(
            (flat_tile, flat_tri), num_keys=2, is_stable=False)
        start = jnp.searchsorted(sorted_tile, bound,
                                 side="left").astype(jnp.int32)
    if nb > 1:   # degenerate sub-starts: all entries in the full-span loop
        start = jnp.concatenate(
            [jnp.repeat(start[:n_segments], nb), start[n_segments:]])
    return sorted_tri, start


def _bin(s, rows, width, height, e_max, chunk, tile_h=None):
    """-> (sorted_rows [T*E + chunk pad, W], sub-starts [n_tiles*nb + 1],
    counts [n_tiles], big_mask [T]).

    Entries are sorted by (tile, row-window category) and the ROWS are
    gathered into that order, so each tile's entries are contiguous (and
    internally grouped by category — see _expand_tiles): the kernel DMAs
    its [start, start+K) window straight from HBM — no dense-bin scatter
    (which costs more than everything else in this pass combined)."""
    tile_h = tile_h or TILE_H
    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // tile_h)
    n_tiles = tiles_x * tiles_y
    nb = _n_cats(tile_h)
    tile, cat, big = _expand_tiles(s, width, height, e_max, tile_h)

    flat_tile = tile.reshape(-1)
    t = tile.shape[0]
    flat_tri = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[:, None], (t, e_max)).reshape(-1)

    sorted_tri, start = _packed_sort(flat_tile, flat_tri, t, n_tiles,
                                     cat.reshape(-1), nb)
    # counts are UNCAPPED: the kernel streams a tile's entries in chunks,
    # so a dense tile never silently drops geometry
    counts = (start[nb::nb] - start[:-1:nb]).astype(jnp.int32)

    # pad entries (tile == n_tiles) sort to the tail but carry their real
    # triangle ids — scattered gather addresses for rows nobody reads. At
    # e_max=6 a small-triangle mesh is ~75% pads; pinning them into the
    # first 256 rows keeps the row gather's page footprint proportional to
    # REAL entries (the albedo window's covered-pixel trick) without
    # funneling millions of duplicate addresses onto one row.
    eidx = jnp.arange(sorted_tri.shape[0], dtype=jnp.int32)
    spread = 256 if t >= 256 else 1      # power of two; & not emulated %
    sorted_tri = jnp.where(eidx < start[n_tiles * nb], sorted_tri,
                           eidx & (spread - 1))

    # gather rows NARROW (random row gathers cost ~3x more at 128 lanes),
    # then zero-pad the lane dim to 128 with a cheap sequential write: the
    # kernel's HBM->VMEM DMA slice requires 128-aligned lanes. Rows are also
    # padded by one chunk so every chunk window is in bounds; entries past a
    # tile's segment belong to other tiles but the count-bounded loop never
    # reads them.
    sorted_rows = rows[sorted_tri]
    lane_pad = (-rows.shape[1]) % 128
    sorted_rows = jnp.pad(sorted_rows, ((0, chunk), (0, lane_pad)))
    return sorted_rows, start[:n_tiles * nb + 1], counts, big


# validity-compacted PREFIX binning for the single-instance paths. Most
# scenes cull ~half their triangles (backface in the main view, frontface in
# the shadow pass — main.cpp:942) yet every triangle used to occupy e_max
# sort slots and one gathered 128-lane row; the bin's sort and row gather are
# its dominant costs and both scale with the slot count, not the real-entry
# count. Compacting valid triangle ids to the front (ONE cheap T-key sort)
# and binning only a static prefix C >= n_valid cuts both by 1 - C/T. The
# prefix size is picked at runtime from a static ladder via lax.switch, so
# exactly ONE branch traces per frame on the device. The single-instance
# entry points are never vmapped on the hot paths; the crowd vmap FALLBACK
# disables compaction (render.pipeline reads RenderConfig.compact_bin),
# because switch under vmap batches to an all-branches select.
COMPACT_MIN_T = 4096
# prefix fractions (num, den); plus full T. Overridable for ladder
# experiments: SMR_RUNGS="3/8,1/2,5/8" (each rung traces the kernel once
# more per config — fleet compile time scales with ladder length).
COMPACT_RUNGS = tuple(
    (int(r.split("/")[0]), int(r.split("/")[1]))
    for r in os.environ.get("SMR_RUNGS", "3/8,5/8").split(","))


def _bin_prefix(s, rows, width, height, e_max, chunk, run, tile_h=None):
    """Compacted-prefix variant of _bin, driving `run` directly.

    run(sorted_rows, starts, counts) -> pytree (the kernel launch); it is
    traced once per ladder rung, and lax.switch executes the smallest rung
    with prefix >= the frame's valid-triangle count. Exact for every input:
    the prefix always contains every valid triangle, ids keep draw order
    through the packed sort's low bits, and invalid ids inside the prefix
    expand to pad entries exactly as in _bin. Returns (run outputs, big)."""
    tile_h = tile_h or TILE_H
    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // tile_h)
    n_tiles = tiles_x * tiles_y
    tile, cat, big = _expand_tiles(s, width, height, e_max, tile_h)
    t = tile.shape[0]
    nb = _n_cats(tile_h)
    # slot 0 is real iff the triangle produced any entry at all
    valid_tri = tile[:, 0] < n_tiles
    n_valid = jnp.sum(valid_tri.astype(jnp.int32))

    vbits = max(int(t - 1).bit_length(), 1)
    assert t < (1 << 30), "prefix compaction id space exceeds the int32 key"
    key = (jnp.where(valid_tri, 0, 1 << vbits)
           + jnp.arange(t, dtype=jnp.int32))
    cids = jax.lax.sort(key, is_stable=False) & ((1 << vbits) - 1)

    lane_pad = (-rows.shape[1]) % 128

    def make_branch(c_n):
        def branch(_):
            ids = jax.lax.slice(cids, (0,), (c_n,))
            g = jnp.concatenate([tile, cat], -1)[ids]    # one fused gather
            flat_tile = g[:, :e_max].reshape(-1)
            flat_cat = g[:, e_max:].reshape(-1)
            flat_tri = jnp.broadcast_to(ids[:, None],
                                        (c_n, e_max)).reshape(-1)
            sorted_tri, start = _packed_sort(flat_tile, flat_tri, t, n_tiles,
                                             flat_cat, nb)
            counts = (start[nb::nb] - start[:-1:nb]).astype(jnp.int32)
            # pin pad entries' gather addresses (see _bin)
            eidx = jnp.arange(sorted_tri.shape[0], dtype=jnp.int32)
            spread = 256 if t >= 256 else 1
            sorted_tri = jnp.where(eidx < start[n_tiles * nb], sorted_tri,
                                   eidx & (spread - 1))
            sorted_rows = rows[sorted_tri]
            sorted_rows = jnp.pad(sorted_rows, ((0, chunk), (0, lane_pad)))
            return run(sorted_rows, start[:n_tiles * nb + 1], counts)
        return branch

    sizes = sorted({min(t, -(-(t * num) // den)) for num, den in COMPACT_RUNGS}
                   | {t})
    sizes = [c for c in sizes if c > 0]
    if len(sizes) == 1:
        return make_branch(sizes[0])(None), big
    idx = jnp.searchsorted(jnp.asarray(sizes, jnp.int32), n_valid,
                           side="left")
    return (jax.lax.switch(idx, [make_branch(c) for c in sizes], None), big)


# entries processed per kernel loop iteration: per-entry scalar reads and
# loop control dominated the sequential kernel (tile-height sweeps showed
# ~2/3 fixed cost per entry), so entries are batched into sublane groups and
# every plane is evaluated as one [GROUP, rows, TILE_W] vector op
GROUP = 8

# static row-window height (multiple of 8): a tile's entries arrive sorted
# by window category (_expand_tiles), so the kernel evaluates each
# category's groups on a STATIC [o, o+WIN) row window of the tile — most
# MMD triangles span a few pixels, and halving the evaluated rows halves
# the per-entry vector work. Category boundaries ride the sub-starts array;
# groups straddling a boundary are simply (re)evaluated in a wider loop —
# exact, because the z-tie rule is order-independent and re-processing an
# entry is a no-op. Overridable for experiments (8 = finest windows, more
# categories; 16 = default balance).
WIN = int(os.environ.get("SMR_WIN", "16"))

# Row-window categories: when ON, every kernel carry is held as a tuple of
# (8, TILE_W) STRIPS and each entry group evaluates only the strips its
# category window covers — most MMD triangles span a few rows, so this cuts
# the per-entry vector work roughly in half. The strip form exists because
# this libtpu's Mosaic crashes on the natural formulations (static row
# slices of a (32,128) carry and leading-dim indexing of (G,wh,TW) values
# both die in vector_extract_strided_slice_rule / xla::Array::Slice); strips
# use only native-(8,128)-shaped values, per-vreg selects, and one final
# concatenate. Default OFF until measured faster: _n_cats() == 1 reproduces
# the r4 kernel structure (single full-tile loop) bit-for-bit.
RASTER_WINDOWS = os.environ.get("MMD_RASTER_WINDOWS", "0") == "1"


def _window_loops(nb, bounds, cstart, n_groups, run_win, run_full, carry):
    """Drive the per-chunk category sub-loops: category k (k < nb-1) groups
    run the static-window body at o = 8k, everything else (the span
    category and every boundary-straddling group) runs the full-tile body.
    Window k's range is [floor(prev boundary / G), ceil(boundary k / G)) —
    boundary groups overlap into the neighboring window where they only
    re-process entries (a no-op under the id z-tie rule) or evaluate a
    subset of a foreign entry's rows (its own window/full loop covers the
    rest)."""
    if nb == 1:
        return run_full(0, n_groups, carry)
    rel = [jnp.clip(b - cstart, 0, n_groups * GROUP) for b in bounds]
    lo = 0
    for k in range(nb - 1):
        hi = (rel[k] + GROUP - 1) // GROUP
        carry = run_win(8 * k, lo, hi, carry)
        lo = rel[k] // GROUP
    return run_full(lo, n_groups, carry)


def _raster_kernel(starts_ref, counts_ref, rows_hbm, depth_ref, tri_ref,
                   b1_ref, b2_ref, attr_ref, scratch, sem, *, tiles_x,
                   n_attrs, chunk, inst_tiles=0, nb=1):
    i = pl.program_id(0)
    local = jax.lax.rem(i, inst_tiles) if inst_tiles else i
    ty = local // tiles_x
    tx = local % tiles_x
    y0 = (ty * TILE_H).astype(jnp.float32)
    x0 = (tx * TILE_W).astype(jnp.float32)
    ys_f = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(
        jnp.float32) + (y0 + 0.5)
    xs_f = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(
        jnp.float32) + (x0 + 0.5)

    # this tile's entries are contiguous in HBM and streamed through VMEM in
    # double-buffered chunks: per-tile capacity is UNBOUNDED (dense tiles
    # never drop geometry) and DMA traffic is proportional to the tile's
    # actual entry count, with the next chunk's copy overlapping compute
    count = counts_ref[i]
    start = starts_ref[i * nb]
    bounds = [starts_ref[i * nb + k] for k in range(1, nb)]
    n_chunks = (count + chunk - 1) // chunk

    def chunk_dma(slot, c):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start + c * chunk, chunk), :],
            scratch.at[slot], sem.at[slot])

    @pl.when(count > 0)
    def _():
        chunk_dma(0, 0).start()

    def body(g, slot, limit, carry, o, wh):
        """One GROUP of entries, full tile (the r4 form, nb == 1): plane
        math vectorized over the group axis ([G,TILE_H,TW] tensors, no
        per-entry scalar extracts), then the per-entry depth/attr selects
        statically unrolled. The trailing group is masked to `limit`
        entries: over-read rows may belong to a DIFFERENT instance in the
        fused crowd grid (whose coverage is unrelated to this tile) —
        within one instance they would be later tiles' entries or valid=0
        pad rows, but the mask makes all cases safe."""
        depth, tri, b1v, b2v, num, den = carry
        rg = scratch[slot, pl.ds(g * GROUP, GROUP), :]      # [G, W]

        def col(c):
            return rg[:, c][:, None, None]                  # [G,1,1]

        dx = xs_f[None] - col(0)                            # [G,TH,TW]
        dy = ys_f[None] - col(1)

        def plane(base):
            return col(base) + col(base + 1) * dx + col(base + 2) * dy

        w1 = col(2) * dx + col(3) * dy
        w2 = col(4) * dx + col(5) * dy
        zp = plane(6)
        valid = col(9) > 0.0
        cover = (w1 >= 0) & (w2 >= 0) & (w1 + w2 <= 1.0) & valid
        ok = cover & (zp >= 0.0) & (zp <= 1.0)
        in_r = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1, 1), 0)
                < limit - g * GROUP)
        zm = jnp.where(ok & in_r, zp, 2.0)                  # 2.0 never wins
        if n_attrs:
            den_p = plane(BASE_WIDTH)
            num_p = [plane(BASE_WIDTH + 3 + 3 * a) for a in range(n_attrs)]
        tid = rg[:, 10]                                     # [G]

        # attribute accumulators are a TUPLE of [TH,TW] planes, not one
        # stacked [na,TH,TW] tensor: re-stacking inside the unrolled entry
        # loop forced a relayout per select in Mosaic and roughly doubled
        # the per-channel cost (measured 4 ms for +2 UV channels at any
        # resolution before this change)
        for g_i in range(GROUP):                            # static unroll
            zg = zm[g_i]
            tid_i = tid[g_i].astype(jnp.int32)
            # z-ties break by draw id (max id wins — exactly the scan
            # raster's later-draw-wins rule): entry ORDER never matters, so
            # category sorting and boundary re-processing stay exact
            passed = (zg < depth) | ((zg == depth) & (tid_i > tri))
            depth = jnp.where(passed, zg, depth)
            tri = jnp.where(passed, tid_i, tri)
            b1v = jnp.where(passed, w1[g_i], b1v)
            b2v = jnp.where(passed, w2[g_i], b2v)
            if n_attrs:
                den = jnp.where(passed, den_p[g_i], den)
                num = tuple(jnp.where(passed, num_p[a][g_i], num[a])
                            for a in range(n_attrs))
        return depth, tri, b1v, b2v, num, den

    def body_strips(g, slot, limit, carry, o, wh):
        """One GROUP of entries on the STATIC row window [o, o+wh), carries
        held as TILE_H//8 strips of (8, TW) per quantity (nb > 1, see
        RASTER_WINDOWS): each covered strip is evaluated as a [G,8,TW]
        tensor whose row offset folds into the per-entry anchor (one
        [G,1,1] subtract per strip), and the per-entry selects touch only
        the covered strips — no strided carry slices, no splices."""
        depth, tri, b1v, b2v, num, den = carry
        depth, tri = list(depth), list(tri)
        b1v, b2v, den = list(b1v), list(b2v), list(den)
        num = [list(ch) for ch in num]
        rg = scratch[slot, pl.ds(g * GROUP, GROUP), :]      # [G, W]

        def col(c):
            return rg[:, c][:, None, None]                  # [G,1,1]

        tid = rg[:, 10]                                     # [G]
        in_r = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1, 1), 0)
                < limit - g * GROUP)
        dx = xs8[None] - col(0)                             # [G,8,TW]
        for s in range(wh // 8):
            si = o // 8 + s
            dy = ys8[None] - (col(1) - float(si * 8))

            def plane(base):
                return col(base) + col(base + 1) * dx + col(base + 2) * dy

            w1 = col(2) * dx + col(3) * dy
            w2 = col(4) * dx + col(5) * dy
            zp = plane(6)
            valid = col(9) > 0.0
            cover = (w1 >= 0) & (w2 >= 0) & (w1 + w2 <= 1.0) & valid
            ok = cover & (zp >= 0.0) & (zp <= 1.0)
            zm = jnp.where(ok & in_r, zp, 2.0)
            if n_attrs:
                den_p = plane(BASE_WIDTH)
                num_p = [plane(BASE_WIDTH + 3 + 3 * a)
                         for a in range(n_attrs)]
            d, tr = depth[si], tri[si]
            b1s, b2s = b1v[si], b2v[si]
            if n_attrs:
                dn = den[si]
                nm = [num[a][si] for a in range(n_attrs)]
            for g_i in range(GROUP):                        # static unroll
                zg = zm[g_i]
                tid_i = tid[g_i].astype(jnp.int32)
                passed = (zg < d) | ((zg == d) & (tid_i > tr))
                d = jnp.where(passed, zg, d)
                tr = jnp.where(passed, tid_i, tr)
                b1s = jnp.where(passed, w1[g_i], b1s)
                b2s = jnp.where(passed, w2[g_i], b2s)
                if n_attrs:
                    dn = jnp.where(passed, den_p[g_i], dn)
                    nm = [jnp.where(passed, num_p[a][g_i], nm[a])
                          for a in range(n_attrs)]
            depth[si], tri[si] = d, tr
            b1v[si], b2v[si] = b1s, b2s
            if n_attrs:
                den[si] = dn
                for a in range(n_attrs):
                    num[a][si] = nm[a]
        return (tuple(depth), tuple(tri), tuple(b1v), tuple(b2v),
                tuple(tuple(ch) for ch in num), tuple(den))

    na = max(n_attrs, 1)
    if nb == 1:
        init = (jnp.ones((TILE_H, TILE_W), jnp.float32),
                jnp.full((TILE_H, TILE_W), -1, jnp.int32),
                jnp.zeros((TILE_H, TILE_W), jnp.float32),
                jnp.zeros((TILE_H, TILE_W), jnp.float32),
                tuple(jnp.zeros((TILE_H, TILE_W), jnp.float32)
                      for _ in range(na)),
                jnp.ones((TILE_H, TILE_W), jnp.float32))
    else:
        ns = TILE_H // 8
        xs8 = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 1).astype(
            jnp.float32) + (x0 + 0.5)
        ys8 = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 0).astype(
            jnp.float32) + (y0 + 0.5)
        one8 = jnp.ones((8, TILE_W), jnp.float32)
        zero8 = jnp.zeros((8, TILE_W), jnp.float32)
        init = (tuple(one8 for _ in range(ns)),
                tuple(jnp.full((8, TILE_W), -1, jnp.int32)
                      for _ in range(ns)),
                tuple(zero8 for _ in range(ns)),
                tuple(zero8 for _ in range(ns)),
                tuple(tuple(zero8 for _ in range(ns)) for _ in range(na)),
                tuple(one8 for _ in range(ns)))

    def chunk_body(c, carry):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        chunk_dma(slot, c).wait()
        n_here = jnp.minimum(chunk, count - c * chunk)
        n_groups = (n_here + GROUP - 1) // GROUP
        bodyfn = body if nb == 1 else body_strips

        def run_win(o, lo, hi, cr):
            return jax.lax.fori_loop(
                lo, hi, lambda g, c_: bodyfn(g, slot, n_here, c_, o, WIN),
                cr)

        def run_full(lo, hi, cr):
            return jax.lax.fori_loop(
                lo, hi,
                lambda g, c_: bodyfn(g, slot, n_here, c_, 0, TILE_H), cr)

        return _window_loops(nb, bounds, start + c * chunk, n_groups,
                             run_win, run_full, carry)

    depth, tri, b1v, b2v, num, den = jax.lax.fori_loop(
        0, n_chunks, chunk_body, init)
    if nb > 1:
        depth = jnp.concatenate(depth, 0)
        tri = jnp.concatenate(tri, 0)
        b1v = jnp.concatenate(b1v, 0)
        b2v = jnp.concatenate(b2v, 0)
        den = jnp.concatenate(den, 0)
        num = tuple(jnp.concatenate(ch, 0) for ch in num)
    depth_ref[...] = depth.reshape(depth_ref.shape)
    tri_ref[...] = tri.reshape(tri_ref.shape)
    b1_ref[...] = b1v.reshape(b1_ref.shape)
    b2_ref[...] = b2v.reshape(b2_ref.shape)
    if n_attrs:
        safe = jnp.where(jnp.abs(den) > 1e-9, den, 1.0)
        attr_ref[...] = (jnp.stack(num) / safe[None, :, :]).reshape(
            attr_ref.shape)
    else:
        attr_ref[...] = jnp.stack(num).reshape(attr_ref.shape)



# D3D11/OpenGL standard 4x MSAA sample pattern (pixel units from center)
MSAA4_OFFSETS = ((-0.125, -0.375), (0.375, -0.125),
                 (-0.375, 0.125), (0.125, 0.375))


def _raster_kernel_ms(starts_ref, counts_ref, rows_hbm, depth_ref, tri_ref,
                      b1_ref, b2_ref, attr_ref, sdepth_ref, scratch, sem, *,
                      tiles_x, n_attrs, chunk, inst_tiles=0, unbias=True,
                      nb=1):
    """4x-MSAA variant of _raster_kernel: per-pixel center visibility +
    attributes (coverage extended to any-sample so edge pixels carry valid
    attributes, like non-centroid GPU interpolation) plus PER-SAMPLE depth
    at the 4 standard offsets. Per-sample deltas of every plane are scalar
    constants per entry, so each extra sample costs ~12 vector ops.
    `inst_tiles` > 0 folds the fused multi-instance (crowd) grid exactly as
    in _raster_kernel. `unbias=False` keeps the +2 edge-extrapolation depth
    bias in the output so multi-pass callers can merge passes with the
    center-beats-edge rule intact, un-biasing once at the end. Category
    sub-loops with static row windows as in _raster_kernel (the category's
    +-1 row pad covers the +-0.375 px sample offsets)."""
    i = pl.program_id(0)
    local = jax.lax.rem(i, inst_tiles) if inst_tiles else i
    ty = local // tiles_x
    tx = local % tiles_x
    y0 = (ty * TILE_H).astype(jnp.float32)
    x0 = (tx * TILE_W).astype(jnp.float32)
    ys_f = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(
        jnp.float32) + (y0 + 0.5)
    xs_f = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(
        jnp.float32) + (x0 + 0.5)

    count = counts_ref[i]
    start = starts_ref[i * nb]
    bounds = [starts_ref[i * nb + k] for k in range(1, nb)]
    n_chunks = (count + chunk - 1) // chunk

    def chunk_dma(slot, c):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start + c * chunk, chunk), :],
            scratch.at[slot], sem.at[slot])

    @pl.when(count > 0)
    def _():
        chunk_dma(0, 0).start()

    def body(g, slot, limit, carry, o, wh):
        """One GROUP of entries, full tile (the r4 form, nb == 1), plane
        math vectorized over the group axis (see _raster_kernel.body for
        the tail-mask rationale)."""
        depth, tri, b1v, b2v, num, den, sdepth = carry
        rg = scratch[slot, pl.ds(g * GROUP, GROUP), :]

        def col(c):
            return rg[:, c][:, None, None]

        dx = xs_f[None] - col(0)
        dy = ys_f[None] - col(1)

        def plane(base):
            return col(base) + col(base + 1) * dx + col(base + 2) * dy

        w1 = col(2) * dx + col(3) * dy
        w2 = col(4) * dx + col(5) * dy
        zp = plane(6)
        valid = col(9) > 0.0
        tid = rg[:, 10]
        in_r = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1, 1), 0)
                < limit - g * GROUP)

        szm = []
        cover_any = None
        for s, (ox, oy) in enumerate(MSAA4_OFFSETS):
            dw1 = col(2) * ox + col(3) * oy          # [G,1,1] per entry
            dw2 = col(4) * ox + col(5) * oy
            dz = col(7) * ox + col(8) * oy
            w1s = w1 + dw1
            w2s = w2 + dw2
            zs = zp + dz
            cover_s = (w1s >= 0) & (w2s >= 0) & (w1s + w2s <= 1.0) & valid
            cover_any = cover_s if cover_any is None else (cover_any | cover_s)
            szm.append(jnp.where(cover_s & (zs >= 0.0) & in_r, zs, 2.0))

        # center visibility with any-sample coverage (edge pixels keep the
        # front surface's attributes even when the exact center is outside).
        # Entries NOT covering the exact center carry a +2 depth bias, so a
        # true center-covering triangle always beats an edge extrapolation —
        # the stored center visibility stays exact wherever it exists.
        cover_c = (w1 >= 0) & (w2 >= 0) & (w1 + w2 <= 1.0)
        zb = jnp.where(cover_any & in_r & (zp >= 0.0) & (zp <= 1.0),
                       zp + jnp.where(cover_c, 0.0, 2.0), 4.0)
        if n_attrs:
            den_p = plane(BASE_WIDTH)
            num_p = [plane(BASE_WIDTH + 3 + 3 * a) for a in range(n_attrs)]

        # per-channel tuple carries (see _raster_kernel.body: re-stacking
        # inside the unrolled loop costs a relayout per select)
        for g_i in range(GROUP):                     # static unroll
            sdepth = tuple(jnp.minimum(sdepth[s], szm[s][g_i])
                           for s in range(4))
            zg = zb[g_i]
            tid_i = tid[g_i].astype(jnp.int32)
            # z-ties break by draw id (max id wins), see _raster_kernel
            passed = (zg < depth) | ((zg == depth) & (tid_i > tri))
            depth = jnp.where(passed, zg, depth)
            tri = jnp.where(passed, tid_i, tri)
            b1v = jnp.where(passed, w1[g_i], b1v)
            b2v = jnp.where(passed, w2[g_i], b2v)
            if n_attrs:
                den = jnp.where(passed, den_p[g_i], den)
                num = tuple(jnp.where(passed, num_p[a][g_i], num[a])
                            for a in range(n_attrs))
        return depth, tri, b1v, b2v, num, den, sdepth

    def body_strips(g, slot, limit, carry, o, wh):
        """One GROUP of entries on the static window [o, o+wh), strip
        carries (nb > 1, see _raster_kernel.body_strips)."""
        depth, tri, b1v, b2v, num, den, sdepth = carry
        depth, tri = list(depth), list(tri)
        b1v, b2v, den = list(b1v), list(b2v), list(den)
        num = [list(ch) for ch in num]
        sdepth = [list(ch) for ch in sdepth]
        rg = scratch[slot, pl.ds(g * GROUP, GROUP), :]

        def col(c):
            return rg[:, c][:, None, None]

        tid = rg[:, 10]
        in_r = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1, 1), 0)
                < limit - g * GROUP)
        dx = xs8[None] - col(0)
        for st in range(wh // 8):
            si = o // 8 + st
            dy = ys8[None] - (col(1) - float(si * 8))

            def plane(base):
                return col(base) + col(base + 1) * dx + col(base + 2) * dy

            w1 = col(2) * dx + col(3) * dy
            w2 = col(4) * dx + col(5) * dy
            zp = plane(6)
            valid = col(9) > 0.0

            szm = []
            cover_any = None
            for s, (ox, oy) in enumerate(MSAA4_OFFSETS):
                w1s = w1 + (col(2) * ox + col(3) * oy)
                w2s = w2 + (col(4) * ox + col(5) * oy)
                zs = zp + (col(7) * ox + col(8) * oy)
                cover_s = ((w1s >= 0) & (w2s >= 0) & (w1s + w2s <= 1.0)
                           & valid)
                cover_any = (cover_s if cover_any is None
                             else (cover_any | cover_s))
                szm.append(jnp.where(cover_s & (zs >= 0.0) & in_r, zs, 2.0))

            cover_c = (w1 >= 0) & (w2 >= 0) & (w1 + w2 <= 1.0)
            zb = jnp.where(cover_any & in_r & (zp >= 0.0) & (zp <= 1.0),
                           zp + jnp.where(cover_c, 0.0, 2.0), 4.0)
            if n_attrs:
                den_p = plane(BASE_WIDTH)
                num_p = [plane(BASE_WIDTH + 3 + 3 * a)
                         for a in range(n_attrs)]
            d, tr = depth[si], tri[si]
            b1s, b2s = b1v[si], b2v[si]
            sd = [sdepth[s][si] for s in range(4)]
            if n_attrs:
                dn = den[si]
                nm = [num[a][si] for a in range(n_attrs)]
            for g_i in range(GROUP):                 # static unroll
                sd = [jnp.minimum(sd[s], szm[s][g_i]) for s in range(4)]
                zg = zb[g_i]
                tid_i = tid[g_i].astype(jnp.int32)
                passed = (zg < d) | ((zg == d) & (tid_i > tr))
                d = jnp.where(passed, zg, d)
                tr = jnp.where(passed, tid_i, tr)
                b1s = jnp.where(passed, w1[g_i], b1s)
                b2s = jnp.where(passed, w2[g_i], b2s)
                if n_attrs:
                    dn = jnp.where(passed, den_p[g_i], dn)
                    nm = [jnp.where(passed, num_p[a][g_i], nm[a])
                          for a in range(n_attrs)]
            depth[si], tri[si] = d, tr
            b1v[si], b2v[si] = b1s, b2s
            for s in range(4):
                sdepth[s][si] = sd[s]
            if n_attrs:
                den[si] = dn
                for a in range(n_attrs):
                    num[a][si] = nm[a]
        return (tuple(depth), tuple(tri), tuple(b1v), tuple(b2v),
                tuple(tuple(ch) for ch in num), tuple(den),
                tuple(tuple(ch) for ch in sdepth))

    na = max(n_attrs, 1)
    if nb == 1:
        init = (jnp.full((TILE_H, TILE_W), 3.0, jnp.float32),  # biased clear
                jnp.full((TILE_H, TILE_W), -1, jnp.int32),
                jnp.zeros((TILE_H, TILE_W), jnp.float32),
                jnp.zeros((TILE_H, TILE_W), jnp.float32),
                tuple(jnp.zeros((TILE_H, TILE_W), jnp.float32)
                      for _ in range(na)),
                jnp.ones((TILE_H, TILE_W), jnp.float32),
                tuple(jnp.ones((TILE_H, TILE_W), jnp.float32)
                      for _ in range(4)))
    else:
        ns = TILE_H // 8
        xs8 = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 1).astype(
            jnp.float32) + (x0 + 0.5)
        ys8 = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 0).astype(
            jnp.float32) + (y0 + 0.5)
        one8 = jnp.ones((8, TILE_W), jnp.float32)
        zero8 = jnp.zeros((8, TILE_W), jnp.float32)
        init = (tuple(jnp.full((8, TILE_W), 3.0, jnp.float32)
                      for _ in range(ns)),
                tuple(jnp.full((8, TILE_W), -1, jnp.int32)
                      for _ in range(ns)),
                tuple(zero8 for _ in range(ns)),
                tuple(zero8 for _ in range(ns)),
                tuple(tuple(zero8 for _ in range(ns)) for _ in range(na)),
                tuple(one8 for _ in range(ns)),
                tuple(tuple(one8 for _ in range(ns)) for _ in range(4)))

    def chunk_body(c, carry):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        chunk_dma(slot, c).wait()
        n_here = jnp.minimum(chunk, count - c * chunk)
        n_groups = (n_here + GROUP - 1) // GROUP
        bodyfn = body if nb == 1 else body_strips

        def run_win(o, lo, hi, cr):
            return jax.lax.fori_loop(
                lo, hi, lambda g, c_: bodyfn(g, slot, n_here, c_, o, WIN),
                cr)

        def run_full(lo, hi, cr):
            return jax.lax.fori_loop(
                lo, hi,
                lambda g, c_: bodyfn(g, slot, n_here, c_, 0, TILE_H), cr)

        return _window_loops(nb, bounds, start + c * chunk, n_groups,
                             run_win, run_full, carry)

    depth, tri, b1v, b2v, num, den, sdepth = jax.lax.fori_loop(
        0, n_chunks, chunk_body, init)
    if nb > 1:
        depth = jnp.concatenate(depth, 0)
        tri = jnp.concatenate(tri, 0)
        b1v = jnp.concatenate(b1v, 0)
        b2v = jnp.concatenate(b2v, 0)
        den = jnp.concatenate(den, 0)
        num = tuple(jnp.concatenate(ch, 0) for ch in num)
        sdepth = tuple(jnp.concatenate(ch, 0) for ch in sdepth)
    if unbias:
        # un-bias: empty stays far (1.0); edge winners drop the +2
        depth = jnp.where(tri < 0, 1.0,
                          jnp.where(depth > 1.5, depth - 2.0, depth))
    depth_ref[...] = depth.reshape(depth_ref.shape)
    tri_ref[...] = tri.reshape(tri_ref.shape)
    b1_ref[...] = b1v.reshape(b1_ref.shape)
    b2_ref[...] = b2v.reshape(b2_ref.shape)
    sdepth_ref[...] = jnp.stack(sdepth).reshape(sdepth_ref.shape)
    if n_attrs:
        safe = jnp.where(jnp.abs(den) > 1e-9, den, 1.0)
        attr_ref[...] = (jnp.stack(num) / safe[None, :, :]).reshape(
            attr_ref.shape)
    else:
        attr_ref[...] = jnp.stack(num).reshape(attr_ref.shape)



def _run_kernel_ms(sorted_rows, starts, counts, width, height, n_attrs,
                   chunk):
    assert chunk % GROUP == 0, "chunk must be a multiple of GROUP"
    pad_w = -(-width // TILE_W) * TILE_W
    pad_h = -(-height // TILE_H) * TILE_H
    tiles_x = pad_w // TILE_W
    n_tiles = (pad_h // TILE_H) * tiles_x
    na = max(n_attrs, 1)
    row_w = sorted_rows.shape[1]

    tile_spec = lambda: pl.BlockSpec(
        (TILE_H, TILE_W), lambda i, s, c: (i // tiles_x, i % tiles_x),
        memory_space=pltpu.VMEM)
    plane_spec = lambda n: pl.BlockSpec(
        (n, TILE_H, TILE_W), lambda i, s, c: (0, i // tiles_x, i % tiles_x),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[tile_spec(), tile_spec(), tile_spec(), tile_spec(),
                   plane_spec(na), plane_spec(4)],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    depth, tri, b1, b2, attr, sdepth = pl.pallas_call(
        partial(_raster_kernel_ms, tiles_x=tiles_x, n_attrs=n_attrs,
                chunk=chunk, nb=_n_cats(TILE_H)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.int32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((na, pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((4, pad_h, pad_w), jnp.float32),
        ],
        interpret=_interpret(),
    )(starts, counts, sorted_rows)
    vis = raster.VisBuffer(
        depth=depth[:height, :width],
        tri=tri[:height, :width],
        bary=jnp.stack([b1[:height, :width], b2[:height, :width]], -1))
    return vis, attr[:, :height, :width], sdepth[:, :height, :width]


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 9))
def rasterize_attrs_tiled_msaa(clip, tris, attrs, width, height,
                               cull=raster.CULL_BACK, e_max=9, chunk=256,
                               nocull=None, compact=True, cv=None, va=None):
    """4x-MSAA raster: center visibility + attributes like
    rasterize_attrs_tiled, PLUS per-sample depth [4, H, W] at the standard
    rotated-grid offsets. A sample is covered iff its depth < 1.0.

    Big-triangle fallback approximates all four samples with the center
    result (oversized triangles are interior-dominated). `cv`/`va`: see
    rasterize_attrs_tiled."""
    if cv is None:
        g = jnp.concatenate([clip, attrs], -1)[tris]
        cv, va = g[..., :4], g[..., 4:]
    s = raster.setup(clip, tris, width, height, cull, cv=cv,
                     sample_extent=0.375, nocull=nocull)
    s["tris_v"] = tris
    s["va"] = va
    rows = _setup_rows(s, jnp.arange(tris.shape[0], dtype=jnp.int32), attrs)
    if compact and tris.shape[0] >= COMPACT_MIN_T:
        def run(sorted_rows, starts, counts):
            return _run_kernel_ms(sorted_rows, starts, counts, width,
                                  height, attrs.shape[1], chunk)
        (vis, attr, sdepth), big = _bin_prefix(s, rows, width, height,
                                               e_max, chunk, run)
    else:
        sorted_rows, starts, counts, big = _bin(s, rows, width, height,
                                                e_max, chunk)
        vis, attr, sdepth = _run_kernel_ms(sorted_rows, starts, counts,
                                           width, height, attrs.shape[1],
                                           chunk)
    if not _covers_all(e_max, width, height):
        vis0 = vis
        vis, attr = _merge_big(vis, attr, clip, tris, width, height, s, big,
                               attrs)
        big_won = (vis.depth < vis0.depth) | (vis.tri != vis0.tri)
        sdepth = jnp.where(big_won[None], jnp.minimum(sdepth, vis.depth[None]),
                           sdepth)
    attr = jnp.moveaxis(attr, 0, -1)
    attr = jnp.where((vis.tri >= 0)[..., None], attr, 0.0)
    return vis, attr, sdepth


def _depth_tile_loop(sub_starts, count, ty, tx, rows_hbm, scratch, sem,
                     chunk, tile_h, nb):
    """Shared depth-only tile loop: stream the tile's entry window from HBM
    in double-buffered chunks and fold the depth min, category sub-loops
    with static row windows as in _raster_kernel (min-folds are trivially
    idempotent). `sub_starts` = [start, m1, .., m_{nb-1}] scalar bounds.
    (ty, tx) are FULL-map tile coordinates, so pixel arithmetic is
    identical whether the kernel runs the whole grid or a window of it.
    Returns the [tile_h, TILE_W] depth tile."""
    y0 = (ty * tile_h).astype(jnp.float32)
    x0 = (tx * TILE_W).astype(jnp.float32)
    ys_f = jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 0).astype(
        jnp.float32) + (y0 + 0.5)
    xs_f = jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 1).astype(
        jnp.float32) + (x0 + 0.5)

    start = sub_starts[0]
    n_chunks = (count + chunk - 1) // chunk

    def chunk_dma(slot, c):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(start + c * chunk, chunk), :],
            scratch.at[slot], sem.at[slot])

    @pl.when(count > 0)
    def _():
        chunk_dma(0, 0).start()

    def body(g, slot, limit, depth, o, wh):
        # one GROUP of entries, full tile (the r4 form, nb == 1),
        # vectorized over the group axis; the min over the group needs no
        # winner tracking (depth only). The tail mask covers over-read rows
        # (other instances' entries in the fused crowd grid, or valid=0
        # pad rows).
        rg = scratch[slot, pl.ds(g * GROUP, GROUP), :]

        def col(c):
            return rg[:, c][:, None, None]

        dx = xs_f[None] - col(0)
        dy = ys_f[None] - col(1)
        w1 = col(2) * dx + col(3) * dy
        w2 = col(4) * dx + col(5) * dy
        zp = col(6) + col(7) * dx + col(8) * dy
        ok = ((w1 >= 0) & (w2 >= 0) & (w1 + w2 <= 1.0) & (col(9) > 0.0)
              & (zp >= 0.0))
        in_r = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1, 1), 0)
                < limit - g * GROUP)
        zm = jnp.where(ok & in_r, zp, 2.0)
        for g_i in range(GROUP):
            depth = jnp.minimum(depth, zm[g_i])
        return depth

    def body_strips(g, slot, limit, depth, o, wh):
        # windowed body, strip carries (nb > 1): see
        # _raster_kernel.body_strips
        depth = list(depth)
        rg = scratch[slot, pl.ds(g * GROUP, GROUP), :]

        def col(c):
            return rg[:, c][:, None, None]

        in_r = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1, 1), 0)
                < limit - g * GROUP)
        dx = xs8[None] - col(0)
        for st in range(wh // 8):
            si = o // 8 + st
            dy = ys8[None] - (col(1) - float(si * 8))
            w1 = col(2) * dx + col(3) * dy
            w2 = col(4) * dx + col(5) * dy
            zp = col(6) + col(7) * dx + col(8) * dy
            ok = ((w1 >= 0) & (w2 >= 0) & (w1 + w2 <= 1.0) & (col(9) > 0.0)
                  & (zp >= 0.0))
            zm = jnp.where(ok & in_r, zp, 2.0)
            d = depth[si]
            for g_i in range(GROUP):
                d = jnp.minimum(d, zm[g_i])
            depth[si] = d
        return tuple(depth)

    if nb == 1:
        init = jnp.ones((tile_h, TILE_W), jnp.float32)
    else:
        xs8 = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 1).astype(
            jnp.float32) + (x0 + 0.5)
        ys8 = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 0).astype(
            jnp.float32) + (y0 + 0.5)
        init = tuple(jnp.ones((8, TILE_W), jnp.float32)
                     for _ in range(tile_h // 8))

    def chunk_body(c, depth):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        chunk_dma(slot, c).wait()
        n_here = jnp.minimum(chunk, count - c * chunk)
        n_groups = (n_here + GROUP - 1) // GROUP
        bodyfn = body if nb == 1 else body_strips

        def run_win(o, lo, hi, d):
            return jax.lax.fori_loop(
                lo, hi, lambda g, d_: bodyfn(g, slot, n_here, d_, o, WIN),
                d)

        def run_full(lo, hi, d):
            return jax.lax.fori_loop(
                lo, hi,
                lambda g, d_: bodyfn(g, slot, n_here, d_, 0, tile_h), d)

        return _window_loops(nb, list(sub_starts[1:]), start + c * chunk,
                             n_groups, run_win, run_full, depth)

    out = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
    return jnp.concatenate(out, 0) if nb > 1 else out


def _depth_kernel(starts_ref, counts_ref, rows_hbm, depth_ref, scratch, sem,
                  *, tiles_x, chunk, inst_tiles=0, nb=1):
    """Depth-only variant of _raster_kernel for shadow maps: no tri/bary/attr
    accumulators, no per-entry valid lane (binned entries are valid by
    construction) and no zp<=1 test (implied by zp <= depth, depth0 = 1) —
    roughly half the per-entry VPU ops and one output buffer instead of five.
    """
    i = pl.program_id(0)
    local = jax.lax.rem(i, inst_tiles) if inst_tiles else i
    ty = local // tiles_x
    tx = local % tiles_x
    subs = [starts_ref[i * nb + k] for k in range(nb)]
    depth_ref[...] = _depth_tile_loop(
        subs, counts_ref[i], ty, tx, rows_hbm, scratch, sem, chunk,
        TILE_H, nb).reshape(depth_ref.shape)


def _depth_kernel_win(origin_ref, starts_ref, counts_ref, rows_hbm,
                      depth_ref, scratch, sem, *, tiles_x, chunk, win_tx,
                      tile_h, nb=1):
    """Windowed depth kernel: the grid covers only a win_ty x win_tx block
    of the full tile grid, whose origin (tile coords, traced) arrives via
    scalar prefetch. Pixel coordinates and entry windows are the FULL map's
    (starts/counts are indexed by global tile id), so results are
    bit-identical to the full-grid kernel over the window."""
    i = pl.program_id(0)
    ty = origin_ref[0] + i // win_tx
    tx = origin_ref[1] + i % win_tx
    gid = ty * tiles_x + tx
    subs = [starts_ref[gid * nb + k] for k in range(nb)]
    depth_ref[...] = _depth_tile_loop(
        subs, counts_ref[gid], ty, tx, rows_hbm, scratch, sem, chunk,
        tile_h, nb).reshape(depth_ref.shape)



def _run_depth_kernel(sorted_rows, starts, counts, width, height, chunk):
    assert chunk % GROUP == 0, "chunk must be a multiple of GROUP"
    pad_w = -(-width // TILE_W) * TILE_W
    pad_h = -(-height // TILE_H) * TILE_H
    tiles_x = pad_w // TILE_W
    n_tiles = (pad_h // TILE_H) * tiles_x
    row_w = sorted_rows.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W),
                         lambda i, s, c: (i // tiles_x, i % tiles_x),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    depth, = pl.pallas_call(
        partial(_depth_kernel, tiles_x=tiles_x, chunk=chunk,
                nb=_n_cats(TILE_H)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32)],
        interpret=_interpret(),
    )(starts, counts, sorted_rows)
    return depth[:height, :width]


def _run_depth_kernel_win(sorted_rows, starts, counts, origin, tiles_x,
                          win_th, win_tw, chunk, tile_h):
    """Run the windowed depth kernel over a win_th x win_tw tile block whose
    (ty, tx) origin is the traced `origin` [2] i32. Returns the window's
    depth [win_th*tile_h, win_tw*TILE_W]."""
    assert chunk % GROUP == 0, "chunk must be a multiple of GROUP"
    row_w = sorted_rows.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(win_th * win_tw,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((tile_h, TILE_W),
                         lambda i, o, s, c: (i // win_tw, i % win_tw),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    depth, = pl.pallas_call(
        partial(_depth_kernel_win, tiles_x=tiles_x, chunk=chunk,
                win_tx=win_tw, tile_h=tile_h, nb=_n_cats(tile_h)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((win_th * tile_h, win_tw * TILE_W),
                                        jnp.float32)],
        interpret=_interpret(),
    )(origin, starts, counts, sorted_rows)
    return depth


def _tile_ladder(full_tiles, fracs=(0.25, 0.5)):
    """Static ladder of window extents in TILES, ending at the full grid.
    All sizes live in one program as lax.switch branches; coarse fracs keep
    the kernel-variant count (and compile time) low — window slack only
    costs empty grid steps (~0.6 us each)."""
    out = []
    for f in fracs:
        s = max(1, min(int(round(full_tiles * f)), full_tiles))
        if s < full_tiles and s not in out:
            out.append(s)
    out.append(full_tiles)
    return out


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def rasterize_depth_tiled_window(clip, tris, width, height,
                                 cull=raster.CULL_BACK, e_max=9, chunk=256,
                                 tile_h=8, cv=None):
    """Depth-only rasterization restricted to the casters' tile bounding
    box, pasted into a far-initialized (1.0) full map — bit-identical to
    rasterize_depth_tiled (the kernel evaluates full-map pixel coordinates;
    tiles outside the window contain no caster coverage by construction of
    the bbox) at a fraction of its grid steps.

    MEASURED NEUTRAL at the 2048^2 bench shadow map (3.33 ms windowed
    tile_h=32 vs 3.44 full; tile_h=8 REGRESSES to 3.8-4.7 ms at any chunk):
    empty grid steps cost ~0.1 us each on this hardware, so skipping ~900
    of them buys ~0.1 ms, while short tiles multiply covered-tile DMA
    latency and per-tile fixed cost faster than they cut per-entry vector
    work. The pass is bound by binning (sort + row gather) and covered-tile
    streaming, which the window cannot remove. Kept as an opt-in
    (RenderConfig.shadow_window) for very large, very sparse targets.

    Caveat: short `tile_h` lowers the bbox-span threshold at which a
    triangle falls to the BIG_TRI_CAP-bounded merge (at tile_h=8 a ~44 px
    triangle already spans >6 tiles); scenes with >64 such casters drop
    the excess, same cliff as the base path. Window extents come from a
    small static ladder (lax.switch); the origin is traced
    (scalar-prefetched). `cv` may pass pre-gathered per-corner clip coords
    [T,3,4] shared with the main pass (see rasterize_attrs_tiled)."""
    s = raster.setup(clip, tris, width, height, cull, cv=cv)
    rows = _setup_rows(s, jnp.arange(tris.shape[0], dtype=jnp.int32))
    sorted_rows, starts, counts, big = _bin(s, rows, width, height, e_max,
                                            chunk, tile_h)
    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // tile_h)
    tws = _tile_ladder(tiles_x)
    ths = _tile_ladder(tiles_y)

    if len(tws) == 1 and len(ths) == 1:
        depth = _run_depth_kernel_win(
            sorted_rows, starts, counts, jnp.zeros((2,), jnp.int32),
            tiles_x, tiles_y, tiles_x, chunk, tile_h)[:height, :width]
    else:
        # caster tile bbox over valid triangles (same clamping as
        # _expand_tiles, so every binned entry's tile lies inside it)
        xy = s["xy"]
        valid = s["valid"]
        tx0_t = (jnp.clip(jnp.min(xy[:, :, 0], 1), 0.0, width - 1.0)
                 // TILE_W).astype(jnp.int32)
        tx1_t = (jnp.clip(jnp.max(xy[:, :, 0], 1), 0.0, width - 1.0)
                 // TILE_W).astype(jnp.int32)
        ty0_t = (jnp.clip(jnp.min(xy[:, :, 1], 1), 0.0, height - 1.0)
                 // tile_h).astype(jnp.int32)
        ty1_t = (jnp.clip(jnp.max(xy[:, :, 1], 1), 0.0, height - 1.0)
                 // tile_h).astype(jnp.int32)
        tx0 = jnp.min(jnp.where(valid, tx0_t, tiles_x - 1))
        tx1 = jnp.max(jnp.where(valid, tx1_t, 0))
        ty0 = jnp.min(jnp.where(valid, ty0_t, tiles_y - 1))
        ty1 = jnp.max(jnp.where(valid, ty1_t, 0))
        need_w = tx1 + 1 - tx0
        need_h = ty1 + 1 - ty0
        iw = sum((need_w > t).astype(jnp.int32) for t in tws[:-1])
        ih = sum((need_h > t).astype(jnp.int32) for t in ths[:-1])

        def make_branch(tw, th):
            def branch(_):
                oy = jnp.clip(ty0, 0, tiles_y - th)
                ox = jnp.clip(tx0, 0, tiles_x - tw)
                win = _run_depth_kernel_win(
                    sorted_rows, starts, counts, jnp.stack([oy, ox]),
                    tiles_x, th, tw, chunk, tile_h)
                full = jnp.ones((tiles_y * tile_h, tiles_x * TILE_W),
                                jnp.float32)
                return jax.lax.dynamic_update_slice(
                    full, win, (oy * tile_h, ox * TILE_W))[:height, :width]
            return branch

        branches = [make_branch(tw, th) for tw in tws for th in ths]
        depth = jax.lax.switch(iw * len(ths) + ih, branches, 0)

    if e_max >= tiles_x * tiles_y:   # covers-all at THIS tile grid
        return depth

    def merge(depth):
        t = tris.shape[0]
        cap = min(BIG_TRI_CAP, t)
        order = jnp.argsort(~big, stable=True)[:cap]
        s_big = {
            "xy": s["xy"][order],
            "z": s["z"][order],
            "area2": s["area2"][order],
            "valid": (s["valid"] & big)[order],
            "inv_w": s["inv_w"][order],
        }
        vis_big = _scan_subset(clip, tris[order], width, height, s_big)
        return jnp.minimum(depth, vis_big.depth)

    return jax.lax.cond(jnp.any(big), merge, lambda d: d, depth)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 8))
def rasterize_depth_tiled(clip, tris, width, height, cull=raster.CULL_BACK,
                          e_max=9, chunk=256, nocull=None, compact=True,
                          cv=None):
    """Depth-only binned rasterization (shadow maps): returns [H, W] depth
    with the same z-test semantics as rasterize_tiled().depth. `cv` may
    pass pre-gathered per-corner clip coords [T,3,4] (see
    rasterize_attrs_tiled) — skips this pass's own 3T-row vertex gather."""
    s = raster.setup(clip, tris, width, height, cull, cv=cv, nocull=nocull)
    rows = _setup_rows(s, jnp.arange(tris.shape[0], dtype=jnp.int32))
    if compact and tris.shape[0] >= COMPACT_MIN_T:
        def run(sorted_rows, starts, counts):
            return _run_depth_kernel(sorted_rows, starts, counts, width,
                                     height, chunk)
        depth, big = _bin_prefix(s, rows, width, height, e_max, chunk, run)
    else:
        sorted_rows, starts, counts, big = _bin(s, rows, width, height,
                                                e_max, chunk)
        depth = _run_depth_kernel(sorted_rows, starts, counts, width,
                                  height, chunk)
    if _covers_all(e_max, width, height):
        return depth

    def merge(depth):
        t = tris.shape[0]
        cap = min(BIG_TRI_CAP, t)
        order = jnp.argsort(~big, stable=True)[:cap]
        s_big = {
            "xy": s["xy"][order],
            "z": s["z"][order],
            "area2": s["area2"][order],
            "valid": (s["valid"] & big)[order],
            "inv_w": s["inv_w"][order],
        }
        vis_big = _scan_subset(clip, tris[order], width, height, s_big)
        return jnp.minimum(depth, vis_big.depth)

    return jax.lax.cond(jnp.any(big), merge, lambda d: d, depth)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _run_kernel(sorted_rows, starts, counts, width, height, n_attrs, chunk):
    assert chunk % GROUP == 0, "chunk must be a multiple of GROUP"
    pad_w = -(-width // TILE_W) * TILE_W
    pad_h = -(-height // TILE_H) * TILE_H
    tiles_x = pad_w // TILE_W
    n_tiles = (pad_h // TILE_H) * tiles_x
    na = max(n_attrs, 1)
    row_w = sorted_rows.shape[1]

    tile_spec = lambda: pl.BlockSpec(
        (TILE_H, TILE_W), lambda i, s, c: (i // tiles_x, i % tiles_x),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
        ],
        out_specs=[
            tile_spec(), tile_spec(), tile_spec(), tile_spec(),
            pl.BlockSpec((na, TILE_H, TILE_W),
                         lambda i, s, c: (0, i // tiles_x, i % tiles_x),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    depth, tri, b1, b2, attr = pl.pallas_call(
        partial(_raster_kernel, tiles_x=tiles_x, n_attrs=n_attrs,
                chunk=chunk, nb=_n_cats(TILE_H)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.int32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((na, pad_h, pad_w), jnp.float32),
        ],
        interpret=_interpret(),
    )(starts, counts, sorted_rows)
    vis = raster.VisBuffer(
        depth=depth[:height, :width],
        tri=tri[:height, :width],
        bary=jnp.stack([b1[:height, :width], b2[:height, :width]], -1))
    return vis, attr[:, :height, :width]


BIG_TRI_CAP = 64


def _covers_all(e_max, width, height) -> bool:
    """True when e_max >= the whole tile grid: no triangle can overflow into
    the big-tri fallback, so the merge is skipped AT TRACE TIME. This matters
    under vmap (crowds): lax.cond batches to a both-branches select, so the
    fallback's full-frame scan would otherwise run for every instance every
    frame even with zero big triangles."""
    return e_max >= (-(-width // TILE_W)) * (-(-height // TILE_H))


def _merge_big(vis, attr, clip, tris, width, height, s, big, attrs):
    """Exact scan raster over oversized triangles, merged by depth.

    Only the first BIG_TRI_CAP oversized triangles are rasterized (compacted
    to the front with a stable sort), so a close-up can never degenerate into
    a full scan over the whole mesh — the fallback's cost is bounded at
    ~BIG_TRI_CAP full-frame edge evaluations, and only when triggered."""
    any_big = jnp.any(big)

    def merge(args):
        vis, attr = args
        t = tris.shape[0]
        cap = min(BIG_TRI_CAP, t)
        # stable-compact big tris to the front, keep `cap` of them
        order = jnp.argsort(~big, stable=True)[:cap]
        s_big = {
            "xy": s["xy"][order],
            "z": s["z"][order],
            "area2": s["area2"][order],
            "valid": (s["valid"] & big)[order],
            "inv_w": s["inv_w"][order],
        }
        vis_big = _scan_subset(clip, tris[order], width, height, s_big)
        # map compacted ids back to original triangle ids
        real_tri = jnp.where(vis_big.tri >= 0,
                             order[jnp.maximum(vis_big.tri, 0)], -1)
        better = (vis_big.depth <= vis.depth) & (vis_big.tri >= 0)
        merged = raster.VisBuffer(
            depth=jnp.where(better, vis_big.depth, vis.depth),
            tri=jnp.where(better, real_tri, vis.tri),
            bary=jnp.where(better[..., None], vis_big.bary, vis.bary))
        if attrs is not None:
            big_attr = raster.interpolate(vis_big, clip, tris[order], attrs)
            big_attr = jnp.moveaxis(big_attr, -1, 0)
            attr = jnp.where(better[None], big_attr, attr)
        return merged, attr

    return jax.lax.cond(any_big, merge, lambda a: a, (vis, attr))


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def rasterize_tiled(clip, tris, width, height, cull=raster.CULL_BACK,
                    e_max=9, chunk=256, compact=True) -> raster.VisBuffer:
    """Binned-tile rasterization; semantics match raster.rasterize.

    `chunk` is the VMEM streaming unit, not a capacity: tiles with any
    number of entries render exactly."""
    s = raster.setup(clip, tris, width, height, cull)
    rows = _setup_rows(s, jnp.arange(tris.shape[0], dtype=jnp.int32))
    if compact and tris.shape[0] >= COMPACT_MIN_T:
        def run(sorted_rows, starts, counts):
            return _run_kernel(sorted_rows, starts, counts, width, height,
                               0, chunk)
        (vis, _), big = _bin_prefix(s, rows, width, height, e_max, chunk,
                                    run)
    else:
        sorted_rows, starts, counts, big = _bin(s, rows, width, height,
                                                e_max, chunk)
        vis, _ = _run_kernel(sorted_rows, starts, counts, width, height, 0,
                             chunk)
    if not _covers_all(e_max, width, height):
        vis, _ = _merge_big(vis, jnp.zeros((1, height, width), jnp.float32),
                            clip, tris, width, height, s, big, None)
    return vis


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 9))
def rasterize_attrs_tiled(clip, tris, attrs, width, height,
                          cull=raster.CULL_BACK, e_max=9, chunk=256,
                          nocull=None, compact=True, cv=None, va=None):
    """Raster + in-kernel perspective-correct attribute interpolation.

    attrs: [V, A] per-vertex attributes. Returns (VisBuffer,
    attr_img [H, W, A]) with zeros on empty pixels. `nocull` [T] exempts
    double-sided triangles from face culling. `compact` enables validity-
    compacted prefix binning (_bin_prefix) — keep it False under vmap.
    `cv`/`va` may pass pre-gathered per-corner clip coords [T,3,4] and
    attributes [T,3,A]: callers rendering several passes over the same
    triangles (shadow + main) gather the corner table ONCE and transform
    per pass — the 3T-row vertex gather is this stage's dominant cost."""
    if cv is None:
        # fuse the clip and attribute vertex gathers into one [T,3,4+A] one
        g = jnp.concatenate([clip, attrs], -1)[tris]
        cv, va = g[..., :4], g[..., 4:]
    s = raster.setup(clip, tris, width, height, cull, cv=cv,
                     nocull=nocull)
    s["tris_v"] = tris
    s["va"] = va
    rows = _setup_rows(s, jnp.arange(tris.shape[0], dtype=jnp.int32), attrs)
    if compact and tris.shape[0] >= COMPACT_MIN_T:
        def run(sorted_rows, starts, counts):
            return _run_kernel(sorted_rows, starts, counts, width, height,
                               attrs.shape[1], chunk)
        (vis, attr), big = _bin_prefix(s, rows, width, height, e_max, chunk,
                                       run)
    else:
        sorted_rows, starts, counts, big = _bin(s, rows, width, height,
                                                e_max, chunk)
        vis, attr = _run_kernel(sorted_rows, starts, counts, width, height,
                                attrs.shape[1], chunk)
    if not _covers_all(e_max, width, height):
        vis, attr = _merge_big(vis, attr, clip, tris, width, height, s, big,
                               attrs)
    attr = jnp.moveaxis(attr, 0, -1)
    attr = jnp.where((vis.tri >= 0)[..., None], attr, 0.0)
    return vis, attr


def binning_stats(clip, tris, width, height, cull=raster.CULL_BACK,
                  e_max=6, chunk=256, tile_h=None):
    """Binning diagnostics for a scene at given raster parameters.

    Per-tile capacity is unbounded (the kernel streams chunks), so the only
    remaining drop cliff is BIG_TRI_CAP for triangles spanning more than
    e_max tiles; max_tile_entries is the dense-tile cost driver. Returns
    dict(max_tile_entries, total_entries, n_big, big_capacity,
    big_dropped)."""
    s = raster.setup(clip, tris, width, height, cull)
    rows = _setup_rows(s, jnp.arange(tris.shape[0], dtype=jnp.int32))
    _, starts, counts, big = _bin(s, rows, width, height, e_max, chunk,
                                  tile_h)
    n_big = int(jnp.sum(big))
    return dict(
        max_tile_entries=int(jnp.max(counts)),
        total_entries=int(jnp.sum(counts)),
        n_big=n_big,
        big_capacity=int(BIG_TRI_CAP),
        big_dropped=max(0, n_big - BIG_TRI_CAP),
    )


def _scan_subset(clip, tris, width, height, s):
    """raster.rasterize's scan body over a precomputed (masked) setup."""
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]

    def body(carry, tri_in):
        depth, tri_id, bary = carry
        xy, z, area2, valid, tid = tri_in
        inv_area = jnp.where(jnp.abs(area2) > 1e-12, 1.0 / area2, 0.0)

        def edge(a, b):
            return (b[0] - a[0]) * (ys - a[1]) - (b[1] - a[1]) * (xs - a[0])

        b0 = edge(xy[1], xy[2]) * inv_area
        b1 = edge(xy[2], xy[0]) * inv_area
        b2 = edge(xy[0], xy[1]) * inv_area
        cover = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & valid
        zp = b0 * z[0] + b1 * z[1] + b2 * z[2]
        passed = cover & (zp <= depth) & (zp >= 0.0) & (zp <= 1.0)
        depth = jnp.where(passed, zp, depth)
        tri_id = jnp.where(passed, tid, tri_id)
        bary = jnp.where(passed[..., None], jnp.stack([b1, b2], -1), bary)
        return (depth, tri_id, bary), None

    t = tris.shape[0]
    init = (jnp.ones((height, width), jnp.float32),
            jnp.full((height, width), -1, jnp.int32),
            jnp.zeros((height, width, 2), jnp.float32))
    (depth, tri_id, bary), _ = jax.lax.scan(
        body, init,
        (s["xy"], s["z"], s["area2"], s["valid"],
         jnp.arange(t, dtype=jnp.int32)))
    return raster.VisBuffer(depth=depth, tri=tri_id, bary=bary)


# ---------------------------------------------------------------------------
# Fused multi-instance (crowd) raster: ONE sort and ONE kernel launch over
# instance x tile — vmapping the single-instance path pays per-instance
# fixed costs (batched small sorts, small pallas grids) that dominate at
# crowd viewport sizes.
# ---------------------------------------------------------------------------

# max bbox tiles per triangle in the FUSED crowd binning. Covers-all
# (e_max = n_tiles) was exact with no fallback, but its entry count
# instances*T*n_tiles OOMs at dense crowds: 64 instances of the bench-density
# character against a 16-tile shadow grid is 26.2M entries, whose sorted row
# buffer alone is 12.5 GB — 2x the chip's HBM (r3: crowd-dense bench).
# bbox expansion bounds entries at instances*T*E; oversized triangles go
# through the same capped scan fallback as the single-instance path.
CROWD_E_MAX = 6


def _crowd_e_max(width, height) -> int:
    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // TILE_H)
    return min(tiles_x * tiles_y, CROWD_E_MAX)


# fused crowd binning runs in up to this many validity-compacted passes:
# pass k bins the compacted triangle ids [k*ceil(I*T/DIV), ...). At crowd
# viewports ~90% of triangles fail the sample-point/face cull (a 25.6k-tri
# character at 256x144 keeps 2.8k), yet every triangle used to occupy E sort
# slots and one 512 B sorted row: the sort (52 ms) and the count-bound row
# gather (~4.5 ns/row -> 44 ms) over 9.8M mostly-pad entries dominated the
# dense-crowd frame. Compaction sorts tris by (valid, draw order) once and
# bins only ceil(I*T/DIV) of them per pass; passes whose id range holds no
# valid triangle are lax.cond-skipped (their big buffers never materialize).
# Exact for EVERY input: all DIV passes together cover all triangles, and
# later passes hold higher draw ids, so the depth merge's later-wins tie
# rule reproduces the single-sort draw order.
CROWD_COMPACT_DIV = 4


def _crowd_compact_passes(s, rows, width, height, chunk, run_pass,
                          empty_pass, merge):
    """Validity-compacted fused crowd binning driver.

    s: vmapped setup dicts, rows: [I, T, W] setup rows.
    run_pass(sorted_rows, starts, counts) -> pytree of pass outputs;
    empty_pass() -> the same pytree for a pass that rendered nothing;
    merge(a, b) -> pytree combining pass a with LATER pass b (later wins
    depth ties). Returns (merged outputs, big [I, T])."""
    tiles_x = -(-width // TILE_W)
    tiles_y = -(-height // TILE_H)
    n_tiles = tiles_x * tiles_y
    e_max = _crowd_e_max(width, height)
    n_inst, t = rows.shape[0], rows.shape[1]
    n = n_inst * t

    tile, cat, big = jax.vmap(
        lambda si: _expand_tiles(si, width, height, e_max))(s)  # [I,T,E]
    nb = _n_cats(TILE_H)
    inst = jnp.arange(n_inst, dtype=jnp.int32)[:, None, None]
    gtile = jnp.where(tile < n_tiles, inst * n_tiles + tile,
                      n_inst * n_tiles)
    gt_flat = gtile.reshape(n, e_max)
    cat_flat = cat.reshape(n, e_max)
    # slot 0 is real iff the triangle produced any entry at all
    valid_tri = gt_flat[:, 0] < n_inst * n_tiles
    n_valid = jnp.sum(valid_tri.astype(jnp.int32))

    # compaction: valid tris first, draw order (global id) within each group
    vbits = max(int(n - 1).bit_length(), 1)
    assert n < (1 << 30), "crowd id space exceeds the int32 sort key"
    key1 = (jnp.where(valid_tri, 0, 1 << vbits)
            + jnp.arange(n, dtype=jnp.int32))
    cids = jax.lax.sort(key1, is_stable=False) & ((1 << vbits) - 1)

    c_v = -(-n // CROWD_COMPACT_DIV)
    n_pass = -(-n // c_v)
    cids = jnp.pad(cids, (0, n_pass * c_v - n), constant_values=n)

    # rows at final lane width (the kernel DMA needs 128-aligned lanes),
    # +1 all-zero pad row addressed by id n
    flat_rows = rows.reshape(n, rows.shape[2])
    lane_pad = (-rows.shape[2]) % 128
    flat_rows = jnp.pad(flat_rows, ((0, 1), (0, lane_pad)))
    gt_pad = jnp.pad(gt_flat, ((0, 1), (0, 0)),
                     constant_values=n_inst * n_tiles)
    cat_pad = jnp.pad(cat_flat, ((0, 1), (0, 0)))

    def make_pass(k):
        def run(_):
            ids = jax.lax.dynamic_slice(cids, (k * c_v,), (c_v,))
            g = jnp.concatenate([gt_pad, cat_pad], -1)[ids]    # [C, 2E]
            flat_tile = g[:, :e_max].reshape(-1)
            flat_cat = g[:, e_max:].reshape(-1)
            flat_gid = jnp.broadcast_to(ids[:, None],
                                        (c_v, e_max)).reshape(-1)
            # t = n + 1: the cids tail padding uses id n (the all-pad row),
            # so the packed key's value bits must cover it
            sorted_gid, start = _packed_sort(flat_tile, flat_gid, n + 1,
                                             n_inst * n_tiles, flat_cat, nb)
            counts = (start[nb::nb] - start[:-1:nb]).astype(jnp.int32)
            # pin pad entries' gather addresses into the first 256 rows
            # (see _bin): scattered dead addresses spread the row gather's
            # page footprint over the whole table
            eidx = jnp.arange(sorted_gid.shape[0], dtype=jnp.int32)
            spread = 256 if n >= 256 else 1
            sorted_gid = jnp.where(eidx < start[n_inst * n_tiles * nb],
                                   sorted_gid, eidx & (spread - 1))
            sorted_rows = flat_rows[jnp.pad(sorted_gid, (0, chunk),
                                            constant_values=n)]
            return run_pass(sorted_rows,
                            start[:n_inst * n_tiles * nb + 1], counts)
        return run

    out = make_pass(0)(None)
    for k in range(1, n_pass):
        out = merge(out, jax.lax.cond(n_valid > k * c_v, make_pass(k),
                                      lambda _: empty_pass(), None))
    return out, big


def _run_kernel_multi(sorted_rows, starts, counts, n_inst, width, height,
                      n_attrs, chunk):
    assert chunk % GROUP == 0, "chunk must be a multiple of GROUP"
    pad_w = -(-width // TILE_W) * TILE_W
    pad_h = -(-height // TILE_H) * TILE_H
    tiles_x = pad_w // TILE_W
    n_tiles = (pad_h // TILE_H) * tiles_x
    na = max(n_attrs, 1)
    row_w = sorted_rows.shape[1]

    def idx(i, s, c):
        return (i // n_tiles, (i % n_tiles) // tiles_x,
                (i % n_tiles) % tiles_x)

    tile_spec = lambda: pl.BlockSpec((1, TILE_H, TILE_W), idx,
                                     memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_inst * n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            tile_spec(), tile_spec(), tile_spec(), tile_spec(),
            pl.BlockSpec((1, na, TILE_H, TILE_W),
                         lambda i, s, c: (i // n_tiles, 0,
                                          (i % n_tiles) // tiles_x,
                                          (i % n_tiles) % tiles_x),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    depth, tri, b1, b2, attr = pl.pallas_call(
        partial(_raster_kernel, tiles_x=tiles_x, n_attrs=n_attrs,
                chunk=chunk, inst_tiles=n_tiles, nb=_n_cats(TILE_H)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_inst, pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((n_inst, pad_h, pad_w), jnp.int32),
            jax.ShapeDtypeStruct((n_inst, pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((n_inst, pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((n_inst, na, pad_h, pad_w), jnp.float32),
        ],
        interpret=_interpret(),
    )(starts, counts, sorted_rows)
    vis = raster.VisBuffer(
        depth=depth[:, :height, :width],
        tri=tri[:, :height, :width],
        bary=jnp.stack([b1[:, :height, :width], b2[:, :height, :width]], -1))
    return vis, attr[:, :, :height, :width]


def _merge_big_crowd(vis, attr, clip, tris, width, height, s, big, attrs):
    """Crowd analog of _merge_big: per-instance capped scan raster over
    oversized triangles, merged by depth. The any-big cond sits OUTSIDE the
    vmap (under vmap lax.cond batches to a both-branches select, which would
    pay the full-frame scan every frame). Returns (vis, attr, big_won) with
    leading instance axes."""
    def merge(args):
        vis, attr = args
        cap = min(BIG_TRI_CAP, tris.shape[0])

        def one(vis_i, attr_i, clip_i, xy, z, a2, v, iw, big_i, attrs_i):
            order = jnp.argsort(~big_i, stable=True)[:cap]
            s_big = {"xy": xy[order], "z": z[order], "area2": a2[order],
                     "valid": (v & big_i)[order], "inv_w": iw[order]}
            vis_big = _scan_subset(clip_i, tris[order], width, height, s_big)
            real_tri = jnp.where(vis_big.tri >= 0,
                                 order[jnp.maximum(vis_big.tri, 0)], -1)
            better = (vis_big.depth <= vis_i.depth) & (vis_big.tri >= 0)
            merged = raster.VisBuffer(
                depth=jnp.where(better, vis_big.depth, vis_i.depth),
                tri=jnp.where(better, real_tri, vis_i.tri),
                bary=jnp.where(better[..., None], vis_big.bary, vis_i.bary))
            big_attr = jnp.moveaxis(
                raster.interpolate(vis_big, clip_i, tris[order], attrs_i),
                -1, 0)
            attr_i = jnp.where(better[None], big_attr, attr_i)
            return merged, attr_i, better

        return jax.vmap(one)(vis, attr, clip, s["xy"], s["z"], s["area2"],
                             s["valid"], s["inv_w"], big, attrs)

    zeros = jnp.zeros(vis.depth.shape, bool)
    return jax.lax.cond(jnp.any(big), merge,
                        lambda a: (a[0], a[1], zeros), (vis, attr))


def _merge_big_depth_crowd(depth, clip, tris, width, height, s, big):
    """Depth-only crowd big-triangle merge (shadow maps)."""
    def merge(depth):
        cap = min(BIG_TRI_CAP, tris.shape[0])

        def one(clip_i, xy, z, a2, v, big_i):
            order = jnp.argsort(~big_i, stable=True)[:cap]
            s_big = {"xy": xy[order], "z": z[order], "area2": a2[order],
                     "valid": (v & big_i)[order]}
            return _scan_subset(clip_i, tris[order], width, height,
                                s_big).depth

        d_big = jax.vmap(one)(clip, s["xy"], s["z"], s["area2"], s["valid"],
                              big)
        return jnp.minimum(depth, d_big)

    return jax.lax.cond(jnp.any(big), merge, lambda d: d, depth)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def rasterize_attrs_tiled_crowd(clip, tris, attrs, width, height,
                                cull=raster.CULL_BACK, chunk=256,
                                cv=None, va=None, nocull=None):
    """Fused multi-instance raster + attribute interpolation.

    clip [I,V,4], tris [T,3] (shared topology), attrs [I,V,A] ->
    (VisBuffer with leading instance axis, attr [I,H,W,A]). Binning is
    bbox-limited (_crowd_e_max); oversized triangles merge through the same
    capped scan fallback as the single-instance path. Per-pixel/per-entry
    semantics identical to rasterize_attrs_tiled. `cv` [I,T,3,4] /
    `va` [I,T,3,A] pass pre-gathered corner tables shared with the crowd
    shadow pass (see crowd_render_frame). `nocull` [T] (shared across
    instances, like the topology) exempts those triangles from face
    culling — double-sided materials."""
    if cv is None:
        def per_inst(clip_i, attrs_i):
            g = jnp.concatenate([clip_i, attrs_i], -1)[tris]
            s = raster.setup(clip_i, tris, width, height, cull,
                             cv=g[..., :4], nocull=nocull)
            s["va"] = g[..., 4:]
            return s

        s = jax.vmap(per_inst)(clip, attrs)
    else:
        def per_inst_cv(clip_i, cv_i, va_i):
            s = raster.setup(clip_i, tris, width, height, cull, cv=cv_i,
                             nocull=nocull)
            s["va"] = va_i
            return s

        s = jax.vmap(per_inst_cv)(clip, cv, va)
    rows = jax.vmap(
        lambda si, ai: _setup_rows(
            si, jnp.arange(tris.shape[0], dtype=jnp.int32), ai))(s, attrs)
    n_inst = clip.shape[0]
    na = attrs.shape[-1]

    def run_pass(sorted_rows, starts, counts):
        v, a = _run_kernel_multi(sorted_rows, starts, counts, n_inst,
                                 width, height, na, chunk)
        return v.depth, v.tri, v.bary, a

    def empty_pass():
        return (jnp.ones((n_inst, height, width), jnp.float32),
                jnp.full((n_inst, height, width), -1, jnp.int32),
                jnp.zeros((n_inst, height, width, 2), jnp.float32),
                jnp.zeros((n_inst, max(na, 1), height, width), jnp.float32))

    def merge(a, b):
        d1, t1, b1, a1 = a
        d2, t2, b2, a2 = b
        # depth ties break by draw id (max id wins), matching the kernel's
        # in-tile rule: later passes hold higher draw ids
        better = (t2 >= 0) & ((d2 < d1) | ((d2 == d1) & (t2 > t1)))
        return (jnp.where(better, d2, d1),
                jnp.where(better, t2, t1),
                jnp.where(better[..., None], b2, b1),
                jnp.where(better[:, None], a2, a1))

    (depth, tri, bary, attr), big = _crowd_compact_passes(
        s, rows, width, height, chunk, run_pass, empty_pass, merge)
    vis = raster.VisBuffer(depth=depth, tri=tri, bary=bary)
    if not _covers_all(_crowd_e_max(width, height), width, height):
        vis, attr, _ = _merge_big_crowd(vis, attr, clip, tris, width,
                                        height, s, big, attrs)
    attr = jnp.moveaxis(attr, 1, -1)
    attr = jnp.where((vis.tri >= 0)[..., None], attr, 0.0)
    return vis, attr


def _run_kernel_ms_multi(sorted_rows, starts, counts, n_inst, width, height,
                         n_attrs, chunk, unbias=True):
    assert chunk % GROUP == 0, "chunk must be a multiple of GROUP"
    pad_w = -(-width // TILE_W) * TILE_W
    pad_h = -(-height // TILE_H) * TILE_H
    tiles_x = pad_w // TILE_W
    n_tiles = (pad_h // TILE_H) * tiles_x
    na = max(n_attrs, 1)
    row_w = sorted_rows.shape[1]

    def idx(i, s, c):
        return (i // n_tiles, (i % n_tiles) // tiles_x,
                (i % n_tiles) % tiles_x)

    def idx4(n):
        return pl.BlockSpec((1, n, TILE_H, TILE_W),
                            lambda i, s, c: (i // n_tiles, 0,
                                             (i % n_tiles) // tiles_x,
                                             (i % n_tiles) % tiles_x),
                            memory_space=pltpu.VMEM)

    tile_spec = lambda: pl.BlockSpec((1, TILE_H, TILE_W), idx,
                                     memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_inst * n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[tile_spec(), tile_spec(), tile_spec(), tile_spec(),
                   idx4(na), idx4(4)],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    depth, tri, b1, b2, attr, sdepth = pl.pallas_call(
        partial(_raster_kernel_ms, tiles_x=tiles_x, n_attrs=n_attrs,
                chunk=chunk, inst_tiles=n_tiles, unbias=unbias,
                nb=_n_cats(TILE_H)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_inst, pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((n_inst, pad_h, pad_w), jnp.int32),
            jax.ShapeDtypeStruct((n_inst, pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((n_inst, pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((n_inst, na, pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((n_inst, 4, pad_h, pad_w), jnp.float32),
        ],
        interpret=_interpret(),
    )(starts, counts, sorted_rows)
    vis = raster.VisBuffer(
        depth=depth[:, :height, :width],
        tri=tri[:, :height, :width],
        bary=jnp.stack([b1[:, :height, :width], b2[:, :height, :width]], -1))
    return vis, attr[:, :, :height, :width], sdepth[:, :, :height, :width]


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def rasterize_attrs_tiled_msaa_crowd(clip, tris, attrs, width, height,
                                     cull=raster.CULL_BACK, chunk=256,
                                     cv=None, va=None, nocull=None):
    """Fused multi-instance 4x-MSAA raster: per-pixel center visibility +
    attributes plus per-sample depth [I, 4, H, W], semantics identical to
    rasterize_attrs_tiled_msaa per instance (bbox binning; big triangles
    merge with the center-approximated samples, like the single path).
    `cv`/`va`/`nocull`: see rasterize_attrs_tiled_crowd."""
    if cv is None:
        def per_inst(clip_i, attrs_i):
            g = jnp.concatenate([clip_i, attrs_i], -1)[tris]
            s = raster.setup(clip_i, tris, width, height, cull,
                             cv=g[..., :4], sample_extent=0.375,
                             nocull=nocull)
            s["va"] = g[..., 4:]
            return s

        s = jax.vmap(per_inst)(clip, attrs)
    else:
        def per_inst_cv(clip_i, cv_i, va_i):
            s = raster.setup(clip_i, tris, width, height, cull, cv=cv_i,
                             sample_extent=0.375, nocull=nocull)
            s["va"] = va_i
            return s

        s = jax.vmap(per_inst_cv)(clip, cv, va)
    rows = jax.vmap(
        lambda si, ai: _setup_rows(
            si, jnp.arange(tris.shape[0], dtype=jnp.int32), ai))(s, attrs)
    n_inst = clip.shape[0]
    na = attrs.shape[-1]

    def run_pass(sorted_rows, starts, counts):
        # biased center depth (unbias=False): edge-extrapolation winners
        # carry +2 so the cross-pass merge keeps center-beats-edge exact
        v, a, sd = _run_kernel_ms_multi(sorted_rows, starts, counts, n_inst,
                                        width, height, na, chunk,
                                        unbias=False)
        return v.depth, v.tri, v.bary, a, sd

    def empty_pass():
        return (jnp.full((n_inst, height, width), 3.0, jnp.float32),
                jnp.full((n_inst, height, width), -1, jnp.int32),
                jnp.zeros((n_inst, height, width, 2), jnp.float32),
                jnp.zeros((n_inst, max(na, 1), height, width), jnp.float32),
                jnp.ones((n_inst, 4, height, width), jnp.float32))

    def merge(a, b):
        d1, t1, b1, a1, sd1 = a
        d2, t2, b2, a2, sd2 = b
        # depth ties break by draw id (see rasterize_attrs_tiled_crowd)
        better = (t2 >= 0) & ((d2 < d1) | ((d2 == d1) & (t2 > t1)))
        return (jnp.where(better, d2, d1),
                jnp.where(better, t2, t1),
                jnp.where(better[..., None], b2, b1),
                jnp.where(better[:, None], a2, a1),
                jnp.minimum(sd1, sd2))

    (depth, tri, bary, attr, sdepth), big = _crowd_compact_passes(
        s, rows, width, height, chunk, run_pass, empty_pass, merge)
    depth = jnp.where(tri < 0, 1.0,
                      jnp.where(depth > 1.5, depth - 2.0, depth))
    vis = raster.VisBuffer(depth=depth, tri=tri, bary=bary)
    if not _covers_all(_crowd_e_max(width, height), width, height):
        vis, attr, big_won = _merge_big_crowd(vis, attr, clip, tris, width,
                                              height, s, big, attrs)
        sdepth = jnp.where(big_won[:, None],
                           jnp.minimum(sdepth, vis.depth[:, None]), sdepth)
    attr = jnp.moveaxis(attr, 1, -1)
    attr = jnp.where((vis.tri >= 0)[..., None], attr, 0.0)
    return vis, attr, sdepth


def _run_depth_kernel_multi(sorted_rows, starts, counts, n_inst, width,
                            height, chunk):
    assert chunk % GROUP == 0, "chunk must be a multiple of GROUP"
    pad_w = -(-width // TILE_W) * TILE_W
    pad_h = -(-height // TILE_H) * TILE_H
    tiles_x = pad_w // TILE_W
    n_tiles = (pad_h // TILE_H) * tiles_x
    row_w = sorted_rows.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_inst * n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda i, s, c: (i // n_tiles,
                                          (i % n_tiles) // tiles_x,
                                          (i % n_tiles) % tiles_x),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    depth, = pl.pallas_call(
        partial(_depth_kernel, tiles_x=tiles_x, chunk=chunk,
                inst_tiles=n_tiles, nb=_n_cats(TILE_H)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_inst, pad_h, pad_w), jnp.float32)],
        interpret=_interpret(),
    )(starts, counts, sorted_rows)
    return depth[:, :height, :width]


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def rasterize_depth_tiled_crowd(clip, tris, width, height,
                                cull=raster.CULL_FRONT, chunk=256,
                                cv=None):
    """Fused multi-instance depth-only raster (crowd shadow maps).

    clip [I,V,4], tris [T,3] -> depth [I,H,W]. `cv` [I,T,3,4] passes
    pre-gathered corner clip coords (see rasterize_attrs_tiled_crowd)."""
    if cv is None:
        s = jax.vmap(
            lambda c: raster.setup(c, tris, width, height, cull))(clip)
    else:
        s = jax.vmap(
            lambda c, cv_i: raster.setup(c, tris, width, height, cull,
                                         cv=cv_i))(clip, cv)
    rows = jax.vmap(
        lambda si: _setup_rows(
            si, jnp.arange(tris.shape[0], dtype=jnp.int32)))(s)
    n_inst = clip.shape[0]
    depth, big = _crowd_compact_passes(
        s, rows, width, height, chunk,
        lambda sr, st, ct: _run_depth_kernel_multi(sr, st, ct, n_inst,
                                                   width, height, chunk),
        lambda: jnp.ones((n_inst, height, width), jnp.float32),
        jnp.minimum)
    if not _covers_all(_crowd_e_max(width, height), width, height):
        depth = _merge_big_depth_crowd(depth, clip, tris, width, height, s,
                                       big)
    return depth
