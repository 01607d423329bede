"""Device texture sampling from the HBM atlas.

Replaces the reference's combined-image-sampler descriptors + fixed-function
samplers (``TextureCache.cpp:167-197``: linear min/mag, repeat wrap,
trilinear mips). Filtering happens in storage space with sRGB decode applied
by the caller afterwards — matching the reference, whose textures are Unorm
(not Srgb) formats and decode in the shader (``pbr.glsl:100-112``).

Everything is a gather over the flattened atlas; the atlas layout (combined
mip pyramid per page) is documented in ``scene/textures.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


# Platform-robust discrete decisions (mip floor, dithered-mip rounding,
# aniso tier count): CPU and TPU transcendental approximations (log2,
# sqrt-chains) differ by ulps, and procedural content parks the continuous
# inputs exactly ON decision boundaries (integer LODs, dyadic dither
# thresholds, integer anisotropy ratios) — so a few-ulp cross-platform
# difference flips the discrete choice and a CPU-frozen golden diverges
# from the on-chip render by a whole mip step (round-4 gate failure:
# 6/7 configs red from exactly this). Shifting every boundary by a
# NON-dyadic epsilon moves it off the value clusters exact arithmetic
# produces; a boundary flip then requires the true value to sit within
# ulps of (boundary + eps), which no aligned content produces. The shift
# itself is invisible: 1e-4 of a mip step / one tap-count boundary.
SNAP_EPS = 1e-4


# log2(1+z) on [0,1]: degree-8 least-squares fit at Chebyshev nodes,
# |poly - log2| <= 4.9e-8, f32 Horner evaluation error <= 1.7e-7
_LOG2_POLY = (-8.8746966506e-03, 5.0277507368e-02, -1.3453425419e-01,
              2.3923166297e-01, -3.4599601243e-01, 4.7832354487e-01,
              -7.2111461440e-01, 1.4426867778e+00, 4.8863580535e-08)


def det_log2(x: jnp.ndarray) -> jnp.ndarray:
    """Platform-deterministic log2 for DISCRETE sampling decisions.

    ``jnp.log2`` lowers to each backend's transcendental approximation —
    the TPU VPU's is accurate to only ~1e-4 relative, the CPU's to ~1 ulp
    — so any mip floor / dither threshold / tap-count ceil fed by it
    flips on ~1e-4 of the lod distribution between platforms. Measured
    round-5: exactly this held the on-chip golden gate at 99.72-99.90%
    within 1/255 (gate >= 99.9%) with whole-mip-step outliers.

    This form is bit-reproducible across platforms up to FMA-contraction
    ulps (~1e-7): the exponent comes EXACTLY from the f32 bit pattern
    (integer ops), and log2 of the mantissa in [1,2) evaluates a fixed
    degree-8 polynomial with plain f32 multiply-adds. Total error vs true
    log2 <= 2e-7 — far below any visible mip difference, and 3 orders of
    magnitude under SNAP_EPS, so a decision flip now needs the true value
    within ~1e-7 of a (boundary + eps), which no content produces.

    x must be positive (callers clamp with ``jnp.maximum``); cost is 8
    FMAs per element — noise next to the texel gathers it guards.
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127                  # exact exponent
    m = jax.lax.bitcast_convert_type(
        (bits & 0x007FFFFF) | 0x3F800000, jnp.float32)   # mantissa [1,2)
    z = m - 1.0
    acc = jnp.float32(_LOG2_POLY[0])
    for c in _LOG2_POLY[1:]:
        acc = acc * z + jnp.float32(c)
    return e.astype(jnp.float32) + acc


class AnisoSpec(NamedTuple):
    """Static anisotropic-sampling plan threaded through the ``max_aniso``
    kwargs. ``max_taps`` is the reference sampler's requested ratio ceiling
    (16, ``TextureCache.cpp:185``); ``tile_fracs`` enables the tiered
    tile-compacted exact path (see ``sample_texture_aniso_tiered``): one
    entry per tier = the fraction of screen tiles budgeted for that tier's
    tap loop. Empty = dense exact taps (the brute-force spec)."""

    max_taps: int = 1
    tile_fracs: tuple = ()
    slot_caps: tuple = ()   # optional per-material-slot tap ceilings
                            # (base, emissive, orm, normal); () = max_taps
                            # everywhere. Consumed by the tiered path.


def aniso_spec(a) -> "AnisoSpec":
    return a if isinstance(a, AnisoSpec) else AnisoSpec(int(a), ())


def _parity(n: int, shape, axis: int) -> jnp.ndarray:
    """[H,W] bool: True where the axis coordinate is even."""
    return (jax.lax.broadcasted_iota(jnp.int32, shape, axis) & 1) == 0


def quad_dfdx(v: jnp.ndarray) -> jnp.ndarray:
    """GLSL dFdx with 2x2 quad semantics: for pixel x the derivative is
    v[x|1] - v[x&~1] along axis 1 (W). v: [H,W,...]. Odd extents behave as
    if the framebuffer were padded by edge replication (hardware pads to
    full quads).

    ROLL + parity-select form: for even x the quad partner is x+1
    (roll -1), for odd x it's x-1 — same subtractions, bit-equal results.
    The old stride-2 slice + repeat lowered to cross-lane shuffle code
    that XLA fused into EVERY consumer of the derivative: one dithered
    texture tap fed by quad derivatives compiled to 70.7 MB of TPU code
    vs 6.1 MB without them (measured round 5); rolls are cheap lane
    rotations and the pattern fuses flat."""
    w = v.shape[1]
    pad = w % 2
    if pad:
        v = jnp.concatenate([v, v[:, -1:]], axis=1)
    nxt = jnp.roll(v, -1, axis=1)
    prv = jnp.roll(v, 1, axis=1)
    even = _parity(w + pad, v.shape[:2], 1)
    even = even.reshape(even.shape + (1,) * (v.ndim - 2))
    d = jnp.where(even, nxt - v, v - prv)
    return d[:, :w]


def quad_dfdy(v: jnp.ndarray) -> jnp.ndarray:
    h = v.shape[0]
    pad = h % 2
    if pad:
        v = jnp.concatenate([v, v[-1:]], axis=0)
    nxt = jnp.roll(v, -1, axis=0)
    prv = jnp.roll(v, 1, axis=0)
    even = _parity(h + pad, v.shape[:2], 0)
    even = even.reshape(even.shape + (1,) * (v.ndim - 2))
    d = jnp.where(even, nxt - v, v - prv)
    return d[:h]


def quad_pair_valid(covered: jnp.ndarray):
    """(valid_x, valid_y) [H,W] bool: whether BOTH pixels of each quad
    x-pair / y-pair are covered. A pair with an uncovered pixel has no
    meaningful finite difference: the uncovered pixel's attributes are
    resolve-path garbage (extrapolation of an arbitrary triangle) or
    kernel zeros — and, critically, *different* garbage per backend.
    Roll + parity form like ``quad_dfdx`` (same values)."""
    h, w = covered.shape[0], covered.shape[1]
    cx = covered
    if w % 2:
        cx = jnp.concatenate([cx, cx[:, -1:]], axis=1)
    ex = _parity(cx.shape[1], cx.shape, 1)
    vx = cx & jnp.where(ex, jnp.roll(cx, -1, axis=1),
                        jnp.roll(cx, 1, axis=1))
    vx = vx[:, :w]
    cy = covered
    if h % 2:
        cy = jnp.concatenate([cy, cy[-1:]], axis=0)
    ey = _parity(cy.shape[0], cy.shape, 0)
    vy = cy & jnp.where(ey, jnp.roll(cy, -1, axis=0),
                        jnp.roll(cy, 1, axis=0))
    vy = vy[:h]
    return vx, vy


def quad_derivs(v: jnp.ndarray, covered: jnp.ndarray | None = None):
    """(dFdx, dFdy) with coverage-aware quad semantics.

    Real hardware spawns 2x2 quads per PRIMITIVE: helper lanes evaluate
    the covered lane's own attribute plane, so silhouette pixels get their
    surface's true footprint (``pbr.glsl:121-145`` relies on this). Our
    deferred resolve has no helper lanes — a quad partner that lost the
    depth test (or hit background) holds another winner's attributes, or
    backend-dependent garbage. The closest cross-backend-exact semantics:
    a pair is valid only when both pixels are covered; an invalid axis
    falls back to the other axis's difference (isotropic footprint), and
    a fully isolated pixel gets zero derivatives (finest mip).

    v: [H,W,...]; covered: [H,W] bool or None (raw GLSL behavior).
    """
    dx = quad_dfdx(v)
    dy = quad_dfdy(v)
    if covered is None:
        return dx, dy
    vx, vy = quad_pair_valid(covered)
    vx = vx.reshape(vx.shape + (1,) * (v.ndim - 2))
    vy = vy.reshape(vy.shape + (1,) * (v.ndim - 2))
    dx_m = jnp.where(vx, dx, jnp.where(vy, dy, 0.0))
    dy_m = jnp.where(vy, dy, jnp.where(vx, dx, 0.0))
    return dx_m, dy_m


def table_lookup(table: jnp.ndarray, idx: jnp.ndarray,
                 max_rows_for_mxu: int = 1024) -> jnp.ndarray:
    """Row fetch ``table[idx]`` routed through the fastest TPU path.

    XLA's gather costs ~17-40 ns/index on TPU regardless of locality; for
    SMALL tables a one-hot matmul on the MXU is ~5x cheaper at framebuffer
    index counts (measured: 256x40 f32 ~3 ms vs ~40 ms gather at 2.07M
    indices). One-hot rows select exactly one table row, so the contraction
    is exact in f32 (HIGHEST avoids bf16 rounding of f16-valued tables).

    table [N,C] float; idx [...] int32 (caller clamps). Falls back to a
    plain gather for big tables or tiny index sets.
    """
    n = table.shape[0]
    if n > max_rows_for_mxu or idx.size < 4 * n:
        return table[idx].astype(jnp.float32)
    flat = idx.reshape(-1)
    oh = (flat[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :])
    out = jnp.dot(oh.astype(jnp.float32), table.astype(jnp.float32),
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    return out.reshape(*idx.shape, table.shape[1])


def table_lookup_planar(table, idx, cols,
                        max_rows_for_mxu: int = 1024) -> jnp.ndarray:
    """``table_lookup`` restricted to ``cols``, returned CHANNEL-LEADING:
    [len(cols), *idx.shape] planes. The row-minor [..., C] form costs a
    full relayout copy on TPU before plane consumers can slice channels
    (measured 3x ~1 ms per frame at 1080p for the 40-col material rows);
    a transposed one-hot contraction emits planes directly, and fetching
    only the consumed columns shrinks the MXU pass."""
    cols = tuple(cols)
    n = table.shape[0]
    sub = table[:, jnp.asarray(cols, jnp.int32)]            # [N, K]
    if n > max_rows_for_mxu or idx.size < 4 * n:
        out = sub[idx].astype(jnp.float32)                  # [..., K]
        return jnp.moveaxis(out, -1, 0)
    flat = idx.reshape(-1)
    oh = (jnp.arange(n, dtype=jnp.int32)[:, None] == flat[None, :])
    out = jnp.dot(sub.astype(jnp.float32).T, oh.astype(jnp.float32),
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)       # [K, PX]
    return out.reshape(len(cols), *idx.shape)


def _gather_rgba(atlas: jnp.ndarray, page, ry, rx) -> jnp.ndarray:
    """atlas [P,H,W,4] uint8; integer index arrays -> f32 rgba in [0,1]."""
    p, h, w, _ = atlas.shape
    flat = (page * h + ry) * w + rx
    texels = atlas.reshape(-1, 4)[flat]
    return texels.astype(jnp.float32) * (1.0 / 255.0)


def _gather_block(table32: jnp.ndarray, flat) -> jnp.ndarray:
    """Fetch a 2x2 block row from a u32-packed block table and unpack to
    f32 [...,16] unorm values. Row width 4 = u8 content, 8 = u16
    (TextureCache.h:59 parity) — packed u32 rows gather ~30% faster than
    16 narrow elements. Indices are flattened to 1-D before the gather:
    a [H,W]-indexed gather materializes as a 3-D result whose layout then
    costs a full relayout copy (~1.4 ms at 1080p); the flat form's [N,4]
    result feeds the unpack directly."""
    c = table32.shape[-1]
    shape = flat.shape
    blk32 = table32.reshape(-1, c)[flat.reshape(-1)]
    if c == 4:       # u8 content
        b = jax.lax.bitcast_convert_type(blk32, jnp.uint8)
        scale = 1.0 / 255.0
    else:            # u16 content
        b = jax.lax.bitcast_convert_type(blk32, jnp.uint16)
        scale = 1.0 / 65535.0
    return b.reshape(*shape, 16).astype(jnp.float32) * scale


def _gather_block_words(table32: jnp.ndarray, flat) -> jnp.ndarray:
    """One block-row gather, returned as PLANAR u32 words [C, *flat.shape]
    (one transpose) instead of a channel-minor [..., 16] unpack. A
    channel-minor block mix compiles to ~9.6 MB of TPU code per tap
    (minor-dim-4 slices put 4 of 128 vector lanes to work and every
    intermediate pays relayouts); the planar form's per-channel [H, W]
    planes run full-lane and compile to ~4.4 MB at 2.2x less compile time
    (measured round 5 — the bake's unrolled taps were a 374 MB / 200 s
    program because of exactly this)."""
    table32 = jnp.asarray(table32)   # eager callers may pass numpy
    c = table32.shape[-1]
    blk32 = table32.reshape(-1, c)[flat.reshape(-1)]        # [N, C]
    return jnp.moveaxis(blk32, 0, 1).reshape((c,) + flat.shape)


def _bilerp_words(words: jnp.ndarray, fx, fy) -> jnp.ndarray:
    """Planar bilinear mix of a gathered 2x2 block (``_gather_block_words``
    output): per-channel full-lane [H, W] math, stacked to [..., 4] only
    at the very end. Arithmetic per element is IDENTICAL to the old
    channel-minor path (same scale-then-mix op order), so results are
    bit-equal and the frozen goldens are unaffected."""
    c = words.shape[0]
    if c == 4:        # u8: word k = corner k, byte ch = channel
        scale = jnp.float32(1.0 / 255.0)

        def corner(k, ch):
            return ((words[k] >> (8 * ch)) & 255).astype(jnp.float32) * scale
    else:             # u16: corner k = words 2k (ch0|ch1), 2k+1 (ch2|ch3)
        scale = jnp.float32(1.0 / 65535.0)

        def corner(k, ch):
            w = words[2 * k + (ch >> 1)]
            return ((w >> (16 * (ch & 1))) & 0xFFFF).astype(jnp.float32) \
                * scale
    chans = []
    for ch in range(4):
        c00, c10 = corner(0, ch), corner(1, ch)
        c01, c11 = corner(2, ch), corner(3, ch)
        top = c00 * (1 - fx) + c10 * fx
        bot = c01 * (1 - fx) + c11 * fx
        chans.append(top * (1 - fy) + bot * fy)
    return jnp.stack(chans, -1)


def _bilinear_at_level(atlas, tex, mip_y, mip_x, uv, level):
    """One bilinear fetch at integer mip ``level`` (traced), REPEAT wrap.

    ONE gather: the atlas stores 2x2 texel blocks with per-texture wrap
    baked in (``scene/textures.py``), so the whole bilinear footprint is a
    single 16-byte row.

    tex: dict of per-pixel int arrays page,x,y,w,h (mip-0 placement).
    """
    # eager callers may pass numpy planes/tables; numpy ops against a
    # traced ``level`` (the trilinear/tap fori_loops) fail, so coerce
    tex = {k: jnp.asarray(v) for k, v in tex.items()}
    mip_x = jnp.asarray(mip_x)
    mip_y = jnp.asarray(mip_y)
    sw = jnp.maximum(tex["w"] >> level, 1)
    sh = jnp.maximum(tex["h"] >> level, 1)
    bx = mip_x[level] + (tex["x"] >> level)
    by = mip_y[level] + (tex["y"] >> level)

    st_x = uv[..., 0] * sw.astype(jnp.float32) - 0.5
    st_y = uv[..., 1] * sh.astype(jnp.float32) - 0.5
    ix0 = jnp.floor(st_x).astype(jnp.int32)
    iy0 = jnp.floor(st_y).astype(jnp.int32)
    fx = st_x - ix0.astype(jnp.float32)
    fy = st_y - iy0.astype(jnp.float32)

    # REPEAT wrap. Atlas texture sizes are snapped to powers of two
    # (scene/textures.py), so the wrap is a mask — integer remainder by a
    # per-pixel divisor is ~2x slower on the VPU (measured).
    x0 = bx + (ix0 & (sw - 1))
    y0 = by + (iy0 & (sh - 1))
    p, h, w, _ = atlas.shape
    flat = (tex["page"] * h + y0) * w + x0
    # planar mix (full-lane per-channel math): 2.2x less generated code
    # per tap than the channel-minor form, bit-equal results
    return _bilerp_words(_gather_block_words(atlas, flat), fx, fy)


def compute_lod(uv: jnp.ndarray, tex_w, tex_h) -> jnp.ndarray:
    """GLSL implicit LOD: lambda = log2(max(|ddx|, |ddy|)) of texel coords,
    with quad-based derivatives. uv [H,W,2]; tex_w/h [H,W]."""
    tc = uv * jnp.stack([tex_w.astype(jnp.float32), tex_h.astype(jnp.float32)], axis=-1)
    dx = quad_dfdx(tc)
    dy = quad_dfdy(tc)
    rho = jnp.maximum(
        jnp.sqrt(jnp.sum(dx * dx, axis=-1)), jnp.sqrt(jnp.sum(dy * dy, axis=-1))
    )
    return det_log2(jnp.maximum(rho, 1e-20))


def _bayer4(ix, iy):
    """4x4 Bayer matrix value in CLOSED FORM (bit-reversed interleave of
    (x^y, y)): [[0,8,2,10],[12,4,14,6],[3,11,1,9],[15,7,13,5]]. Pure
    integer ops — a table lookup here is a full-screen GATHER (measured
    22 ms/frame at 1080p, eating the entire dither saving)."""
    x = ix & 3
    y = iy & 3
    xy = x ^ y
    return (((xy & 1) << 3) | ((y & 1) << 2)
            | (xy & 2) | (y >> 1)).astype(jnp.float32)


def _dither_level(lod, n_mips):
    """Integer mip level from fractional lod by 4x4 ordered dithering:
    the lod fraction becomes the DUTY CYCLE of picking the next level
    across each 4x4 pixel block, so mip transitions stay spatially smooth
    while every tap costs ONE block gather instead of two (the classic
    'dithered trilinear' of shipping rasterizers). Deterministic in pixel
    position — renders are reproducible and golden-testable."""
    import jax

    shape = lod.shape
    ax = len(shape) - 1
    iy = (jax.lax.broadcasted_iota(jnp.int32, shape, max(ax - 1, 0))
          if len(shape) >= 2 else jnp.zeros(shape, jnp.int32))
    ix = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
    thr = (_bayer4(ix, iy) + 0.5) * (1.0 / 16.0)
    lodc = jnp.clip(lod, 0.0, (n_mips - 1).astype(jnp.float32))
    l0 = jnp.floor(lodc + SNAP_EPS).astype(jnp.int32)
    f = jnp.maximum(lodc - l0.astype(jnp.float32), 0.0)
    return jnp.minimum(l0 + (f - SNAP_EPS > thr).astype(jnp.int32),
                       n_mips - 1)


def sample_texture_rows(atlas, mip_y, mip_x, tex, n_mips, uv, lod=None,
                        dither: bool = False) -> jnp.ndarray:
    """Core sampler on pre-fetched table rows.

    tex: dict of per-pixel int arrays page/x/y/w/h; n_mips per-pixel int;
    uv [...,2]; lod [...] or None (bilinear at mip 0). ``dither``: one
    gather per tap via ordered-dither mip rounding (``_dither_level``)
    instead of the two-level trilinear blend. Returns f32 [...,4].
    """
    if lod is None:
        return _bilinear_at_level(atlas, tex, mip_y, mip_x, uv,
                                  jnp.zeros_like(n_mips))
    if dither:
        return _bilinear_at_level(atlas, tex, mip_y, mip_x, uv,
                                  _dither_level(lod, n_mips))
    return _bilinear_at_level_lod(atlas, tex, mip_y, mip_x, uv, n_mips,
                                  lod)


def _aniso_footprint(tex, uv_dx, uv_dy, max_aniso: int):
    """Per-pixel anisotropy: tap count ``n``, minor-axis ``lod``, and the
    major-axis uv step. GL-style footprint split: N taps along the major
    axis, each filtered at the LOD of footprint/N."""
    size = jnp.stack([tex["w"].astype(jnp.float32),
                      tex["h"].astype(jnp.float32)], -1)
    dx = uv_dx * size
    dy = uv_dy * size
    px = jnp.sqrt((dx * dx).sum(-1))
    py = jnp.sqrt((dy * dy).sum(-1))
    pmax = jnp.maximum(px, py)
    pmin = jnp.maximum(jnp.minimum(px, py), 1e-20)
    n = jnp.clip(jnp.ceil(pmax / pmin - SNAP_EPS), 1.0, float(max_aniso))
    lod = det_log2(jnp.maximum(pmax / n, 1e-20))
    major = jnp.where((px >= py)[..., None], uv_dx, uv_dy)
    return n, lod, major


def sample_texture_aniso(atlas, mip_y, mip_x, tex, n_mips, uv,
                         duv_dx, duv_dy, max_aniso: int,
                         dither: bool = False) -> jnp.ndarray:
    """Anisotropic filtering, the reference's 16x sampler request
    (``TextureCache.cpp:185-186``): N trilinear taps spread along the
    major-axis footprint, LOD chosen from the minor axis (footprint /= N),
    mean-combined. ``max_aniso`` is the static tap ceiling (2..16).

    ``dither=False``: exact N taps, 2 block gathers each (the brute-force
    spec; the golden model and the per-pixel parity path share it via
    tiered compaction in the callers — see ``aniso_tiles`` plumbing).

    ``dither=True``: ONE gather per pixel — the footprint integral is
    distributed over the 4x4 Bayer block exactly like the dithered-mip
    rounding: each pixel takes the tap at slot ``j = floor(phase*n)`` of
    its own N-tap ladder, with a TRANSPOSED Bayer phase so the tap choice
    decorrelates from the mip-rounding threshold. Neighboring pixels of a
    grazing surface then collectively sample the whole footprint at the
    cost of plain dithered trilinear — this is what makes the reference's
    16x request affordable as the DEFAULT. Deterministic in pixel
    position, so renders stay golden-testable.
    """
    n, lod, major = _aniso_footprint(tex, duv_dx, duv_dy, max_aniso)

    if dither:
        shape = n.shape
        ax = len(shape) - 1
        iy = (jax.lax.broadcasted_iota(jnp.int32, shape, max(ax - 1, 0))
              if len(shape) >= 2 else jnp.zeros(shape, jnp.int32))
        ix = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
        # transposed phase: decorrelated from _dither_level's threshold
        phase = (_bayer4(iy, ix) + 0.5) * (1.0 / 16.0)
        j = jnp.floor(phase * n)                       # 0..n-1, uniform
        t = (j + 0.5) / n - 0.5
        return _bilinear_at_level_lod(atlas, tex, mip_y, mip_x,
                                      uv + major * t[..., None],
                                      n_mips, lod, dither=True)

    # GL-style: tap offsets (i+0.5)/N - 0.5 along the major axis. Taps
    # beyond the per-pixel N get ZERO weight and the sum is normalized by
    # N per pixel — weighting collapsed taps 1/max_aniso each would shift
    # the footprint centroid toward the last slot (up to ~0.9 texels at
    # ratio 2 with max_aniso 16). fori_loop (not a Python unroll): tap
    # code is emitted ONCE — an unrolled 16-tap loop multiplied the
    # ~4.4 MB per-tap TPU code 16x (round-5 compile-time fix); adds stay
    # sequential in the same order, so results are bit-equal.
    def body(i, acc):
        t = (i.astype(jnp.float32) + 0.5) / n - 0.5
        w = (i < n).astype(jnp.float32)[..., None]
        return acc + w * _bilinear_at_level_lod(atlas, tex, mip_y, mip_x,
                                                uv + major * t[..., None],
                                                n_mips, lod, dither)
    acc = jax.lax.fori_loop(0, max_aniso, body,
                            jnp.zeros(uv.shape[:-1] + (4,), jnp.float32))
    return acc / n[..., None]


def tap_ladder(spec: AnisoSpec) -> list:
    """Tap ladder 2, 4, 8, ... capped at max_taps; the last tier absorbs
    the full ratio range."""
    ladder = []
    t = 2
    for i in range(len(spec.tile_fracs)):
        last = i == len(spec.tile_fracs) - 1
        ladder.append(spec.max_taps if last else min(t, spec.max_taps))
        t *= 2
    return ladder


def row_segments(h: int, w: int, seg_w: int):
    """Shard-invariant screen compaction geometry: [1, seg_w] row segments.

    Every segment lies inside ONE pixel row, and all selection math below
    is strictly per-row — so an image-row sharding (parallel/sharded.py
    splits [H, W] into [H/D, W] bands) computes bit-identical selections
    to the single-chip pass for ANY row split. This is the repo's
    "screen-space compaction must be shard-invariant" design rule
    (tests/test_sharded.py sweeps it); 2-D tiles (8x128) break it because
    a band boundary can cut a tile, changing its member count.
    """
    ntx = -(-w // seg_w)
    pw = ntx * seg_w - w
    return ntx, pw


def _segfy(a, ntx, pw, seg_w):
    """[H, W(,C)] -> [H, ntx, seg_w(,C)] with zero right-padding."""
    a = jnp.pad(a, ((0, 0), (0, pw)) + ((0, 0),) * (a.ndim - 2))
    return a.reshape((a.shape[0], ntx, seg_w) + a.shape[2:])


def row_segment_counts(member, seg_w: int):
    """[H, W] bool -> per-row member count per [1, seg_w] segment [H, ntx]."""
    h, w = member.shape
    ntx, pw = row_segments(h, w, seg_w)
    return _segfy(member, ntx, pw, seg_w).sum(-1)


def select_row_segments(member, seg_w: int, frac: float):
    """Per-ROW top-k segment selection by member count.

    member [H, W] bool -> (sel [H, K] int32, K). Each pixel row
    independently budgets K = max(1, round(frac * segments_per_row))
    of its [1, seg_w] segments; ties break to the lowest segment index
    (jax.lax.top_k), all deterministic integer math — shard-invariant
    and platform-exact.
    """
    ntx, _ = row_segments(*member.shape, seg_w)
    k = max(1, min(int(round(frac * ntx)), ntx))
    cnt = row_segment_counts(member, seg_w)               # [H, ntx]
    _, sel = jax.lax.top_k(cnt, k)                        # [H, K]
    return sel, k


def gather_row_segments(a, sel, seg_w: int):
    """Compact [H, W(,C)] screen planes to the selected [H, K, seg_w(,C)]
    segments."""
    h, w = a.shape[:2]
    ntx, pw = row_segments(h, w, seg_w)
    seg = _segfy(a, ntx, pw, seg_w)
    idx = sel.reshape(sel.shape + (1,) * (seg.ndim - 2))
    return jnp.take_along_axis(seg, idx, axis=1)


def scatter_row_segments(vals, sel, h: int, w: int, seg_w: int):
    """Inverse of gather_row_segments: (values [H,K,seg_w(,C)], sel [H,K])
    -> ([H,W(,C)] scattered, have [H,W] bool coverage)."""
    ntx, pw = row_segments(h, w, seg_w)
    rows = jnp.arange(h, dtype=jnp.int32)[:, None]
    scat = jnp.zeros((h, ntx, seg_w) + vals.shape[3:], vals.dtype)
    scat = scat.at[rows, sel].set(vals, mode="drop")
    have = jnp.zeros((h, ntx), bool).at[rows, sel].set(True, mode="drop")
    have = jnp.broadcast_to(have[:, :, None], (h, ntx, seg_w))
    unseg = lambda x: x.reshape((h, ntx * seg_w) + x.shape[3:])[:, :w]
    return unseg(scat), unseg(have)


def _uv_footprint(duv_dx, duv_dy, max_taps: int):
    """Texture-size-independent anisotropy decision in UV space: tap count
    ``n`` and the major-axis uv step. For square textures this equals the
    dense spec's texel-space ratio exactly (both axes scale by the same
    size); only sqrt/div/ceil — platform-deterministic, so tier membership
    can gate golden-tested renders."""
    px = jnp.sqrt((duv_dx * duv_dx).sum(-1))
    py = jnp.sqrt((duv_dy * duv_dy).sum(-1))
    pmax = jnp.maximum(px, py)
    pmin = jnp.maximum(jnp.minimum(px, py), 1e-20)
    n = jnp.clip(jnp.ceil(pmax / pmin - SNAP_EPS), 1.0, float(max_taps))
    major = jnp.where((px >= py)[..., None], duv_dx, duv_dy)
    return n, major


def _slot_rho2(tex, duv_dx, duv_dy):
    """Per-slot squared texel-space footprint (major axis): rho2 such that
    the isotropic LOD is 0.5*log2(rho2)."""
    size = jnp.stack([tex["w"].astype(jnp.float32),
                      tex["h"].astype(jnp.float32)], -1)
    dx = duv_dx * size
    dy = duv_dy * size
    return jnp.maximum(jnp.maximum((dx * dx).sum(-1), (dy * dy).sum(-1)),
                       1e-40)


def sample_slots_aniso_tiered(atlas, mip_y, mip_x, slots, uv,
                              duv_dx, duv_dy, spec: AnisoSpec,
                              slot_caps=None, seg_w: int = 128):
    """Exact anisotropic taps at compacted cost for SEVERAL texture slots
    sharing one footprint decision (the pipeline-variant analog of the
    reference's fixed-function 16x samplers, ``TextureCache.cpp:185``).

    Most screen pixels are isotropic (N == 1) and pay one trilinear tap
    per slot; anisotropic pixels group into tap tiers (2 / 4 / ... /
    max_taps) decided ONCE from the uv-space derivatives — all slots of a
    surface share uv, so the ratio only differs per slot via texture
    aspect (equal for square textures). Each tier's tap loop runs only on
    per-ROW budgeted [1, seg_w] segments (``select_row_segments``):
    K = tile_fracs[i] * segments_per_row per pixel row. Inside a selected
    segment the result is the exact per-pixel N-tap average (bit-equal to
    the dense spec for square textures); past-budget pixels fall back to
    isotropic trilinear at the major-axis LOD (standard no-aniso
    behavior). Budgets are static => renders stay deterministic,
    golden-testable, and image-row-shard-invariant.

    slots: list of (tex_planes, n_mips) — tex_planes the page/x/y/w/h
    dict, all [H, W]. ``slot_caps``: optional per-slot tap ceilings
    (e.g. (16, 4, 4, 4): full quality on base color, near-isotropic
    sooner on emissive/ORM/normal — their content tolerates it; a
    declared quality knob, PARITY.md). Returns one rgba [H,W,4] per slot.
    """
    assert uv.ndim == 3 and len(spec.tile_fracs) >= 1
    if not slots:          # textureless scene: nothing to sample
        return []
    h, w = uv.shape[:2]
    if slot_caps is None:
        slot_caps = (spec.max_taps,) * len(slots)
    n, major = _uv_footprint(duv_dx, duv_dy, spec.max_taps)

    PLANE_KEYS = ("page", "x", "y", "w", "h")
    rho2 = [_slot_rho2(tex, duv_dx, duv_dy) for tex, _ in slots]

    # --- isotropic base taps: ONE lax.scan over the stacked slot planes,
    # so the ~4 MB tap body is emitted once, not per slot (the unrolled
    # form put the round-4 bake at 374 MB of TPU code / 200 s compiles —
    # round-5 compile-size fix). Per-slot math is independent, so the
    # scanned results are bit-equal to the unrolled loop's.
    iso_xs = {k: jnp.stack([tex[k] for tex, _ in slots])
              for k in PLANE_KEYS}
    iso_xs["nm"] = jnp.stack([nm for _, nm in slots])
    iso_xs["rho2"] = jnp.stack(rho2)

    def iso_body(carry, xs):
        tex_s = {k: xs[k] for k in PLANE_KEYS}
        lod_iso = 0.5 * det_log2(xs["rho2"])
        return carry, _bilinear_at_level_lod(atlas, tex_s, mip_y, mip_x,
                                             uv, xs["nm"], lod_iso)

    _, iso = jax.lax.scan(iso_body, 0, iso_xs)
    outs = [iso[si] for si in range(len(slots))]

    shared = {"u": uv[..., 0], "v": uv[..., 1],
              "mu": major[..., 0], "mv": major[..., 1], "n": n}
    prev = 1.0
    for taps, frac in zip(tap_ladder(spec), spec.tile_fracs):
        member = (n > prev) & ((n <= taps) if taps < spec.max_taps
                               else True)
        sel, k = select_row_segments(member, seg_w, frac)
        c = {key: gather_row_segments(v, sel, seg_w)
             for key, v in shared.items()}
        uv_c = jnp.stack([c["u"], c["v"]], -1)
        major_c = jnp.stack([c["mu"], c["mv"]], -1)

        # group slots by their effective tap count, then scan each group
        # (body emitted once per group, not per slot). Within a group the
        # clip ceiling equals the group's taps_s; for MEMBER pixels this
        # is identical to the per-slot cap clip (membership bounds n by
        # the tier's taps <= cap), and non-member lanes are masked out by
        # ``hit`` below — results stay bit-equal where they are consumed.
        groups: dict = {}
        for si in range(len(slots)):
            taps_s = min(taps, slot_caps[si])
            if taps_s > 1:
                groups.setdefault(taps_s, []).append(si)
        for taps_s, sis in sorted(groups.items()):
            xs = {key: jnp.stack([gather_row_segments(slots[si][0][key],
                                                      sel, seg_w)
                                  for si in sis]) for key in PLANE_KEYS}
            xs["rho2"] = jnp.stack([gather_row_segments(rho2[si], sel,
                                                        seg_w)
                                    for si in sis])
            xs["nm"] = jnp.stack([gather_row_segments(slots[si][1], sel,
                                                      seg_w)
                                  for si in sis])
            n_c = jnp.clip(c["n"], 1.0, float(taps_s))

            def tier_body(carry, xs, taps_s=taps_s, n_c=n_c,
                          uv_c=uv_c, major_c=major_c):
                tex_c = {key: xs[key] for key in PLANE_KEYS}
                # minor-axis LOD at the slot's own scale: log2(pmax/N)
                # with one log2 (0.5*log2(rho2/N^2)) — N-capped pixels
                # widen their filter instead of aliasing
                lod_c = 0.5 * det_log2(xs["rho2"] / (n_c * n_c))

                def tap(i, acc):
                    tt = (i.astype(jnp.float32) + 0.5) / n_c - 0.5
                    wt = (i < n_c).astype(jnp.float32)[..., None]
                    return acc + wt * _bilinear_at_level_lod(
                        atlas, tex_c, mip_y, mip_x,
                        uv_c + major_c * tt[..., None], xs["nm"], lod_c)

                acc = jax.lax.fori_loop(
                    0, taps_s, tap,
                    jnp.zeros(uv_c.shape[:-1] + (4,), jnp.float32))
                return carry, acc / n_c[..., None]

            _, accs = jax.lax.scan(tier_body, 0, xs)
            for gi, si in enumerate(sis):
                scat, have = scatter_row_segments(accs[gi], sel, h, w,
                                                  seg_w)
                hit = (member & have)[..., None]
                outs[si] = jnp.where(hit, scat, outs[si])
        prev = taps
    return outs


def sample_texture_aniso_tiered(atlas, mip_y, mip_x, tex, n_mips, uv,
                                duv_dx, duv_dy, spec: AnisoSpec,
                                seg_w: int = 128):
    """Single-slot form of ``sample_slots_aniso_tiered`` (see it for the
    semantics + the shard-invariance design rule)."""
    return sample_slots_aniso_tiered(atlas, mip_y, mip_x,
                                     [(tex, n_mips)], uv, duv_dx, duv_dy,
                                     spec, seg_w=seg_w)[0]


def _bilinear_at_level_lod(atlas, tex, mip_y, mip_x, uv, n_mips, lod,
                           dither: bool = False):
    """Trilinear helper: two _bilinear_at_level taps mixed by lod fract
    (or ONE dither-rounded tap, see ``_dither_level``). The two levels
    run through a fori_loop so the ~4 MB tap body is emitted ONCE per
    call site, not twice (round-5 compile-size fix); the weighted adds
    keep the unrolled form's order, so results are bit-equal."""
    if dither:
        return _bilinear_at_level(atlas, tex, mip_y, mip_x, uv,
                                  _dither_level(lod, n_mips))
    lodc = jnp.clip(lod, 0.0, (n_mips - 1).astype(jnp.float32))
    l0 = jnp.floor(lodc + SNAP_EPS).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n_mips - 1)
    f = jnp.maximum(lodc - l0.astype(jnp.float32), 0.0)[..., None]
    ls = jnp.stack([l0, l1])
    ws = jnp.stack([1 - f, f])
    # eager callers may pass numpy planes; numpy ops against the loop's
    # traced index fail, so coerce once here
    tex = {k: jnp.asarray(v) for k, v in tex.items()}

    def body(i, acc):
        return acc + ws[i] * _bilinear_at_level(atlas, tex, mip_y, mip_x,
                                                uv, ls[i])
    return jax.lax.fori_loop(0, 2, body,
                             jnp.zeros(uv.shape[:-1] + (4,), jnp.float32))


def sample_texture(atlas, tex_table, mip_y, mip_x, handle, uv, lod=None) -> jnp.ndarray:
    """Trilinear (or bilinear if lod None) sample by texture handle.

    atlas: [P,2S,S,16] uint8 block atlas; tex_table [N,6] int32; mip_y [L]
    int32; handle [...]: texture id (invalid ids clamped — caller masks);
    uv [...,2]. Returns rgba f32 [...,4].
    """
    row = tex_table[jnp.clip(handle, 0, tex_table.shape[0] - 1)]
    tex = {
        "page": row[..., 0],
        "x": row[..., 1],
        "y": row[..., 2],
        "w": row[..., 3],
        "h": row[..., 4],
    }
    return sample_texture_rows(atlas, mip_y, mip_x, tex, row[..., 5], uv, lod)


# --- cubemap --------------------------------------------------------------

def _cube_face_uv(dirs: jnp.ndarray):
    """dirs [...,3] -> (face i32, u, v) with GL/Vulkan face conventions."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x, jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    ).astype(jnp.int32)
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)
    sc = jnp.where(is_x, jnp.where(x > 0, -z, z), jnp.where(is_y, x, jnp.where(z > 0, x, -x)))
    tc = jnp.where(is_y, jnp.where(y > 0, z, -z), -y)
    return face, 0.5 * (sc / ma + 1.0), 0.5 * (tc / ma + 1.0)


def _bilerp_f32_rows(rows16: jnp.ndarray, fx, fy) -> jnp.ndarray:
    """Planar bilinear mix of gathered f32 block rows [16, ...] (row
    layout c00[4] c10[4] c01[4] c11[4]); same full-lane rationale and
    bit-equal op order as ``_bilerp_words``."""
    chans = []
    for ch in range(4):
        c00, c10 = rows16[ch], rows16[4 + ch]
        c01, c11 = rows16[8 + ch], rows16[12 + ch]
        top = c00 * (1 - fx) + c10 * fx
        bot = c01 * (1 - fx) + c11 * fx
        chans.append(top * (1 - fy) + bot * fy)
    return jnp.stack(chans, -1)


def _sample_cube_blocks(cube: jnp.ndarray, dirs: jnp.ndarray,
                        gather_words) -> jnp.ndarray:
    """Shared bilinear cube sampling over a 2x2-block table;
    ``gather_words`` maps flat indices -> planar [C, ...] block words."""
    face, u, v = _cube_face_uv(dirs)
    s = cube.shape[1]
    st_x = u * s - 0.5
    st_y = v * s - 0.5
    ix0 = jnp.floor(st_x).astype(jnp.int32)
    iy0 = jnp.floor(st_y).astype(jnp.int32)
    fx = st_x - ix0.astype(jnp.float32)
    fy = st_y - iy0.astype(jnp.float32)
    x0 = jnp.clip(ix0, 0, s - 1)       # clamp-to-edge within the face
    y0 = jnp.clip(iy0, 0, s - 1)
    return gather_words((face * s + y0) * s + x0, fx, fy)


def sample_cubemap(cube: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear cubemap sample (GL/Vulkan face conventions). cube
    [6,S,S,16] uint8 2x2 blocks (clamp-to-edge baked in — see
    scene.textures.build_atlas); dirs [...,3]. Returns rgba f32 [...,4].
    One gather per sample."""
    return _sample_cube_blocks(
        cube, dirs,
        lambda flat, fx, fy: _bilerp_words(
            _gather_block_words(cube, flat), fx, fy))


def sample_cubemap_f32(cube: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of an f32 block cube [6,S,S,16] (e.g. the
    irradiance map): same one-row-gather scheme, no unpack."""

    def gw(flat, fx, fy):
        rows = cube.reshape(-1, 16)[flat.reshape(-1)]
        rows = jnp.moveaxis(rows, 0, 1).reshape((16,) + flat.shape)
        return _bilerp_f32_rows(rows, fx, fy)

    return _sample_cube_blocks(cube, dirs, gw)
