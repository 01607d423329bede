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


class AnisoSpec(NamedTuple):
    """Static anisotropic-sampling plan threaded through the ``max_aniso``
    kwargs. ``max_taps`` is the reference sampler's requested ratio ceiling
    (16, ``TextureCache.cpp:185``); ``tile_fracs`` enables the tiered
    tile-compacted exact path (see ``sample_texture_aniso_tiered``): one
    entry per tier = the fraction of screen tiles budgeted for that tier's
    tap loop. Empty = dense exact taps (the brute-force spec)."""

    max_taps: int = 1
    tile_fracs: tuple = ()


def aniso_spec(a) -> "AnisoSpec":
    return a if isinstance(a, AnisoSpec) else AnisoSpec(int(a), ())


def quad_dfdx(v: jnp.ndarray) -> jnp.ndarray:
    """GLSL dFdx with 2x2 quad semantics: for pixel x the derivative is
    v[x|1] - v[x&~1] along axis 1 (W). v: [H,W,...]. Odd extents behave as
    if the framebuffer were padded by edge replication (hardware pads to
    full quads)."""
    w = v.shape[1]
    if w % 2:
        v = jnp.concatenate([v, v[:, -1:]], axis=1)
    d = v[:, 1::2] - v[:, 0::2]
    return jnp.repeat(d, 2, axis=1)[:, :w]


def quad_dfdy(v: jnp.ndarray) -> jnp.ndarray:
    h = v.shape[0]
    if h % 2:
        v = jnp.concatenate([v, v[-1:]], axis=0)
    d = v[1::2] - v[0::2]
    return jnp.repeat(d, 2, axis=0)[:h]


def quad_pair_valid(covered: jnp.ndarray):
    """(valid_x, valid_y) [H,W] bool: whether BOTH pixels of each quad
    x-pair / y-pair are covered. A pair with an uncovered pixel has no
    meaningful finite difference: the uncovered pixel's attributes are
    resolve-path garbage (extrapolation of an arbitrary triangle) or
    kernel zeros — and, critically, *different* garbage per backend."""
    h, w = covered.shape[0], covered.shape[1]
    cx = covered
    if w % 2:
        cx = jnp.concatenate([cx, cx[:, -1:]], axis=1)
    vx = jnp.repeat(cx[:, 1::2] & cx[:, 0::2], 2, axis=1)[:, :w]
    cy = covered
    if h % 2:
        cy = jnp.concatenate([cy, cy[-1:]], axis=0)
    vy = jnp.repeat(cy[1::2] & cy[0::2], 2, axis=0)[:h]
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


def _bilinear_at_level(atlas, tex, mip_y, mip_x, uv, level):
    """One bilinear fetch at integer mip ``level`` (traced), REPEAT wrap.

    ONE gather: the atlas stores 2x2 texel blocks with per-texture wrap
    baked in (``scene/textures.py``), so the whole bilinear footprint is a
    single 16-byte row.

    tex: dict of per-pixel int arrays page,x,y,w,h (mip-0 placement).
    """
    sw = jnp.maximum(tex["w"] >> level, 1)
    sh = jnp.maximum(tex["h"] >> level, 1)
    bx = mip_x[level] + (tex["x"] >> level)
    by = mip_y[level] + (tex["y"] >> level)

    st_x = uv[..., 0] * sw.astype(jnp.float32) - 0.5
    st_y = uv[..., 1] * sh.astype(jnp.float32) - 0.5
    ix0 = jnp.floor(st_x).astype(jnp.int32)
    iy0 = jnp.floor(st_y).astype(jnp.int32)
    fx = (st_x - ix0.astype(jnp.float32))[..., None]
    fy = (st_y - iy0.astype(jnp.float32))[..., None]

    # REPEAT wrap. Atlas texture sizes are snapped to powers of two
    # (scene/textures.py), so the wrap is a mask — integer remainder by a
    # per-pixel divisor is ~2x slower on the VPU (measured).
    x0 = bx + (ix0 & (sw - 1))
    y0 = by + (iy0 & (sh - 1))
    p, h, w, _ = atlas.shape
    flat = (tex["page"] * h + y0) * w + x0
    blk = _gather_block(atlas, flat)
    c00, c10, c01, c11 = blk[..., 0:4], blk[..., 4:8], blk[..., 8:12], blk[..., 12:16]
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def compute_lod(uv: jnp.ndarray, tex_w, tex_h) -> jnp.ndarray:
    """GLSL implicit LOD: lambda = log2(max(|ddx|, |ddy|)) of texel coords,
    with quad-based derivatives. uv [H,W,2]; tex_w/h [H,W]."""
    tc = uv * jnp.stack([tex_w.astype(jnp.float32), tex_h.astype(jnp.float32)], axis=-1)
    dx = quad_dfdx(tc)
    dy = quad_dfdy(tc)
    rho = jnp.maximum(
        jnp.sqrt(jnp.sum(dx * dx, axis=-1)), jnp.sqrt(jnp.sum(dy * dy, axis=-1))
    )
    return jnp.log2(jnp.maximum(rho, 1e-20))


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
    l0 = jnp.floor(lodc).astype(jnp.int32)
    f = lodc - l0.astype(jnp.float32)
    return jnp.minimum(l0 + (f > thr).astype(jnp.int32), n_mips - 1)


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
    lodc = jnp.clip(lod, 0.0, (n_mips - 1).astype(jnp.float32))
    l0 = jnp.floor(lodc).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n_mips - 1)
    f = (lodc - l0.astype(jnp.float32))[..., None]
    c0 = _bilinear_at_level(atlas, tex, mip_y, mip_x, uv, l0)
    c1 = _bilinear_at_level(atlas, tex, mip_y, mip_x, uv, l1)
    return c0 * (1 - f) + c1 * f


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
    n = jnp.clip(jnp.ceil(pmax / pmin), 1.0, float(max_aniso))
    lod = jnp.log2(jnp.maximum(pmax / n, 1e-20))
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

    acc = 0.0
    for i in range(max_aniso):
        # GL-style: tap offsets (i+0.5)/N - 0.5 along the major axis.
        # Taps beyond the per-pixel N get ZERO weight and the sum is
        # normalized by N per pixel — weighting collapsed taps 1/max_aniso
        # each would shift the footprint centroid toward the last slot
        # (up to ~0.9 texels at ratio 2 with max_aniso 16).
        t = (i + 0.5) / n - 0.5
        w = (i < n).astype(jnp.float32)[..., None]
        acc = acc + w * _bilinear_at_level_lod(atlas, tex, mip_y, mip_x,
                                               uv + major * t[..., None],
                                               n_mips, lod, dither)
    return acc / n[..., None]


def sample_texture_aniso_tiered(atlas, mip_y, mip_x, tex, n_mips, uv,
                                duv_dx, duv_dy, spec: AnisoSpec,
                                tile_h: int = 8, tile_w: int = 128):
    """Exact anisotropic taps at compacted cost: footprint-adaptive tap
    TIERS (the 'pipeline variant' analog the reference gets from fixed-
    function samplers). Most screen pixels are isotropic (N == 1) and pay
    one trilinear tap; anisotropic pixels are grouped into tap tiers
    (2 / 4 / ... / max_taps), and each tier's tap loop runs only on the
    K most-populated (tile_h, tile_w) screen tiles of that tier —
    K = tile_fracs[i] * n_tiles, the same top-k compaction the two-stage
    shadow PCF uses (shadow.py). Inside a selected tile the result is the
    EXACT per-pixel N-tap average (bit-equal to the dense spec); tier
    pixels beyond the budget fall back to isotropic trilinear at the
    major-axis LOD (standard no-aniso behavior). Budgets are static, so
    renders stay deterministic and golden-testable.

    Inputs must be screen-shaped [H, W(, 2)]."""
    assert uv.ndim == 3 and len(spec.tile_fracs) >= 1
    n, lod, major = _aniso_footprint(tex, duv_dx, duv_dy, spec.max_taps)
    lod_iso = lod + jnp.log2(n)        # = log2(pmax): the no-aniso LOD
    base = _bilinear_at_level_lod(atlas, tex, mip_y, mip_x, uv,
                                  n_mips, lod_iso)

    h, w = n.shape
    nty = -(-h // tile_h)
    ntx = -(-w // tile_w)
    n_tiles = nty * ntx
    ph, pw = nty * tile_h - h, ntx * tile_w - w

    def tilefy(a, fill=0):
        a = jnp.pad(a, ((0, ph), (0, pw)) + ((0, 0),) * (a.ndim - 2),
                    constant_values=fill)
        a = a.reshape((nty, tile_h, ntx, tile_w) + a.shape[2:])
        return jnp.moveaxis(a, 2, 1).reshape((n_tiles, tile_h, tile_w)
                                             + a.shape[4:])

    def untile(a):
        a = a.reshape((nty, ntx, tile_h, tile_w) + a.shape[3:])
        a = jnp.moveaxis(a, 1, 2).reshape((nty * tile_h, ntx * tile_w)
                                          + a.shape[4:])
        return a[:h, :w]

    # tap ladder: 2, 4, 8, ... capped at max_taps; last tier absorbs the
    # full ratio range
    ladder = []
    t = 2
    for i in range(len(spec.tile_fracs)):
        last = i == len(spec.tile_fracs) - 1
        ladder.append(spec.max_taps if last else min(t, spec.max_taps))
        t *= 2

    out = base
    planes = {"u": uv[..., 0], "v": uv[..., 1],
              "mu": major[..., 0], "mv": major[..., 1],
              "n": n, "lod": lod, "n_mips": n_mips}
    planes.update({k: tex[k] for k in ("page", "x", "y", "w", "h")})
    tiled = {k: tilefy(v) for k, v in planes.items()}

    prev = 1.0
    for taps, frac in zip(ladder, spec.tile_fracs):
        member = (n > prev) & ((n <= taps) if taps < spec.max_taps
                               else True)
        k = max(1, min(int(round(frac * n_tiles)), n_tiles))
        cnt = tilefy(member).reshape(n_tiles, -1).sum(-1)
        _, sel = jax.lax.top_k(cnt, k)
        c = {key: tiled[key][sel].reshape(k * tile_h, tile_w)
             for key in tiled}
        uv_c = jnp.stack([c["u"], c["v"]], -1)
        major_c = jnp.stack([c["mu"], c["mv"]], -1)
        tex_c = {key: c[key] for key in ("page", "x", "y", "w", "h")}
        n_c = jnp.maximum(c["n"], 1.0)
        acc = 0.0
        for i in range(taps):
            tt = (i + 0.5) / n_c - 0.5
            wt = (i < n_c).astype(jnp.float32)[..., None]
            acc = acc + wt * _bilinear_at_level_lod(
                atlas, tex_c, mip_y, mip_x, uv_c + major_c * tt[..., None],
                c["n_mips"], c["lod"])
        acc = acc / n_c[..., None]
        r = acc.reshape(k, tile_h, tile_w, 4)
        scat = jnp.zeros((n_tiles, tile_h, tile_w, 4), acc.dtype)
        scat = scat.at[sel].set(r, mode="drop")
        have = jnp.zeros((n_tiles, 1, 1), bool).at[sel].set(True,
                                                            mode="drop")
        have = jnp.broadcast_to(have, (n_tiles, tile_h, tile_w))
        hit = (member & untile(have))[..., None]
        out = jnp.where(hit, untile(scat), out)
        prev = taps
    return out


def _bilinear_at_level_lod(atlas, tex, mip_y, mip_x, uv, n_mips, lod,
                           dither: bool = False):
    """Trilinear helper: two _bilinear_at_level taps mixed by lod fract
    (or ONE dither-rounded tap, see ``_dither_level``)."""
    if dither:
        return _bilinear_at_level(atlas, tex, mip_y, mip_x, uv,
                                  _dither_level(lod, n_mips))
    lodc = jnp.clip(lod, 0.0, (n_mips - 1).astype(jnp.float32))
    l0 = jnp.floor(lodc).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n_mips - 1)
    f = (lodc - l0.astype(jnp.float32))[..., None]
    c0 = _bilinear_at_level(atlas, tex, mip_y, mip_x, uv, l0)
    c1 = _bilinear_at_level(atlas, tex, mip_y, mip_x, uv, l1)
    return c0 * (1 - f) + c1 * f


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


def _sample_cube_blocks(cube: jnp.ndarray, dirs: jnp.ndarray,
                        gather) -> jnp.ndarray:
    """Shared bilinear cube sampling over a 2x2-block table; ``gather``
    maps flat indices -> [...,16] f32 block values."""
    face, u, v = _cube_face_uv(dirs)
    s = cube.shape[1]
    st_x = u * s - 0.5
    st_y = v * s - 0.5
    ix0 = jnp.floor(st_x).astype(jnp.int32)
    iy0 = jnp.floor(st_y).astype(jnp.int32)
    fx = (st_x - ix0.astype(jnp.float32))[..., None]
    fy = (st_y - iy0.astype(jnp.float32))[..., None]
    x0 = jnp.clip(ix0, 0, s - 1)       # clamp-to-edge within the face
    y0 = jnp.clip(iy0, 0, s - 1)
    blk = gather((face * s + y0) * s + x0)
    c00, c10, c01, c11 = blk[..., 0:4], blk[..., 4:8], blk[..., 8:12], blk[..., 12:16]
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sample_cubemap(cube: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear cubemap sample (GL/Vulkan face conventions). cube
    [6,S,S,16] uint8 2x2 blocks (clamp-to-edge baked in — see
    scene.textures.build_atlas); dirs [...,3]. Returns rgba f32 [...,4].
    One gather per sample."""
    return _sample_cube_blocks(cube, dirs,
                               lambda flat: _gather_block(cube, flat))


def sample_cubemap_f32(cube: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of an f32 block cube [6,S,S,16] (e.g. the
    irradiance map): same one-row-gather scheme, no unpack."""
    return _sample_cube_blocks(
        cube, dirs, lambda flat: cube.reshape(-1, 16)[flat])
