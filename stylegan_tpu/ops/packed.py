"""Space-to-depth "packed" convolutions for the wide, shallow stages.

At the >=512^2 stages of FFHQ-1024 StyleGAN the channel count falls to 32/16,
so a 3x3 conv's MXU contraction dimension uses 32/16 of the systolic array's
128 lanes — measured 5.4 TFLOP/s at 1024^2x16 on v5e vs ~60-117 TFLOP/s for
the same FLOPs at C>=64.  The fix is layout, not kernels: keep those stages'
activations space-to-depth packed, (B, H, W, C) -> (B, H/2, W/2, 4C), and run
every conv of the stage directly in the packed domain with an equivalent
zero-structured kernel.  The packed 3x3 does 4x the MACs (the structured
kernel is 3/4 zeros) but contracts over 4C lanes, which nets out 1.9-2.6x
faster at C<=32 — and the 1x1 to_rgb / fused up-/down-scale convs repack with
*no* MAC waste.  Measured (amortized, v5e): conv3x3 1024^2x16 7.0ms ->
2.7ms packed; 512^2x32 2.6ms -> 1.3ms; to_rgb pair 5.7ms -> 2.2ms.

Lane order is channel-major: packed[..., c*4 + (di*2 + dj)] holds original
pixel (2i+di, 2j+dj) channel c.  Per-pixel quantities (noise) then tile as a
whole (4,)-block repeated C times, and per-channel quantities (bias, noise
weight, styles, norm statistics) expand with jnp.repeat(v, 4) — both O(C)
host-side-shaped ops that XLA folds into the consuming fusion.

All packers take the *reference-layout* HWIO kernels (after the w_mul
equalized-LR fold), so parameters, checkpoints and converters are untouched;
packing is a pure execution-layout choice.  Everything here is differentiable
— the VJP of a packed conv is a packed-shape conv, so the training step
inherits the same MXU win on the backward pass.

Reference semantics being reproduced: 3x3 SAME convs (CustomLayers.py:107-
135), the fused 4-tap up/downscale convs (CustomLayers.py:142-165), and the
depthwise blur (CustomLayers.py:251-276), which folds into the up/down conv
kernels as a spatial pre-/post-composition instead of a separate full-res
pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .linear import _accum_dtype  # single source for the bf16-AD dtype rule
from .precision import get_precision

DIMS = ("NHWC", "HWIO", "NHWC")
P = 2          # pack factor (2x2 pixels -> channels)
PP = P * P


# --------------------------------------------------------------------------
# Layout transforms
# --------------------------------------------------------------------------

def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), lanes ordered c*4 + (di*2+dj)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // P, P, w // P, P, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)            # (b, h', w', c, di, dj)
    return x.reshape(b, h // P, w // P, c * PP)


def depth_to_space(x: jax.Array) -> jax.Array:
    """(B, H', W', 4C) -> (B, 2H', 2W', C) — inverse of space_to_depth."""
    b, hp, wp, cpp = x.shape
    c = cpp // PP
    x = x.reshape(b, hp, wp, c, P, P)
    x = x.transpose(0, 1, 4, 2, 5, 3)            # (b, h', di, w', dj, c)
    return x.reshape(b, hp * P, wp * P, c)


def repeat_channel(v: jax.Array) -> jax.Array:
    """Per-channel vector (C,) -> packed lanes (4C,): each entry 4x."""
    return jnp.repeat(v, PP, axis=-1)


# --------------------------------------------------------------------------
# Kernel packers.  All build (kh', kw', 4Ci|Ci, 4Co) HWIO kernels from the
# reference 3x3/1x1 HWIO kernel w (with w_mul already applied).  The spatial
# index math is enumerated per (output phase d, original tap t) — <=36 cases
# — with .at[].set on a zeros kernel; XLA folds the construction into a small
# constant subgraph next to the conv.
# --------------------------------------------------------------------------

def pack_same_kernel(w: jax.Array) -> jax.Array:
    """Same-resolution conv (k odd), packed input AND output.

    For output phase d and original tap offset t (o = 2i+d reads n = o+t):
    packed input row q = n>>1 with phase n&1, so kernel tap (q-i) spans
    {-1,0,1} for k=3 (kernel 3x3, 3/4 zeros) and {0} for k=1 (phase-diagonal
    1x1).
    """
    k, _, ci, co = w.shape
    assert k % 2 == 1
    r = k // 2
    # packed tap offset q = (d + t) >> 1 spans [-(r+1)//2, (r+1)>>1]:
    # kp = 3 covers k in {3, 5}; 5-tap+ blurs (e.g. [1,4,6,4,1]) need more
    kp = 1 if k == 1 else 2 * ((r + 1) // 2) + 1
    pad = kp // 2
    kern = jnp.zeros((kp, kp, ci, P, P, co, P, P), w.dtype)
    for di in range(P):
        for ti in range(-r, r + 1):
            ei = di + ti
            qi, pin_i = ei >> 1, ei & 1
            for dj in range(P):
                for tj in range(-r, r + 1):
                    ej = dj + tj
                    qj, pin_j = ej >> 1, ej & 1
                    kern = kern.at[qi + pad, qj + pad, :, pin_i, pin_j,
                                   :, di, dj].set(w[ti + r, tj + r])
    return kern.reshape(kp, kp, ci * PP, co * PP)


def _upscale_taps(w: jax.Array) -> tuple:
    """Full original-domain kernel of the fused upscale conv:
    out[o] = sum_t w4f[t] xd[o + t - 2] on the 2x-dilated input
    (ops/linear.py:_fused_upscale_conv).  Returns ((4,4,Ci,Co), pad).

    The depthwise blur that follows in the G path is NOT folded in: the
    reference blurs with its own zero padding as a separate pass
    (CustomLayers.py:251-276), and composing it into the conv kernel would
    change the 2-pixel border — use blur_packed() after this conv instead.
    """
    wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    w4 = (wp[1:, 1:] + wp[:-1, 1:] + wp[1:, :-1] + wp[:-1, :-1])
    return w4[::-1, ::-1], 2                                # (4,4,Ci,Co)


def _composed_up_taps(w: jax.Array, blur_k: jax.Array) -> tuple:
    """Original-domain taps of blur(upscale_conv(x)) composed into ONE
    kernel: out[o] = sum_u K[u] xd[o+u-3], K[u] = sum_{s+t=u} B[s] w4f[t]
    (6x6 taps, pad 3).  Exact everywhere EXCEPT the 1-pixel output border,
    where the two-pass form zero-pads the *cropped* conv output before
    blurring while the composition sees the uncropped values —
    conv_packed_up_blur subtracts precisely those terms (see
    _up_blur_border_corrections).  The key economics: the extra taps land in
    already-occupied packed kernel slots, so the packed kernel footprint —
    and the conv's MAC count — is IDENTICAL to the unfused up-conv, and the
    separate full-res blur pass (its MACs and its 2 HBM sweeps) disappears.
    """
    full, padf = _upscale_taps(w)
    l = full.shape[0]
    kb = blur_k.shape[0]
    comp = jnp.zeros((l + kb - 1, l + kb - 1) + full.shape[2:], w.dtype)
    for si in range(kb):
        for sj in range(kb):
            comp = comp.at[si:si + l, sj:sj + l].add(blur_k[si, sj] * full)
    return comp, padf + (kb - 1) // 2


def pack_up_kernel(w: jax.Array, blur_k=None) -> tuple:
    """Fused 2x-upscale conv, UNPACKED half-res input -> packed output.

    Output phase d reads dilated taps with e = d+t-pad even, i.e. input rows
    i + e/2.  Returns (kernel (kp,kp,Ci,4Co), padding per dim).
    blur_k folds the subsequent depthwise blur into the kernel
    (_composed_up_taps); pair with _up_blur_border_corrections."""
    full, padf = (_composed_up_taps(w, blur_k) if blur_k is not None
                  else _upscale_taps(w))
    l, _, ci, co = full.shape
    offs = sorted({(d + t - padf) // 2 for d in range(P) for t in range(l)
                   if (d + t - padf) % 2 == 0})
    kp = offs[-1] - offs[0] + 1
    lo = -offs[0]
    kern = jnp.zeros((kp, kp, ci, co, P, P), w.dtype)
    for di in range(P):
        for ti in range(l):
            ei = di + ti - padf
            if ei % 2:
                continue
            for dj in range(P):
                for tj in range(l):
                    ej = dj + tj - padf
                    if ej % 2:
                        continue
                    kern = kern.at[ei // 2 + lo, ej // 2 + lo, :, :,
                                   di, dj].add(full[ti, tj])
    kern = kern.reshape(kp, kp, ci, co * PP)
    return kern, (lo, kp - 1 - lo)


def pack_up_kernel_packed_in(w: jax.Array, blur_k=None) -> tuple:
    """Fused 2x-upscale conv, PACKED quarter-grid input -> packed output.

    The packed output grid is 2x the packed input grid, so this is an
    lhs-dilated conv in the packed domain; each original tap installs at two
    kernel positions (one per input phase) and the dilation zeros select the
    parity-correct one at run time.  Returns (kernel, padding).
    blur_k folds the subsequent depthwise blur in (_composed_up_taps)."""
    full, padf = (_composed_up_taps(w, blur_k) if blur_k is not None
                  else _upscale_taps(w))
    l, _, ci, co = full.shape
    # j = e/2 - pin + pad_k for e = d+t-padf even, pin in {0,1}
    js = sorted({(d + t - padf) // 2 - pin
                 for d in range(P) for t in range(l) for pin in range(P)
                 if (d + t - padf) % 2 == 0})
    kp = js[-1] - js[0] + 1
    lo = -js[0]
    kern = jnp.zeros((kp, kp, ci, P, P, co, P, P), w.dtype)
    for di in range(P):
        for ti in range(l):
            ei = di + ti - padf
            if ei % 2:
                continue
            for dj in range(P):
                for tj in range(l):
                    ej = dj + tj - padf
                    if ej % 2:
                        continue
                    for pin_i in range(P):
                        for pin_j in range(P):
                            kern = kern.at[
                                ei // 2 - pin_i + lo, ej // 2 - pin_j + lo,
                                :, pin_i, pin_j, :, di, dj].add(full[ti, tj])
    kern = kern.reshape(kp, kp, ci * PP, co * PP)
    # the 2x-dilated input has length 2*(G/2)-1 = G-1, so the right pad is
    # kp - lo (not the same-res kp-1-lo) to make the output exactly G rows
    return kern, (lo, kp - lo)


def _downscale_taps(w: jax.Array, gain: float = 0.25) -> tuple:
    """4-tap averaged stride-2 kernel of the fused downscale conv:
    z[o] = sum_t wd[t] x[2o + t - 1] (ops/linear.py:_fused_downscale_conv).
    Returns ((4,4,Ci,Co), pad=1)."""
    wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    return (wp[1:, 1:] + wp[:-1, 1:] + wp[1:, :-1] + wp[:-1, :-1]) * gain, 1


def _composed_down_taps(w: jax.Array, blur_k: jax.Array) -> tuple:
    """downscale_conv(blur(x)) composed: z[o] = sum_u Kd[u] x[2o+u-2],
    Kd[u] = sum_{t+s=u} wd[t] B[s] (6 taps, pad 2).  Exact except where the
    two-pass downconv reads the zero-PADDED blurred map at indices -1/N
    (the analytic blur extension there is nonzero) — a 1-pixel output ring,
    fixed by _down_blur_border_corrections.  Same packed-kernel footprint as
    the plain downscale conv, so the separate blur pass is free to drop."""
    wd, padd = _downscale_taps(w)
    l = wd.shape[0]
    kb = blur_k.shape[0]
    comp = jnp.zeros((l + kb - 1, l + kb - 1) + wd.shape[2:], w.dtype)
    for si in range(kb):
        for sj in range(kb):
            comp = comp.at[si:si + l, sj:sj + l].add(blur_k[si, sj] * wd)
    return comp, padd + (kb - 1) // 2


def pack_down_kernel(w: jax.Array, blur_k=None) -> tuple:
    """Fused 2x-downscale conv (stride-2, 4-tap averaged kernel,
    ops/linear.py:_fused_downscale_conv), packed input -> packed output.

    z[o'] = sum_t wd[t] x[2o' + t - 1]; packed out row o' = 2i+d reads
    original n = 4i + 2d + t - 1 -> packed input row 2i + (n>>1 - 2i), a
    stride-2 conv in the packed domain.  blur_k composes the D's preceding
    depthwise blur into the kernel (_composed_down_taps; pair with
    _down_blur_border_corrections, or use conv_packed_down_blur).
    Returns (kernel, padding)."""
    wd, padd = (_composed_down_taps(w, blur_k) if blur_k is not None
                else _downscale_taps(w))
    l, _, ci, co = wd.shape
    gs = sorted({(2 * d + t - padd) >> 1 for d in range(P) for t in range(l)})
    kp = gs[-1] - gs[0] + 1
    lo = -gs[0]
    kern = jnp.zeros((kp, kp, ci, P, P, co, P, P), w.dtype)
    for di in range(P):
        for ti in range(l):
            ni = 2 * di + ti - padd
            gi, pin_i = ni >> 1, ni & 1
            for dj in range(P):
                for tj in range(l):
                    nj = 2 * dj + tj - padd
                    gj, pin_j = nj >> 1, nj & 1
                    kern = kern.at[gi + lo, gj + lo, :, pin_i, pin_j,
                                   :, di, dj].add(wd[ti, tj])
    kern = kern.reshape(kp, kp, ci * PP, co * PP)
    return kern, (lo, kp - 1 - lo)


# --------------------------------------------------------------------------
# Packed conv applications
# --------------------------------------------------------------------------

def conv_packed_same(x: jax.Array, w: jax.Array) -> jax.Array:
    """Packed-domain SAME conv: x (B,H',W',4Ci), w the reference (k,k,Ci,Co)
    kernel (w_mul applied)."""
    kern = pack_same_kernel(w)
    pad = (kern.shape[0] - 1) // 2
    return lax.conv_general_dilated(
        x, kern.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=DIMS, precision=get_precision(),
        preferred_element_type=_accum_dtype(x)).astype(x.dtype)


def conv_packed_up(x: jax.Array, w: jax.Array,
                   in_packed: bool = False, blur_k=None) -> jax.Array:
    """Fused upscale conv producing PACKED output at the new resolution.

    in_packed=False: x is the unpacked (B, H, W, Ci) previous-stage output.
    in_packed=True:  x is packed (B, H/2, W/2, 4Ci).
    Output: (B, H, W, 4Co) — i.e. resolution 2H packed by 2.
    blur_k composes the following blur into the kernel (interior-exact only;
    use conv_packed_up_blur for the border-corrected public form).
    """
    if in_packed:
        kern, (plo, phi) = pack_up_kernel_packed_in(w, blur_k)
        return lax.conv_general_dilated(
            x, kern.astype(x.dtype), (1, 1), [(plo, phi), (plo, phi)],
            lhs_dilation=(2, 2), dimension_numbers=DIMS,
            precision=get_precision(),
            preferred_element_type=_accum_dtype(x)).astype(x.dtype)
    kern, (plo, phi) = pack_up_kernel(w, blur_k)
    return lax.conv_general_dilated(
        x, kern.astype(x.dtype), (1, 1), [(plo, phi), (plo, phi)],
        dimension_numbers=DIMS, precision=get_precision(),
        preferred_element_type=_accum_dtype(x)).astype(x.dtype)


def _strip_upconv1d(v: jax.Array, k4: jax.Array) -> jax.Array:
    """1-D fused-upscale conv of a border strip with one kernel row/column.

    v: (B, L, Ci); k4: (l, Ci, Co) taps in the _upscale_taps orientation.
    Returns u: (B, 2L+2, Co) with u[:, o+1] = sum_t k4[t] vd[o+t-pad] for
    o in [-1, 2L] (vd = 2x-dilated v, zero outside) — the UNCROPPED
    upscale-conv values, one virtual row beyond each end.
    """
    l = k4.shape[0]
    pad = l // 2  # 2 for the plain 4-tap, 3 for the blur-composed 6-tap
    out = lax.conv_general_dilated(
        v[:, :, None, :], k4[:, None].astype(v.dtype), (1, 1),
        [(pad + 1, pad + 1), (0, 0)], lhs_dilation=(2, 1),
        dimension_numbers=DIMS, precision=get_precision(),
        preferred_element_type=_accum_dtype(v)).astype(v.dtype)
    return out[:, :, 0, :]


def _packed_border_rows(x: jax.Array, in_packed: bool) -> tuple:
    """(top_row, bot_row, left_col, right_col) of the ORIGINAL-domain input,
    each (B, L, Ci), extracted from packed or unpacked x."""
    if not in_packed:
        return x[:, 0], x[:, -1], x[:, :, 0], x[:, :, -1]
    b, hp, wp, cpp = x.shape
    c = cpp // PP
    g = x.reshape(b, hp, wp, c, P, P)                     # (..., c, di, dj)

    def row(i, di):
        r = g[:, i, :, :, di, :]                          # (B, wp, C, P_dj)
        return r.transpose(0, 1, 3, 2).reshape(b, wp * P, c)

    def col(j, dj):
        r = g[:, :, j, :, :, dj]                          # (B, hp, C, P_di)
        return r.transpose(0, 1, 3, 2).reshape(b, hp * P, c)

    return row(0, 0), row(-1, 1), col(0, 0), col(-1, 1)


def _apply_packed_borders(y: jax.Array, ct, cb, cl, cr) -> jax.Array:
    """Subtract the four original-domain border corrections (each (B, L, Co);
    top/bottom = original rows 0/2H-1, left/right = original cols 0/2W-1)
    from the packed output in ONE fused elementwise update.

    Each thin correction slab is zero-padded to y's shape and the sum is
    subtracted once: pads are cheap fusible producers on TPU, so XLA folds
    the whole ring fix into a single sweep over y (or into y's consumer).
    The first form of this code applied four sequential
    dynamic-update-slices instead, each of which materialized a full copy
    of y — measured 10-19% END-TO-END regression at 1024^2, i.e. more HBM
    traffic than the blur pass the fold removes (docs/DESIGN.md round 4)."""
    b, hp, wp, cpp = y.shape
    c = cpp // PP

    def hslab(corr, side):
        u = jnp.zeros((b, 1, wp, c, P, P), y.dtype)
        r = corr.reshape(b, wp, P, c).transpose(0, 1, 3, 2)   # (B,wp,C,dj)
        u = u.at[:, 0, :, :, 0 if side == "top" else 1, :].set(
            r.astype(y.dtype))
        u = u.reshape(b, 1, wp, cpp)
        rows = (0, hp - 1) if side == "top" else (hp - 1, 0)
        return jnp.pad(u, ((0, 0), rows, (0, 0), (0, 0)))

    def wslab(corr, side):
        u = jnp.zeros((b, hp, 1, c, P, P), y.dtype)
        r = corr.reshape(b, hp, P, c).transpose(0, 1, 3, 2)   # (B,hp,C,di)
        u = u.at[:, :, 0, :, :, 0 if side == "left" else 1].set(
            r.astype(y.dtype))
        u = u.reshape(b, hp, 1, cpp)
        cols = (0, wp - 1) if side == "left" else (wp - 1, 0)
        return jnp.pad(u, ((0, 0), (0, 0), cols, (0, 0)))

    return y - (hslab(ct, "top") + hslab(cb, "bottom")
                + wslab(cl, "left") + wslab(cr, "right"))


def _up_blur_corr_values(strips, w: jax.Array, blur_k: jax.Array) -> tuple:
    """The four border-correction lines for the blur-composed upscale conv
    (layout-independent; strips are ORIGINAL-domain border rows/cols).

    Two-pass: yc = crop(upconv(x)) to (2H, 2W); z = blur(yc) with zero pad.
    Composed zc instead blurs the UNCROPPED upconv, so for each output cell
    the terms whose conv-output index falls outside the crop (row/col -1 or
    2H/2W — exactly a 1-pixel ring) must be subtracted:

      z[0,  :] = zc[0,  :] - sum_sj B[0,sj]  y~[-1, oj+sj-1]
      z[-1, :] = zc[-1, :] - sum_sj B[-1,sj] y~[2H, oj+sj-1]
      z[:,  0] -= sum_si B[si,0]  y~[oi+si-1, -1]   (in-crop rows only)
      z[:, -1] -= sum_si B[si,-1] y~[oi+si-1, 2W]   (in-crop rows only)

    where y~[-1,:] / y~[2H,:] / y~[:,-1] / y~[:,2W] are the uncropped conv's
    virtual border strips — 1-D upscale convs of x's border rows/cols with
    single rows/columns of the 4-tap kernel (only one dilated input row can
    reach each virtual output row).  O(edge) work: four (B, L, Ci)->(B, 2L,
    Co) thin convs; nothing at the full resolution.
    """
    full, _ = _upscale_taps(w)                 # (4, 4, Ci, Co) oriented taps
    kb = blur_k.shape[0]
    rb = kb // 2
    assert kb == 3, "border correction derived for 3-tap blurs"
    top, bot, left, right = strips

    def edge_corr(strip, ktaps, bvec):
        """strip (B,L,Ci) -> virtual line y~ (B, 2L+2, Co) -> 3-tap VALID
        contraction with the blur vector -> (B, 2L, Co)."""
        t = _strip_upconv1d(strip, ktaps)
        return sum(bvec[s] * t[:, s:t.shape[1] - (kb - 1) + s]
                   for s in range(kb))

    def edge_corr_incrop(strip, ktaps, bvec):
        """Same but over in-crop line values only (virtual ends excluded,
        SAME zero-padded contraction) — the left/right column rule."""
        t = _strip_upconv1d(strip, ktaps)[:, 1:-1]       # rows 0..2L-1
        tp = jnp.pad(t, ((0, 0), (rb, rb), (0, 0)))
        return sum(bvec[s] * tp[:, s:tp.shape[1] - (kb - 1) + s]
                   for s in range(kb))

    # virtual row -1 reaches only dilated row 0 through tap l-1; row 2H only
    # row 2H-2 through tap 0 (see _strip_upconv1d index math)
    return (edge_corr(top, full[-1], blur_k[0]),
            edge_corr(bot, full[0], blur_k[-1]),
            edge_corr_incrop(left, full[:, -1], blur_k[:, 0]),
            edge_corr_incrop(right, full[:, 0], blur_k[:, -1]))


def _up_blur_border_corrections(y: jax.Array, x: jax.Array, w: jax.Array,
                                blur_k: jax.Array,
                                in_packed: bool) -> jax.Array:
    """Apply _up_blur_corr_values to a PACKED conv output."""
    ct, cb, cl, cr = _up_blur_corr_values(
        _packed_border_rows(x, in_packed), w, blur_k)
    return _apply_packed_borders(y, ct, cb, cl, cr)


def conv_packed_up_blur(x: jax.Array, w: jax.Array, blur_k: jax.Array,
                        in_packed: bool = False) -> jax.Array:
    """blur(upscale_conv(x)) as ONE packed conv + O(edge) border fixes.

    Bit-equivalent to conv_packed_up followed by blur_packed (pinned by
    tests/test_packed.py) at the cost of the up-conv alone: the composed
    taps occupy the same packed kernel slots, and the full-res blur pass —
    its dense-diagonal MACs and its two HBM sweeps over the (2H)^2 x 4C
    activation — disappears.

    The border corrections are derived for the default 3-tap blur
    (config.py blur_filter [1,2,1]); other sizes fall back to the exact
    two-pass form rather than tracing into an assertion."""
    if blur_k.shape[0] != 3:
        return blur_packed(conv_packed_up(x, w, in_packed=in_packed), blur_k)
    y = conv_packed_up(x, w, in_packed=in_packed, blur_k=blur_k)
    return _up_blur_border_corrections(y, x, w, blur_k, in_packed)


def conv_packed_down(x: jax.Array, w: jax.Array, blur_k=None) -> jax.Array:
    """Fused downscale conv, packed (B,H',W',4Ci) -> packed (B,H'/2,W'/2,4Co)
    at the halved resolution (apply blur_packed first for the D path, or
    pass blur_k and use conv_packed_down_blur for the folded form)."""
    kern, (plo, phi) = pack_down_kernel(w, blur_k)
    return lax.conv_general_dilated(
        x, kern.astype(x.dtype), (2, 2), [(plo, phi), (plo, phi)],
        dimension_numbers=DIMS, precision=get_precision(),
        preferred_element_type=_accum_dtype(x)).astype(x.dtype)


def _blur_line(strip: jax.Array, bvec, ext: int) -> jax.Array:
    """Depthwise 3-tap blur of a border strip (B, L, C) with scalar taps
    bvec, evaluated on indices [-ext, L-1+ext] (zero-padded): returns
    (B, L + 2*ext, C)."""
    kb = len(bvec)
    rb = kb // 2
    sp = jnp.pad(strip, ((0, 0), (rb + ext, rb + ext), (0, 0)))
    n = strip.shape[1] + 2 * ext
    return sum(bvec[s] * sp[:, s:s + n] for s in range(kb))


def _strip_downconv1d(line: jax.Array, ktaps: jax.Array) -> jax.Array:
    """Stride-2 1-D contraction of a line (B, L+2, Ci) covering indices
    [-1, L] with one 4-tap kernel row/col (4, Ci, Co) -> (B, L/2, Co):
    out[o] = sum_t ktaps[t] line[2o + t - 1]."""
    out = lax.conv_general_dilated(
        line[:, :, None, :], ktaps[:, None].astype(line.dtype), (2, 1),
        [(0, 0), (0, 0)], dimension_numbers=DIMS,
        precision=get_precision(),
        preferred_element_type=_accum_dtype(line)).astype(line.dtype)
    return out[:, :, 0, :]


def _down_blur_border_corrections(y: jax.Array, x: jax.Array, w: jax.Array,
                                  blur_k: jax.Array) -> jax.Array:
    """Make the blur-composed downscale conv EXACTLY equal the two-pass
    form: the two-pass downconv zero-pads the blurred map at rows/cols -1
    and N, while the composition evaluates the analytic blur extension
    there (nonzero: e.g. blurred[-1] = B[2] x[0]).  Subtract those terms —
    again exactly a 1-pixel ring of the (N/2)^2 output:

      z[0,  :] -= sum_tj wd[0,tj]  xb~[-1, 2oj+tj-1]
      z[-1, :] -= sum_tj wd[-1,tj] xb~[N,  2oj+tj-1]
      z[:,  0] -= sum_ti wd[ti,0]  xb~[2oi+ti-1, -1]   (in-range rows only)
      z[:, -1] -= sum_ti wd[ti,-1] xb~[2oi+ti-1, N]    (in-range rows only)

    with xb~[-1,:] = B[2]-row blur of x's top row, xb~[N,:] = B[0]-row blur
    of the bottom row, xb~[:,±] = B[:,2]/B[:,0] blurs of the edge columns.
    O(edge) work only."""
    ct, cb, cl, cr = _down_blur_corr_values(
        _packed_border_rows(x, in_packed=True), w, blur_k)
    return _apply_packed_borders(y, ct, cb, cl, cr)


def _down_blur_corr_values(strips, w: jax.Array, blur_k: jax.Array) -> tuple:
    """The four border-correction lines for the blur-composed downscale conv
    (layout-independent; see _down_blur_border_corrections)."""
    wd, _ = _downscale_taps(w)
    kb = blur_k.shape[0]
    assert kb == 3, "border correction derived for 3-tap blurs"
    top, bot, left, right = strips

    # rows -1 / N of the blurred map, on column indices [-1, N]
    line_top = _blur_line(top, blur_k[-1], ext=1)
    line_bot = _blur_line(bot, blur_k[0], ext=1)
    # cols -1 / N on IN-RANGE rows only (rows -1/N belong to the top/bottom
    # groups): blur the edge columns, then zero-extend to [-1, N]
    line_l = jnp.pad(_blur_line(left, blur_k[:, -1], ext=0),
                     ((0, 0), (1, 1), (0, 0)))
    line_r = jnp.pad(_blur_line(right, blur_k[:, 0], ext=0),
                     ((0, 0), (1, 1), (0, 0)))
    return (_strip_downconv1d(line_top, wd[0]),
            _strip_downconv1d(line_bot, wd[-1]),
            _strip_downconv1d(line_l, wd[:, 0]),
            _strip_downconv1d(line_r, wd[:, -1]))


def _apply_unpacked_borders(y: jax.Array, ct, cb, cl, cr) -> jax.Array:
    """Unpacked analogue of _apply_packed_borders: one fused pad-and-subtract
    instead of four sequential full-tensor scatter updates."""
    b, h, w, co = y.shape

    def hs(corr, side):
        rows = (0, h - 1) if side == "top" else (h - 1, 0)
        return jnp.pad(corr.astype(y.dtype)[:, None],
                       ((0, 0), rows, (0, 0), (0, 0)))

    def ws(corr, side):
        cols = (0, w - 1) if side == "left" else (w - 1, 0)
        return jnp.pad(corr.astype(y.dtype)[:, :, None],
                       ((0, 0), (0, 0), cols, (0, 0)))

    return y - (hs(ct, "top") + hs(cb, "bottom")
                + ws(cl, "left") + ws(cr, "right"))


def _unpacked_strips(x: jax.Array) -> tuple:
    return x[:, 0], x[:, -1], x[:, :, 0], x[:, :, -1]


def fused_upscale_conv_blur(x: jax.Array, w: jax.Array,
                            blur_k: jax.Array) -> jax.Array:
    """UNPACKED blur(fused_upscale_conv(x)) as one lhs-dilated conv with the
    composed 6x6 kernel + border fixes — for the C>=64 fused stages where
    packing doesn't apply but the blur's extra full-res pass still does.

    Non-3-tap blur filters fall back to the two-pass form (the border
    corrections are derived for [1,2,1])."""
    if blur_k.shape[0] != 3:
        from .linear import _fused_upscale_conv
        from .primitives import blur2d
        return blur2d(_fused_upscale_conv(x, w), blur_k)
    comp, pad = _composed_up_taps(w, blur_k)
    y = lax.conv_general_dilated(
        x, comp.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
        lhs_dilation=(2, 2), dimension_numbers=DIMS,
        precision=get_precision(),
        preferred_element_type=_accum_dtype(x)).astype(x.dtype)
    ct, cb, cl, cr = _up_blur_corr_values(_unpacked_strips(x), w, blur_k)
    return _apply_unpacked_borders(y, ct, cb, cl, cr)


def fused_downscale_conv_blur(x: jax.Array, w: jax.Array,
                              blur_k: jax.Array) -> jax.Array:
    """UNPACKED fused_downscale_conv(blur(x)) as one stride-2 conv with the
    composed 6x6 kernel + border fixes (3-tap blurs only; other sizes fall
    back to the two-pass form)."""
    if blur_k.shape[0] != 3:
        from .linear import _fused_downscale_conv
        from .primitives import blur2d
        return _fused_downscale_conv(blur2d(x, blur_k), w)
    comp, pad = _composed_down_taps(w, blur_k)
    y = lax.conv_general_dilated(
        x, comp.astype(x.dtype), (2, 2), [(pad, pad), (pad, pad)],
        dimension_numbers=DIMS, precision=get_precision(),
        preferred_element_type=_accum_dtype(x)).astype(x.dtype)
    ct, cb, cl, cr = _down_blur_corr_values(_unpacked_strips(x), w, blur_k)
    return _apply_unpacked_borders(y, ct, cb, cl, cr)


def conv_packed_down_blur(x: jax.Array, w: jax.Array,
                          blur_k: jax.Array) -> jax.Array:
    """downscale_conv(blur(x)) as ONE packed stride-2 conv + O(edge) border
    fixes — bit-equivalent to blur_packed followed by conv_packed_down
    (tests/test_packed.py) at the cost of the downscale conv alone.
    3-tap blurs only; other sizes fall back to the two-pass form."""
    if blur_k.shape[0] != 3:
        return conv_packed_down(blur_packed(x, blur_k), w)
    y = conv_packed_down(x, w, blur_k=blur_k)
    return _down_blur_border_corrections(y, x, w, blur_k)


def blur_packed(x: jax.Array, kernel2d: jax.Array) -> jax.Array:
    """Depthwise blur in the packed domain (== blur2d through d2s/s2d).

    Expressed as a DENSE packed conv with a channel-diagonal kernel: grouped
    convs with 4-lane groups lower pathologically on TPU (measured 17ms at
    the 1024-stage vs 2.7ms for this dense form — the diagonal's zero MACs
    are cheaper than the grouped lowering), and the unpacked depthwise blur
    costs 4.4ms at 1024^2x16 besides.  A MAC-free shift-and-add VPU
    formulation (36 weighted phase-mapped slices) was also tried and lost
    1.9x (344 vs 184 us/img at the 512 stage, batch 128): the slice access
    pattern costs more HBM traffic than the dense form wastes in MACs.

    Any odd tap count works (pack_same_kernel sizes the packed kernel to
    the tap span).  Even-tap kernels are rejected up front: SAME-style
    padding (k-1)//2 shrinks H by 1 — torch does the same
    (CustomLayers.py:251-276), breaking progressive blending there too —
    and an odd H cannot exist in the packed layout.
    """
    if kernel2d.shape[0] % 2 == 0:
        raise ValueError(
            f"blur_filter with even tap count {kernel2d.shape[0]} shrinks "
            "the feature map by 1px (torch conv SAME semantics) and cannot "
            "run in the packed layout; use an odd tap count or ops.packed: "
            "false")
    c = x.shape[-1] // PP
    eye = jnp.eye(c, dtype=kernel2d.dtype)
    w = kernel2d[:, :, None, None] * eye[None, None]      # (k,k,C,C) diag
    return conv_packed_same(x, w)


# --------------------------------------------------------------------------
# Packed element-wise / normalization ops (epilogue building blocks)
# --------------------------------------------------------------------------

def add_noise_packed(x: jax.Array, noise_weight: jax.Array,
                     noise: jax.Array) -> jax.Array:
    """x: (B,H',W',4C); noise: (B,H',W',4) per original pixel
    (= space_to_depth of the reference's (B,H,W,1) noise)."""
    c = x.shape[-1] // PP
    n = jnp.tile(noise.astype(x.dtype), (1, 1, 1, c))
    return x + repeat_channel(noise_weight.astype(x.dtype)) * n


def instance_norm_packed(x: jax.Array, epsilon: float = 1e-5) -> jax.Array:
    """Per-(sample, channel) spatial normalization in the packed domain:
    statistics reduce over (H', W', phase) with lanes viewed as (C, 4).

    Uses the one-pass var = E[x^2] - E[x]^2 form: the two-pass
    mean-then-centered-moment form costs an extra full HBM sweep (measured
    2.38 -> 1.79 ms at the 1024 stage) for ~1e-6 f32 difference on O(1)
    post-lrelu activations.  The unpacked default path keeps torch's exact
    two-pass formula for bit-level reference parity."""
    b, hp, wp, cpp = x.shape
    c = cpp // PP
    xf = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    g = xf.reshape(b, hp, wp, c, PP)
    mean = jnp.mean(g, axis=(1, 2, 4))                      # (B, C)
    m2 = jnp.mean(jnp.square(g), axis=(1, 2, 4))
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + epsilon)
    mean_p = repeat_channel(mean)[:, None, None, :]
    scale_p = repeat_channel(scale)[:, None, None, :]
    return ((xf - mean_p) * scale_p).astype(x.dtype)


def pixel_norm_packed(x: jax.Array, epsilon: float = 1e-8) -> jax.Array:
    """Per-original-pixel channel normalization: lanes grouped (C, phase),
    reduce over C per phase."""
    b, hp, wp, cpp = x.shape
    c = cpp // PP
    xf = x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
    g = xf.reshape(b, hp, wp, c, PP)
    ms = jnp.mean(jnp.square(g), axis=3, keepdims=True)     # (B,H',W',1,4)
    out = (g * lax.rsqrt(ms + epsilon)).reshape(x.shape)
    return out.astype(x.dtype)


def style_modulate_packed(x: jax.Array, style: jax.Array) -> jax.Array:
    """AdaIN in the packed domain; style: (B, 2C) as [scales, biases]."""
    cpp = x.shape[-1]
    c = cpp // PP
    s = style.reshape(style.shape[0], 2, c)
    scale = repeat_channel(s[:, 0])[:, None, None, :].astype(x.dtype)
    bias = repeat_channel(s[:, 1])[:, None, None, :].astype(x.dtype)
    return x * (scale + 1.0) + bias


def upscale_rgb_packed(rgb: jax.Array) -> jax.Array:
    """Nearest 2x upsample of an UNPACKED (B,H,W,C) image straight into the
    packed domain at 2H: every phase of packed pixel (i,j) equals rgb[i,j],
    i.e. a channel-repeat (used for the linear-structure residual path)."""
    return jnp.repeat(rgb, PP, axis=-1)
