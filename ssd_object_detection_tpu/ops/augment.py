"""On-device SSD augmentation: photometric + expand + min-IoU crop + flip INSIDE jit.

TPU-first redesign of data/augment.py (the host numpy recipe, which itself is
above-reference: the reference repo has NO augmentation — SURVEY.md components 7/8).
The host recipe runs expand/crop/photometric as per-image numpy before resize, which
(a) can't use the packed uint8 cache (it needs pre-resize pixels) and (b) is
host-bound: ~1 step/s on a 1-vCPU host vs ~6-7 for flip-only (AUG_HORIZON_10K.json).

Key observation: expand (zoom-out onto a fill canvas) -> min-IoU crop (zoom-in) ->
resize -> flip COMPOSE INTO ONE AFFINE RESAMPLE of the stored image:

    out(s_y, s_x) = img(a_y*(s_y+.5)+b_y, a_x*(s_x+.5)+b_x),  fill outside

so the whole geometric recipe costs exactly one bilinear sampling — implemented as
two batched MXU matmuls against per-image interpolation matrices (the same
matmul-resize machinery as ops/preprocess.resize_bilinear_planar), with out-of-range
taps given zero weight and the residual coverage mass assigned to the per-image fill
color (the image mean, as in data/augment.py:35). Photometric jitter is elementwise
in-jit. The crop's rejection sampling (reference semantics: data/augment.py:54-104,
SSD-paper sampled patches) is vectorized: `crop_attempts` candidate rects are drawn
in parallel, validity is evaluated for all of them, and the FIRST valid one wins —
the same acceptance distribution as the host's sequential loop with iid draws.

Semantics deviations vs data/augment.py, all deliberate and documented:
  - geometry is continuous (no int() truncation of canvas sizes / crop pixels);
  - photometric applies to the STORED (already resized) image rather than the
    original-resolution one — elementwise ops commute with resampling up to the
    interpolation of clip() boundaries;
  - expand/crop resample the stored SxS pixels, so extreme zoom-ins interpolate
    from S-resolution data instead of the original JPEG resolution. That is the
    price of feeding from the packed cache; at SSD's 0.3-1.0 crop scales the
    resample ratio stays <= 3.3x.

Equivalence to the host recipe is tested geometry-for-geometry in
tests/test_augment_device.py: a scripted rng drives data/augment.py to a chosen
expand/crop, and apply_geometry() reproduces its boxes exactly and its pixels to
bilinear tolerance.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# SSD-paper crop options (data/augment.py:22); index 0 = no crop. -1 sentinel makes
# "max IoU >= min_iou" trivially true so the math stays branch-free.
_CROP_MIN_IOUS = (-1.0, 0.1, 0.3, 0.5, 0.7, 0.9)


@dataclasses.dataclass(frozen=True)
class AugConfig:
    """Static augmentation knobs baked into the compiled step (mirrors the host
    recipe's parameters: data/augment.py random_expand/random_min_iou_crop)."""

    photometric: bool = True
    expand: bool = True
    crop: bool = True
    flip: bool = True
    photometric_p: float = 0.5
    expand_p: float = 0.5
    expand_max_ratio: float = 4.0
    crop_attempts: int = 50

    @property
    def any_geometry(self) -> bool:
        return self.expand or self.crop or self.flip


def _photometric(key, img01: jnp.ndarray, p: float) -> jnp.ndarray:
    """Brightness/contrast/saturation jitter, same ops and ranges as
    data/augment.py:107-117 (sequential, each gated by its own coin)."""
    u = jax.random.uniform(key, (6,))
    img01 = jnp.where(u[0] < p, jnp.clip(img01 + (u[1] * 0.24 - 0.12), 0.0, 1.0), img01)
    img01 = jnp.where(
        u[2] < p, jnp.clip((img01 - 0.5) * (0.7 + u[3] * 0.6) + 0.5, 0.0, 1.0), img01
    )
    gray = img01.mean(axis=2, keepdims=True)
    img01 = jnp.where(
        u[4] < p, jnp.clip(gray + (img01 - gray) * (0.7 + u[5] * 0.6), 0.0, 1.0), img01
    )
    return img01


def _draw_geometry(key, boxes, valid, cfg: AugConfig):
    """Per-image geometry draw -> (org_window xyxy, crop_rect xyxy, flip bool).

    `org_window` is where the ORIGINAL image sits inside the (conceptual) expanded
    frame; `crop_rect` is the sampled patch in that same frame. Both relative.
    """
    ke, kc_opt, kc_rect, kf = jax.random.split(key, 4)

    # --- expand (data/augment.py:25-42, isotropic ratio, uniform placement)
    if cfg.expand:
        ue = jax.random.uniform(ke, (4,))
        do_e = ue[0] < cfg.expand_p
        ratio = jnp.where(do_e, 1.0 + ue[1] * (cfg.expand_max_ratio - 1.0), 1.0)
        osz = 1.0 / ratio
        oy0 = ue[2] * (1.0 - osz)
        ox0 = ue[3] * (1.0 - osz)
    else:
        osz = jnp.float32(1.0)
        oy0 = ox0 = jnp.float32(0.0)
    org_window = jnp.stack([ox0, oy0, ox0 + osz, oy0 + osz])  # xyxy

    # boxes in the expanded frame (cxcywh)
    ecx = boxes[:, 0] * osz + ox0
    ecy = boxes[:, 1] * osz + oy0
    ew = boxes[:, 2] * osz
    eh = boxes[:, 3] * osz

    # --- min-IoU crop (data/augment.py:54-104), vectorized rejection sampling
    crop_rect = jnp.array([0.0, 0.0, 1.0, 1.0], jnp.float32)
    if cfg.crop:
        opt = jax.random.randint(kc_opt, (), 0, len(_CROP_MIN_IOUS))
        min_iou = jnp.asarray(_CROP_MIN_IOUS, jnp.float32)[opt]
        u = jax.random.uniform(kc_rect, (cfg.crop_attempts, 4))
        cw = 0.3 + 0.7 * u[:, 0]
        ch = 0.3 + 0.7 * u[:, 1]
        aspect_ok = (cw / ch >= 0.5) & (cw / ch <= 2.0)
        x0 = u[:, 2] * (1.0 - cw)
        y0 = u[:, 3] * (1.0 - ch)
        rects = jnp.stack([x0, y0, x0 + cw, y0 + ch], axis=1)  # (A, 4)

        bx0, by0 = ecx - ew / 2, ecy - eh / 2
        bx1, by1 = ecx + ew / 2, ecy + eh / 2
        ix0 = jnp.maximum(rects[:, None, 0], bx0[None, :])
        iy0 = jnp.maximum(rects[:, None, 1], by0[None, :])
        ix1 = jnp.minimum(rects[:, None, 2], bx1[None, :])
        iy1 = jnp.minimum(rects[:, None, 3], by1[None, :])
        inter = jnp.clip(ix1 - ix0, 0) * jnp.clip(iy1 - iy0, 0)  # (A, G)
        area_b = jnp.clip(bx1 - bx0, 0) * jnp.clip(by1 - by0, 0)
        area_r = cw * ch
        iou = inter / jnp.maximum(area_b[None, :] + area_r[:, None] - inter, 1e-10)
        iou = jnp.where(valid[None, :], iou, -1.0)
        centers_in = (
            (ecx[None, :] > rects[:, None, 0]) & (ecx[None, :] < rects[:, None, 2])
            & (ecy[None, :] > rects[:, None, 1]) & (ecy[None, :] < rects[:, None, 3])
            & valid[None, :]
        )
        ok = aspect_ok & (iou.max(axis=1) >= min_iou) & centers_in.any(axis=1)
        do_crop = (opt > 0) & ok.any()
        first = jnp.argmax(ok)  # first valid attempt, like the host's loop
        crop_rect = jnp.where(do_crop, rects[first], crop_rect)

    flip = (
        jax.random.uniform(kf) < 0.5 if cfg.flip else jnp.asarray(False)
    )
    return org_window, crop_rect, flip


def apply_geometry(
    img01: jnp.ndarray,  # (B, S, S, 3) float32 [0,1]
    boxes: jnp.ndarray,  # (B, G, 4) relative cxcywh
    cls: jnp.ndarray,  # (B, G) int32
    valid: jnp.ndarray,  # (B, G) bool
    org_window: jnp.ndarray,  # (B, 4) xyxy: original image region in expanded frame
    crop_rect: jnp.ndarray,  # (B, 4) xyxy: sampled patch in expanded frame
    flip: jnp.ndarray,  # (B,) bool
    out_size: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deterministic core: one affine bilinear resample + box transform.

    Exposed separately from the rng draw so tests can drive the exact geometry
    data/augment.py produced and compare outputs."""
    b, s_in, _, _ = img01.shape
    s_out = out_size or s_in
    fill = img01.mean(axis=(1, 2))  # (B, 3) — expand fill color (data/augment.py:35)

    ox0, oy0 = org_window[:, 0], org_window[:, 1]
    ow = org_window[:, 2] - org_window[:, 0]
    oh = org_window[:, 3] - org_window[:, 1]
    cx0, cy0 = crop_rect[:, 0], crop_rect[:, 1]
    cw = crop_rect[:, 2] - crop_rect[:, 0]
    ch = crop_rect[:, 3] - crop_rect[:, 1]

    # output pixel s -> source continuous coord: u = c0 + (s+.5)/S * csz (expanded
    # frame) -> v = (u - o0)/osz (original rel) -> src = v * S_in
    a_y = ch / (oh * s_out) * s_in
    b_y = (cy0 - oy0) / oh * s_in
    a_x = cw / (ow * s_out) * s_in
    b_x = (cx0 - ox0) / ow * s_in
    # horizontal flip mirrors the OUTPUT: s -> S-1-s  <=>  a' = -a, b' = a*S + b
    a_xf = jnp.where(flip, -a_x, a_x)
    b_xf = jnp.where(flip, a_x * s_out + b_x, b_x)

    def axis_matrix(a, bb):
        # (B, S_out, S_in) bilinear weights; out-of-range taps get ZERO weight
        pos = jnp.arange(s_out, dtype=jnp.float32) + 0.5
        src = a[:, None] * pos[None, :] + bb[:, None] - 0.5  # (B, S_out) pixel idx
        i0 = jnp.floor(src)
        frac = src - i0
        i0i = i0.astype(jnp.int32)
        cols = jnp.arange(s_in, dtype=jnp.int32)
        in0 = (i0i >= 0) & (i0i < s_in)
        in1 = (i0i + 1 >= 0) & (i0i + 1 < s_in)
        m0 = jnp.where((i0i[..., None] == cols) & in0[..., None], (1.0 - frac)[..., None], 0.0)
        m1 = jnp.where(((i0i + 1)[..., None] == cols) & in1[..., None], frac[..., None], 0.0)
        return m0 + m1

    # f32 matmuls, NOT bf16: photometric'd pixels are arbitrary floats (the uint8
    # exactness argument of ops/preprocess's bf16 resize doesn't hold here), and at
    # batch 32 x 512^2 the two einsums cost ~2.6 ms f32 — noise next to the 54 ms
    # train step they live in
    ry = axis_matrix(a_y, b_y)  # (B, S_out, S_in) f32
    rx = axis_matrix(a_xf, b_xf)
    planar = img01.transpose(0, 3, 1, 2).astype(jnp.float32)  # (B, 3, S_in, S_in)
    rows = jnp.einsum("bsy,bcyx->bcsx", ry, planar)
    out = jnp.einsum("btx,bcsx->bcst", rx, rows)  # (B, 3, S_out, S_out)
    # fill: the sampled weights sum to cov_y*cov_x; the residual mass is fill color
    cov = jnp.einsum("bs,bt->bst", ry.sum(-1), rx.sum(-1))
    out = out + fill[:, :, None, None] * (1.0 - cov[:, None, :, :])
    out_img = jnp.clip(out.transpose(0, 2, 3, 1), 0.0, 1.0)  # (B, S_out, S_out, 3)

    # --- boxes: original rel -> expanded frame -> crop frame, clip, keep, flip
    osz4 = jnp.stack([ow, oh, ow, oh], axis=1)[:, None, :]  # (B,1,4)
    off4 = jnp.stack([ox0, oy0, jnp.zeros_like(ox0), jnp.zeros_like(oy0)], axis=1)[:, None, :]
    eb = boxes * osz4 + off4  # expanded-frame cxcywh
    ex0 = eb[..., 0] - eb[..., 2] / 2
    ey0 = eb[..., 1] - eb[..., 3] / 2
    ex1 = eb[..., 0] + eb[..., 2] / 2
    ey1 = eb[..., 1] + eb[..., 3] / 2
    keep = (
        (eb[..., 0] > crop_rect[:, None, 0]) & (eb[..., 0] < crop_rect[:, None, 2])
        & (eb[..., 1] > crop_rect[:, None, 1]) & (eb[..., 1] < crop_rect[:, None, 3])
    )
    kx0 = (jnp.clip(ex0, crop_rect[:, None, 0], crop_rect[:, None, 2]) - cx0[:, None]) / cw[:, None]
    kx1 = (jnp.clip(ex1, crop_rect[:, None, 0], crop_rect[:, None, 2]) - cx0[:, None]) / cw[:, None]
    ky0 = (jnp.clip(ey0, crop_rect[:, None, 1], crop_rect[:, None, 3]) - cy0[:, None]) / ch[:, None]
    ky1 = (jnp.clip(ey1, crop_rect[:, None, 1], crop_rect[:, None, 3]) - cy0[:, None]) / ch[:, None]
    ncx = (kx0 + kx1) / 2
    ncx = jnp.where(flip[:, None], 1.0 - ncx, ncx)
    new_boxes = jnp.stack([ncx, (ky0 + ky1) / 2, kx1 - kx0, ky1 - ky0], axis=-1)
    new_valid = valid & keep
    new_boxes = jnp.where(new_valid[..., None], new_boxes, 0.0)
    new_cls = jnp.where(new_valid, cls, 0)
    return out_img, new_boxes.astype(jnp.float32), new_cls, new_valid


def augment_batch(
    key: jax.Array,
    image: jnp.ndarray,  # (B, S, S, 3) uint8 or float32 [0,1]
    gt_boxes: jnp.ndarray,
    gt_cls: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: AugConfig = AugConfig(),
    out_size: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full recipe on a batch, inside jit: photometric -> expand -> crop -> flip
    (host order: data/augment.py:120-132 + pipeline flip). Returns float32 [0,1]
    images plus transformed (boxes, cls, valid)."""
    if image.dtype == jnp.uint8:
        image = image.astype(jnp.float32) / 255.0
    b = image.shape[0]
    keys = jax.random.split(key, b)

    if cfg.photometric:
        image = jax.vmap(lambda k, im: _photometric(k, im, cfg.photometric_p))(
            jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys), image
        )
    if not cfg.any_geometry:
        return image, gt_boxes, gt_cls, gt_valid

    geo_keys = jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys)
    org_window, crop_rect, flip = jax.vmap(
        lambda k, bx, v: _draw_geometry(k, bx, v, cfg)
    )(geo_keys, gt_boxes, gt_valid)
    return apply_geometry(
        image, gt_boxes, gt_cls, gt_valid, org_window, crop_rect, flip,
        out_size=out_size,
    )
