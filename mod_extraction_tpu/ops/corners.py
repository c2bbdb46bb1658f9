"""Corner analysis and LFO post-processing.

TPU-native re-design of the reference's corner machinery
(`mod_extraction/modulations.py:213-363`).  The reference detects corners
with a batched sign-change trick but then post-processes each example with
data-dependent Python loops (`_stretch_corners`, `check_mod_sig`,
`find_valid_mod_sig_indices`).  Here everything is reformulated as
fixed-shape masked ops so the whole pipeline runs inside `jit` (needed by
the TBPTT task, which stretches/validates the extractor output every step):

* corners -> per-frame segment ids (exclusive cumsum of the anchor mask)
* per-segment statistics via masked min/max over a static segment budget
* validity checks -> boolean masks instead of index lists (invalid
  examples are weighted out of the loss instead of dropped, keeping
  shapes static across devices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smoothen(x: jnp.ndarray, smooth_n_frames: int) -> jnp.ndarray:
    """Moving average with stride 1 (reference `modulations.py:359-363`).

    Output length shrinks to T - smooth_n_frames + 1 (unfold semantics).
    Implemented with a cumulative sum instead of materializing the
    unfolded (B, T, W) tensor.
    """
    if smooth_n_frames <= 1:
        return x
    w = smooth_n_frames
    zero = jnp.zeros(x.shape[:-1] + (1,), dtype=x.dtype)
    cs = jnp.concatenate([zero, jnp.cumsum(x, axis=-1)], axis=-1)
    return (cs[..., w:] - cs[..., :-w]) / w


def find_corners(mod_sig: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched top/bottom corner detection.

    Parity with reference `find_corners` (`modulations.py:219-238`): a
    position is a top corner when the slope goes positive -> negative
    (strictly, via the floor(-eps) trick), bottom when negative -> positive.
    First and last frames are never corners.

    Args:  mod_sig (B, T) float.
    Returns: (top, bottom) int32 masks of shape (B, T) with values {0, 1}.
    """
    assert mod_sig.ndim == 2
    diff = mod_sig[:, 1:] - mod_sig[:, :-1]
    diff_r = diff[:, 1:]
    diff_l = diff[:, :-1]
    diff_pos_l = jnp.where(diff_l > 0, diff_l, 0.0)
    diff_neg_l = jnp.where(diff_l < 0, diff_l, 0.0)
    top_inner = (-jnp.floor(diff_pos_l * (diff_r + 1e-16))).astype(jnp.int32)
    bot_inner = (-jnp.floor(diff_neg_l * (diff_r + 1e-16))).astype(jnp.int32)
    pad = jnp.zeros((mod_sig.shape[0], 1), dtype=jnp.int32)
    top = jnp.concatenate([pad, top_inner, pad], axis=1)
    bottom = jnp.concatenate([pad, bot_inner, pad], axis=1)
    return top, bottom


def _segment_stats(m, anchor_mask, anchor_targets, max_segments):
    """Shared segment machinery for stretch/rebuild ops (single example).

    Args:
      m: (T,) signal.
      anchor_mask: (T,) bool — segment boundaries (must include T-1).
      anchor_targets: (T,) target value at each anchor position.
      max_segments: static segment budget K.

    Returns dict of per-frame segment ids plus per-segment
    (prev_pos, cur_pos, prev_target, cur_target, seg_min) arrays of
    shape (K,). Segments beyond the live count contain garbage — callers
    must mask with `seg_valid`.
    """
    t = m.shape[0]
    iota = jnp.arange(t)
    a = anchor_mask.astype(jnp.int32)
    # seg_id[i] = number of anchors strictly before i.
    ex_cumsum = jnp.cumsum(a) - a
    seg_id = jnp.clip(ex_cumsum, 0, max_segments - 1)

    s_range = jnp.arange(max_segments)
    # cur anchor position of segment s = the (s+1)-th anchor = the unique
    # anchor position with ex_cumsum == s.
    is_cur = (ex_cumsum[None, :] == s_range[:, None]) & anchor_mask[None, :]
    big = jnp.int32(t)
    cur_pos = jnp.min(jnp.where(is_cur, iota[None, :], big), axis=1)
    seg_valid = cur_pos < big
    cur_pos = jnp.minimum(cur_pos, t - 1)
    prev_pos = jnp.concatenate([jnp.zeros((1,), jnp.int32), cur_pos[:-1]])

    cur_target = anchor_targets[cur_pos]
    prev_target = jnp.concatenate([m[0][None], cur_target[:-1]])

    # Per-segment min of m over frames (prev, cur] — frame 0 excluded
    # (reference `_stretch_corners` never touches index 0).
    in_seg = (seg_id[None, :] == s_range[:, None]) & (iota[None, :] >= 1)
    inf = jnp.float32(jnp.inf)
    seg_min = jnp.min(jnp.where(in_seg, m[None, :], inf), axis=1)

    return dict(
        seg_id=seg_id,
        cur_pos=cur_pos,
        prev_pos=prev_pos,
        cur_target=cur_target,
        prev_target=prev_target,
        seg_min=seg_min,
        seg_valid=seg_valid,
    )


def _stretch_one(m, top, bottom, max_n_corners, top_val=1.0, bot_val=0.0):
    """Vectorized equivalent of `_stretch_corners` (`modulations.py:260-291`).

    Each segment between anchors is rescaled so the anchor frame hits its
    target (tops -> 1.0, bottoms -> 0.0); the final frame anchors to its own
    value. Segments whose previous and current targets coincide are left
    untouched, matching the reference's `prev_anchor != target_val` guard.
    """
    t = m.shape[0]
    n_corners = jnp.sum(top) + jnp.sum(bottom)

    is_corner = (top == 1) | (bottom == 1)
    anchor_mask = is_corner.at[t - 1].set(True)
    targets = jnp.where(top == 1, top_val, jnp.where(bottom == 1, bot_val, m))
    # (The forced final anchor keeps its own value unless it is a corner.)

    k = max_n_corners + 2  # corners + forced final anchor + slack
    st = _segment_stats(m, anchor_mask, targets, k)

    m_prev = m[st["prev_pos"]]
    m_cur = m[st["cur_pos"]]
    curr_range = jnp.abs(m_prev - m_cur)
    target_range = jnp.abs(st["prev_target"] - st["cur_target"])
    safe = curr_range > 0
    scale = jnp.where(safe, target_range / jnp.where(safe, curr_range, 1.0), 0.0)
    offset = st["cur_target"] - (m_cur - st["seg_min"]) * scale
    apply = (
        (st["prev_target"] != st["cur_target"]) & safe & st["seg_valid"]
    )

    s = st["seg_id"]
    stretched = jnp.where(
        apply[s], (m - st["seg_min"][s]) * scale[s] + offset[s], m
    )
    # Frame 0 is never modified (reference slices start at prev_idx + 1).
    stretched = stretched.at[0].set(m[0])

    # Skip examples with too many corners (`modulations.py:300-304`).
    return jnp.where(n_corners > max_n_corners, m, stretched)


def stretch_corners(
    mod_sig: jnp.ndarray, max_n_corners: int = 10, smooth_n_frames: int = 32
) -> jnp.ndarray:
    """Batched `stretch_corners` (`modulations.py:294-307`).

    Smooths, finds corners, and rescales every inter-corner segment so
    peaks hit 1.0 / troughs hit 0.0. Fully jittable; per-example work is
    vmapped with a static corner budget.
    """
    assert mod_sig.ndim == 2
    mod_sig = smoothen(mod_sig, smooth_n_frames)
    top, bottom = find_corners(mod_sig)
    return jax.vmap(lambda m, t, b: _stretch_one(m, t, b, max_n_corners))(
        mod_sig, top, bottom
    )


def corners_to_mod_sig(
    top_corners: jnp.ndarray, bottom_corners: jnp.ndarray, max_n_corners: int = 64
) -> jnp.ndarray:
    """Rebuild a piecewise-linear LFO from corner masks.

    Parity with `corners_to_mod_sig` (`modulations.py:241-257`): linear
    ramps between consecutive corners (tops = 1, bottoms = 0), zeros
    outside the first/last corner, all-zeros if either mask is empty.
    Accepts (T,) masks like the reference.
    """
    assert top_corners.ndim == 1
    t = top_corners.shape[0]
    iota = jnp.arange(t)
    is_corner = (top_corners == 1) | (bottom_corners == 1)
    targets = jnp.where(top_corners == 1, 1.0, 0.0)

    # last corner index <= i (inclusive cummax of marked iota)
    marked = jnp.where(is_corner, iota, -1)
    prev_idx = jax.lax.associative_scan(jnp.maximum, marked)
    # next corner index >= i (reverse cummin)
    marked_n = jnp.where(is_corner, iota, t)
    next_idx = jax.lax.associative_scan(
        jnp.minimum, marked_n, reverse=True
    )

    has_prev = prev_idx >= 0
    has_next = next_idx < t
    p = jnp.clip(prev_idx, 0, t - 1)
    n = jnp.clip(next_idx, 0, t - 1)
    denom = jnp.maximum(n - p, 1)
    frac = (iota - p).astype(jnp.float32) / denom.astype(jnp.float32)
    ramp = targets[p] + (targets[n] - targets[p]) * frac
    out = jnp.where(has_prev & has_next, ramp, 0.0)
    empty = (jnp.max(top_corners) == 0) | (jnp.max(bottom_corners) == 0)
    return jnp.where(empty, jnp.zeros_like(out), out)


def _min_corner_spacing(mask: jnp.ndarray) -> jnp.ndarray:
    """Minimum index distance between consecutive 1s (inf if < 2 ones)."""
    t = mask.shape[0]
    iota = jnp.arange(t)
    marked = jnp.where(mask == 1, iota, -1)
    last_le = jax.lax.associative_scan(jnp.maximum, marked)
    prev_lt = jnp.concatenate([jnp.full((1,), -1), last_le[:-1]])
    dist = jnp.where(
        (mask == 1) & (prev_lt >= 0), iota - prev_lt, jnp.int32(t + 1)
    )
    d = jnp.min(dist)
    return jnp.where(d > t, jnp.inf, d.astype(jnp.float32))


def check_mod_sig_mask(
    mod_sig: jnp.ndarray,
    top_corners: jnp.ndarray,
    bottom_corners: jnp.ndarray,
    min_top_corners: int = 1,
    max_top_corners: int = 6,
    min_bottom_corners: int = 1,
    max_bottom_corners: int = 6,
    min_fraction_between_corners: float = 0.10,
) -> jnp.ndarray:
    """Batched validity rules (reference `check_mod_sig`, `modulations.py:311-343`).

    Returns a (B,) bool mask instead of a Python bool per example, so the
    TBPTT step can zero-weight invalid examples without changing shapes.
    """
    assert mod_sig.ndim == 2
    n_frames = mod_sig.shape[-1]
    min_n_frames = int(min_fraction_between_corners * n_frames)
    n_top = jnp.sum(top_corners, axis=-1)
    n_bot = jnp.sum(bottom_corners, axis=-1)
    ok = (
        (n_top >= min_top_corners)
        & (n_top <= max_top_corners)
        & (n_bot >= min_bottom_corners)
        & (n_bot <= max_bottom_corners)
    )
    top_spacing = jax.vmap(_min_corner_spacing)(top_corners)
    bot_spacing = jax.vmap(_min_corner_spacing)(bottom_corners)
    ok = ok & (top_spacing >= min_n_frames) & (bot_spacing >= min_n_frames)
    return ok


def find_valid_mod_sig_mask(mod_sig: jnp.ndarray) -> jnp.ndarray:
    """Mask version of `find_valid_mod_sig_indices` (`modulations.py:346-356`)."""
    top, bottom = find_corners(mod_sig)
    return check_mod_sig_mask(mod_sig, top, bottom)
