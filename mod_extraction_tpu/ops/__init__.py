from mod_extraction_tpu.ops.lfo import (
    LFO_SHAPES,
    shape_to_idx,
    make_mod_signal,
    make_mod_signal_batch,
    make_rand_mod_signal,
)
from mod_extraction_tpu.ops.corners import (
    find_corners,
    corners_to_mod_sig,
    stretch_corners,
    check_mod_sig_mask,
    find_valid_mod_sig_mask,
    smoothen,
)

__all__ = [
    "LFO_SHAPES",
    "shape_to_idx",
    "make_mod_signal",
    "make_mod_signal_batch",
    "make_rand_mod_signal",
    "find_corners",
    "corners_to_mod_sig",
    "stretch_corners",
    "check_mod_sig_mask",
    "find_valid_mod_sig_mask",
    "smoothen",
]
