from .fused import (
    space_to_depth,
    depth_to_space,
    round_and_to_int8,
    clamp_reciprocal_with_quant,
    add_and_multiply,
    process_with_mask,
    combine_for_reading_2x,
    restore_y_2x,
    restore_y_2x_with_cat_after,
    restore_y_4x,
    build_index_dec,
    build_index_enc,
    replicate_pad,
    pixel_shuffle_clamp,
    checkerboard_masks_2x,
    checkerboard_masks_4x,
)

__all__ = [
    "space_to_depth", "depth_to_space", "round_and_to_int8",
    "clamp_reciprocal_with_quant", "add_and_multiply", "process_with_mask",
    "combine_for_reading_2x", "restore_y_2x", "restore_y_2x_with_cat_after",
    "restore_y_4x", "build_index_dec", "build_index_enc", "replicate_pad",
    "pixel_shuffle_clamp", "checkerboard_masks_2x", "checkerboard_masks_4x",
]
