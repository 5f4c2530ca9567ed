from .blocks import (
    conv_init,
    conv_apply,
    wsilu,
    wsilu_chunk_add,
    depth_conv_block_init,
    depth_conv_block_apply,
    subpel_conv2x_init,
    subpel_conv2x_apply,
    res_block_stride2_init,
    res_block_stride2_apply,
    res_block_upsample_init,
    res_block_upsample_apply,
    sequential_init,
    sequential_apply,
)

__all__ = [
    "conv_init", "conv_apply", "wsilu", "wsilu_chunk_add",
    "depth_conv_block_init", "depth_conv_block_apply",
    "subpel_conv2x_init", "subpel_conv2x_apply",
    "res_block_stride2_init", "res_block_stride2_apply",
    "res_block_upsample_init", "res_block_upsample_apply",
    "sequential_init", "sequential_apply",
]
