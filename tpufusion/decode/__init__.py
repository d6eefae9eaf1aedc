from tpufusion.decode.decode import (
    find_obstacle,
    find_obstacles_topk,
    back_project_2d_to_3d,
    corner_vote,
    decode_frame,
    decode_frame_multi,
    decode_batch,
    decode_batch_multi,
)

__all__ = [
    "find_obstacle",
    "find_obstacles_topk",
    "back_project_2d_to_3d",
    "corner_vote",
    "decode_frame",
    "decode_frame_multi",
    "decode_batch",
    "decode_batch_multi",
]
