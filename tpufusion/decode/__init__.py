from tpufusion.decode.decode import (
    find_obstacle,
    back_project_2d_to_3d,
    corner_vote,
    decode_frame,
    decode_batch,
)

__all__ = [
    "find_obstacle",
    "back_project_2d_to_3d",
    "corner_vote",
    "decode_frame",
    "decode_batch",
]
