from marconet_tpu.utils.image import (
    preprocess_line,
    postprocess_sr,
    draw_boxes,
    stack_collage,
)

__all__ = [
    "preprocess_line",
    "postprocess_sr",
    "draw_boxes",
    "stack_collage",
]
