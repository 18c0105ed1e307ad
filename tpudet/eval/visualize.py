"""Detection visualization (SURVEY.md C22): draw predicted/GT boxes + labels
on images, host-side with PIL."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

_PALETTE = [
    (230, 60, 60), (60, 200, 90), (70, 110, 240), (240, 200, 60),
    (200, 80, 220), (80, 210, 220), (250, 150, 50), (150, 100, 60),
]


def draw_detections(
    image: np.ndarray,
    boxes: np.ndarray,
    classes: np.ndarray,
    scores: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
    color_by_class: bool = True,
) -> np.ndarray:
    """[h,w,3] uint8 + [N,4]/[N] -> annotated uint8 image."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(image.astype(np.uint8)).convert("RGB")
    draw = ImageDraw.Draw(img)
    for i in range(len(boxes)):
        c = int(classes[i])
        color = _PALETTE[(c - 1) % len(_PALETTE)] if color_by_class else (255, 40, 40)
        x1, y1, x2, y2 = [float(v) for v in boxes[i]]
        draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
        label = (
            class_names[c - 1]
            if class_names and 0 < c <= len(class_names)
            else str(c)
        )
        if scores is not None:
            label = f"{label} {float(scores[i]):.2f}"
        tx, ty = x1 + 2, max(y1 - 12, 0)
        draw.text((tx, ty), label, fill=color)
    return np.asarray(img)
