"""Pure-tensor geometry ops (reference layer L2 — SURVEY.md C6–C8, C10, C11,
C14, C16 geometry). Everything here is shape-static, jit-safe jnp; the Pallas
fast paths live in ``tpudet.kernels`` and are tested against these.

``nms`` and ``roi_align`` name both a submodule and its main function; at the
package level the *submodules* win (``tpudet.ops.nms.nms(...)``) to keep
imports unambiguous.
"""

from tpudet.ops.boxes import (  # noqa: F401
    area,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    flip_boxes_horizontal,
    pairwise_iou,
)
from tpudet.ops.anchors import generate_anchors, generate_fpn_anchors  # noqa: F401
from tpudet.ops.nms import batched_nms  # noqa: F401
from tpudet.ops.matchers import match_boxes  # noqa: F401
from tpudet.ops.samplers import sample_balanced  # noqa: F401
from tpudet.ops.roi_align import crop_and_resize  # noqa: F401
from tpudet.ops.selection import blocked_top_k  # noqa: F401
from tpudet.ops.hungarian import hungarian  # noqa: F401

# Restore submodule bindings shadowed by same-named functions.
from tpudet.ops import nms, roi_align  # noqa: F401,E402
from tpudet.ops import anchors, boxes, matchers, samplers  # noqa: F401,E402
