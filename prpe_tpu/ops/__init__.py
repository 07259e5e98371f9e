from prpe_tpu.ops import anchors, assigner, boxes, heatmap, losses, margin, nms

__all__ = ["anchors", "assigner", "boxes", "heatmap", "losses", "margin", "nms"]
