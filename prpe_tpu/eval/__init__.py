from prpe_tpu.eval import keypoint_eval, map as map_eval, verification

__all__ = ["keypoint_eval", "map_eval", "verification"]
