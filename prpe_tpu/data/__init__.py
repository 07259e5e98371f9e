from prpe_tpu.data import detection, faces, pipeline, pose, synthetic

__all__ = ["detection", "faces", "pipeline", "pose", "synthetic"]
