from prpe_tpu.data import detection, faces, loader, packed, pipeline, pose, synthetic

__all__ = ["detection", "faces", "loader", "packed", "pipeline", "pose", "synthetic"]
