from prpe_tpu.infer.cascade import CascadeModel, CascadeResult, build_cascade_runner

__all__ = ["CascadeModel", "CascadeResult", "build_cascade_runner"]
