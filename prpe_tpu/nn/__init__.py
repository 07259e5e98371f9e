from prpe_tpu.nn import adapters, common, irnet, resnet, vit, yolo

__all__ = ["adapters", "common", "irnet", "resnet", "vit", "yolo"]
