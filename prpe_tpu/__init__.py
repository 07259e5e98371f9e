"""prpe_tpu — a TPU-native multi-task person-recognition / pose-estimation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
"Person-Recognition-for-Pose-Estimation" codebase: a shared ResNet-50 trunk
feeding four task branches (YOLOv11 person detection, YOLOv11 face detection,
AdaFace IR-50 identity embedding, ViTPose-B pose estimation), trained with a
round-robin multi-task loop and served as a detect -> recognize -> pose gated
cascade that runs entirely on-device.

Design stance (TPU-first, not a port):
  * models are pure functions over parameter pytrees (flax.linen), NHWC layout
  * every post-processing step the reference runs on host / in torchvision
    C++ kernels (NMS, heatmap decode, identity gating) is a fixed-shape
    on-device jnp/Pallas op inside one jitted program
  * parallelism is a `jax.sharding.Mesh` + sharding annotations from day one:
    the reference's DDP/NCCL path maps to a `data` mesh axis (psum grads,
    global batch-norm stats come for free under jit), and the 85k-class
    AdaFace classifier shards over a `model` axis
  * bf16 compute policy on TPU; fp32 params
"""

__version__ = "0.1.0"
