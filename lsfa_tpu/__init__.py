"""lsfa_tpu — TPU-native long/short-term feature aggregation video object detection.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of hustvl/LSFA
(real-time object detection in compressed video): R-FCN detection with a
ResNet backbone, FlowNet-guided long-term key-frame aggregation, and
compressed-domain (motion-vector + residual) short-term propagation.

Design stance (TPU-first, not a port):
  * functional flax models, pjit/shard_map data parallelism over a Mesh
  * fixed-shape programs: padded images, fixed-size top-k/masked NMS,
    fixed-size ROI sampling — no dynamic shapes under jit
  * feature-propagation primitives (bilinear warp, PSROIPooling) as
    XLA-native gather/scan formulations with Pallas kernels for hot paths
  * the key-frame feature cache is device-resident recurrent state

Reference behavior documented against /root/reference (hustvl/LSFA) with
file:line citations in docstrings. No reference code is copied.
"""

__version__ = "0.1.0"

from lsfa_tpu.config import get_default_config, load_config  # noqa: F401
