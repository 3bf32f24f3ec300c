"""PointRCNN-TPU: a TPU-native (JAX/XLA/Pallas) two-stage LiDAR 3D detector framework.

Re-designed from scratch with the capabilities of sshaoshuai/PointRCNN:
PointNet++ RPN over raw point clouds + canonical RoI refinement, KITTI data
pipeline, bin-based box codec, training/eval tooling and the official KITTI
AP metric protocol.
"""

__version__ = "0.1.0"
