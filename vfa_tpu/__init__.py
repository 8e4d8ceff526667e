"""vfa_tpu — TPU-native multiview voxelized-feature-aggregation detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Jiahao-Ma/VFA
(multiview 3D/2D detection via per-camera CNN features projected into a shared
BEV voxel grid, CenterNet-style heads). Reference behavior is documented per
module with `/root/reference` file:line citations; the implementation is
TPU-first: NHWC convs on the MXU, the voxel projection vmapped/fused instead of
per-camera Python loops, jax.sharding meshes instead of a single-device loop,
and a pure-JAX rotated-IoU eval stack instead of CUDA/MATLAB.
"""

__version__ = "0.1.0"

from vfa_tpu.config import mc_opts, mx_opts, wt_opts, DatasetConfig  # noqa: F401
