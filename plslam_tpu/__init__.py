"""plslam_tpu — TPU-native point-and-line RGB-D visual SLAM.

A ground-up re-design of the capabilities of
``wolfcanli/ORB_SLAM2_Modification_with-point-and-line-feature`` (a C++
ORB-SLAM2 fork with LSD/LBD line features) as an idiomatic JAX/XLA/Pallas
framework for TPU:

- perception (ORB pyramid extraction, line segment detection, binary
  descriptors) as batched array programs / Pallas kernels,
- data association (point + line matching) as batched popcount/gating
  kernels,
- state estimation (pose optimization, local/global bundle adjustment,
  Sim3 pose graph) as jitted Levenberg–Marquardt with Schur complement,
- the reference's three pthreads (Tracking / LocalMapping / LoopClosing)
  re-expressed as sequential or sharded batch passes over fixed-capacity,
  mask-padded state.

Layer map (mirrors SURVEY.md §1 of the reference):
  models/    pipeline stages + map model (Frame, Map arenas, Tracking,
             LocalMapping, LoopClosing, PointCloudMapping, System facade)
  ops/       perception & association kernels (pyramid, FAST, ORB, LSD,
             LBD, Hamming matching, line matching)
  optim/     optimizers replacing g2o (pose LM, Schur BA, Sim3 graph)
  geometry/  SE3/Sim3/projection/Plücker primitives
  bow/       bag-of-binary-words vocabulary + keyframe database
  parallel/  device mesh, sharded matching + distributed BA
  utils/     config, TUM dataset IO, trajectory/PCD writers, metrics
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/optimization math is small-matrix and precision-sensitive (3x3
# rotations, 6x6 normal equations, chi² gates): default all matmuls to f32
# accumulation. FLOP-heavy kernels (descriptor matmuls, image convs) opt into
# lower precision explicitly where profitable.
_jax.config.update("jax_default_matmul_precision", "float32")
del _jax
