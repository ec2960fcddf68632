"""deepfepe_tpu — a TPU-native deep keypoint camera-pose estimation framework.

Built from scratch in JAX/XLA/Pallas with the full capability surface of the
reference DeepFEPE system (eric-yyjau/pytorch-deepFEPE, IROS 2020):

- SuperPoint-style detector/descriptor frontend (`deepfepe_tpu.frontend`)
- differentiable iterative weighted 8-point fundamental-matrix solver
  (`deepfepe_tpu.models.deepfnet`)
- epipolar / pose losses and the end-to-end training engine
  (`deepfepe_tpu.losses`, `deepfepe_tpu.train`)
- the KITTI/ApolloScape/TUM/EuRoC two-frame data pipeline (`deepfepe_tpu.data`)
- KITTI seq 09/10 visual-odometry evaluation (`deepfepe_tpu.eval`)
- multi-host data-parallel training over a TPU device mesh
  (`deepfepe_tpu.parallel`)

Everything on the compute path is batched, statically shaped, and jit-able;
per-item Python loops in the reference (batched SVDs, pose decomposition,
OpenCV round trips) are replaced by vmapped closed-form JAX and Pallas kernels.
"""

__version__ = "0.1.0"
