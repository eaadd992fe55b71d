"""autoware_vision_pilot_tpu — TPU-native rebuild of the VisionPilot ADAS stack.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
autowarefoundation/autoware_vision_pilot: the model zoo (SceneSeg, Scene3D,
DomainSeg, EgoLanes, AutoSpeed, AutoSteer, AutoDrive + Lite variants), the
real-time perception runtime (lane filtering/tracking, object tracking,
path planning, speed planning, steering/longitudinal control), trainers,
and export/quantization tooling — redesigned TPU-first:

- compute path: jitted JAX forwards in NHWC bf16, Pallas kernels for fused
  pre/post-processing, XLA collectives over `jax.sharding.Mesh` for scale;
- runtime path: a host pipeline that keeps frames device-resident and
  double-buffers host<->HBM transfers.
"""

__version__ = "0.1.0"
