"""ygz_tpu — a TPU-native visual(-inertial) SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
ORB-YGZ-SLAM (reference: /root/reference, C++/SSE, 4-thread CPU design):
mono/stereo/RGB-D feature SLAM + SVO-style sparse direct tracking + IMU
preintegration / VIO.

Design stance (see SURVEY.md §7):
  * Map state is struct-of-arrays with fixed capacities + validity masks,
    not pointer graphs; all numerics are pure jitted functions.
  * Front-end (pyramid, FAST, BRIEF, patch alignment, matching) is batched
    over points/tiles; descriptors matched via an MXU-friendly ±1 matmul.
  * Bundle adjustment is batched Gauss-Newton with dense-block Schur
    complement; distributed BA shards observations over a jax Mesh.
"""

__version__ = "0.1.0"
