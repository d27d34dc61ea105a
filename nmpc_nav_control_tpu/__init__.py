"""nmpc_nav_control_tpu — a TPU-native NMPC engine for wheeled-robot
navigation, built from scratch in JAX/XLA/Pallas.

Provides the capabilities of the reference ROS package
``JorgeDFR/nmpc_nav_control`` (pose-goal + parametric path-following NMPC for
diff / omni4 / tric steering geometries) with the entire numerical stack —
RK4 rollout + sensitivities, Gauss-Newton RTI-SQP linearization, Riccati
factorization, box-constrained interior-point QP — as jitted JAX kernels that
batch thousands of scenarios per chip and shard across TPU meshes.

See SURVEY.md for the structural analysis of the reference and BASELINE.md
for targets.
"""

__version__ = "0.1.0"
