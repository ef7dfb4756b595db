"""raytracer_tpu — a TPU-native rebuild of JoaquinRodriguezph/ray-tracer-v1.

A from-scratch JAX/XLA/Pallas framework with the reference's full capability
surface: sphere-scene Whitted ray tracing, stochastic path tracing, the
ray-tracing RL environment, PPO/SAC/tabular-Q learned samplers, and the
Forward-Backward (FB) representation-learning track — all redesigned as
batched wavefront computation over device meshes instead of per-pixel Python
recursion.
"""

__version__ = "0.1.0"
