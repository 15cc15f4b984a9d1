"""Pure-JAX / Pallas compute kernels for stereo SLAM."""
