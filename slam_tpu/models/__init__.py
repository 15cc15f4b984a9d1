"""Pipeline stages: frontend odometry, track store, bundle adjustment,
pose graph, loop closure."""
