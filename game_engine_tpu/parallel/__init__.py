"""Device mesh, shardings, and multi-chip rollout/training."""
