"""Self-play training: PPO over batched rooms."""
