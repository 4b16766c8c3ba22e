"""Pure-functional jittable room engine: GameState pytree + step()."""
