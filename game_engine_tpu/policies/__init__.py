"""Bot decision policies: scripted (deterministic) and learned heads."""
