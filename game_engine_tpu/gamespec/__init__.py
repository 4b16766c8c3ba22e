"""DSL compiler: YAML game definitions -> typed GameSpec -> compiled IR -> tables."""
