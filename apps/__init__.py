"""CLI apps (console entry points declared in pyproject.toml)."""
