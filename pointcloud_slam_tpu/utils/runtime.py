"""Runtime/backend selection helpers for the CLI apps.

The apps run on whatever backend JAX picks (the TPU in production). For
development replay and CI, `--platform cpu` must actually work — and on
images where a TPU plugin force-registers itself and overrides the
JAX_PLATFORMS environment variable, only the in-process config update is
authoritative (see tests/conftest.py). Every app funnels its --platform flag
through here so the rule lives in one place.
"""

from __future__ import annotations


def select_platform(platform: str) -> None:
    """Pin the JAX backend ('' = auto). Call before the first computation."""
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)


def add_platform_arg(parser) -> None:
    parser.add_argument(
        "--platform", default="",
        help="force the JAX backend (e.g. cpu); default: auto (TPU when available)",
    )
