"""Per-user persistent XLA compile cache.

The chain/serving graphs are compile-heavy (tens of seconds for the large
fused scans); every entry point that re-runs them (bench, CLI, tools,
tests) shares one persistent cache so recompiles are paid once per
machine. The directory is per-user by default — a fixed world-writable
path would let another local user pre-create the directory and plant
poisoned cache entries — and overridable via ``AUDIOFORGE_JAX_CACHE``.
"""

from __future__ import annotations

import getpass
import os
import tempfile

__all__ = ["compile_cache_dir", "enable_compile_cache"]


def compile_cache_dir() -> str:
    """Resolve the cache directory: ``AUDIOFORGE_JAX_CACHE`` env wins;
    otherwise ``$XDG_CACHE_HOME/audioforge/jax`` (or ``~/.cache/...``)
    when a home directory exists, else a uid-suffixed tempdir."""
    env = os.environ.get("AUDIOFORGE_JAX_CACHE")
    if env:
        return env
    xdg = os.environ.get("XDG_CACHE_HOME")
    home = os.path.expanduser("~")
    if xdg:
        return os.path.join(xdg, "audioforge", "jax")
    if home and home != "~" and os.path.isdir(home):
        return os.path.join(home, ".cache", "audioforge", "jax")
    try:
        tag = f"uid{os.getuid()}"
    except AttributeError:  # non-posix
        tag = getpass.getuser() or "user"
    return os.path.join(tempfile.gettempdir(), f"audioforge_jax_{tag}")


def enable_compile_cache(min_compile_seconds: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at the per-user directory.
    Safe to call repeatedly and before/after backend init."""
    import jax

    path = compile_cache_dir()
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_seconds),
    )
    return path
