"""Per-user, per-machine persistent XLA compile cache.

The chain/serving graphs are compile-heavy (tens of seconds for the large
fused scans); every entry point that re-runs them (bench, CLI, tools,
tests) shares one persistent cache so recompiles are paid once per
machine. The directory is per-user by default — a fixed world-writable
path would let another local user pre-create the directory and plant
poisoned cache entries — and overridable via ``AUDIOFORGE_JAX_CACHE``.

The cache is strictly an optimisation layer, so it must never be able to
take a tool or the test suite down:

* **Kill switch.** ``AUDIOFORGE_JAX_CACHE=off`` (also ``0``/``none``/
  ``disabled``) or ``AUDIOFORGE_NO_COMPILE_CACHE=1`` makes
  :func:`enable_compile_cache` a no-op everywhere.
* **Per-machine directories.** Cache entries hold AOT-compiled machine
  code; loading artifacts produced on a different CPU can fail at best
  and SIGILL at worst (XLA warns exactly that). The resolved directory
  therefore always ends in a fingerprint of this machine's platform and
  CPU model, so a cache directory shared between hosts (rsync'd repos,
  network homes) never cross-loads artifacts.
* **Serializer probe.** Some jaxlib builds crash (SIGSEGV) inside
  ``put_executable_and_time`` when writing cache entries. A crash signal
  cannot be caught in-process, so before the cache is first enabled on a
  machine a tiny sacrificial subprocess compiles a function with the
  cache pointed at the target directory and min-compile-time 0. Only if
  the probe exits cleanly *and* produced a cache file is the cache
  enabled; the verdict is remembered in a marker file so the probe runs
  once per directory, not once per process.
"""

from __future__ import annotations

import getpass
import hashlib
import os
import platform
import subprocess
import sys
import tempfile

__all__ = [
    "cache_disabled",
    "compile_cache_dir",
    "enable_compile_cache",
    "machine_fingerprint",
]

_DISABLED_VALUES = frozenset({"off", "0", "none", "disabled", "false"})
_OK_MARKER = ".serializer-ok"
_BAD_MARKER = ".serializer-bad"
_PROBE_TIMEOUT_S = 120.0


def cache_disabled() -> bool:
    """True when the user asked for no persistent compile cache."""
    if os.environ.get("AUDIOFORGE_NO_COMPILE_CACHE", "").strip().lower() in (
        "1",
        "true",
        "yes",
        "on",
    ):
        return True
    env = os.environ.get("AUDIOFORGE_JAX_CACHE", "").strip().lower()
    return env in _DISABLED_VALUES if env else False


def machine_fingerprint() -> str:
    """Short stable fingerprint of this machine's CPU/platform, used to
    keep AOT artifacts from being loaded on a different machine."""
    parts = [platform.system(), platform.machine(), platform.processor() or ""]
    try:
        with open("/proc/cpuinfo", "r", encoding="utf-8", errors="replace") as fh:
            for line in fh:
                if line.lower().startswith(("model name", "hardware", "cpu model")):
                    parts.append(line.split(":", 1)[-1].strip())
                    break
    except OSError:
        pass
    digest = hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]
    return f"m-{digest}"


def compile_cache_dir() -> str:
    """Resolve the cache directory: ``AUDIOFORGE_JAX_CACHE`` env wins;
    otherwise ``$XDG_CACHE_HOME/audioforge/jax`` (or ``~/.cache/...``)
    when a home directory exists, else a uid-suffixed tempdir. The
    machine fingerprint is always appended (entries are per-machine)."""
    env = os.environ.get("AUDIOFORGE_JAX_CACHE")
    if env and env.strip().lower() not in _DISABLED_VALUES:
        base = env
    else:
        xdg = os.environ.get("XDG_CACHE_HOME")
        home = os.path.expanduser("~")
        if xdg:
            base = os.path.join(xdg, "audioforge", "jax")
        elif home and home != "~" and os.path.isdir(home):
            base = os.path.join(home, ".cache", "audioforge", "jax")
        else:
            try:
                tag = f"uid{os.getuid()}"
            except AttributeError:  # non-posix
                tag = getpass.getuser() or "user"
            base = os.path.join(tempfile.gettempdir(), f"audioforge_jax_{tag}")
    return os.path.join(base, machine_fingerprint())


# The probe compiles one trivial function with the persistent cache forced
# on (min compile time 0 so even the trivial graph is written) and then
# requires that at least one cache file actually landed. A serializer that
# segfaults kills only this subprocess.
_PROBE_SCRIPT = r"""
import os, sys
path = sys.argv[1]
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("AUDIOFORGE_JAX_CACHE", None)
os.environ.pop("AUDIOFORGE_NO_COMPILE_CACHE", None)
# the sharded-executable serializer is a separate code path that can
# crash where the single-device one works (observed: SIGSEGV writing a
# mesh-sharded executable while trivial programs cached fine), so the
# probe exercises BOTH on a virtual multi-device mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", path)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
fn = jax.jit(lambda x: jnp.tanh(x) * 2.0 + jnp.sum(x))
fn(np.ones((64,), np.float32)).block_until_ready()
devs = jax.devices()
if len(devs) >= 2:
    from jax.sharding import Mesh, NamedSharding, PartitionSpec
    mesh = Mesh(np.asarray(devs[:2]), ("s",))
    sharding = NamedSharding(mesh, PartitionSpec("s"))
    xs = jax.device_put(np.ones((2, 64), np.float32), sharding)
    sfn = jax.jit(lambda x: jnp.tanh(x) * 0.5 + 1.0,
                  out_shardings=sharding)
    jax.block_until_ready(sfn(xs))
names = [n for n in os.listdir(path) if not n.startswith(".")]
sys.exit(0 if names else 3)
"""


def _probe_serializer(path: str) -> bool:
    """Run the sacrificial cache-write probe. Returns True only on a clean
    exit with a cache entry written. Any crash, nonzero exit, or timeout
    counts as a broken serializer."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Never let the probe inherit a platform pin that needs a live tunnel.
    env.setdefault("AUDIOFORGE_PLATFORM", "cpu")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SCRIPT, path],
            env=env,
            timeout=_PROBE_TIMEOUT_S,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
    except (subprocess.TimeoutExpired, OSError):
        return False
    return proc.returncode == 0


def enable_compile_cache(min_compile_seconds: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at the per-user,
    per-machine directory — unless disabled or the machine's serializer
    fails the crash probe. Returns the directory, or ``""`` when the
    cache stays off. Safe to call repeatedly and before/after backend
    init."""
    if cache_disabled():
        return ""
    import jax

    path = compile_cache_dir()
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return ""
    ok_marker = os.path.join(path, _OK_MARKER)
    bad_marker = os.path.join(path, _BAD_MARKER)
    if os.path.exists(bad_marker):
        return ""
    if not os.path.exists(ok_marker):
        if _probe_serializer(path):
            _touch(ok_marker)
        else:
            _touch(bad_marker)
            return ""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_seconds),
    )
    return path


def _touch(path: str) -> None:
    try:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write("")
    except OSError:
        pass
