"""Persistent XLA compilation-cache setup (shared by the CLI and bench).
Extracted from train/loop.py (r5 hygiene)."""

from __future__ import annotations

import os
import sys

from .logging import get_logger

log = get_logger(__name__)


def configure_compile_cache(args=None) -> None:
    """Enable JAX's persistent XLA compilation cache on non-CPU platforms.

    Skips the 20-40 s first-compile on every process (the step program is
    stable across runs of one schema) and pins ONE compiled program where
    the compiler is run-to-run nondeterministic — the whole-step timing on
    this TPU measures bimodal between processes (CLAUDE.md); a shared
    cache freezes whichever compilation was cached first. `--fwt_compile_cache
    off` (or FWT_COMPILE_CACHE=off) disables; CPU runs (tests) never cache.
    The platform must be KNOWN non-CPU before backend init (an init here
    would defeat bench.py's host-only-first wedge ordering), so pure-auto
    environments with no JAX_PLATFORMS hint skip the default — pass
    --fwt_compile_cache DIR explicitly there. jax itself is only imported
    when the cache actually engages (the native predict path must stay
    jax-free, see the lazy-import note at the top of this module)."""
    cache_dir = getattr(args, "fwt_compile_cache", None) if args else None
    if cache_dir is None:
        cache_dir = os.environ.get("FWT_COMPILE_CACHE")
    if cache_dir == "off":
        return
    explicit = cache_dir is not None
    platform = getattr(args, "fwt_platform", None) if args else None
    if platform is None:
        platform = ""
        if "jax" in sys.modules:  # in-process config (tests) wins over env
            platform = sys.modules["jax"].config.jax_platforms or ""
        platform = platform or os.environ.get("JAX_PLATFORMS") or ""
    # the platform string can be a priority list ("axon,cpu" from the site
    # hook: cpu is only the FALLBACK) — judge by the first entry, not by
    # substring ("cpu" in "axon,cpu" kept the cache off on every device
    # run until r4)
    plats = [p.strip() for p in str(platform).split(",") if p.strip()]
    if (plats and plats[0] == "cpu") or (not plats and not explicit):
        return
    if cache_dir is None:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "fwt_xla")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError) as e:  # pragma: no cover
        log.warning("compilation cache disabled: %s", e)


