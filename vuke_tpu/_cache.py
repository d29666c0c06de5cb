"""Persistent-compile-cache activation that works on this image.

The image's sitecustomize preimports jax before any user code runs, so the
usual ``JAX_COMPILATION_CACHE_DIR`` env vars are read *too early* and
silently do nothing — ``jax.config.update`` after import is the only way
the cache actually engages (round 1 shipped with the env-var approach and
every process paid full Mosaic recompiles).
"""

import os

# Lives inside the repo (gitignored): /tmp is wiped across machine restarts
# and a cold cache costs minutes of Mosaic recompiles per program.  Cache
# entries are keyed by computation hash, not path, so dirs are mergeable.
_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_CACHE_DIR = os.environ.get("VUKE_JAX_CACHE_DIR",
                                   os.path.join(_REPO_DIR, ".jax_cache"))

_done = False


def enable_compile_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass
    except Exception:
        pass
