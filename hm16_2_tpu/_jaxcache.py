"""Persistent XLA compilation cache setup (imported lazily by modules that
jit).  Avoids recompiling the analysis kernels in every process."""

import os

_done = False


def ensure_cache():
    global _done
    if _done:
        return
    _done = True
    try:
        import jax
        d = os.environ.get("HM16_JAX_CACHE",
                           os.path.expanduser("~/.cache/hm16_jax"))
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
