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
        d = os.environ.get("HM16_JAX_CACHE")
        if d is None:
            # key by platform config AND the host CPU feature set:
            # XLA:CPU caches AOT executables specialized to the compile
            # machine's features — loading them on a host with fewer
            # features SIGILL/SEGVs (cpu_aot_loader warns exactly this)
            key = (os.environ.get("JAX_PLATFORMS", "default")
                   + "-" + os.environ.get("XLA_FLAGS", "")).replace("/", "_")
            key = "".join(ch if ch.isalnum() or ch in "-_." else "_"
                          for ch in key)[:80]
            try:
                import hashlib
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        if line.startswith("flags"):
                            key += "-" + hashlib.md5(
                                line.encode()).hexdigest()[:8]
                            break
            except OSError:
                pass
            d = os.path.join(os.path.expanduser("~/.cache/hm16_jax"), key)
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
