"""Persistent XLA compilation cache.

TPU compiles through the remote tunnel cost 20-40 s each; a disk cache
amortizes them across processes (examples, bench, repeated runs).  Safe to
call unconditionally — harmless on CPU where compiles are cheap.
"""

import os


def enable_persistent_cache(path: str = "~/.cache/fbpr_jax_cache") -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
