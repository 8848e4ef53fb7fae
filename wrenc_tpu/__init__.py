"""wrenc-tpu: a TPU-native H.266/VVC all-intra encoder framework.

Capability parity target: hjmkt/wrenc (see SURVEY.md). Architecture is
TPU-first (JAX/XLA/Pallas/pjit for the compute path, batched wavefront RD
search, per-CTU-row wavefront CABAC) rather than a port.
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache: first compiles of the search
    kernels are expensive (minutes with a remote-compile TPU backend);
    caching them makes fresh processes start hot. Opt out with
    WRENC_TPU_NO_JAX_CACHE=1; override location with JAX_COMPILATION_CACHE_DIR
    or WRENC_TPU_JAX_CACHE_DIR."""
    import os
    if os.environ.get("WRENC_TPU_NO_JAX_CACHE"):
        return
    try:
        import jax
        path = (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or os.environ.get("WRENC_TPU_JAX_CACHE_DIR")
                or os.path.expanduser("~/.cache/wrenc_tpu/jax"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def _apply_platform_override():
    """Honor WRENC_JAX_PLATFORM=cpu|tpu|... at package import. In this
    environment JAX_PLATFORMS alone does not reliably stick for fresh
    processes (the axon PJRT plugin registers regardless); calling
    jax.config.update before any backend is initialized does."""
    import os
    plat = os.environ.get("WRENC_JAX_PLATFORM")
    if not plat:
        return
    try:
        import jax
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


_enable_compilation_cache()
_apply_platform_override()
