"""Cache/output directory resolution (reference: modl/utils/system.py)
plus the persistent XLA compilation-cache hookup (no reference analog —
the reference's compiled code is ahead-of-time Cython; here jit
compilation is a first-run cost worth persisting across processes)."""
import os

__all__ = ["get_cache_dirs", "get_output_dir", "enable_compilation_cache"]

_compilation_cache_dir = [None]


def enable_compilation_cache(cache_dir=None):
    """Point JAX's persistent compilation cache at a directory.

    Resolution chain: ``cache_dir`` arg > ``MODL_JAX_CACHE`` env var >
    ``<first get_cache_dirs() entry>/modl_tpu/jax``. Setting
    ``MODL_JAX_CACHE=''`` disables the cache entirely. Idempotent;
    estimators call this once before their first jit so that cold
    compiles (~90 s for the recsys epoch programs) are paid once per
    machine, not once per process. Returns the active directory, or
    ``None`` when disabled/unavailable.
    """
    if cache_dir is None:
        cache_dir = os.getenv('MODL_JAX_CACHE')
        if cache_dir == '':
            return None
        if cache_dir is None:
            cache_dir = os.path.join(get_cache_dirs()[0], 'modl_tpu', 'jax')
    if _compilation_cache_dir[0] == cache_dir:
        return cache_dir
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # The recsys window program takes ~90 s to compile but any
        # program worth a dispatch is worth caching on this rig.
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception:  # best-effort: never fail a fit over caching
        return None
    _compilation_cache_dir[0] = cache_dir
    return cache_dir


def get_cache_dirs(cache_dir=None):
    """Cache directory chain: arg > SHARED_CACHE > CACHE > ~/cache."""
    paths = []
    if cache_dir is not None:
        paths.extend(cache_dir.split(os.pathsep))
    else:
        global_data = os.getenv('SHARED_CACHE')
        if global_data is not None:
            paths.extend(global_data.split(os.pathsep))
        local_data = os.getenv('CACHE')
        if local_data is not None:
            paths.extend(local_data.split(os.pathsep))
        paths.append(os.path.expanduser('~/cache'))
    return paths


def get_output_dir(data_dir=None):
    """Output directory: arg > MODL_OUTPUT > ~/output/modl."""
    if data_dir is not None:
        return str(data_dir)
    output_dir = os.getenv('MODL_OUTPUT')
    if output_dir is not None:
        return str(output_dir)
    return os.path.expanduser('~/output/modl')
