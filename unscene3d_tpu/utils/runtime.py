"""Runtime utilities: compilation cache, timers.

The reference's hand-rolled timers live at utils/utils.py:353-415; here a
minimal equivalent plus JAX persistent-compilation-cache setup (first TPU
compile of the full model is ~minutes; cached reloads are seconds).
"""

from __future__ import annotations

import os
import time


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get("UNSCENE3D_JAX_CACHE", "/tmp/unscene3d_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # make the host CPU backend available next to the TPU plugin so cheap
    # one-shot work (param init) can compile on CPU instead of paying a
    # second multi-minute TPU compile. NEVER override an explicit
    # jax_platforms config (e.g. the test suite forcing 'cpu').
    try:
        import os as _os

        current = jax.config.jax_platforms
        if current is None or current == "":
            plats = _os.environ.get("JAX_PLATFORMS", "")
            if plats and "cpu" not in plats:
                jax.config.update("jax_platforms", plats + ",cpu")
        elif "cpu" not in current and current:
            jax.config.update("jax_platforms", current + ",cpu")
    except Exception:
        pass


def init_on_cpu(init_fn, *args, **kwargs):
    """Run a flax init on the host CPU backend and transfer the result to the
    default (TPU) device; avoids compiling the full model twice on TPU."""
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return init_fn(*args, **kwargs)
    from unscene3d_tpu.ops.csr_conv import gather_fallback

    with jax.default_device(cpu), gather_fallback():
        variables = init_fn(*args, **kwargs)
    default = jax.devices()[0]
    if default.platform == "cpu":
        return variables
    return jax.tree.map(lambda x: jax.device_put(x, default), variables)


class Timer:
    """Accumulating timer (reference utils/utils.py Timer/AverageMeter)."""

    def __init__(self):
        self.total = 0.0
        self.calls = 0
        self._t0 = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self.total += dt
        self.calls += 1
        return dt

    @property
    def average(self) -> float:
        return self.total / max(self.calls, 1)

    def __enter__(self):
        self.tic()
        return self

    def __exit__(self, *a):
        self.toc()
