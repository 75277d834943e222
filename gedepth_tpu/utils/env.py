"""Environment fingerprint logged at train start (reference
depth/utils/collect_env.py role)."""
from __future__ import annotations

import platform
import sys


def collect_env() -> dict:
    info = {
        "python": sys.version.replace("\n", " "),
        "platform": platform.platform(),
    }
    try:
        import jax
        info["jax"] = jax.__version__
        info["jax_backend"] = jax.default_backend()
        info["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:  # pragma: no cover
        info["jax"] = f"unavailable: {e}"
    for mod in ("flax", "optax", "numpy"):
        try:
            info[mod] = __import__(mod).__version__
        except Exception:
            pass
    return info
