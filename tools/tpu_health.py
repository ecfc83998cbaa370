"""Shim: the TPU health probe moved into the package so the unified CLI
can route it (``python -m srgan_st_tpu doctor``). This path keeps the
documented ``python tools/tpu_health.py`` invocation working — including
standalone in a broken environment (no PYTHONPATH), which is exactly when
a wedge-diagnosis tool gets reached for."""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from srgan_st_tpu.utils.tpu_health import diagnose, main, probe  # noqa: E402,F401

if __name__ == "__main__":
    main()
