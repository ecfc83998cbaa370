"""Shim: the TPU health probe moved into the package so the unified CLI
can route it (``python -m srgan_st_tpu doctor``). This path keeps the
documented ``python tools/tpu_health.py`` invocation working."""

from srgan_st_tpu.utils.tpu_health import diagnose, main, probe  # noqa: F401

if __name__ == "__main__":
    main()
