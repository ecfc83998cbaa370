"""TPU health probe (srgan_st_tpu.utils.tpu_health) wedge diagnosis (pure logic; no device claims)."""

from srgan_st_tpu.utils.tpu_health import diagnose


def _ok(claim_s=3.0, jit_s=0.5):
    return {"ok": True, "claim_s": claim_s, "jit_s": jit_s, "error": None}

def _fail(claim_s):
    return {"ok": False, "claim_s": claim_s, "jit_s": None,
            "error": "RuntimeError: UNAVAILABLE"}


def test_healthy_chip():
    assert diagnose([_ok()]).startswith("USABLE (")

def test_slow_claim_flags_draining_compile_queue():
    assert "slow claim" in diagnose([_ok(claim_s=300.0)])

def test_constant_long_failures_diagnose_wedge():
    # the observed signature: repeated failures at a constant ~1502 s
    v = diagnose([_fail(1505.0), _fail(1501.0), _fail(1502.0)])
    assert v.startswith("WEDGED")
    assert "Do NOT retry" in v

def test_single_long_failure_advises_quiet_reprobe():
    v = diagnose([_fail(1502.0)])
    assert v.startswith("UNAVAILABLE")
    assert "quiet period" in v

def test_fast_failure_reports_error_verbatim():
    v = diagnose([_fail(2.0)])
    assert "RuntimeError" in v

def test_varying_failure_times_not_called_wedge():
    # spread > 30 s across attempts: load/transient, not the session lock
    v = diagnose([_fail(700.0), _fail(1400.0)])
    assert not v.startswith("WEDGED")

def test_interrupted_probe_excluded_from_wedge_heuristic():
    # probe 2's timing is the user's Ctrl-C reaction time, not a server
    # constant: it must not corroborate (or fabricate) a WEDGED verdict
    interrupted = dict(_fail(1480.0), error="KeyboardInterrupt",
                       interrupted=True)
    v = diagnose([_fail(1500.0), interrupted])
    assert not v.startswith("WEDGED")
    assert v.startswith("UNAVAILABLE")
