"""TPU health probe (srgan_st_tpu.utils.tpu_health) wedge diagnosis (pure logic; no device claims)."""

import os
import sys
import types

from srgan_st_tpu.utils import tpu_health
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


def test_patient_bootstrap_passes_claim_timeout(monkeypatch, tmp_path):
    # --patient plumbs claim_timeout_s into the manual register() call
    # (a fake axon.register stands in; no device is claimed)
    calls = {}
    fake_register_mod = types.ModuleType("axon.register")

    def fake_register(addr, topology=None, **kw):
        calls["addr"] = addr
        calls["topology"] = topology
        calls.update(kw)

    fake_register_mod.register = fake_register
    fake_axon = types.ModuleType("axon")
    fake_axon.register = fake_register_mod
    monkeypatch.setitem(sys.modules, "axon", fake_axon)
    monkeypatch.setitem(sys.modules, "axon.register", fake_register_mod)
    monkeypatch.setenv("SRGAN_AXON_SITE", str(tmp_path))  # keep sys.path clean
    monkeypatch.setenv("PALLAS_AXON_TPU_GEN", "v5e")

    tpu_health._patient_bootstrap(12345)

    assert calls["addr"] is None
    assert calls["topology"] == "v5e:1x1x1"  # slot-2 positional contract
    assert calls["claim_timeout_s"] == 12345
    assert calls["session_id"]  # fresh uuid per client


def test_patient_reexec_strips_pool_env(monkeypatch):
    # the child must start WITHOUT the startup-hook trigger env (so the
    # backend isn't pre-registered with the default timeout) and WITH the
    # marker carrying the requested claim timeout
    seen = {}

    def fake_call(cmd, env=None):
        seen["cmd"] = cmd
        seen["env"] = env
        return 7

    monkeypatch.setattr(tpu_health.subprocess, "call", fake_call)
    monkeypatch.setenv(tpu_health._POOL_ENV, "127.0.0.1")
    rc = tpu_health._reexec_patient(["--patient", "600", "--json"], 600)
    assert rc == 7
    assert tpu_health._POOL_ENV not in seen["env"]
    assert seen["env"][tpu_health._PATIENT_ENV] == "600"
    assert "-m" in seen["cmd"]
    assert "srgan_st_tpu.utils.tpu_health" in seen["cmd"]
    # the package root must be importable in the child
    import srgan_st_tpu
    pkg_root = os.path.dirname(os.path.dirname(srgan_st_tpu.__file__))
    assert pkg_root in seen["env"]["PYTHONPATH"].split(os.pathsep)
