"""TPU health probe: is the chip claimable, and if not, what's wrong?

Operational tool for the failure mode documented in ROUND3.md ("TPU wedge
note"): on pooled/tunneled TPU runtimes (e.g. the axon platform), a client
killed mid-claim or mid-compile leaves a server-side session grant that
expires slowly; until it does, every new client blocks in the claim leg
and then fails UNAVAILABLE after a constant server-side timeout (~25 min
observed). Symptoms and remedies this tool encodes:

- A healthy chip claims + compiles a tiny jit in seconds.
- A constant time-to-failure across attempts (±few s) is a server-side
  claim timeout, i.e. a wedged session lock — NOT load. Retrying in a
  tight loop makes it worse; each killed retry re-arms the lock.
- Remedy: stop ALL clients, wait out the grant expiry, then send ONE
  clean-exit probe (this tool). Never SIGKILL/timeout a probe: a probe
  must exit cleanly even on failure so it doesn't re-arm the wedge.

Usage:
    python tools/tpu_health.py                # one clean probe, verdict
    python tools/tpu_health.py --retries 5 --spacing 120
    python tools/tpu_health.py --json         # machine-readable line
    python tools/tpu_health.py --patient 10800   # hold ONE queued claim 3h

Exit code 0 = chip usable; 1 = unavailable (diagnosis on stdout).
This process never installs signal-based timeouts around the claim: the
claim either completes or fails server-side, and the process exits
cleanly either way (the whole point — see above).

Patient mode (``--patient SECONDS``): the ~25 min constant observed above
is the CLIENT's default claim timeout — a wedged-chip claim sits queued
server-side and gives up, it isn't rejected. Holding one clean queued
claim for hours has ~100% duty cycle on catching the stale grant's
expiry, versus ~10% for spaced 25-min probes. The pooled runtime's
registration hook registers the backend at interpreter startup with the
default timeout (options are fixed for process lifetime), so patient mode
re-execs itself with the hook's trigger env unset and registers the
backend manually with ``claim_timeout_s=SECONDS``. Still ONE clean-exit
client at a time — run it instead of, not alongside, spaced probes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

#: env marker carrying --patient seconds across the re-exec (see
#: module docstring "Patient mode"); presence means "we are the child:
#: register manually before probing".
_PATIENT_ENV = "SRGAN_TPU_HEALTH_PATIENT_S"
#: the sitecustomize trigger env: when set, the pooled runtime's .pth
#: hook already registered the backend at interpreter startup and the
#: claim timeout can no longer be changed in this process.
_POOL_ENV = "PALLAS_AXON_POOL_IPS"


def _patient_bootstrap(claim_timeout_s: int) -> None:
    """Manually register the pooled-TPU backend with a long claim timeout.

    Mirrors the sitecustomize hook's registration call (same topology /
    .so / loopback-relay env) but passes ``claim_timeout_s`` through.
    Must run before the backend initializes; only reachable in a child
    process whose ``_POOL_ENV`` was stripped (else registration already
    happened at startup and re-registering would drift-error).
    """
    import uuid

    os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
    os.environ["AXON_LOOPBACK_RELAY"] = "1"
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    site = os.environ.get("SRGAN_AXON_SITE", "/root/.axon_site")
    if site not in sys.path:
        sys.path.insert(0, site)
    from axon.register import register

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    register(
        None,
        f"{gen}:1x1x1",  # topology stays in slot 2 positionally (hook contract)
        so_path=os.environ.get("SRGAN_AXON_SO", "/opt/axon/libaxon_pjrt.so"),
        session_id=str(uuid.uuid4()),
        remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
        claim_timeout_s=int(claim_timeout_s),
    )


def _reexec_patient(argv: list[str], patient_s: int) -> int:
    """Re-run this module in a child with the startup hook disarmed.

    Returns the child's exit code. The child sees ``_PATIENT_ENV`` and
    bootstraps the backend manually (``_patient_bootstrap``).
    """
    env = dict(os.environ)
    env.pop(_POOL_ENV, None)
    env[_PATIENT_ENV] = str(patient_s)
    cmd = [sys.executable, "-m", "srgan_st_tpu.utils.tpu_health", *argv]
    # the child must find both the package and the runtime site dir
    extra = [p for p in (os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),) if p]
    env["PYTHONPATH"] = os.pathsep.join(
        extra + [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p])
    return subprocess.call(cmd, env=env)


def probe() -> dict:
    """One clean claim attempt. Returns a result dict; never raises."""
    t0 = time.time()
    result = {"ok": False, "claim_s": None, "jit_s": None, "error": None,
              "devices": None}
    try:
        import jax

        devices = jax.devices()
        result["devices"] = [str(d) for d in devices]
        result["claim_s"] = round(time.time() - t0, 1)
        import jax.numpy as jnp

        t1 = time.time()
        y = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 128)))
        y.block_until_ready()
        result["jit_s"] = round(time.time() - t1, 1)
        result["ok"] = True
    except KeyboardInterrupt:
        # The user cancelled mid-claim. Record it so the retry loop STOPS:
        # launching another claim the user will also interrupt is exactly
        # the killed-mid-claim pattern that re-arms the wedge.
        result["claim_s"] = round(time.time() - t0, 1)
        result["error"] = "KeyboardInterrupt"
        result["interrupted"] = True
    except BaseException as e:  # noqa: BLE001 — report anything, exit cleanly
        result["claim_s"] = round(time.time() - t0, 1)
        result["error"] = f"{type(e).__name__}: {e}"
    return result


def diagnose(results: list[dict]) -> str:
    """Human verdict from one or more probe results."""
    last = results[-1]
    if last["ok"]:
        if last["claim_s"] > 120:
            return (
                f"USABLE but slow claim ({last['claim_s']}s): another "
                "client's compile may be draining in the tunnel; expect "
                "serialized compiles until it finishes."
            )
        return f"USABLE (claim {last['claim_s']}s, tiny jit {last['jit_s']}s)"
    # interrupted probes are excluded from the constant-time heuristic:
    # their claim_s is the USER's reaction time, not a server constant
    fails = [r["claim_s"] for r in results
             if not r["ok"] and not r.get("interrupted")]
    if len(fails) >= 2 and max(fails) - min(fails) < 30 and min(fails) > 600:
        return (
            f"WEDGED: {len(fails)} failures at a constant ~{int(sum(fails) / len(fails))}s "
            "= server-side claim timeout (stale session grant). Stop ALL "
            "clients, wait >1h with zero claim attempts, then send ONE "
            "clean probe. Do NOT retry in a loop."
        )
    if fails and fails[-1] > 600:
        return (
            f"UNAVAILABLE after {fails[-1]}s (claim-leg timeout). Likely a "
            "stale session grant from a killed client; re-probe ONCE after "
            "a quiet period rather than looping."
        )
    return f"UNAVAILABLE: {last['error']}"


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Probe TPU claimability with clean-exit clients and "
        "diagnose the pooled-runtime wedge failure mode."
    )
    parser.add_argument("--retries", type=int, default=1,
                        help="max probe attempts (default 1; keep small — "
                        "failed claims are ~25 min each on a wedged chip)")
    parser.add_argument("--spacing", type=float, default=60.0,
                        help="seconds between attempts")
    parser.add_argument("--json", action="store_true",
                        help="emit one JSON line instead of prose")
    parser.add_argument("--patient", type=int, default=None, metavar="SECONDS",
                        help="hold ONE queued claim for this many seconds "
                        "instead of the ~25 min client default (wedge "
                        "recovery; see module docstring). Implies "
                        "--retries 1.")
    args = parser.parse_args(argv)

    if args.patient is not None and _PATIENT_ENV not in os.environ:
        if os.environ.get(_POOL_ENV):
            # options are process-fixed once the startup hook registered
            # the backend — hand off to a clean child (it re-enters main
            # with _PATIENT_ENV set and probes below).
            child_argv = list(argv) if argv is not None else sys.argv[1:]
            sys.exit(_reexec_patient(child_argv, args.patient))
        # no startup hook in play (bare env): bootstrap right here
        os.environ[_PATIENT_ENV] = str(args.patient)
    if _PATIENT_ENV in os.environ:
        args.retries = 1
        _patient_bootstrap(int(os.environ[_PATIENT_ENV]))

    results: list[dict] = []
    for i in range(max(1, args.retries)):
        if i:
            try:
                time.sleep(args.spacing)
            except KeyboardInterrupt:
                # still print the verdict/JSON for the completed probes
                if not args.json:
                    print("interrupted during spacing — stopping", flush=True)
                break
        r = probe()
        results.append(r)
        if not args.json:
            status = "ok" if r["ok"] else f"fail ({r['error']})"
            print(f"probe {i + 1}/{args.retries}: {status} "
                  f"after {r['claim_s']}s", flush=True)
        if r["ok"]:
            break
        if r.get("interrupted"):
            if not args.json:
                print("interrupted by user — stopping (no further claim "
                      "attempts; see module docstring)", flush=True)
            break

    verdict = diagnose(results)
    if args.json:
        print(json.dumps({"ok": results[-1]["ok"], "verdict": verdict,
                          "probes": results}))
    else:
        print(verdict)
    sys.exit(0 if results[-1]["ok"] else 1)


if __name__ == "__main__":
    main()
