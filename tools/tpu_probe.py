#!/usr/bin/env python
"""Patient TPU-tunnel recovery probe.

Round-3 postmortem: the axon tunnel's backend init either hangs
indefinitely or raises UNAVAILABLE during an outage, and killing a
process that holds the tunnel can wedge the remote helpers.  This
probe therefore (a) bounds each attempt with an IN-PROCESS watchdog
(os._exit from a daemon thread — never an external kill), (b) sleeps
between attempts, and (c) writes machine-readable status to
/tmp/tpu_probe_status.json after every attempt so another session can
watch progress without touching the tunnel.

Usage: python tools/tpu_probe.py [max_attempts]
Exits 0 the first time a tiny jit+fetch round-trip succeeds on the
real device; exits 7 after max_attempts failures.
"""
import json
import os
import subprocess
import sys
import time

STATUS = "/tmp/tpu_probe_status.json"
CHILD = r"""
import os, threading, time
def _die():
    os._exit(43)   # internal watchdog: bound a wedged init w/o external kill
t = threading.Timer(1500.0, _die)
t.daemon = True
t.start()
t0 = time.time()
import jax, jax.numpy as jnp
devs = jax.devices()
init_s = time.time() - t0
t1 = time.time()
x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256), jnp.bfloat16))
y = float(x)   # D2H fetch — proves the transfer path, not just init
rt_s = time.time() - t1
print(f"PROBE_OK platform={devs[0].platform} init_s={init_s:.1f} "
      f"roundtrip_s={rt_s:.1f} val={y}", flush=True)
"""


def write_status(rec):
    rec["time"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(STATUS, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    max_attempts = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    for attempt in range(1, max_attempts + 1):
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c", CHILD], capture_output=True,
                text=True, timeout=1800)
            tail = (out.stdout + out.stderr).strip().splitlines()[-3:]
            ok = out.returncode == 0 and "PROBE_OK" in out.stdout
        except subprocess.TimeoutExpired:
            tail, ok = ["(outer 1800s timeout)"], False
        dur = time.time() - t0
        write_status({"attempt": attempt, "ok": ok,
                      "dur_s": round(dur, 1), "tail": tail})
        print(f"[probe] attempt {attempt}: ok={ok} dur={dur:.0f}s "
              f"{tail[-1] if tail else ''}", flush=True)
        if ok:
            return 0
        # Natural-error attempts can take ~25 min through the tunnel;
        # don't hammer a dead backend.
        time.sleep(300)
    return 7


if __name__ == "__main__":
    sys.exit(main())
