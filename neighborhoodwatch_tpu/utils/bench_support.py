"""Remote-tunnel-aware timing helpers for benchmarks.

This harness reaches its TPU through a multiplexed relay that DEGRADES to
KB/s for 10-25 minutes after tens of GB of transfers (measured; see the
verify skill's tunnel-health notes). A benchmark that syncs inside such a
window records the LINK, not the engine — one degraded scalar roundtrip
once inflated the kNN headline 0.55 -> 0.86 s/call. These helpers hold the
measured mitigation discipline so `bench.py` can read as a benchmark again
(VERDICT r3 weak #6):

- sync by fetching a 4-byte device-computed reduction of a REAL compute
  output — never the full array (bills the link) and never bare
  `block_until_ready` (remote transports short-circuit it from the local
  send buffer);
- gate every timed region on a healthy scalar roundtrip (`tunnel_gate`);
- re-measure a region whose CLOSING sync landed in a degraded window
  (`with_tunnel_retry`).

On a local TPU-VM every gate passes instantly and the helpers are inert.
"""

import sys
import time


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def tunnel_gate(sync, probe, where="", max_wait_s=1500, healthy_s=2.0):
    """Wait out a degraded remote-device tunnel before a timed region.

    Fetches a 4-byte device-computed reduction of `probe` via `sync` and
    requires the roundtrip under `healthy_s` (healthy: ~0.4s through the
    tunnel, ~1ms on a local TPU-VM), sleeping 60s between probes up to
    `max_wait_s`, then proceeding with a loud warning so a permanently-slow
    link never deadlocks the bench. Returns the last measured roundtrip
    seconds."""
    waited = 0
    while True:
        t0 = time.perf_counter()
        _ = float(sync(probe))
        rt = time.perf_counter() - t0
        if rt <= healthy_s:
            return rt
        if waited >= max_wait_s:
            log(f"tunnel STILL degraded after {waited}s waiting (scalar "
                f"roundtrip {rt:.1f}s) {where} — proceeding; timings may "
                f"be link-inflated")
            return rt
        log(f"tunnel degraded (scalar roundtrip {rt:.1f}s) {where}; "
            f"waiting 60s")
        time.sleep(60)
        waited += 60


def with_tunnel_retry(measure, sync, probe, label, attempts=3,
                      healthy_s=2.0):
    """Run `measure()` (a timed region returning its measurement), gated on
    a healthy tunnel before AND validated after: if the closing scalar
    roundtrip is degraded the measurement billed the link, so it re-runs
    (up to `attempts`). Returns the last measurement."""
    value = None
    for _attempt in range(attempts):
        tunnel_gate(sync, probe, f"before {label}")
        value = measure()
        t0 = time.perf_counter()
        _ = float(sync(probe))
        if time.perf_counter() - t0 <= healthy_s:
            return value
        log(f"{label} closed on a degraded tunnel; re-measuring")
    return value


def measure_latency(run, sync_out, iters):
    """Median per-call latency: dispatch + 4-byte sync each iteration (each
    sync pays one tunnel roundtrip on a remote-attached device). `run()`
    returns the output to sync on via `sync_out(out)`. Returns
    (median_s, times)."""
    import numpy as np
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = run()
        sync_out(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), times


def measure_pipelined(run, sync_out, iters):
    """Steady-state s/call: `iters` back-to-back async dispatches, ONE
    closing sync (the device executes enqueued programs in order, so
    reading the last output waits for all) — how the engines run in
    production with a full dispatch queue. Through a remote tunnel this is
    the only timing that excludes the per-call host<->device roundtrip; on
    a local TPU-VM it coincides with the latency measurement."""
    t0 = time.perf_counter()
    outs = [run() for _ in range(iters)]
    sync_out(outs[-1])
    return (time.perf_counter() - t0) / iters
