"""Serial, outage-resilient TPU measurement queue.

The round-3/4 measurement campaigns kept re-deriving the same /tmp shell
pattern (STATUS.md sessions 3-6): the TPU service on this host disappears
for hours (jax init hangs ~25 min then raises UNAVAILABLE), only ONE
process may hold the chip, and a timeout-killed chip process wedges the
claim for 10-20 min. This tool versions that discipline:

  probe (cheap, subprocess, bounded) -> run job (bounded) -> log -> next

    python tools/chipqueue.py --queue q.jsonl [--status /tmp/cq_status.jsonl]

Queue file: one JSON object per line
    {"name": "bench", "cmd": "python bench.py", "timeout": 1800}
(`timeout` optional, default 3600; lines starting with # are skipped).

Behavior:
  - waits for the TPU service before EVERY job (tiny-matmul probe in a
    subprocess with its own timeout, retried forever with backoff — an
    outage stalls the queue instead of burning jobs);
  - runs jobs serially under `timeout`, env prepared for chip work
    (PYTHONPATH includes the axon site, persistent XLA compile cache);
  - appends one JSON status line per job (rc, wall seconds, log path) to
    --status and the full output to <logdir>/<name>.log;
  - RESUMABLE: jobs whose name already has an rc=0 status line are
    skipped, so a killed session re-runs only what's missing;
  - after a job times out (rc=124), waits a claim-cooldown before the next
    probe (the stale server-side claim blocks newcomers for 10-20 min).

Probes respect the measurement rules: the probe ends with a real
device->host value fetch (block_until_ready lies on this backend).
"""

import argparse
import json
import os
import subprocess
import sys
import time

PROBE_SRC = r"""
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
d = jax.devices()
a = jnp.ones((256, 256), jnp.bfloat16)
v = float((a @ a).sum())  # un-fakeable device->host fetch
print(f"probe ok {d[0].device_kind} n={len(d)} v={v} t={time.time()-t0:.1f}s")
"""


def _env():
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = [repo]
    axon_site = "/root/.axon_site"
    if os.path.isdir(axon_site):
        parts.append(axon_site)
    if env.get("PYTHONPATH"):
        parts.append(env["PYTHONPATH"])
    env["PYTHONPATH"] = ":".join(parts)
    # /tmp compile cache, matching bench.py: the workspace gets RE-CLONED
    # between sessions (observed 2026-08-20), which wipes a repo-local
    # cache; /tmp survives a re-clone (nothing survives a VM restart —
    # observed 2026-08-19 — either way)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tvqvae_jax_cache")
    os.makedirs(env["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
    return env


def probe(timeout_s: float) -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-u", "-c", PROBE_SRC],
            capture_output=True, text=True, timeout=timeout_s, env=_env(),
        )
        return out.returncode == 0 and "probe ok" in out.stdout
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def wait_for_chip(status_fh, probe_timeout: float, retry_sleep: float,
                  max_wait: float | None):
    """Block until a probe succeeds. A hanging probe attempt completes the
    moment the service recovers, so the effective poll period is
    min(outage remaining, probe_timeout) + retry_sleep."""
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        if probe(probe_timeout):
            if attempt > 1:
                _log(status_fh, {"event": "chip_up",
                                 "waited_s": round(time.time() - t0, 1),
                                 "attempts": attempt})
            return True
        _log(status_fh, {"event": "probe_failed", "attempt": attempt,
                         "waited_s": round(time.time() - t0, 1)})
        if max_wait is not None and time.time() - t0 > max_wait:
            return False
        time.sleep(retry_sleep)


def _log(fh, obj):
    obj = {"t": time.strftime("%Y-%m-%dT%H:%M:%S"), **obj}
    fh.write(json.dumps(obj) + "\n")
    fh.flush()
    print(json.dumps(obj), flush=True)


def load_queue(path: str):
    jobs = []
    with open(path) as f:
        for ln, line in enumerate(f, 1):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            job = json.loads(line)
            if "name" not in job or "cmd" not in job:
                raise SystemExit(f"{path}:{ln}: job needs name and cmd")
            jobs.append(job)
    names = [j["name"] for j in jobs]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise SystemExit(f"duplicate job names: {sorted(dupes)}")
    return jobs


def done_names(status_path: str):
    done = set()
    if os.path.exists(status_path):
        with open(status_path) as f:
            for line in f:
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if obj.get("event") == "job_done" and obj.get("rc") == 0:
                    done.add(obj["name"])
    return done


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Serial outage-resilient TPU measurement queue"
    )
    ap.add_argument("--queue", required=True, help="JSONL job list")
    ap.add_argument("--status", default="/tmp/chipqueue_status.jsonl",
                    help="append-only JSONL status log (also the resume "
                         "record: rc=0 jobs are skipped on re-run)")
    ap.add_argument("--logdir", default="/tmp/chipqueue_logs")
    ap.add_argument("--probe-timeout", type=float, default=1800.0,
                    help="per-probe-attempt bound (outage hangs exceed "
                         "25 min before raising)")
    ap.add_argument("--retry-sleep", type=float, default=120.0)
    ap.add_argument("--max-wait", type=float, default=None,
                    help="give up waiting for the chip after this many "
                         "seconds (default: wait forever)")
    ap.add_argument("--claim-cooldown", type=float, default=300.0,
                    help="sleep after a timed-out job before re-probing "
                         "(stale claims block newcomers 10-20 min; the "
                         "probe loop absorbs the rest)")
    ap.add_argument("--rerun", action="store_true",
                    help="ignore the resume record; run every job")
    args = ap.parse_args(argv)

    jobs = load_queue(args.queue)
    os.makedirs(args.logdir, exist_ok=True)
    skip = set() if args.rerun else done_names(args.status)

    with open(args.status, "a") as status_fh:
        _log(status_fh, {"event": "queue_start", "jobs": len(jobs),
                         "skipping": sorted(skip & {j["name"] for j in jobs})})
        for job in jobs:
            name, cmd = job["name"], job["cmd"]
            budget = float(job.get("timeout", 3600))
            if name in skip:
                continue
            if not wait_for_chip(status_fh, args.probe_timeout,
                                 args.retry_sleep, args.max_wait):
                _log(status_fh, {"event": "gave_up_waiting", "job": name})
                return 2
            log_path = os.path.join(args.logdir, f"{name}.log")
            _log(status_fh, {"event": "job_start", "name": name,
                             "cmd": cmd, "timeout": budget})
            t0 = time.time()
            with open(log_path, "a") as lf:
                lf.write(f"\n===== {time.strftime('%F %T')} {cmd}\n")
                lf.flush()
                try:
                    rc = subprocess.run(
                        cmd, shell=True, stdout=lf, stderr=lf,
                        timeout=budget, env=_env(),
                    ).returncode
                except subprocess.TimeoutExpired:
                    rc = 124
            _log(status_fh, {"event": "job_done", "name": name, "rc": rc,
                             "wall_s": round(time.time() - t0, 1),
                             "log": log_path})
            if rc == 124:
                _log(status_fh, {"event": "claim_cooldown",
                                 "sleep_s": args.claim_cooldown})
                time.sleep(args.claim_cooldown)
        _log(status_fh, {"event": "queue_end"})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
