"""Cold-start A/B: fresh-process CLI wall time with and without the
persistent compilation cache (VERDICT r4 item 2).

Runs ``muse-psfr --values 1,0.7,25`` in three fresh subprocesses on the
CPU backend (the cache is incompatible with the axon remote-compile
tunnel, where it auto-disables):

1. cold, cache enabled at a fresh directory (pays compiles, fills cache)
2. warm, same cache directory (the target: < 30 s to results)
3. control, cache disabled (the old cold-start every process paid)

Prints one JSON line with the three wall times.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(cache_env, tag):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env["MUSE_PSFR_COMPILE_CACHE"] = cache_env
    # the host-side table cache (utils/compile_cache.host_cache_dir)
    # rides the same lifecycle: fresh dir for cold, reused for warm,
    # disabled for the control
    env["MUSE_PSFR_HOST_CACHE"] = (
        "0" if cache_env == "0" else os.path.join(cache_env, "host"))
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-m", "muse_psfr_tpu", "--no-color",
         "--values", "1,0.7,25", "--logfile", os.devnull],
        capture_output=True, text=True, env=env, cwd=tempfile.gettempdir())
    dt = time.perf_counter() - t0
    ok = proc.returncode == 0 and "FWHM 0.85 0.73 0.62" in (
        proc.stdout + proc.stderr)
    print(f"  {tag}: {dt:.1f} s (golden block {'ok' if ok else 'MISSING'})",
          file=sys.stderr)
    if not ok:
        print(proc.stdout[-2000:] + proc.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"{tag} run failed")
    return dt


def main():
    cache_dir = tempfile.mkdtemp(prefix="muse_psfr_cache_")
    try:
        t_cold = run_cli(cache_dir, "cold+cache")
        t_warm = run_cli(cache_dir, "warm")
        t_nocache = run_cli("0", "no-cache control")
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)
    print(json.dumps({
        "metric": "cli_cold_start_s",
        "cold_with_cache_s": round(t_cold, 1),
        "warm_with_cache_s": round(t_warm, 1),
        "no_cache_s": round(t_nocache, 1),
        "speedup_warm_vs_no_cache": round(t_nocache / t_warm, 2),
        "target_warm_s": 30.0,
    }))


if __name__ == "__main__":
    main()
