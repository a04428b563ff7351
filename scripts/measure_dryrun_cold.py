"""Measure the COLD wall time of the driver's multichip dryrun halves.

VERDICT r4 #1: the driver contract (`__graft_entry__.dryrun_multichip`) timed
out (MULTICHIP_r04.json rc=124) after round 4 extended it with the inversion
step, and nothing in the repo measured the quantity the contract depends on —
the cold-compile wall time on this 1-core host. This script times each half
(and the combined entrypoint) in a fresh subprocess with a FRESH
JAX_COMPILATION_CACHE_DIR on an 8-device virtual CPU mesh, and writes
docs/dryrun_cold_time.json.

Usage: python scripts/measure_dryrun_cold.py [gan|inversion|combined|all]
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import jax
jax.config.update('jax_platforms', 'cpu')
import sys; sys.path.insert(0, {repo!r})
{body}
print('CHILD_OK')
"""

BODIES = {
    "gan": "from invertavatar_tpu.train.dryrun import run_dryrun\nrun_dryrun(8)",
    "inversion": (
        "from invertavatar_tpu.train.dryrun import run_dryrun_inversion\n"
        "run_dryrun_inversion(8)"
    ),
    "combined": (
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)"
    ),
}


def run_one(name: str, timeout_s: int = 2400):
    cache = tempfile.mkdtemp(prefix=f"jc_dry_{name}_")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = cache
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=8")
    # mirror __graft_entry__.dryrun_multichip's child env exactly
    flags += ["--xla_backend_optimization_level=0",
              "--xla_llvm_disable_expensive_passes=true",
              "--xla_cpu_collective_call_terminate_timeout_seconds=1200"]
    env["XLA_FLAGS"] = " ".join(flags)
    code = CHILD.format(repo=_repo, body=BODIES[name])
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env, cwd=_repo,
            capture_output=True, text=True, timeout=timeout_s,
        )
        dt = time.time() - t0
        ok = proc.returncode == 0 and "CHILD_OK" in proc.stdout
        tail = (proc.stderr or proc.stdout)[-1500:]
    except subprocess.TimeoutExpired:
        dt, ok, tail = time.time() - t0, False, f"timeout after {timeout_s}s"
    finally:
        shutil.rmtree(cache, ignore_errors=True)
    return {"cold_s": round(dt, 1), "ok": ok, **({} if ok else {"tail": tail})}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(BODIES) if mode == "all" else [mode]
    path = os.path.join(_repo, "docs", "dryrun_cold_time.json")
    out = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                out = json.load(f)
        except Exception:  # noqa: BLE001
            pass
    out.setdefault("host", "1-core CPU (8-device virtual mesh), fresh compile cache per run")
    for name in names:
        print(f"== {name} (fresh cache) ==", flush=True)
        out[name] = run_one(name)
        print(json.dumps({name: out[name]}), flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
