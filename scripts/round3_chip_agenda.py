"""One-shot chip agenda for when the tunnel recovers: runs every pending
round-3 measurement sequentially, printing results as it goes (each stage
guarded, so a mid-run weather collapse still leaves the earlier numbers).

Run ALONE on the chip: python scripts/round3_chip_agenda.py
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label, cmd, timeout=900, env=None):
    print(f"=== {label}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout,
            cwd=REPO, env={**os.environ, **(env or {})},
        )
        tail = "\n".join((out.stdout + out.stderr).splitlines()[-6:])
        print(f"--- rc={out.returncode} {time.time()-t0:.0f}s\n{tail}", flush=True)
    except subprocess.TimeoutExpired:
        print(f"--- TIMEOUT after {timeout}s", flush=True)


def main():
    # 0. probe: a tiny matmul+fetch must return in seconds, else abort
    probe = subprocess.run(
        [sys.executable, "-c",
         "from transkun_tpu.utils.jax_setup import setup_cache; setup_cache();"
         "import jax, jax.numpy as jnp, numpy as np, time;"
         "x = jnp.ones((512,512), jnp.bfloat16); np.asarray(x@x);"
         "t0=time.time(); np.asarray(x@x); print('rtt_ms', (time.time()-t0)*1e3)"],
        capture_output=True, text=True, timeout=180, cwd=REPO,
    )
    print(probe.stdout + probe.stderr, flush=True)
    if probe.returncode != 0 or "rtt_ms" not in probe.stdout:
        print("ABORT: link unhealthy", flush=True)
        return
    rtt = float(probe.stdout.split("rtt_ms")[-1])
    if rtt > 200:
        print(f"ABORT: rtt {rtt:.0f} ms — bad weather", flush=True)
        return

    py = sys.executable
    run("bench (1st)", [py, "bench.py"], 900)
    run("bench (2nd)", [py, "bench.py"], 300)
    run("serving", [py, "scripts/bench_serving.py"], 900)
    run("tlayout A/B", [py, "scripts/profile_tlayout.py"], 900)
    run("backbone (default)", [py, "scripts/profile_backbone.py", "--batch", "1", "--bf16"], 900)
    run("backbone (fused kv)", [py, "scripts/profile_backbone.py", "--batch", "1", "--bf16"],
        900, env={"TRANSKUN_TPU_FUSED_KV": "1"})
    run("train B=2", [py, "scripts/profile_train.py", "--batch", "2", "--bf16"], 1200)
    run("density/event-rate", [py, "scripts/bench_density.py"], 900)
    run("learning F1 (TPU, 1000 steps)", [py, "scripts/learning_f1.py", "--steps", "1000"], 1800)


if __name__ == "__main__":
    main()
