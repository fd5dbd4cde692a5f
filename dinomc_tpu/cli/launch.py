"""Fault-tolerant launcher: run a training CLI, requeue on failure.

Parity target: ``run_dino_with_submitit.py`` — the reference submits
``train_dino`` to SLURM via submitit and requeues on preemption with a
``DelayedSubmission`` (``:71-78``), resuming from the epoch checkpoint.
On TPU the same durability comes from orbax restart-from-latest (every
trainer here resumes from --output_dir automatically); this launcher
supplies the supervision loop: run the target module, and if the process
dies (preemption, OOM, transient TPU error), relaunch it up to
``--max_restarts`` times. Multi-host SLURM launches set the standard
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
(see parallel/distributed.py) in the sbatch script.

Example:
    python -m dinomc_tpu.cli.launch --max_restarts 5 -- \
        python -m dinomc_tpu.cli.train_dino --output_dir runs/mc ...
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time


def main():
    p = argparse.ArgumentParser("launch")
    p.add_argument("--max_restarts", default=3, type=int)
    p.add_argument("--min_uptime", default=60.0, type=float,
                   help="runs shorter than this count as crash loops")
    p.add_argument("--backoff", default=10.0, type=float)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- followed by the training command")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no command given (use: launch [opts] -- <command ...>)")

    restarts = 0
    while True:
        start = time.time()
        print(f"[launch] starting (attempt {restarts + 1}): {' '.join(cmd)}")
        proc = subprocess.run(cmd)
        uptime = time.time() - start
        if proc.returncode == 0:
            print(f"[launch] finished cleanly after {uptime:.0f}s")
            return 0
        print(f"[launch] exited rc={proc.returncode} after {uptime:.0f}s")
        if uptime < args.min_uptime:
            restarts += 1
            if restarts > args.max_restarts:
                print("[launch] crash loop — giving up")
                return proc.returncode
        else:
            # long-lived run that died: treat as preemption, always requeue
            restarts = 0
        time.sleep(args.backoff)


if __name__ == "__main__":
    sys.exit(main())
