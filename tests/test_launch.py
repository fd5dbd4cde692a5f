"""Fault-injection tests for the supervision launcher (cli/launch.py) —
the submitit requeue-on-preemption equivalent (run_dino_with_submitit.py:71-78).
Trainer-side checkpoint-resume continuity is covered in test_ckpt.py /
test_cli_smoke.py; these tests cover the relaunch loop itself."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # subprocess fault-injection supervision loops

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _launch(*launch_args, script: str):
    # PYTHONPATH="" drops any site-wide sitecustomize (on some hosts it
    # imports jax at interpreter start — tens of seconds per relaunch);
    # neither the launcher nor the -c children need anything beyond stdlib
    return subprocess.run(
        [sys.executable, "-m", "dinomc_tpu.cli.launch", *launch_args,
         "--", sys.executable, "-c", script],
        capture_output=True, text=True, cwd=REPO, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": ""},
    )


def test_clean_exit_runs_once():
    proc = _launch("--backoff", "0.05", script="print('trained')")
    assert proc.returncode == 0
    assert proc.stdout.count("attempt 1") == 1
    assert "attempt 2" not in proc.stdout


def test_crash_loop_gives_up():
    # every run dies instantly; with min_uptime high, each failure counts
    # toward max_restarts and the launcher eventually surfaces the rc
    proc = _launch(
        "--max_restarts", "2", "--min_uptime", "9999", "--backoff", "0.05",
        script="import sys; sys.exit(3)",
    )
    assert proc.returncode == 3
    assert "attempt 3" in proc.stdout  # 1 initial + 2 restarts
    assert "giving up" in proc.stdout


def test_preemption_requeues_and_recovers(tmp_path):
    # first run "preempted" (dies mid-training), second finds the sentinel
    # (standing in for the orbax latest-step the real trainers restore)
    sentinel = tmp_path / "ckpt"
    script = (
        "import os, sys; p = {p!r}\n"
        "if os.path.exists(p):\n"
        "    print('resumed'); sys.exit(0)\n"
        "open(p, 'w').close(); sys.exit(1)\n"
    ).format(p=str(sentinel))
    proc = _launch("--min_uptime", "0.0", "--backoff", "0.05", script=script)
    assert proc.returncode == 0
    assert "resumed" in proc.stdout
    # preemption resets the crash-loop counter, so both launches log
    # "attempt 1" — count launches, not attempt numbers
    assert proc.stdout.count("starting (attempt") == 2
