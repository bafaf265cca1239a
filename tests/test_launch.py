"""Multi-host launcher tests (command construction + local fan-out)."""

import subprocess
import sys

from a3t_tpu.bin.launch import build_host_commands, main, run_commands


def test_ssh_commands_carry_bootstrap_flags():
    cmds = build_host_commands(
        ["tpu-0", "tpu-1"], ["python", "-m", "a3t_tpu.bin.train",
                             "--config", "c.yaml"],
        port=9999, launcher="ssh", cwd="/work")
    assert len(cmds) == 2
    assert cmds[0][0] == "ssh"
    assert "tpu-0" in cmds[0]
    remote = cmds[1][-1]
    assert "cd /work &&" in remote
    assert "--coordinator tpu-0:9999" in remote
    assert "--num-hosts 2" in remote
    assert "--host-id 1" in remote


def test_slurm_commands():
    cmds = build_host_commands(["n0", "n1"], ["train"], launcher="slurm")
    assert cmds[0][:3] == ["srun", "--nodes=1", "--ntasks=1"]
    assert "-wn1" in cmds[1]
    assert cmds[1][-2:] == ["--host-id", "1"]


def test_local_fanout_runs_all_ranks(tmp_path):
    marker = tmp_path / "rank"
    cmd = [sys.executable, "-c",
           "import sys; open(sys.argv[sys.argv.index('--host-id')+1] + "
           f"'_{marker.name}', 'w')"]
    # local mode: args appended raw; run from tmp_path so markers land there
    cmds = build_host_commands(["a", "b", "c"], cmd, launcher="local")
    procs = [subprocess.Popen(c, cwd=tmp_path) for c in cmds]
    assert all(p.wait() == 0 for p in procs)
    assert sorted(p.name for p in tmp_path.iterdir()) == [
        "0_rank", "1_rank", "2_rank"]


def test_failure_propagates():
    good = [sys.executable, "-c", "pass"]
    bad = [sys.executable, "-c", "import sys; sys.exit(3)"]
    rc = run_commands([good + ["--host-id", "0"], bad])
    assert rc == 3


def test_dry_run_prints(capsys):
    rc = main(["--hosts", "h0,h1", "--dry-run", "--launcher", "slurm",
               "--", "echo", "hi"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    assert "--coordinator h0:8476" in out[0]


def test_stuck_rank_terminated_when_sibling_fails():
    """The poll-all loop must tear down a rank stuck 'in a collective'
    when another rank dies (a sequential wait would hang here)."""
    import time

    slow = [sys.executable, "-c", "import time; time.sleep(300)"]
    bad = [sys.executable, "-c", "import sys; sys.exit(2)"]
    t0 = time.time()
    rc = run_commands([slow, bad])
    assert rc == 2
    assert time.time() - t0 < 60  # not the 300 s sleep
