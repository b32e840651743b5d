"""Smoke tests for the CLI entry points the driver/judge runs.

Each runs in a subprocess on the CPU backend with tiny shapes and must emit
parseable one-line JSON (bench contract).
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=300):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    out = subprocess.run(
        [sys.executable] + args,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=ROOT,
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def last_json(stdout: str) -> dict:
    lines = [l for l in stdout.strip().splitlines() if l.startswith("{")]
    assert lines, stdout
    return json.loads(lines[-1])


@pytest.mark.parametrize("game", ["single_room", "random_room", "maze"])
def test_bench_smoke(game):
    out = run_cli([
        "bench.py", "--backend", "cpu", "--game", game,
        "--num-envs", "8", "--steps", "4", "--reps", "1",
        "--num-rays", "8", "--height-px", "8",
    ])
    r = last_json(out)
    assert r["metric"] == "env_steps_per_sec"
    assert r["value"] > 0
    assert r["config"]["game"] == game


def test_bench_scaling_smoke():
    out = run_cli([
        "bench_scaling.py", "--backend", "cpu",
        "--envs-per-device", "8", "--steps", "4",
        "--num-rays", "8", "--height-px", "8",
    ])
    r = last_json(out)
    assert r["metric"] == "scaling_efficiency"
    assert r["devices"] == 8
    assert r["value"] > 0


def test_bench_ppo_smoke():
    out = run_cli([
        "bench_ppo.py", "--backend", "cpu",
        "--num-envs", "8", "--rollout-steps", "4", "--updates", "2",
        "--num-rays", "8", "--height-px", "8", "--hidden", "16",
    ])
    r = last_json(out)
    assert r["metric"] == "ppo_env_steps_per_sec"
    assert r["value"] > 0


def test_bench_ppo_multi_player_smoke():
    out = run_cli([
        "bench_ppo.py", "--backend", "cpu", "--game", "multi_player",
        "--num-players", "2",
        "--num-envs", "8", "--rollout-steps", "4", "--updates", "2",
        "--num-rays", "8", "--height-px", "8", "--hidden", "16",
    ])
    r = last_json(out)
    assert r["metric"] == "ppo_env_steps_per_sec"
    assert r["config"]["num_players"] == 2
    assert r["value"] > 0


def test_train_ppo_recurrent_smoke():
    out = run_cli([
        "examples/train_ppo.py", "--backend", "cpu", "--recurrent",
        "--game", "maze", "--map-h", "7", "--map-w", "7",
        "--num-envs", "8", "--updates", "2", "--rollout-steps", "4",
        "--num-rays", "8", "--height-px", "8", "--hidden", "16",
    ])
    r = last_json(out)
    assert "loss" in r


def test_train_ppo_multi_player_smoke():
    out = run_cli([
        "examples/train_ppo.py", "--backend", "cpu",
        "--game", "multi_player", "--num-players", "2",
        "--num-envs", "8", "--updates", "2", "--rollout-steps", "4",
        "--num-rays", "8", "--height-px", "8", "--hidden", "16",
    ])
    r = last_json(out)
    assert "loss" in r and "reward_p1" in r


def test_multi_player_demo_smoke(tmp_path):
    out = run_cli([
        "examples/multi_player_demo.py", "--backend", "cpu",
        "--num-envs", "2", "--steps", "4", "--num-rays", "16",
        "--height-px", "16", "--out", str(tmp_path),
    ])
    r = last_json(out)
    assert r["players"] == 2
    assert (tmp_path / "player0_camera.png").exists()
    assert (tmp_path / "top_view.png").exists()


def test_rollout_demo_smoke():
    out = run_cli([
        "examples/rollout_demo.py", "--backend", "cpu",
        "--num-envs", "8", "--chunk-steps", "4", "--chunks", "2",
        "--num-rays", "8", "--height-px", "8",
    ])
    r = last_json(out)
    assert r["env_steps"] == 8 * 4 * 2


def test_train_ppo_smoke():
    out = run_cli([
        "examples/train_ppo.py", "--backend", "cpu",
        "--num-envs", "8", "--updates", "2", "--rollout-steps", "4",
        "--num-rays", "8", "--height-px", "8", "--hidden", "16",
        "--obs", "depth",
    ])
    r = last_json(out)
    assert "loss" in r


def test_graft_entry_smoke():
    out = subprocess.run(
        [sys.executable, "__graft_entry__.py"],
        capture_output=True, text=True, timeout=600, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip(8) OK" in out.stdout
