import os
import subprocess
import sys


def test_quickstart_runs():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "quickstart.py"),
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "batch export" in out.stdout
    assert '"failed": 0' in out.stdout


def test_serve_client_runs():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable,
         os.path.join(repo, "examples", "serve_client.py"),
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "serve client tour complete" in out.stdout
    assert "lagged=True" in out.stdout
    assert "switched to prefetched image" in out.stdout
