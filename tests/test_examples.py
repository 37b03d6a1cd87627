"""Smoke test: the shipped examples must run end-to-end.

Examples honour ``MUSE_PSFR_TINY=1`` (tiny grids, few rows) so this
stays test-sized; the subprocess pins the CPU backend the same way
``conftest.py`` does (the env var alone is overridden by accelerator
plugins).  The sweep example exercises the same ``condition_sweep`` +
``save_sweep`` + matplotlib path as tests/test_api_edge_cases.py and
tests/test_psfrec.py::test_plot, so only the night example runs here.
"""

import os
import subprocess
import sys


def test_full_night_example(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "examples", "full_night.py")
    env = dict(os.environ)
    env["MUSE_PSFR_TINY"] = "1"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys, runpy; sys.argv = [%r]; "
            "runpy.run_path(%r, run_name='__main__')" % (script, script))
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=300,
                          cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "wrote" in proc.stdout
    assert (tmp_path / "night_psf.fits").exists()


def test_multihost_example(tmp_path):
    """The multi-host demo spawns 2 local processes over a 4-device
    global mesh and asserts both return the identical night."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "examples", "multihost_night.py")
    env = dict(os.environ)
    env["MUSE_PSFR_TINY"] = "1"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, script], env=env,
                          capture_output=True, text=True, timeout=600,
                          cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "identical" in proc.stdout
    assert (tmp_path / "mh_demo_fit_0.npy").exists()
