"""Golden-plan tests: the batch planner's dispatch schedule is pinned.

``plan_batch`` is a pure function of (telemetry, wavelength grid,
npsflin, cfg, chunk) — its JSON summary for the driver bench nights is
committed under tests/data/golden_plan_*.json.  A planner change that
alters any group's window/blue/anchor annotation, row assignment, or
chunk schedule shows up here as a readable diff instead of a throughput
regression three rounds later (VERDICT r4 item 6).  Regenerate the
goldens with ``python benchmarks/dump_plan.py`` ONLY for an intentional
planner change, and say so in the CHANGELOG.
"""

import json
import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from muse_psfr_tpu.config import GalacsiConfig  # noqa: E402
from muse_psfr_tpu.parallel.batch import plan_batch  # noqa: E402


@pytest.fixture(autouse=True)
def _clear_plan_env(monkeypatch):
    for var in ("MUSE_PSFR_NO_TAIL", "MUSE_PSFR_NO_BLUE",
                "MUSE_PSFR_BLUE_TIERS"):
        monkeypatch.delenv(var, raising=False)


def _bench_plan(n, chunk, npsflin):
    from bench import build_rows
    seeing, GL, L0, mask = build_rows(n)
    lbda = np.linspace(490, 930, 35)
    return plan_batch(seeing, GL, L0, mask, lbda, npsflin=npsflin,
                      cfg=GalacsiConfig(), chunk=chunk)


def _golden(name):
    with open(os.path.join(ROOT, "tests", "data",
                           f"golden_plan_{name}.json")) as fh:
        return json.load(fh)


@pytest.mark.parametrize("name,n,chunk,npsflin", [
    ("night100", 100, 50, 1),
    ("night1000", 1000, 100, 1),
    ("night100_npsflin3", 100, 44, 3),
])
def test_golden_plan(name, n, chunk, npsflin):
    summary = _bench_plan(n, chunk, npsflin).summary()
    golden = _golden(name)
    if summary != golden:     # readable diff: compare per-group fields
        assert summary.keys() == golden.keys()
        for k in golden:
            if k != "groups":
                assert summary[k] == golden[k], f"plan field {k} changed"
        assert len(summary["groups"]) == len(golden["groups"]), \
            "number of plan groups changed"
        for i, (s, g) in enumerate(zip(summary["groups"],
                                       golden["groups"])):
            for k in g:
                assert s[k] == g[k], f"group {i} field {k} changed"


def test_plan_batch_is_pure_and_deterministic():
    """Two plans of the same inputs are identical, hold host arrays
    only, and partition the batch exactly."""
    import jax
    p1 = _bench_plan(100, 50, 1)
    p2 = _bench_plan(100, 50, 1)
    assert p1.summary() == p2.summary()
    assert isinstance(p1.lbda, np.ndarray)
    assert isinstance(p1.table, np.ndarray)
    assert not isinstance(p1.npixc, jax.Array)
    for g in p1.groups:
        assert isinstance(g.rows, np.ndarray)
        assert sum(g.nvals) == g.rows.shape[0]
        assert sum(g.sizes) == g.rows.shape[0] + g.n_pad
        assert g.offs == tuple(
            int(o) for o in np.concatenate([[0],
                                            np.cumsum(g.sizes)[:-1]]))
    covered = np.sort(np.concatenate([g.rows for g in p1.groups]))
    assert np.array_equal(covered, np.arange(100))


def test_executable_keys_cover_dispatches():
    plan = _bench_plan(100, 50, 1)
    keys = plan.executable_keys()
    assert len(keys) == len(set(keys))
    for g in plan.groups:
        for s in g.sizes:
            assert (g.cfg, s) in keys


def test_no_tail_env_flattens_sizes(monkeypatch):
    monkeypatch.setenv("MUSE_PSFR_NO_TAIL", "1")
    plan = _bench_plan(100, 50, 1)
    for g in plan.groups:
        assert all(s == plan.chunk for s in g.sizes)


def test_process_batch_dispatches_the_plan():
    """The executor's on_chunk deliveries follow the plan's groups, row
    order, and valid counts exactly (tiny config, CPU)."""
    from muse_psfr_tpu.parallel.batch import process_batch
    cfg = GalacsiConfig(dim=512, dim_pup=16, dimpsf=12, lambda_chunk=2)
    lb = np.linspace(500.0, 900.0, 4)
    see = np.array([0.9, 1.0, 0.5, 1.2, 0.8])
    gl = np.array([0.85, 0.85, 0.85, 0.6, 0.7])
    l0 = np.full(5, 25.0)
    mask = np.ones((5, 4))
    plan = plan_batch(see, gl, l0, mask, lb, npsflin=1, cfg=cfg, chunk=2)
    expect = []
    for g in plan.groups:
        for i, nv in enumerate(g.nvals):
            expect.append(g.rows[g.offs[i]:g.offs[i] + nv])
    seen = []
    process_batch(see, gl, l0, mask, lb, cfg=cfg, chunk=2,
                  on_chunk=lambda idx, _: seen.append(np.array(idx)))
    # a window-guard redo may append extra corrected deliveries at the
    # end; the planned dispatches must be the prefix
    assert len(seen) >= len(expect)
    for e, s in zip(expect, seen):
        assert np.array_equal(e, s), (e, s)


def test_plan_memo_hits_identical_inputs(monkeypatch):
    """Identical batch inputs reuse the memoised plan; any changed
    input or planning env knob misses."""
    from muse_psfr_tpu.parallel import batch as pb
    pb._PLAN_MEMO.clear()
    p1 = _bench_plan(100, 50, 1)
    p2 = _bench_plan(100, 50, 1)
    assert p2 is p1
    p3 = _bench_plan(100, 25, 1)
    assert p3 is not p1
    monkeypatch.setenv("MUSE_PSFR_NO_BLUE", "1")
    p4 = _bench_plan(100, 50, 1)
    assert p4 is not p1
    assert all(g.cfg.otf_blue is None for g in p4.groups)
