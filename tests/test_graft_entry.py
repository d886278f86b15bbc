"""Driver-gate regression tests: the multi-chip dryrun must live in the suite.

Both round-1 and round-2 shipped a red `MULTICHIP_r0N.json` because nothing in
`tests/` executed `__graft_entry__.dryrun_multichip` — gate-path edits landed
without the gate ever re-running. These tests invoke the REAL gate entry
points in-process on the suite's virtual 8-device CPU mesh, so any commit
that breaks the dryrun path breaks the suite immediately.

Reference anchor: /root/reference/train.py:28-29,66-67,181 (the DDP training
step this dryrun's dp x tp x sp SPMD step replaces).
"""

import importlib.util
import os
import sys

import jax
import pytest


def _load_graft_entry():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def graft_entry():
    return _load_graft_entry()


def test_dryrun_multichip_2d_mesh(graft_entry, capfd):
    """The exact driver gate, 2-D mesh branch (dp x tp + encoder sp).

    n=4 -> data2 x model2: exercises the same with_sharding_constraint /
    shard_params_tp / make_train_step path as the driver's dryrun_multichip(8),
    including the enc_sp_axis="model" sequence-parallel constraint that broke
    round 2 when init ran outside the mesh context.
    """
    assert len(jax.devices()) >= 4, "suite must run on the 8-device CPU mesh"
    graft_entry.dryrun_multichip(4)  # raises on any failure
    out = capfd.readouterr().out
    assert "dryrun_multichip(4) ok" in out
    assert "model2" in out, "2-D mesh branch (tp+sp) must be exercised"


def test_dryrun_runs_in_process_under_suite(graft_entry, monkeypatch):
    """The suite path must NOT take the subprocess re-exec branch (which would
    hide import-time failures behind an rc and skip coverage)."""
    called = {}

    def _no_subprocess(*a, **k):  # pragma: no cover - should never run
        called["reexec"] = True
        raise AssertionError("dryrun re-exec'd inside the sanitized suite env")

    import subprocess

    monkeypatch.setattr(subprocess, "run", _no_subprocess)
    graft_entry.dryrun_multichip(2)  # 1-D mesh branch (pure dp)
    assert "reexec" not in called


def test_entry_traces_and_lowers(graft_entry):
    """entry() must return (fn, args) that jit-lowers on the production
    geometry. Lowering (trace + StableHLO emit) catches shape/sharding bugs
    without paying the full-size XLA compile; the driver does the compile."""
    fn, args = graft_entry.entry()
    lowered = jax.jit(fn).lower(*args)
    text = lowered.as_text()
    assert "func.func public @main" in text
