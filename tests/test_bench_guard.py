"""bench.py tunnel-outage guard: hang -> honest zero JSON + exit 1;
healthy probe -> silent pass-through (the guard must never alter a real
benchmark run).  A recent success is cached in a marker file so repeated
startups don't each pay a backend-attach probe."""

import json
import subprocess

import pytest

import bench


@pytest.fixture
def isolated_cache(monkeypatch, tmp_path):
    """Point the success-marker file at a fresh per-test path."""
    path = tmp_path / "alive_marker"
    monkeypatch.setattr(bench, "_ALIVE_CACHE", str(path))
    return path


def test_guard_passes_through_on_healthy_probe(
        monkeypatch, capsys, isolated_cache):
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: subprocess.CompletedProcess(a, 0))
    bench.check_backend_alive(timeout=1)
    assert capsys.readouterr().out == ""
    assert isolated_cache.exists(), "healthy probe must write the marker"


def test_guard_emits_zero_line_and_exits_on_hang(
        monkeypatch, capsys, isolated_cache):
    def hang(cmd, timeout=None, **k):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", hang)
    with pytest.raises(SystemExit) as exc:
        bench.check_backend_alive(timeout=7)
    assert exc.value.code == 1
    assert not isolated_cache.exists(), "a hang must not write the marker"
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, "must print exactly ONE JSON line"
    rec = json.loads(out[0])
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
    assert "UNMEASURED" in rec["unit"] and ">7s" in rec["unit"]
    assert rec["metric"] == "tnt_flat_cg_iters_per_s_bf16"


def test_fresh_marker_skips_probe(monkeypatch, isolated_cache):
    isolated_cache.touch()

    def boom(*a, **k):
        raise AssertionError("probe must not run when the marker is fresh")

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench.backend_alive(timeout=1) is True


def test_stale_marker_reprobes(monkeypatch, isolated_cache):
    import os
    isolated_cache.touch()
    old = 10_000.0  # epoch-ish: far older than any cache window
    os.utime(isolated_cache, (old, old))

    def hang(cmd, timeout=None, **k):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", hang)
    assert bench.backend_alive(timeout=1) is False
