"""bench.py tunnel-outage guard: hang -> honest zero JSON + exit 1;
healthy probe -> silent pass-through (the guard must never alter a real
benchmark run)."""

import json
import subprocess

import pytest

import bench


def test_guard_passes_through_on_healthy_probe(monkeypatch, capsys):
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: subprocess.CompletedProcess(a, 0))
    bench.check_backend_alive(timeout=1)
    assert capsys.readouterr().out == ""


def test_guard_emits_zero_line_and_exits_on_hang(monkeypatch, capsys):
    def hang(cmd, timeout=None, **k):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", hang)
    with pytest.raises(SystemExit) as exc:
        bench.check_backend_alive(timeout=7)
    assert exc.value.code == 1
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, "must print exactly ONE JSON line"
    rec = json.loads(out[0])
    assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
    assert "UNMEASURED" in rec["unit"] and ">7s" in rec["unit"]
    assert rec["metric"] == "tnt_flat_cg_iters_per_s_bf16"
