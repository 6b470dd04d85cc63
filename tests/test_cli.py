"""CLI: python -m optimization_tpu solve <graph.g2o> end to end."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from optimization_tpu import cli
from optimization_tpu.io import g2o

# the CLI drives full solver pipelines whose results carry NaN-padded
# traces by contract -> excluded from the OPTTPU_DEBUG_NANS tier

from test_pose_sync import _make_pose_graph


def _write_graph(tmp_path, seed=2):
    graph, R_true, t_true = _make_pose_graph(seed, noise_rot=0.01,
                                             noise_t=0.01)
    path = str(tmp_path / "g.g2o")
    g2o.save_g2o(path, graph)
    return path, R_true, t_true


def test_solve_certify_json_npz(tmp_path, capsys):
    path, R_true, t_true = _write_graph(tmp_path)
    out = str(tmp_path / "sol.npz")
    rc = cli.main(["solve", path, "--certify", "--dtype", "f64",
                   "--json", "--out", out])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip())
    assert summary["status"] == "GRADIENT"
    assert summary["certified"] is True
    assert summary["n_vertices"] == 20

    sol = np.load(out)
    from optimization_tpu.models import pose_sync
    er, et = pose_sync.alignment_errors(
        jnp.asarray(sol["R"]), jnp.asarray(sol["t"]),
        jnp.asarray(R_true), jnp.asarray(t_true))
    assert float(er) < 0.05 and float(et) < 0.2


def test_solve_writes_g2o_vertices(tmp_path, capsys):
    path, _, _ = _write_graph(tmp_path, seed=3)
    out = str(tmp_path / "sol.g2o")
    rc = cli.main(["solve", path, "--marginalized", "--dtype", "f64",
                   "--out", out])
    assert rc == 0
    text = open(out).read()
    assert text.count("VERTEX_SE3:QUAT") == 20
    assert "EDGE_SE3:QUAT" in text
    prose = capsys.readouterr().out
    # The marginalized trajectory on this instance sits at its f64 inner-
    # solve noise floor near the end: depending on f64 summation order it
    # terminates GRADIENT (tolerance reached, |grad| ~ 2e-10) or
    # TRUST_REGION (Delta collapsed at the floor, |grad| ~ 5e-7) — both
    # are successful stops (exit code 0, cli.py); quality on this graph
    # family is pinned by test_solve_certify_json_npz via the npz output.
    assert ("status: GRADIENT" in prose or "status: TRUST_REGION" in prose)


def test_solve_cert_fast(tmp_path, capsys):
    """--cert-fast (chol RR + block-Jacobi certificate preconditioner)
    certifies the same graph."""
    path, _, _ = _write_graph(tmp_path, seed=3)
    rc = cli.main(["solve", path, "--certify", "--cert-fast",
                   "--dtype", "f64", "--json"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip())
    assert summary["certified"] is True
    assert abs(summary["certificate_lam_min"]) < 1e-3
