"""g2o loader: native C++ parser == pure-Python parser, and the loaded graph
drives the rotation-sync flagship end-to-end."""

import numpy as np
import pytest

from optimization_tpu.io import g2o


def _write_se3_file(path, n=6, extra=4, seed=0):
    rng = np.random.default_rng(seed)

    def rand_quat():
        q = rng.normal(size=4)
        return q / np.linalg.norm(q)

    lines = []
    for i in range(n):
        x, y, z = rng.normal(size=3)
        qx, qy, qz, qw = rand_quat()
        lines.append(f"VERTEX_SE3:QUAT {i} {x:.6f} {y:.6f} {z:.6f} "
                     f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}")
    edges = [(i, i + 1) for i in range(n - 1)]
    edges += [(int(rng.integers(n)), int(rng.integers(n))) for _ in range(extra)]
    for i, j in edges:
        x, y, z = rng.normal(size=3)
        qx, qy, qz, qw = rand_quat()
        info = np.zeros(21)
        # upper-triangular listing of a 6x6: diagonal offsets 0,6,11,15,18,20
        for off, v in zip((0, 6, 11, 15, 18, 20), rng.uniform(1, 5, size=6)):
            info[off] = v
        lines.append(
            f"EDGE_SE3:QUAT {i} {j} {x:.6f} {y:.6f} {z:.6f} "
            f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f} "
            + " ".join(f"{v:.6f}" for v in info))
    path.write_text("\n".join(lines) + "\n")
    return len(edges)


def _write_se2_file(path, n=5):
    lines = []
    for i in range(n):
        lines.append(f"VERTEX_SE2 {i} {0.1 * i} {0.2 * i} {0.05 * i}")
    for i in range(n - 1):
        info = "4.0 0.0 0.0 4.0 0.0 2.5"
        lines.append(f"EDGE_SE2 {i} {i + 1} 1.0 0.0 0.1 {info}")
    path.write_text("\n".join(lines) + "\n")
    return n - 1


def test_python_parser_se3(tmp_path):
    p = tmp_path / "g.g2o"
    E = _write_se3_file(p)
    g = g2o.load_g2o(str(p), native=False)
    assert g.dim == 3 and g.n_vertices == 6 and len(g.src) == E
    # Rotations are orthonormal with det +1
    RtR = np.einsum("eji,ejk->eik", g.Rij, g.Rij)
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-9)
    assert np.all(np.linalg.det(g.Rij) > 0.99)
    assert np.all(g.kappa > 0)


def test_python_parser_se2(tmp_path):
    p = tmp_path / "g.g2o"
    E = _write_se2_file(p)
    g = g2o.load_g2o(str(p), native=False)
    assert g.dim == 2 and len(g.src) == E
    np.testing.assert_allclose(g.kappa, 2.5)
    np.testing.assert_allclose(g.Rij[0], [[np.cos(0.1), -np.sin(0.1)],
                                          [np.sin(0.1), np.cos(0.1)]])


@pytest.mark.skipif(not g2o.native_available(),
                    reason="native loader unavailable (no C++ toolchain)")
def test_native_matches_python(tmp_path):
    p = tmp_path / "g.g2o"
    _write_se3_file(p, n=10, extra=12, seed=3)
    gn = g2o.load_g2o(str(p), native=True)
    gp = g2o.load_g2o(str(p), native=False)
    assert gn.n_vertices == gp.n_vertices and gn.dim == gp.dim
    np.testing.assert_array_equal(gn.src, gp.src)
    np.testing.assert_array_equal(gn.dst, gp.dst)
    np.testing.assert_allclose(gn.Rij, gp.Rij, atol=1e-12)
    np.testing.assert_allclose(gn.tij, gp.tij, atol=1e-12)
    np.testing.assert_allclose(gn.kappa, gp.kappa, atol=1e-12)


@pytest.mark.skipif(not g2o.native_available(),
                    reason="native loader unavailable")
def test_native_error_on_missing_file():
    with pytest.raises(ValueError):
        g2o.load_g2o("/nonexistent/file.g2o", native=True)


@pytest.mark.slow
def test_loaded_graph_drives_rotation_sync(tmp_path):
    """End-to-end: g2o file -> PoseGraph -> TNT rotation sync."""
    import jax.numpy as jnp

    from optimization_tpu.models import rotation_sync as rs
    from optimization_tpu.solvers import tnt
    import jax

    # Build a consistent (noiseless) pose graph from known rotations
    rng = np.random.default_rng(1)
    n = 8
    R_true = np.asarray(rs.ROTATIONS.rand(jax.random.PRNGKey(5), n, 3, 3),
                        np.float64)
    lines = []
    edges = [(i, i + 1) for i in range(n - 1)] + [(0, 4), (2, 6)]
    for i, j in edges:
        Rij = R_true[i] @ R_true[j].T
        # rotation -> quaternion
        w = np.sqrt(max(0.0, 1 + np.trace(Rij))) / 2
        if w > 1e-9:
            x = (Rij[2, 1] - Rij[1, 2]) / (4 * w)
            y = (Rij[0, 2] - Rij[2, 0]) / (4 * w)
            z = (Rij[1, 0] - Rij[0, 1]) / (4 * w)
        else:  # pragma: no cover - not hit with random rotations
            x, y, z = 1.0, 0.0, 0.0
        info = np.zeros(21)
        info[[0, 6, 11, 15, 18, 20]] = 1.0
        lines.append(
            f"EDGE_SE3:QUAT {i} {j} 0 0 0 {x:.12f} {y:.12f} {z:.12f} "
            f"{w:.12f} " + " ".join(map(str, info)))
    p = tmp_path / "sync.g2o"
    p.write_text("\n".join(lines) + "\n")

    g = g2o.load_g2o(str(p))
    data = rs.RotationSyncData(src=jnp.asarray(g.src), dst=jnp.asarray(g.dst),
                               Rij=jnp.asarray(g.Rij))
    problem = rs.make_problem()
    params = tnt.TNTParams(max_iterations=50, gradient_tolerance=1e-8,
                           relative_decrease_tolerance=0.0,
                           stepsize_tolerance=0.0,
                           preconditioned_gradient_tolerance=0.0)
    R0 = rs.spectral_init(data, n, 3)
    res = tnt.solve(problem, R0, params, data=data)
    err = float(rs.mean_rotation_error(res.x, jnp.asarray(R_true)))
    assert float(res.f) < 1e-8
    assert err < 1e-4


@pytest.mark.skipif(not g2o.native_available(),
                    reason="native loader unavailable")
def test_native_tolerates_blank_and_crlf_lines(tmp_path):
    """Whitespace-only and CRLF-terminated lines must not poison the parse
    (regression: a stale tag from the previous line caused a spurious
    'malformed EDGE' failure for the whole file)."""
    p = tmp_path / "crlf.g2o"
    _write_se3_file(p, n=4, extra=2, seed=7)
    body = p.read_text().replace("\n", "\r\n")
    p.write_text("# comment\r\n   \r\n" + body + "   \n\r\n")
    gn = g2o.load_g2o(str(p), native=True)
    gp = g2o.load_g2o(str(p), native=False)
    np.testing.assert_array_equal(gn.src, gp.src)
    np.testing.assert_allclose(gn.Rij, gp.Rij, atol=1e-12)


def test_save_load_roundtrip_se3(tmp_path):
    """Round-2: save_g2o -> load_g2o reproduces the graph (rotations via the
    largest-pivot quaternion extraction, kappa/tau through the diagonal
    information blocks) for both parser backends."""
    rng = np.random.default_rng(3)
    E, n = 24, 9

    def rand_rot():
        A = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(A)
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        return q

    Rij = np.stack([rand_rot() for _ in range(E)])
    # include a near-pi rotation (degenerate for the naive w-formula)
    axis = np.array([1.0, 2.0, -1.0])
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    th = np.pi - 1e-7
    Rij[0] = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)

    src = rng.integers(0, n, E).astype(np.int32)
    dst = ((src + 1 + rng.integers(0, n - 1, E)) % n).astype(np.int32)
    tij = rng.normal(size=(E, 3))
    kappa = rng.uniform(0.5, 8.0, E)
    tau = rng.uniform(0.1, 3.0, E)
    graph = g2o.PoseGraph(n_vertices=n, dim=3, src=src, dst=dst,
                          Rij=Rij, tij=tij, kappa=kappa)

    path = str(tmp_path / "roundtrip.g2o")
    g2o.save_g2o(path, graph, poses=(np.stack([np.eye(3)] * n),
                                     np.zeros((n, 3))), tau=tau)

    for native in ([False, True] if g2o.native_available() else [False]):
        loaded = g2o.load_g2o(path, native=native)
        assert loaded.n_vertices == n and loaded.dim == 3
        np.testing.assert_array_equal(loaded.src, src)
        np.testing.assert_array_equal(loaded.dst, dst)
        np.testing.assert_allclose(loaded.Rij, Rij, atol=1e-9)
        np.testing.assert_allclose(loaded.tij, tij, atol=1e-10)
        np.testing.assert_allclose(loaded.kappa, kappa, rtol=1e-10)


def test_save_load_roundtrip_se2(tmp_path):
    rng = np.random.default_rng(4)
    E, n = 10, 5
    th = rng.uniform(-np.pi, np.pi, E)
    Rij = np.stack([[[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
                    for a in th])
    graph = g2o.PoseGraph(
        n_vertices=n, dim=2,
        src=rng.integers(0, n, E).astype(np.int32),
        dst=rng.integers(0, n, E).astype(np.int32),
        Rij=Rij, tij=rng.normal(size=(E, 2)),
        kappa=rng.uniform(0.5, 2.0, E))
    path = str(tmp_path / "roundtrip2.g2o")
    g2o.save_g2o(path, graph)
    loaded = g2o.load_g2o(path, native=False)
    np.testing.assert_allclose(loaded.Rij, graph.Rij, atol=1e-10)
    np.testing.assert_allclose(loaded.tij, graph.tij, atol=1e-10)
    np.testing.assert_allclose(loaded.kappa, graph.kappa, rtol=1e-10)


@pytest.mark.parametrize("native", [False, True])
def test_negative_vertex_index_rejected(tmp_path, native):
    """A negative edge index must error loudly in BOTH parsers: int32
    indices flow straight into downstream gathers, where a -1 silently
    wraps to the last vertex (reference analog: the library validates its
    inputs and throws, e.g. ``TNT.h:256-318``)."""
    if native and not g2o.native_available():
        pytest.skip("native loader unavailable")
    p = tmp_path / "bad.g2o"
    info = " ".join(["1.0"] * 21)
    p.write_text("VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1\n"
                 f"EDGE_SE3:QUAT -1 0 0 0 0 0 0 0 1 {info}\n")
    with pytest.raises(ValueError, match="negative vertex index"):
        g2o.load_g2o(str(p), native=native)

    p2 = tmp_path / "bad2.g2o"
    p2.write_text("VERTEX_SE2 -3 0 0 0\n"
                  "EDGE_SE2 0 1 1.0 0.0 0.1 4.0 0.0 0.0 4.0 0.0 2.5\n")
    with pytest.raises(ValueError, match="vertex id|invalid literal"):
        g2o.load_g2o(str(p2), native=native)
