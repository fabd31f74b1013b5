"""Native C++ host-runtime parity tests (vs the numpy implementations)."""

import contextlib
import os

import numpy as np
import pytest

from magnetite_tpu import native
from magnetite_tpu.fem import assembly, dia as dia_mod
from magnetite_tpu.meshing.generators import plate_with_hole_mesh, rect_mesh
from magnetite_tpu.meshing.msh import _parse_msh_numpy, parse_msh

from test_meshing import MSH_FIXTURE

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@contextlib.contextmanager
def numpy_fallback():
    saved = native._lib
    native._lib = None
    native._load_failed = True
    try:
        yield
    finally:
        native._lib = saved
        native._load_failed = False


@pytest.mark.parametrize(
    "mesh_fn", [lambda: rect_mesh(9, 7), lambda: plate_with_hole_mesh(12, 24)]
)
def test_ell_structure_parity(mesh_fn):
    mesh = mesh_fn()
    s_nat = assembly.build_ell_structure(mesh.tris, mesh.num_nodes)
    with numpy_fallback():
        s_np = assembly.build_ell_structure(mesh.tris, mesh.num_nodes)
    assert s_nat.width == s_np.width
    np.testing.assert_array_equal(s_nat.cols, s_np.cols)
    np.testing.assert_array_equal(s_nat.slot_ids, s_np.slot_ids)


@pytest.mark.parametrize(
    "mesh_fn", [lambda: rect_mesh(9, 7), lambda: plate_with_hole_mesh(12, 24)]
)
def test_dia_structure_parity(mesh_fn):
    mesh = mesh_fn()
    d_nat = dia_mod.build_dia_structure(mesh.tris, mesh.num_nodes)
    with numpy_fallback():
        d_np = dia_mod.build_dia_structure(mesh.tris, mesh.num_nodes)
    np.testing.assert_array_equal(d_nat.offsets, d_np.offsets)
    np.testing.assert_array_equal(
        np.asarray(d_nat.slot_ids, np.int64),
        np.asarray(d_np.slot_ids, np.int64),
    )


def test_dia_structure_over_limit_matches_numpy():
    mesh = rect_mesh(10, 10)
    rng = np.random.default_rng(0)
    perm = rng.permutation(mesh.num_nodes)
    inv = np.argsort(perm)
    scrambled = inv[mesh.tris].astype(np.int32)
    d_nat = dia_mod.build_dia_structure(scrambled, mesh.num_nodes, max_diags=8)
    with numpy_fallback():
        d_np = dia_mod.build_dia_structure(scrambled, mesh.num_nodes, max_diags=8)
    assert d_nat is None and d_np is None


def test_msh_parse_parity_fixture():
    m_nat = parse_msh(MSH_FIXTURE)
    m_np = _parse_msh_numpy(MSH_FIXTURE)
    np.testing.assert_allclose(m_nat.coords, m_np.coords)
    np.testing.assert_array_equal(m_nat.tris, m_np.tris)


def test_msh_parse_parity_noncontiguous_tags():
    text = MSH_FIXTURE.replace("2 1 0 1\n5\n", "2 1 0 1\n9\n").replace(
        "3 1 2 5", "3 1 2 9"
    ).replace("4 2 3 5", "4 2 3 9").replace("5 3 4 5", "5 3 4 9").replace(
        "6 4 1 5", "6 4 1 9"
    ).replace("2 5 1 5", "2 5 1 9")
    m_nat = parse_msh(text)
    m_np = _parse_msh_numpy(text)
    np.testing.assert_allclose(m_nat.coords, m_np.coords)
    np.testing.assert_array_equal(m_nat.tris, m_np.tris)


def test_msh_parse_errors_match():
    from magnetite_tpu.errors import MesherError

    with pytest.raises(MesherError):
        parse_msh("$MeshFormat\n4.1 0 8\n$EndMeshFormat\n")


def test_msh_roundtrip_generated():
    """Synthesize a larger MSH from a generated mesh; both parsers agree."""
    mesh = rect_mesh(20, 20)
    lines = ["$MeshFormat", "4.1 0 8", "$EndMeshFormat", "$Nodes"]
    n = mesh.num_nodes
    lines.append(f"1 {n} 1 {n}")
    lines.append(f"2 1 0 {n}")
    lines.extend(str(i + 1) for i in range(n))
    lines.extend(
        f"{x} {y} 0" for x, y in mesh.coords.tolist()
    )
    lines.append("$EndNodes")
    lines.append("$Elements")
    e = mesh.num_elements
    lines.append(f"1 {e} 1 {e}")
    lines.append(f"2 1 2 {e}")
    lines.extend(
        f"{i + 1} {t[0] + 1} {t[1] + 1} {t[2] + 1}"
        for i, t in enumerate(mesh.tris.tolist())
    )
    lines.append("$EndElements")
    text = "\n".join(lines) + "\n"
    m_nat = parse_msh(text)
    m_np = _parse_msh_numpy(text)
    np.testing.assert_allclose(m_nat.coords, mesh.coords)
    np.testing.assert_array_equal(m_nat.tris, mesh.tris)
    np.testing.assert_allclose(m_np.coords, mesh.coords)


def test_native_sort_reduce_matches_numpy():
    from magnetite_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 500, 10_000).astype(np.int64)
    vals = rng.standard_normal((10_000, 2, 2))
    got_k, got_v = native.sort_reduce_blocks(keys, vals)
    uniq, inv = np.unique(keys, return_inverse=True)
    want = np.zeros((uniq.size, 4))
    np.add.at(want, inv, vals.reshape(-1, 4))
    np.testing.assert_array_equal(got_k, uniq)
    np.testing.assert_allclose(got_v.reshape(-1, 4), want, atol=1e-12)


def test_native_amg_assemble_matches_numpy():
    from magnetite_tpu import native
    from magnetite_tpu.fem.amg import _assemble_block_coo
    from magnetite_tpu.meshing.generators import rect_mesh

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    mesh = rect_mesh(9, 7, width=1.3)
    rng = np.random.default_rng(1)
    free = (rng.uniform(size=(mesh.num_nodes, 2)) > 0.2).astype(np.float64)
    rows, cols, vals = _assemble_block_coo(
        mesh.coords, mesh.tris, 69e9, 0.33, 0.5, free
    )
    # numpy fallback path
    import os

    os.environ["MAGNETITE_NO_NATIVE"] = "1"
    try:
        import magnetite_tpu.native as nat

        # force the flag to take effect for a fresh load decision
        nat._lib = None
        nat._load_failed = False
        rows2, cols2, vals2 = _assemble_block_coo(
            mesh.coords, mesh.tris, 69e9, 0.33, 0.5, free
        )
    finally:
        del os.environ["MAGNETITE_NO_NATIVE"]
        nat._lib = None
        nat._load_failed = False
    # the native direct path emits deduplicated sorted COO; the fallback
    # carries ELL-padding duplicate keys with zero blocks. Both represent
    # the same matrix -- compare densified.
    n = mesh.num_nodes

    def densify(r, c, v):
        dense = np.zeros((n, 2, n, 2))
        np.add.at(dense, (r, slice(None), c, slice(None)), v)
        return dense

    a, b = densify(rows, cols, vals), densify(rows2, cols2, vals2)
    np.testing.assert_allclose(a, b, atol=1e-9 * np.abs(b).max())


def test_stale_native_library_degrades_gracefully(tmp_path, monkeypatch):
    """A pre-existing .so missing current symbols must NOT crash load():
    the process falls back to numpy (and a forced rebuild fixes the file
    for the next interpreter). Found by review: the eager symbol bindings
    used to raise AttributeError through every native entry point."""
    import shutil
    import subprocess

    from magnetite_tpu import native

    src = os.path.join(os.path.dirname(native.__file__), "_native")
    work = tmp_path / "_native"
    shutil.copytree(src, work, ignore=shutil.ignore_patterns("*.so"))
    # build WITHOUT the amg kernels -> stale symbol set, fresh mtime
    subprocess.run(
        [
            "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
            str(work / "src" / "msh_parser.cpp"),
            str(work / "src" / "structure.cpp"),
            "-o", str(work / "libmagnetite_native.so"),
        ],
        check=True,
    )
    # make the sources older than the .so so plain `make` is a no-op
    old = 1_000_000_000
    for f in (work / "src").iterdir():
        os.utime(f, (old, old))
    os.utime(work / "Makefile", (old, old))

    monkeypatch.setattr(native, "_NATIVE_DIR", str(work))
    monkeypatch.setattr(
        native, "_SO_PATH", str(work / "libmagnetite_native.so")
    )
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_failed", False)
    try:
        assert native.load() is None  # graceful, no AttributeError escape
        keys = np.array([3, 3, 5], dtype=np.int64)
        assert native.sort_reduce_blocks(keys, np.ones((3, 1))) is None
    finally:
        native._lib = None
        native._load_failed = False
