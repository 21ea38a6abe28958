"""Native C++ runtime: GSD codec cross-compatibility + table formatter."""

import numpy as np
import pytest

from cavmd_tpu.core import make_diatomic_system
from cavmd_tpu.io import HOOMDTrajectory, open_gsd
from cavmd_tpu.io.native import NativeGSDWriter, format_table, load


pytestmark = pytest.mark.skipif(load() is None, reason="no native toolchain")


def test_native_gsd_cross_read(tmp_path):
    """A file written by the C++ codec must be byte-level readable by the
    Python GSDFile reader (same on-disk format)."""
    snap = make_diatomic_system(8, box_L=18.0, seed=2)
    path = str(tmp_path / "native.gsd")
    t = HOOMDTrajectory(path, "w", prefer_native=True)
    assert isinstance(t.file, NativeGSDWriter)
    t.append(snap, step=0, dtype=np.float64)
    t.append(snap.replace(position=snap.position + 1.0), step=7,
             dtype=np.float64)
    t.close()

    with open_gsd(path) as r:
        assert len(r) == 2
        f0 = r[0]
        f1 = r[1]
    np.testing.assert_allclose(
        np.asarray(f0.position), np.asarray(snap.position), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(f1.position), np.asarray(snap.position) + 1.0, atol=1e-12
    )
    assert f0.types == snap.types
    np.testing.assert_array_equal(
        np.asarray(f0.bond_group), np.asarray(snap.bond_group)
    )


def test_python_and_native_writers_equivalent(tmp_path):
    """Same frames through both codecs -> same chunk contents on read."""
    snap = make_diatomic_system(5, box_L=16.0, seed=3)
    p_native = str(tmp_path / "a.gsd")
    p_python = str(tmp_path / "b.gsd")
    for path, native in ((p_native, True), (p_python, False)):
        t = HOOMDTrajectory(path, "w", prefer_native=native)
        t.append(snap, step=0)
        t.close()
    with open_gsd(p_native) as a, open_gsd(p_python) as b:
        fa, fb = a[0], b[0]
    np.testing.assert_array_equal(np.asarray(fa.position), np.asarray(fb.position))
    np.testing.assert_array_equal(np.asarray(fa.typeid), np.asarray(fb.typeid))
    assert fa.types == fb.types


def test_format_table():
    data = np.array([[0.123456789, 42.0, -1.5], [2.0, 100.0, 3.25]])
    text = format_table(data, decimals=6, int_col=1)
    lines = text.strip().split("\n")
    assert lines[0] == "0.123457 42 -1.500000"
    assert lines[1] == "2.000000 100 3.250000"


def test_format_table_matches_python():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(50, 20))
    data[:, 1] = np.arange(50)
    text = format_table(data, decimals=6, int_col=1)
    for row, line in zip(data, text.strip().split("\n")):
        expect = " ".join(
            str(int(v)) if j == 1 else f"{v:.6f}" for j, v in enumerate(row)
        )
        assert line == expect
