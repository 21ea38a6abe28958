"""End-to-end driver CLI tests (parity: reference 05_advanced_run workflow)."""

import os

import numpy as np
import pytest

from cavmd_tpu.drivers.advanced_run import build_parser, main, parse_replicas


def test_parse_replicas():
    assert parse_replicas("1-3") == [1, 2, 3]
    assert parse_replicas("1,3,5") == [1, 3, 5]
    assert parse_replicas("2-3,1") == [1, 2, 3]
    assert parse_replicas(None) == [1]


def test_parser_flags():
    args = build_parser().parse_args(
        ["--coupling", "2e-3", "--no-cavity", "--fixed-timestep",
         "--fkt-wavevectors", "10"]
    )
    assert args.coupling == 2e-3
    assert args.no_cavity and args.fixed_timestep
    assert args.fkt_wavevectors == 10


@pytest.mark.slow
def test_full_cavity_run(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "--runtime", "0.02", "--device", "CPU", "--n-molecules", "20",
        "--enable-energy-tracker", "--enable-fkt",
        "--fkt-wavevectors", "10", "--fkt-ref-interval", "0.005",
        "--energy-output-period-ps", "0.001",
        "--fkt-output-period-ps", "0.001",
        "--gsd-output-period-ps", "0.01",
    ])
    assert rc == 0
    out = tmp_path / "cavity_coupling_1eneg03"
    assert (out / "prod-1_energy_tracker.txt").exists()
    assert (out / "prod-1_cavity_mode.txt").exists()
    assert (out / "prod-1.gsd").exists()
    assert (out / "prod-1_ref0.txt").exists()
    rows = [
        l.split() for l in open(out / "prod-1_energy_tracker.txt")
        if not l.startswith("#") and not l.startswith("time")
    ]
    d = np.array(rows, float)
    uni = d[:, 18]
    assert np.abs(uni - uni[0]).max() < 1e-4  # conserved universe energy
    # the generated input GSD is persisted next to the job dir
    assert (tmp_path / "init-0.gsd").exists()


@pytest.mark.slow
def test_no_cavity_fixed_dt(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rc = main([
        "--no-cavity", "--fixed-timestep", "--timestep", "0.5",
        "--runtime", "0.01", "--device", "CPU", "--n-molecules", "10",
        "--molecular-bath", "none",
    ])
    assert rc == 0
    assert (tmp_path / "no_cavity" / "prod-1.gsd").exists()


@pytest.mark.slow
def test_resume_from_frame(tmp_path, monkeypatch):
    """Checkpoint/resume: a later run can seed from a prior run's output
    (SURVEY.md §5 checkpoint mechanism)."""
    monkeypatch.chdir(tmp_path)
    rc = main([
        "--runtime", "0.01", "--device", "CPU", "--n-molecules", "10",
        "--gsd-output-period-ps", "0.005",
    ])
    assert rc == 0
    # resume using the produced trajectory as input
    rc = main([
        "--runtime", "0.005", "--device", "CPU",
        "--input-gsd", "../cavity_coupling_1eneg03/prod-1.gsd",
        "--replicas", "2",
    ])
    assert rc == 0
    assert (tmp_path / "cavity_coupling_1eneg03" / "prod-2.gsd").exists()


@pytest.mark.slow
def test_vmap_replicas(tmp_path, monkeypatch):
    """--vmap-replicas: batched trajectories, per-replica output files."""
    monkeypatch.chdir(tmp_path)
    rc = main([
        "--vmap-replicas", "--replicas", "1-3", "--runtime", "0.005",
        "--device", "CPU", "--n-molecules", "10",
    ])
    assert rc == 0
    out = tmp_path / "cavity_coupling_1eneg03"
    for r in (1, 2, 3):
        assert (out / f"prod-{r}.gsd").exists()
        assert (out / f"prod-{r}_energy_tracker.txt").exists()
    # replicas decorrelate: final positions differ between replicas
    from cavmd_tpu.io import open_gsd

    with open_gsd(str(out / "prod-1.gsd")) as t1, \
         open_gsd(str(out / "prod-2.gsd")) as t2:
        p1 = np.asarray(t1[-1].position)
        p2 = np.asarray(t2[-1].position)
    assert not np.allclose(p1, p2)
