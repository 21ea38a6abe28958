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
def test_shard_atoms_matches_single_device(tmp_path, monkeypatch):
    """--shard-atoms 8: full driver workflow (adaptive dt, energy tracker,
    F(k,t), GSD) with particle arrays sharded over the virtual 8-CPU mesh.
    The trajectory and the tracker files must match a single-device run on
    the same ghost-padded system (--pad-atoms 8 — the bitwise comparator,
    since RNG draws are N-shaped). VERDICT r1 item 3."""
    common = [
        "--runtime", "0.01", "--device", "CPU", "--n-molecules", "12",
        "--enable-energy-tracker", "--enable-fkt",
        "--fkt-wavevectors", "6", "--fkt-ref-interval", "0.005",
        "--energy-output-period-ps", "0.001",
        "--fkt-output-period-ps", "0.001",
        "--gsd-output-period-ps", "0.005",
    ]
    sharded_dir = tmp_path / "sharded"
    single_dir = tmp_path / "single"
    sharded_dir.mkdir()
    single_dir.mkdir()
    monkeypatch.chdir(sharded_dir)
    assert main(common + ["--shard-atoms", "8"]) == 0
    monkeypatch.chdir(single_dir)
    assert main(common + ["--pad-atoms", "8"]) == 0

    from cavmd_tpu.io import open_gsd

    out_s = sharded_dir / "cavity_coupling_1eneg03"
    out_1 = single_dir / "cavity_coupling_1eneg03"
    with open_gsd(str(out_s / "prod-1.gsd")) as ts, \
         open_gsd(str(out_1 / "prod-1.gsd")) as t1:
        assert len(ts) == len(t1)
        fs, f1 = ts[-1], t1[-1]
        # ghost rows stripped from output: only physical particles
        assert fs.N == 25  # 24 atoms + photon
        np.testing.assert_allclose(
            np.asarray(fs.position), np.asarray(f1.position),
            rtol=1e-10, atol=1e-10,
        )

    def rows(path):
        return np.array([
            l.split() for l in open(path)
            if not l.startswith("#") and not l.startswith("time")
        ], float)

    es, e1 = (rows(d / "prod-1_energy_tracker.txt") for d in (out_s, out_1))
    np.testing.assert_allclose(es, e1, rtol=1e-8, atol=1e-10)
    # F(k,t) over sharded obs: same reference files, same values
    ks, k1 = (rows(d / "prod-1_ref0.txt") for d in (out_s, out_1))
    np.testing.assert_allclose(ks, k1, rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_vmap_replicas(tmp_path, monkeypatch):
    """--vmap-replicas with the FULL workflow: adaptive dt, F(k,t) + dipole
    autocorrelation, periodic per-replica GSD frames (VERDICT r1 item 5)."""
    monkeypatch.chdir(tmp_path)
    rc = main([
        "--vmap-replicas", "--replicas", "1-3", "--runtime", "0.01",
        "--device", "CPU", "--n-molecules", "10",
        "--enable-fkt", "--fkt-wavevectors", "6",
        "--fkt-ref-interval", "0.004", "--fkt-output-period-ps", "0.001",
        "--energy-output-period-ps", "0.001",
        "--gsd-output-period-ps", "0.004",
    ])
    assert rc == 0
    out = tmp_path / "cavity_coupling_1eneg03"
    for r in (1, 2, 3):
        assert (out / f"prod-{r}.gsd").exists()
        assert (out / f"prod-{r}_energy_tracker.txt").exists()
        assert (out / f"prod-{r}_cavity_mode.txt").exists()
        # F(k,t) multi-reference files, same format as the sequential path
        assert (out / f"prod-{r}_ref0.txt").exists()
        assert (out / f"prod-{r}_ref1.txt").exists()  # second reference fired
        assert (out / f"prod-{r}_dipole_autocorr_0.txt").exists()
        ref0 = [l for l in open(out / f"prod-{r}_ref0.txt")
                if not l.startswith("#")]
        assert len(ref0) > 2  # C(t) rows accumulated
        assert len(ref0[0].split()) == 3  # timestep lag_time(ps) field_autocorr
    rows = np.array([
        l.split() for l in open(out / "prod-1_energy_tracker.txt")
        if not l.startswith("#") and not l.startswith("time")
    ], float)
    assert len(rows) >= 5  # energy audit rows at the requested period
    # periodic trajectory frames (not just initial+final)
    from cavmd_tpu.io import open_gsd

    with open_gsd(str(out / "prod-1.gsd")) as t1:
        assert len(t1) >= 3
    # replicas decorrelate: final positions differ between replicas
    with open_gsd(str(out / "prod-1.gsd")) as t1, \
         open_gsd(str(out / "prod-2.gsd")) as t2:
        p1 = np.asarray(t1[-1].position)
        p2 = np.asarray(t2[-1].position)
    assert not np.allclose(p1, p2)


def _make_multiframe_input(path, n_frames=3, n_molecules=6, seed=3):
    """Write an n-frame input GSD with distinct per-frame positions
    (the reference's replica-number-doubles-as-frame convention,
    05_advanced_run.py:1571, needs real multi-frame inputs)."""
    from cavmd_tpu.core.system import make_diatomic_system
    from cavmd_tpu.integrate import ForceField
    from cavmd_tpu.io import HOOMDTrajectory
    from cavmd_tpu.utils import fire_minimize

    snap = make_diatomic_system(n_molecules, box_L=14.0, seed=seed)
    ff0 = ForceField.create(snap, enable_cavity=False)
    snap = fire_minimize(snap, ff0, n_steps=200)
    rng = np.random.default_rng(seed)
    pos0 = np.asarray(snap.position)
    frames = []
    with HOOMDTrajectory(path, "w") as t:
        for f in range(n_frames):
            p = pos0 + 1e-3 * rng.standard_normal(pos0.shape)
            frames.append(p)
            t.append(snap.replace(position=p), step=f, dtype=np.float64)
    return frames


@pytest.mark.slow
def test_shard_replicas_matches_vmap(tmp_path, monkeypatch):
    """--shard-replicas 2 x --shard-atoms 4 over the virtual 8-CPU mesh
    reproduces the vmap-only run (padded comparator), from a multi-frame
    input GSD, with log/* chunks embedded in every frame (VERDICT r2
    item 4)."""
    frames = _make_multiframe_input(str(tmp_path / "multi.gsd"))
    common = [
        "--vmap-replicas", "--replicas", "0-1", "--runtime", "0.008",
        "--device", "CPU", "--input-gsd", "../../multi.gsd",
        "--energy-output-period-ps", "0.001",
        "--gsd-output-period-ps", "0.004",
    ]
    vdir = tmp_path / "vmap_only"
    sdir = tmp_path / "sharded"
    vdir.mkdir()
    sdir.mkdir()
    monkeypatch.chdir(vdir)
    assert main(common + ["--pad-atoms", "4"]) == 0
    monkeypatch.chdir(sdir)
    assert main(common + ["--shard-replicas", "2", "--shard-atoms", "4"]) == 0

    from cavmd_tpu.io import open_gsd

    out_v = vdir / "cavity_coupling_1eneg03"
    out_s = sdir / "cavity_coupling_1eneg03"

    def rows(path):
        return np.array([
            l.split() for l in open(path)
            if not l.startswith("#") and not l.startswith("time")
        ], float)

    for r in (0, 1):
        ev, es = (rows(d / f"prod-{r}_energy_tracker.txt")
                  for d in (out_v, out_s))
        np.testing.assert_allclose(es, ev, rtol=1e-8, atol=1e-10)
        # per-replica runtime termination: no tracker rows meaningfully
        # beyond --runtime even though the batch advances until the
        # slowest replica finishes
        assert ev[:, 0].max() <= 0.008 * 1.5
        assert es[:, 0].max() <= 0.008 * 1.5
        with open_gsd(str(out_v / f"prod-{r}.gsd")) as tv, \
             open_gsd(str(out_s / f"prod-{r}.gsd")) as ts:
            assert len(tv) == len(ts)
            # per-replica frame seeding: frame 0 of replica r is input
            # frame r (molecular rows; the photon is appended; ghost
            # padding stripped; GSD frames are f32)
            np.testing.assert_allclose(
                np.asarray(tv[0].position)[: len(frames[r])], frames[r],
                atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(ts[-1].position), np.asarray(tv[-1].position),
                rtol=1e-7, atol=1e-9)
            # ghost rows stripped: 12 atoms + photon
            assert ts[0].N == 13
            # log/* chunks embedded in every frame of the vmapped path
            for fr in range(len(ts)):
                t_ps = ts.read_log(fr, "md/time_ps")
                assert t_ps is not None
            log_names = [n for n in ts.file._names if n.startswith("log/")]
            assert any("EnergyTracker" in n for n in log_names)


@pytest.mark.slow
def test_vmap_replicas_cell_overflow_recovery(tmp_path, monkeypatch):
    """The vmapped-replica chunk loop must recover from cell-list bucket
    overflow like Simulation.run does: re-plan capacity, retry the chunk
    (VERDICT r2 item 4 / weak 5)."""
    from cavmd_tpu.integrate import ForceField

    real_create = ForceField.create

    def crippled_create(snapshot, **kw):
        if kw.get("enable_cavity", True):
            # force cell mode with a cap guaranteed to overflow
            kw.setdefault("pair_mode", "cell")
            kw.setdefault("cell_cap", 2)
            kw.setdefault("r_cut", 7.0)
        return real_create(snapshot, **kw)

    monkeypatch.setattr(ForceField, "create", staticmethod(crippled_create))
    monkeypatch.chdir(tmp_path)
    rc = main([
        "--vmap-replicas", "--replicas", "1-2", "--runtime", "0.004",
        "--device", "CPU", "--n-molecules", "24",
        "--energy-output-period-ps", "0.001",
        "--gsd-output-period-ps", "0.002",
    ])
    assert rc == 0
    out = tmp_path / "cavity_coupling_1eneg03"
    from cavmd_tpu.io import open_gsd

    for r in (1, 2):
        with open_gsd(str(out / f"prod-{r}.gsd")) as t:
            assert np.isfinite(np.asarray(t[-1].position)).all()


def test_resolved_box_constant_density():
    """--box-L default scales the reference box at constant density;
    an explicit value wins (the reference scene is 250 molecules in
    46.0 bohr, core/system.py)."""
    from cavmd_tpu.drivers.advanced_run import build_parser, resolved_box

    p = build_parser()
    assert resolved_box(p.parse_args([])) == pytest.approx(46.0)
    args8 = p.parse_args(["--n-molecules", "2000"])
    assert resolved_box(args8) == pytest.approx(46.0 * 2.0)  # 8x molecules
    rho_ref = 250 / 46.0**3
    assert 2000 / resolved_box(args8) ** 3 == pytest.approx(rho_ref)
    explicit = p.parse_args(["--n-molecules", "2000", "--box-L", "50.0"])
    assert resolved_box(explicit) == 50.0


def test_bench_workload_builder_runs():
    """The shared large-N workload builder (cavmd_tpu/drivers/workloads.py)
    behind bench.py's harness record and scripts/bench_large_n.py must
    run end-to-end at a small size: a chunk advances time, reports the
    overflow channel, and conserves universe energy to the f32 band."""
    import numpy as np

    from cavmd_tpu.drivers.workloads import build_large_n
    from cavmd_tpu.integrate import universe_energy

    runner, state, snap, ff = build_large_n(100)
    assert snap.N == 201
    assert ff.pair_mode == "cell"
    state, obs = runner(state, 50)
    assert not np.asarray(obs["cell_overflow"]).any()
    assert float(state.time_au) > 0
    eu = np.asarray(universe_energy(obs))
    assert eu.shape == (50,)
    assert np.ptp(eu) < 5e-3  # f32 band at this size/dt
