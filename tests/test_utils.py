"""Utils tests: MCD metric, ValueWindow, misc helpers, checkpoint manager."""
import numpy as np
import pytest

from tacotron_wavenet_vocoder_korean_tpu.config import AudioConfig
from tacotron_wavenet_vocoder_korean_tpu.utils import metrics, misc
from tacotron_wavenet_vocoder_korean_tpu.utils.infolog import ValueWindow

CFG = AudioConfig()


def _tone(f, dur=0.4, sr=24000):
    t = np.arange(int(sr * dur)) / sr
    return (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_mcd_identity():
    w = _tone(220)
    assert metrics.mcd(w, w, CFG) < 1e-4


def test_mcd_orders_similarity():
    a = _tone(220)
    near = _tone(230)
    far = _tone(1400)
    assert metrics.mcd(a, near, CFG) < metrics.mcd(a, far, CFG)


def test_dtw_handles_length_mismatch():
    a = _tone(220, dur=0.3)
    b = _tone(220, dur=0.45)
    v = metrics.mcd(a, b, CFG, use_dtw=True)
    assert np.isfinite(v) and v < 3.0  # same tone, stretched


def test_value_window():
    w = ValueWindow(3)
    for v in [1, 2, 3, 4]:
        w.append(v)
    assert w.count == 3
    assert w.average == 3.0


def test_misc_helpers():
    assert misc.str2bool("yes") is True
    assert misc.str2bool("0") is False
    with pytest.raises(Exception):
        misc.str2bool("maybe")
    assert misc.add_postfix("a/b.wav", "manual") == "a/b.manual.wav"
    assert misc.parallel_map(lambda x: x * 2, [1, 2, 3], 2) == [2, 4, 6]
    rev = misc.get_git_revision()
    assert rev is None or len(rev) == 40


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from tacotron_wavenet_vocoder_korean_tpu.train.checkpoints import (
        CheckpointManager, restore_into_state)
    from tacotron_wavenet_vocoder_korean_tpu.train.tacotron_task import (
        TrainState)

    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params={"w": jnp.arange(6.0).reshape(2, 3)},
        batch_stats={},
        opt_state=(jnp.zeros(3),))
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    mgr.save(7, state)
    assert mgr.latest_step() == 7
    zero = TrainState(jnp.zeros((), jnp.int32),
                      {"w": jnp.zeros((2, 3))}, {}, (jnp.zeros(3),))
    restored = mgr.restore(zero)
    assert int(restored.step) == 7
    assert np.allclose(np.asarray(restored.params["w"]),
                       np.arange(6.0).reshape(2, 3))
    mgr.close()

    # load_path semantics keep the step; initialize_path resets it
    st, start = restore_into_state(zero, str(tmp_path), None)
    assert start == 7
    st, start = restore_into_state(zero, None, str(tmp_path))
    assert start == 0 and int(st.step) == 0


def test_mutual_exclusion():
    from tacotron_wavenet_vocoder_korean_tpu.train.checkpoints import (
        restore_into_state)
    with pytest.raises(ValueError):
        restore_into_state(None, "a", "b")


def test_step_timer_skips_warmup():
    from tacotron_wavenet_vocoder_korean_tpu.utils.profiling import StepTimer
    import time as _t
    timer = StepTimer(warmup=2)
    for i in range(5):
        with timer:
            _t.sleep(0.002)
    assert timer.count == 5
    assert 0 < timer.mean < 0.1


def test_plot_outputs(tmp_path):
    from tacotron_wavenet_vocoder_korean_tpu.utils import plot
    a = np.random.RandomState(0).rand(12, 30)
    p1 = str(tmp_path / "align.png")
    plot.plot_alignment(a, p1, info="test", text=list("안녕하세요안녕하세요안녕"))
    p2 = str(tmp_path / "spec.png")
    plot.plot_spectrogram(a, p2, title="mel")
    import os
    assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000


def test_optimizer_factory():
    from tacotron_wavenet_vocoder_korean_tpu.train.wavenet_task import (
        make_optimizer)
    from tacotron_wavenet_vocoder_korean_tpu.config import (
        Config, WaveNetConfig, overlay)
    import jax.numpy as jnp
    for opt in ("adam", "sgd", "rmsprop"):
        cfg = overlay(Config(), wavenet={"optimizer": opt,
                                         "clip_gradients": True})
        tx = make_optimizer(cfg)
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()
    with pytest.raises(KeyError):
        make_optimizer(overlay(Config(), wavenet={"optimizer": "lion"}))


def test_watchdog_restart_argv(monkeypatch):
    """restart_argv rewrites the CLI to resume the same run dir and drops
    any prior --load_path/--initialize_path/--log_dir."""
    import sys
    from tacotron_wavenet_vocoder_korean_tpu.train.watchdog import (
        restart_argv)
    monkeypatch.setattr(sys, "argv", [
        "train_tacotron.py", "--data_paths", "a,b",
        "--initialize_path", "warm", "--log_dir=old", "--num_steps", "10"])
    argv = restart_argv("logs/run1")
    assert argv[0] == sys.executable
    assert "--initialize_path" not in argv and "warm" not in argv
    assert "old" not in argv
    assert argv[-4:] == ["--log_dir", "logs/run1", "--load_path", "logs/run1"]
    assert "--num_steps" in argv and "10" in argv


def test_watchdog_noop_and_trigger(monkeypatch, tmp_path):
    from tacotron_wavenet_vocoder_korean_tpu.train import watchdog

    calls = []
    monkeypatch.setattr(watchdog.os, "execv",
                        lambda p, a: calls.append(("exec", p, a)))
    # disabled
    watchdog.maybe_exec_restart("d", 0, save_fn=lambda: calls.append("save"),
                                log_fn=lambda m: None)
    assert not calls
    # under limit
    monkeypatch.setattr(watchdog, "host_rss_gb", lambda: 1.0)
    watchdog.maybe_exec_restart("d", 50, save_fn=lambda: calls.append("save"),
                                log_fn=lambda m: None)
    assert not calls
    # over limit: saves THEN execs
    monkeypatch.setattr(watchdog, "host_rss_gb", lambda: 99.0)
    watchdog.maybe_exec_restart("d", 50, save_fn=lambda: calls.append("save"),
                                log_fn=lambda m: None)
    assert calls[0] == "save" and calls[1][0] == "exec"


def test_slowdown_watchdog_fires_on_sustained_degradation():
    """SlowdownWatchdog: median-of-window vs best-median detector fires on
    leak-driven slowdown but not during warmup."""
    from tacotron_wavenet_vocoder_korean_tpu.train.watchdog import (
        SlowdownWatchdog)
    # The leak grows host RSS alongside the slowdown; model that with a
    # monotonically growing rss_fn (one tick per call).
    rss = iter(range(10000))
    dog = SlowdownWatchdog(ratio=1.25, window=30, min_samples=50,
                           rss_growth_gb=2.0, rss_fn=lambda: next(rss))
    # warmup: huge compile-polluted samples must never fire
    for _ in range(49):
        assert not dog.update(5.0)
    # steady state ~0.12 s/step
    for _ in range(60):
        assert not dog.update(0.12)
    assert dog.best_median == pytest.approx(0.12)
    # degrade to 0.18: once the window median crosses 0.15 it must fire
    fired = False
    for _ in range(40):
        if dog.update(0.18):
            fired = True
            break
    assert fired
    assert "best 120 ms" in dog.reason()


def test_slowdown_watchdog_requires_rss_corroboration():
    """Regression (both_r2_ss step-2800 incident): Tacotron's sec/step
    legitimately varies with the shape-bucket mix and the data curriculum,
    so a degraded median with FLAT host RSS (no leak) must NOT restart —
    each spurious exec-restart pays minutes of bucket recompiles on axon."""
    from tacotron_wavenet_vocoder_korean_tpu.train.watchdog import (
        SlowdownWatchdog)
    dog = SlowdownWatchdog(ratio=1.25, window=30, min_samples=50,
                           rss_growth_gb=2.0, rss_fn=lambda: 30.0)
    for _ in range(80):
        assert not dog.update(0.013)   # short-bucket best median
    # curriculum shift to longer buckets: 1.5x the best, RSS flat
    for i in range(200):
        assert not dog.update(0.020), f"false positive at sample {i}"


def test_slowdown_watchdog_ignores_isolated_spikes_and_disables():
    """Checkpoint-save (~4 s) and eval spikes hit single samples; the median
    detector must not fire on them.  ratio<=1 disables entirely."""
    from tacotron_wavenet_vocoder_korean_tpu.train.watchdog import (
        SlowdownWatchdog)
    dog = SlowdownWatchdog(ratio=1.25, window=30, min_samples=50)
    for _ in range(80):
        assert not dog.update(0.12)
    # one save spike per 100 samples (1000-step interval / 10-step sync),
    # plus eval spikes every 50: at most a handful per 30-sample window
    for i in range(300):
        sample = 0.52 if i % 25 == 0 else 0.12
        assert not dog.update(sample), f"false positive at sample {i}"

    off = SlowdownWatchdog(ratio=1.0)
    for _ in range(200):
        assert not off.update(9.9)


def test_packed_device_put_exact():
    """packed_device_put preserves every leaf's shape/dtype/values across a
    mixed-dtype pytree."""
    import jax
    import numpy as np
    from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
        packed_device_put)
    rng = np.random.RandomState(0)
    tree = {
        "a": rng.randn(3, 5).astype(np.float32),
        "b": {"c": rng.randn(7).astype(np.float32),
              "d": np.arange(4, dtype=np.int32),
              "e": rng.randn(2, 2, 2).astype(np.float16)},
        "f": np.asarray(3, np.int32),           # scalar
        "g": rng.randn(1, 1).astype(np.float32),
    }
    out = packed_device_put(tree)
    flat_in, _ = jax.tree_util.tree_flatten(tree)
    flat_out, _ = jax.tree_util.tree_flatten(out)
    assert len(flat_in) == len(flat_out)
    for a, b in zip(flat_in, flat_out):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(b), a)


def test_packed_host_get_exact():
    """packed_host_get (the O(#dtypes) device->host fetch used by checkpoint
    save) round-trips a mixed device/host pytree exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tacotron_wavenet_vocoder_korean_tpu.utils.misc import (
        packed_host_get)
    rng = np.random.RandomState(1)
    tree = {
        "a": jnp.asarray(rng.randn(3, 5), jnp.float32),
        "b": {"c": jnp.asarray(rng.randn(7), jnp.float32),
              "d": jnp.arange(4, dtype=jnp.int32),
              "e": jnp.asarray(rng.randn(2, 2, 2), jnp.bfloat16)},
        "f": jnp.asarray(3, jnp.int32),                # 0-d device scalar
        "g": rng.randn(1, 1).astype(np.float32),       # host leaf: no transfer
        "h": 7,                                        # python scalar
    }
    out = packed_host_get(tree)
    flat_in, tin = jax.tree_util.tree_flatten(tree)
    flat_out, tout = jax.tree_util.tree_flatten(out)
    assert tin == tout and len(flat_in) == len(flat_out)
    for a, b in zip(flat_in, flat_out):
        assert isinstance(b, np.ndarray)
        assert np.shape(a) == b.shape
        np.testing.assert_array_equal(b, np.asarray(a))


def test_restore_into_abstract_skeleton(tmp_path):
    """restore_into_state accepts a jax.eval_shape skeleton (no concrete
    buffers), so resuming runs skip on-device init entirely."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tacotron_wavenet_vocoder_korean_tpu.train.checkpoints import (
        CheckpointManager, restore_into_state)
    from tacotron_wavenet_vocoder_korean_tpu.train.tacotron_task import (
        TrainState)

    state = TrainState(
        step=jnp.asarray(11, jnp.int32),
        params={"w": jnp.arange(6.0).reshape(2, 3),
                "b": jnp.full((4,), 2.5)},
        batch_stats={},
        opt_state=(jnp.ones(3),))
    mgr = CheckpointManager(str(tmp_path), max_to_keep=1)
    mgr.save(11, state)
    mgr.close()

    def _skeleton():
        return TrainState(jnp.zeros((), jnp.int32),
                          {"w": jnp.zeros((2, 3)), "b": jnp.zeros((4,))},
                          {}, (jnp.zeros(3),))

    abstract = jax.eval_shape(_skeleton)
    assert isinstance(jax.tree.leaves(abstract)[0], jax.ShapeDtypeStruct)
    st, start = restore_into_state(abstract, str(tmp_path), None)
    assert start == 11
    np.testing.assert_allclose(np.asarray(st.params["w"]),
                               np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.asarray(st.params["b"]), 2.5)
    np.testing.assert_allclose(np.asarray(st.opt_state[0]), 1.0)


@pytest.mark.slow
def test_hang_watchdog_fires_and_disarms():
    """HangWatchdog hard-exits 42 when no beat arrives (wedged-RPC recovery)
    and stays quiet while beats flow / after stop().  Runs in a subprocess
    because the watchdog uses os._exit."""
    import subprocess
    import sys as _sys
    prog = """
import sys, time
sys.path.insert(0, {root!r})
from tacotron_wavenet_vocoder_korean_tpu.train.watchdog import HangWatchdog
mode = sys.argv[1]
dog = HangWatchdog(0.5)
if mode == "beats":
    for _ in range(8):
        time.sleep(0.2)
        dog.beat()
    dog.stop()
    time.sleep(1.2)   # disarmed: must NOT fire after stop()
    sys.exit(0)
else:
    time.sleep(30)    # never beats -> watchdog exits 42
    sys.exit(1)
"""
    import os as _os
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    prog = prog.format(root=root)
    r = subprocess.run([_sys.executable, "-c", prog, "hang"], timeout=30)
    assert r.returncode == HangWatchdogExit()
    r = subprocess.run([_sys.executable, "-c", prog, "beats"], timeout=30)
    assert r.returncode == 0


def HangWatchdogExit():
    from tacotron_wavenet_vocoder_korean_tpu.train.watchdog import HangWatchdog
    return HangWatchdog.EXIT_CODE


@pytest.mark.slow
def test_hang_watchdog_first_beat_grace():
    """Before the FIRST beat the (larger) first_timeout_s applies — a slow
    restore+compile must not be killed at the steady-state timeout — and
    the moment a beat arrives the normal timeout takes over."""
    import subprocess
    import sys as _sys
    prog = """
import sys, time
sys.path.insert(0, {root!r})
from tacotron_wavenet_vocoder_korean_tpu.train.watchdog import HangWatchdog
mode = sys.argv[1]
if mode == "grace-holds":
    dog = HangWatchdog(0.3, first_timeout_s=4.0)
    time.sleep(1.2)   # > timeout_s but within grace: must survive
    dog.beat()
    dog.stop()
    sys.exit(0)
elif mode == "grace-then-normal":
    dog = HangWatchdog(0.3, first_timeout_s=30.0)
    dog.beat()        # first beat ends the grace period
    time.sleep(5)     # normal 0.3s timeout now applies -> exits 42
    sys.exit(1)
elif mode == "expect-compile":
    # mid-run new-bucket compile (ADVICE r4): after the first beat,
    # expect_compile() must re-apply the grace window until the next beat,
    # and that beat must restore the steady-state timeout.
    dog = HangWatchdog(0.3, first_timeout_s=4.0)
    dog.beat()            # steady state now
    dog.expect_compile()  # new shape bucket about to first-compile
    time.sleep(1.2)       # > timeout_s but within grace: must survive
    dog.beat()
    dog.stop()
    sys.exit(0)
else:  # grace-expires
    dog = HangWatchdog(0.3, first_timeout_s=1.0)
    time.sleep(10)    # never beats; grace 1.0s expires -> exits 42
    sys.exit(1)
"""
    import os as _os
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    prog = prog.format(root=root)
    r = subprocess.run([_sys.executable, "-c", prog, "grace-holds"],
                       timeout=30)
    assert r.returncode == 0
    r = subprocess.run([_sys.executable, "-c", prog, "grace-then-normal"],
                       timeout=30)
    assert r.returncode == HangWatchdogExit()
    r = subprocess.run([_sys.executable, "-c", prog, "expect-compile"],
                       timeout=30)
    assert r.returncode == 0
    r = subprocess.run([_sys.executable, "-c", prog, "grace-expires"],
                       timeout=30)
    assert r.returncode == HangWatchdogExit()


def test_supervise_script_retries_then_succeeds(tmp_path):
    """scripts/supervise.sh resumes a crashed campaign: retries non-zero
    exits and adds --load_path once a checkpoint exists."""
    import os as _os
    import subprocess
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    script = _os.path.join(root, "scripts", "supervise.sh")
    log_dir = tmp_path / "run"
    (log_dir / "ckpt" / "100").mkdir(parents=True)
    marker = tmp_path / "count"
    fake = tmp_path / "fake.sh"
    fake.write_text(
        "#!/usr/bin/env bash\n"
        f"n=$(cat {marker} 2>/dev/null || echo 0)\n"
        f"echo $((n+1)) > {marker}\n"
        "echo \"args: $@\"\n"
        "if [ \"$n\" -lt 2 ]; then exit 42; fi\n"
        "exit 0\n")
    fake.chmod(0o755)
    env = dict(_os.environ, MAX_RETRIES="5", RETRY_SLEEP_S="1",
               SUPERVISE_NO_SNAPSHOT="1")
    r = subprocess.run(
        ["bash", script, str(log_dir), str(fake)], env=env,
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert marker.read_text().strip() == "3"   # 2 failures + 1 success
    assert f"--load_path {log_dir}" in r.stdout  # ckpt exists -> resume flag


def test_supervise_probe_gates_relaunch_without_consuming_retries(tmp_path):
    """With SUPERVISE_PROBE set, a failed run is followed by a probe loop:
    the trainer is NOT relaunched until the probe passes, and probe failures
    do not consume MAX_RETRIES (outages shouldn't exhaust the crash budget)."""
    import os as _os
    import subprocess
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    script = _os.path.join(root, "scripts", "supervise.sh")
    log_dir = tmp_path / "run"
    log_dir.mkdir()
    marker = tmp_path / "count"
    probe_marker = tmp_path / "probe_count"
    fake = tmp_path / "fake.sh"
    fake.write_text(
        "#!/usr/bin/env bash\n"
        f"n=$(cat {marker} 2>/dev/null || echo 0)\n"
        f"echo $((n+1)) > {marker}\n"
        "if [ \"$n\" -lt 1 ]; then exit 42; fi\n"
        "exit 0\n")
    fake.chmod(0o755)
    # probe fails 3 times, then passes
    probe = (
        f"p=$(cat {probe_marker} 2>/dev/null || echo 0); "
        f"echo $((p+1)) > {probe_marker}; "
        "[ \"$p\" -ge 3 ]")
    env = dict(_os.environ, MAX_RETRIES="2", RETRY_SLEEP_S="0",
               SUPERVISE_NO_SNAPSHOT="1",
               SUPERVISE_PROBE=probe, PROBE_TIMEOUT_S="10",
               PROBE_MAX_TRIES="10")
    r = subprocess.run(
        ["bash", script, str(log_dir), str(fake)], env=env,
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert marker.read_text().strip() == "2"        # 1 failure + 1 success
    assert probe_marker.read_text().strip() == "4"  # 3 failed probes + 1 ok
    assert r.stdout.count("device probe failed") == 3
    assert "device probe ok" in r.stdout


def test_supervise_probe_gives_up_after_probe_budget(tmp_path):
    """A probe that never passes must eventually stop the supervisor (exit
    41) instead of looping forever."""
    import os as _os
    import subprocess
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    script = _os.path.join(root, "scripts", "supervise.sh")
    log_dir = tmp_path / "run"
    log_dir.mkdir()
    fake = tmp_path / "fake.sh"
    fake.write_text("#!/usr/bin/env bash\nexit 42\n")
    fake.chmod(0o755)
    env = dict(_os.environ, MAX_RETRIES="5", RETRY_SLEEP_S="0",
               SUPERVISE_NO_SNAPSHOT="1",
               SUPERVISE_PROBE="false", PROBE_TIMEOUT_S="5",
               PROBE_MAX_TRIES="3")
    r = subprocess.run(
        ["bash", script, str(log_dir), str(fake)], env=env,
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 41, r.stdout + r.stderr
    assert r.stdout.count("device probe failed") == 2  # 3rd prints give-up
    assert "still failing after 3 tries" in r.stdout


def test_supervise_refuses_unsnapshotted_campaign(tmp_path):
    """Durability policy: supervise.sh exits 40 unless the log_dir has a
    LIVE autosnapshot pidfile (or SUPERVISE_NO_SNAPSHOT=1 — covered by the
    other supervise tests).  Two VM resets destroyed unprotected
    checkpoints; the guard makes snapshotting mandatory, not discipline."""
    import os as _os
    import subprocess
    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    script = _os.path.join(root, "scripts", "supervise.sh")
    log_dir = tmp_path / "run"
    log_dir.mkdir()
    fake = tmp_path / "fake.sh"
    fake.write_text("#!/usr/bin/env bash\necho ran\nexit 0\n")
    fake.chmod(0o755)
    env = {k: v for k, v in _os.environ.items()
           if k != "SUPERVISE_NO_SNAPSHOT"}

    # no pidfile at all -> refused
    r = subprocess.run(["bash", script, str(log_dir), str(fake)], env=env,
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 40, r.stdout + r.stderr
    assert "ran" not in r.stdout

    # stale pidfile (dead process) -> still refused
    (log_dir / ".autosnapshot.pid").write_text("999999999")
    r = subprocess.run(["bash", script, str(log_dir), str(fake)], env=env,
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 40, r.stdout + r.stderr

    # live pid -> campaign runs
    (log_dir / ".autosnapshot.pid").write_text(str(_os.getpid()))
    r = subprocess.run(["bash", script, str(log_dir), str(fake)], env=env,
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ran" in r.stdout


def test_text_roundtrip_check(tmp_path):
    """Startup transcript round-trip validation logs dropped-symbol texts
    (reference train_tacotron.py:31-44)."""
    import train_tacotron as T

    d = tmp_path / "data"
    d.mkdir()
    (d / "train.txt").write_text(
        "a.npz|100|4|존경하는 독일 국민 여러분\n"   # clean round-trip
        "b.npz|100|4|남북 화해·협력의 기틀\n",     # '·' not in symbol table
        encoding="utf-8")
    n_bad = T.check_text_roundtrip([str(d)], "korean_cleaners")
    assert n_bad == 1


def test_bench_stops_live_campaigns(tmp_path):
    """The scored bench STOPs live campaigns before measuring (VERDICT r3:
    a live trainer contended the chip out of the tacotron suite)."""
    import os as _os
    import threading
    import time as _time

    import bench

    live = tmp_path / "logs" / "live_run"
    stale = tmp_path / "logs" / "stale_run"
    live.mkdir(parents=True)
    stale.mkdir(parents=True)
    (stale / "train.log").write_text("old\n")
    _os.utime(stale / "train.log", (_time.time() - 3600,) * 2)
    tl = live / "train.log"
    tl.write_text("step 1\n")

    def fake_trainer():
        # keeps logging every second until it sees STOP (like the drivers)
        for _ in range(60):
            if (live / "STOP").exists():
                with open(tl, "a") as f:
                    f.write("exiting cleanly\n")
                return
            with open(tl, "a") as f:
                f.write("step\n")
            _time.sleep(1.0)

    t = threading.Thread(target=fake_trainer, daemon=True)
    t.start()
    t0 = _time.time()
    # Split API (VERDICT r4 weak #6): STOP files land immediately, the
    # bounded quiesce wait is a separate call the first suite overlaps
    # with its first compile.
    bench._stop_live_campaigns(root=str(tmp_path), force=True)
    assert (live / "STOP").exists()           # non-blocking: STOP is instant
    bench._await_campaign_quiesce(timeout_s=45)
    t.join(timeout=10)
    assert (live / "STOP").exists()
    assert not (stale / "STOP").exists()      # quiet runs left alone
    assert "exiting cleanly" in tl.read_text()
    assert _time.time() - t0 < 45             # quiesced before the hard cap


def test_vocoder_eval_selection_includes_heldout():
    """vocoder_eval always scores the loader's true held-out clips (last
    num_test_per_speaker of the sorted paths, data/loader.py:452-456) and
    spreads the remaining budget over the corpus."""
    import importlib.util as _ilu
    import os as _os

    spec = _ilu.spec_from_file_location(
        "vocoder_eval", _os.path.join(_os.path.dirname(__file__),
                                      "..", "scripts", "vocoder_eval.py"))
    mod = _ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)

    corpus = [f"{i:03d}.npz" for i in range(110)]
    paths, held = mod.select_eval_paths(corpus, n=10, n_test=2)
    assert held == {"108.npz", "109.npz"}
    assert set(paths) >= held                 # heldout always included
    assert len(paths) == 10
    assert len(set(paths)) == 10              # no duplicates

    # corpus too small to split: no heldout, plain spread
    paths, held = corpus_small = mod.select_eval_paths(
        [f"{i}.npz" for i in range(3)], n=10, n_test=2)
    assert held == set() and len(paths) == 3


def test_jaxpr_flops_counts_dots_convs_and_scan_trips():
    """utils/flops.py: exact 2*M*N*K for dot_general, conv formula within
    ~15% of XLA's cost model, and scan bodies MULTIPLIED by trip count
    (XLA's cost model counts scan bodies once — wrong for our scan-heavy
    models; this counter feeds the bench's MFU fields with no compile)."""
    import jax
    import jax.numpy as jnp

    from tacotron_wavenet_vocoder_korean_tpu.utils.flops import fn_flops

    a, b = jnp.ones((64, 128)), jnp.ones((128, 32))
    assert fn_flops(lambda a, b: jnp.dot(a, b), a, b) == 2 * 64 * 128 * 32

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC"))
    x, k = jnp.ones((2, 100, 16)), jnp.ones((5, 16, 32))
    got = fn_flops(conv, x, k)
    want = 2 * 2 * 96 * 32 * 5 * 16      # 2*|out|*K_spatial*C_in
    assert got == want

    def scanned(c, xs):
        return jax.lax.scan(lambda c, x: (jnp.dot(c, x), ()), c, xs)[0]
    c0, xs = jnp.ones((8, 8)), jnp.ones((10, 8, 8))
    assert fn_flops(scanned, c0, xs) == 10 * 2 * 8 * 8 * 8

    # grad traces the backward too: d(xW)/dW and d/dx add 2 more matmuls
    def loss(w, x):
        return jnp.sum(jnp.dot(x, w) ** 2)
    w, x = jnp.ones((16, 8)), jnp.ones((4, 16))
    fwd = fn_flops(loss, w, x)
    both = fn_flops(jax.grad(loss, argnums=(0, 1)), w, x)
    assert both == 3 * fwd               # fwd + d/dw + d/dx matmuls


def test_jaxpr_flops_train_step_magnitude():
    """The counter runs on the REAL tacotron train step (scan + CBHG convs +
    grad) and lands in a sane range: at least the 3x-forward matmul floor
    implied by the parameter count, well under an absurd bound."""
    import jax
    import numpy as np

    from tacotron_wavenet_vocoder_korean_tpu.config import Config
    from tacotron_wavenet_vocoder_korean_tpu.data.loader import TacotronBatch
    from tacotron_wavenet_vocoder_korean_tpu.train.tacotron_task import (
        TacotronTask, batch_to_dict)
    from tacotron_wavenet_vocoder_korean_tpu.utils.flops import fn_flops
    from tests.test_tacotron import tiny_cfg

    cfg = Config(tacotron=tiny_cfg(initial_phase_step=0))
    task = TacotronTask(cfg, is_randomly_initialized=True)
    rng = np.random.RandomState(0)
    B, T_in, T_out = 2, 16, 20
    batch = TacotronBatch(
        inputs=rng.randint(2, 70, size=(B, T_in)).astype(np.int32),
        input_lengths=np.full((B,), T_in, np.int32),
        loss_coeff=np.ones((B,), np.float32),
        mel_targets=rng.randn(B, T_out, 80).astype(np.float32),
        linear_targets=rng.randn(B, T_out, 1025).astype(np.float32),
        speaker_id=np.zeros((B,), np.int32))
    state = task.init_state(jax.random.PRNGKey(0), batch)
    flops = fn_flops(task.train_step, state, batch_to_dict(batch),
                     jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    # fwd+bwd >= ~3 * 2*P per example applied at least once
    assert flops > 3 * 2 * n_params
    assert flops < 1e13                   # tiny model, tiny batch
