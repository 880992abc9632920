"""bench.py helper machinery: the driver runs bench.py unattended at round
end, so its pure parts get CPU tests (the TPU datapoints themselves are
exercised by running bench.py on hardware)."""

import logging
import sys
import time

import jax.numpy as jnp
import numpy as np


def _bench():
    sys.path.insert(0, "/root/repo")
    import bench

    return bench


def test_timed_frames_outlier_flag():
    bench = _bench()

    def make_step(straggler_frame):
        def step(ds, ubo, frame, cfg):
            if int(frame) == straggler_frame:
                time.sleep(0.25)
            else:
                time.sleep(0.005)
            return jnp.zeros((4,), jnp.float32), jnp.int32(7)

        return step

    # Straggler present: flag set, ray total still accumulates all frames.
    rad, total, times, outlier = bench.timed_frames(
        make_step(3), None, None, None, 5, "t")
    assert outlier is True
    assert total == 35 and len(times) == 5

    # No straggler: flag clear.
    _, _, _, outlier = bench.timed_frames(
        make_step(-1), None, None, None, 4, "t")
    assert outlier is False


def test_compile_log_tap_parses_hit_and_compile_time():
    bench = _bench()
    tap = bench._CompileLogTap.install()
    try:
        logger = logging.getLogger("jax._src.compiler")
        logger.debug(
            "Persistent compilation cache hit for 'jit_step' with key "
            "'jit_step-abc123'")
        logger.debug("'jit_frame' took at least 0.00 seconds to compile "
                     "(12.34s)")
    finally:
        tap.remove()
    assert "jit_step" in tap.hits
    assert tap.compile_s["jit_frame"] == 12.34
    # Removal restores the handler-free state (no leak into later tests).
    assert tap._handler not in logging.getLogger(
        "jax._src.compiler").handlers


def test_drain_forces_scalar():
    bench = _bench()
    v = bench.drain(jnp.asarray(np.ones((8, 3), np.float32)))
    assert v == 24.0
